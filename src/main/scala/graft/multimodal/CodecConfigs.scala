package graft.multimodal

/** Codec-configuration ("extradata") record parsing for the four
  * config shapes modern video corpora carry out-of-band:
  *
  *  - `avcC`  — AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1)
  *  - `hvcC`  — HEVCDecoderConfigurationRecord (ISO 14496-15 §8.3.3.1)
  *  - `av1C`  — AV1CodecConfigurationRecord (AV1 Codec ISO Media File
  *              Format Binding §2.3; also the CodecPrivate payload of
  *              AV1-in-Matroska per the AV1-in-Matroska mapping)
  *  - `vpcC`  — VPCodecConfigurationRecord inside its FullBox (VP
  *              Codec ISO Media File Format Binding §8; `vp08`/`vp09`
  *              sample entries)
  *
  * The reference has no video surface at all (its ingest is pandas
  * over CSV/parquet — `data_extraction.py`); this is the
  * beyond-reference multimodal seam. Round 12 ROUTED `av01`/`vp09`
  * sample entries but extracted extradata for AVC/HEVC only, so an
  * AV1/VP9 corpus indexed frames without codec config — these parsers
  * close that gap, and [[Multimodal.videoCodecConfigs]] exposes the
  * result per asset.
  *
  * Strictness matches the container family: fixed marker/version
  * bits and reserved-bit zeroes are validated, lengths are
  * bounds-checked, and any violation yields None (the Spark seam
  * emits the flagged row). Profile/level/bit-depth semantics are the
  * registry ones each spec defines (e.g. AV1 `seq_level_idx` 8 =
  * level 4.0; VP9 level 41 = 4.1 tens-encoded).
  */
object CodecConfigs {

  /** Parsed config: the record kind plus the three fields every
    * codec's record exposes (profile, level as the codec encodes it,
    * luma bit depth). */
  final case class ConfigFields(kind: String, profile: Int, level: Int,
      bitDepth: Int)

  /** Dispatch on the config-box fourcc ([[Mp4Index.configBoxFor]]) or
    * the Matroska CodecPrivate kind ([[kindForMkvCodec]]). */
  def parse(kind: String, b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = kind match {
    case "avcC" => parseAvcC(b, from, until)
    case "hvcC" => parseHvcC(b, from, until)
    case "av1C" => parseAv1C(b, from, until)
    case "vpcC" => parseVpcC(b, from, until)
    case "vp9cp" => parseVp9Private(b, from, until)
    case _ => None
  }

  /** avcC: configurationVersion(1)==1, AVCProfileIndication(1),
    * profile_compatibility(1), AVCLevelIndication(1),
    * reserved+lengthSizeMinusOne(1), then SPS/PPS lists. Bit depth is
    * 8 unless the High-profile extension (chroma_format +
    * bit_depth_luma_minus8 …, present for profile_idc 100/110/122/144
    * when the muxer wrote it) says otherwise — the same
    * extension-optional leniency [[H264Avcc.parseConfig]] documents.
    */
  def parseAvcC(b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = {
    if (until - from < 7 || b(from) != 1) return None
    val profile = b(from + 1) & 0xff
    val level = b(from + 3) & 0xff
    if ((b(from + 4) & 0x03) == 2) return None // reserved lengthSize
    // walk the SPS/PPS lists only to find the optional extension
    var off = from + 5
    def takeSets(count: Int): Boolean = {
      var c = count
      while (c > 0) {
        if (off + 2 > until) return false
        val l = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        off += 2 + l
        if (off > until || l == 0) return false
        c -= 1
      }
      true
    }
    val numSps = b(off) & 0x1f
    off += 1
    if (numSps == 0 || !takeSets(numSps)) return None
    if (off >= until) return None
    val numPps = b(off) & 0xff
    off += 1
    if (numPps == 0 || !takeSets(numPps)) return None
    val bitDepth =
      if (off + 3 <= until && (b(off) & 0xfc) == 0xfc &&
          (b(off + 1) & 0xf8) == 0xf8 && (b(off + 2) & 0xf8) == 0xf8)
        (b(off + 1) & 0x07) + 8
      else 8
    Some(ConfigFields("avcC", profile, level, bitDepth))
  }

  /** hvcC: version(1)==1; byte 1 = profile_space(2)+tier(1)+
    * general_profile_idc(5); bytes 2–5 compat flags; 6–11 constraint
    * flags; byte 12 = general_level_idc; then min_spatial(2),
    * parallelism(1), chroma_format(1), bit_depth_luma_minus8(1),
    * bit_depth_chroma_minus8(1), avgFrameRate(2),
    * flags+lengthSizeMinusOne(1), numOfArrays(1) — 23 fixed bytes
    * before the NALU arrays. */
  def parseHvcC(b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = {
    if (until - from < 23 || b(from) != 1) return None
    val profile = b(from + 1) & 0x1f
    val level = b(from + 12) & 0xff
    val bitDepth = (b(from + 17) & 0x07) + 8
    Some(ConfigFields("hvcC", profile, level, bitDepth))
  }

  /** av1C (AV1-ISOBMFF §2.3): byte 0 = marker(1)==1 + version(7)==1
    * (0x81); byte 1 = seq_profile(3) + seq_level_idx_0(5); byte 2 =
    * seq_tier_0 + high_bitdepth + twelve_bit + monochrome +
    * chroma_subsampling_x/y + chroma_sample_position(2); byte 3 =
    * reserved(3)==0 + initial_presentation_delay fields; then
    * configOBUs. Bit depth per the AV1 spec's color-config ladder:
    * high_bitdepth=0 → 8, =1 → 10, +twelve_bit → 12 (twelve_bit
    * without high_bitdepth is malformed). When configOBUs are
    * present they must tile as size-field OBUs (§5.3.2; the spec
    * requires obu_has_size_field for configOBUs) — a truncated or
    * junk-trailing record refuses. */
  def parseAv1C(b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = {
    if (until - from < 4 || (b(from) & 0xff) != 0x81) return None
    val profile = (b(from + 1) >> 5) & 0x07
    val level = b(from + 1) & 0x1f
    val high = (b(from + 2) & 0x40) != 0
    val twelve = (b(from + 2) & 0x20) != 0
    if (twelve && !high) return None
    if ((b(from + 3) & 0xe0) != 0) return None // reserved bits
    if (!obusTile(b, from + 4, until)) return None
    val bitDepth = if (!high) 8 else if (twelve) 12 else 10
    Some(ConfigFields("av1C", profile, level, bitDepth))
  }

  /** configOBUs must tile exactly: header byte (forbidden bit 0,
    * obu_has_size_field required here) [+ extension byte] + leb128
    * size + payload, repeated to `until` (AV1 §5.3.2). */
  private def obusTile(b: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val h = b(i) & 0xff
      if ((h & 0x80) != 0 || (h & 0x01) != 0) return false // forbidden/reserved
      if ((h & 0x02) == 0) return false // configOBUs carry size fields
      i += 1
      if ((h & 0x04) != 0) i += 1 // extension_flag: one extension byte
      // leb128 (≤ 8 bytes per spec; sizes here are tiny)
      var size = 0L
      var shift = 0
      var more = true
      while (more) {
        if (i >= until || shift > 56) return false
        val v = b(i) & 0xff
        size |= (v & 0x7fL) << shift
        more = (v & 0x80) != 0
        shift += 7
        i += 1
      }
      if (size < 0 || size > until - i) return false
      i += size.toInt
    }
    true
  }

  /** vpcC (VP codec ISO binding §8): FullBox version(1)==1 +
    * flags(3)==0, then profile(1), level(1), bitDepth(4)+
    * chromaSubsampling(3)+videoFullRangeFlag(1), colourPrimaries(1),
    * transferCharacteristics(1), matrixCoefficients(1),
    * codecInitializationDataSize(2) — which MUST be 0 for VP8/VP9 —
    * + that many data bytes, tiling the record exactly. */
  def parseVpcC(b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = {
    if (until - from < 12) return None
    if (b(from) != 1 || b(from + 1) != 0 || b(from + 2) != 0 ||
        b(from + 3) != 0) return None
    val profile = b(from + 4) & 0xff
    val level = b(from + 5) & 0xff
    val bitDepth = (b(from + 6) >> 4) & 0x0f
    if (bitDepth != 8 && bitDepth != 10 && bitDepth != 12) return None
    val initSize = ((b(from + 10) & 0xff) << 8) | (b(from + 11) & 0xff)
    if (initSize != 0 || from + 12 + initSize != until) return None
    Some(ConfigFields("vpcC", profile, level, bitDepth))
  }

  /** The config-record kind a Matroska CodecID implies for its
    * CodecPrivate payload (Matroska codec mappings): AVC/HEVC carry
    * the same avcC/hvcC records as MP4; AV1 carries the av1C record
    * verbatim (AV1-in-Matroska §CodecPrivate); VP9's OPTIONAL
    * CodecPrivate is the WebM feature-record format (`vp9cp`, id/
    * length/value triples — NOT the MP4 vpcC box). VP8 keeps config
    * in-band with no defined CodecPrivate, so no kind. */
  def kindForMkvCodec(codecId: String): Option[String] = codecId match {
    case "V_MPEG4/ISO/AVC" => Some("avcC")
    case "V_MPEGH/ISO/HEVC" => Some("hvcC")
    case "V_AV1" => Some("av1C")
    case "V_VP9" => Some("vp9cp")
    case _ => None
  }

  /** Whether a Matroska codec's mapping REQUIRES CodecPrivate: absent
    * extradata on these is a spec-violating mux (surfaced as the
    * declared kind with −1 fields); VP9's is optional — absence is
    * the normal in-band shape, not an anomaly. */
  def mkvPrivateRequired(codecId: String): Boolean = codecId match {
    case "V_MPEG4/ISO/AVC" | "V_MPEGH/ISO/HEVC" | "V_AV1" => true
    case _ => false
  }

  /** VP9-in-WebM CodecPrivate (WebM "VP9 Codec Private" mapping):
    * (id: 1 byte, length: 1 byte, value) triples tiling the payload
    * exactly — id 1 profile, 2 level, 3 bit depth, 4 chroma
    * subsampling, each 1-byte; unknown ids are skipped
    * (forward-compatible per spec), but a DEFINED id with the wrong
    * length, a bit depth outside {8,10,12}, or broken tiling
    * refuses. Absent features report −1. */
  def parseVp9Private(b: Array[Byte], from: Int, until: Int)
      : Option[ConfigFields] = {
    if (until - from < 3) return None
    var i = from
    var profile = -1
    var level = -1
    var bitDepth = -1
    while (i < until) {
      if (i + 2 > until) return None
      val id = b(i) & 0xff
      val l = b(i + 1) & 0xff
      if (i + 2 + l > until) return None
      if (id >= 1 && id <= 4) {
        if (l != 1) return None
        val v = b(i + 2) & 0xff
        id match {
          case 1 => profile = v
          case 2 => level = v
          case 3 => bitDepth = v
          case _ => () // chroma subsampling: validated, not surfaced
        }
      }
      i += 2 + l
    }
    if (bitDepth != -1 && bitDepth != 8 && bitDepth != 10 &&
      bitDepth != 12) return None
    Some(ConfigFields("vp9cp", profile, level, bitDepth))
  }

  /** A WebM VP9 CodecPrivate for fixtures: profile/level/bit-depth/
    * chroma triples (12 bytes). */
  def encodeVp9Private(profile: Int, level: Int, bitDepth: Int = 8,
      chroma: Int = 1): Array[Byte] =
    Array[Byte](1, 1, profile.toByte, 2, 1, level.toByte,
      3, 1, bitDepth.toByte, 4, 1, chroma.toByte)

  // ---------------------------------------------------------------
  // AUDIO codec config: esds (AAC-in-MP4) and dOps (Opus-in-MP4)
  // ---------------------------------------------------------------

  /** Parsed audio config: record kind, MPEG-4 objectTypeIndication
    * (−1 where the codec has none), declared sample rate and
    * channels. */
  final case class AudioConfig(kind: String, objectType: Int,
      sampleRateHz: Int, channels: Int)

  /** ISO 14496-3 §1.6.3 sampling-frequency-index table. */
  private val AscRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** esds (MPEG-4 ES descriptor framing, ISO 14496-1 §7.2.6): FullBox
    * payload → ES_Descriptor(tag 0x03, expandable length) →
    * DecoderConfigDescriptor(0x04: objectTypeIndication first) →
    * DecoderSpecificInfo(0x05: the AudioSpecificConfig — ISO 14496-3
    * §1.6.2.1: audioObjectType(5) + samplingFrequencyIndex(4, 0xf =
    * 24-bit explicit frequency) + channelConfiguration(4)). Strict:
    * descriptor lengths must fit, reserved frequency indices (13/14)
    * and the escaped audioObjectType (31) refuse. */
  def parseEsds(b: Array[Byte], from: Int, until: Int)
      : Option[AudioConfig] = {
    if (until - from < 4 || b(from) != 0) return None // version 0
    var i = from + 4
    // one descriptor header: (tag, payloadStart, payloadEnd)
    def descriptor(at: Int, end: Int): Option[(Int, Int, Int)] = {
      if (at + 2 > end) return None
      val tag = b(at) & 0xff
      var j = at + 1
      var size = 0L
      var n = 0
      var more = true
      while (more) {
        if (j >= end || n >= 4) return None
        val v = b(j) & 0xff
        size = (size << 7) | (v & 0x7f)
        more = (v & 0x80) != 0
        n += 1; j += 1
      }
      if (size > end - j) None else Some((tag, j, j + size.toInt))
    }
    val (esTag, esStart, esEnd) = descriptor(i, until).getOrElse(return None)
    if (esTag != 0x03 || esEnd - esStart < 3) return None
    // ES_ID(2) + flags(1): streamDependence(+2) / URL(+1+len) / OCR(+2)
    val flags = b(esStart + 2) & 0xff
    var p = esStart + 3
    if ((flags & 0x80) != 0) p += 2
    if ((flags & 0x40) != 0) {
      if (p >= esEnd) return None
      p += 1 + (b(p) & 0xff)
    }
    if ((flags & 0x20) != 0) p += 2
    if (p > esEnd) return None
    // sub-descriptors of the ES descriptor: find DecoderConfig (0x04)
    var dcd: Option[(Int, Int)] = None
    while (p < esEnd && dcd.isEmpty) {
      val (tag, s, e) = descriptor(p, esEnd).getOrElse(return None)
      if (tag == 0x04) dcd = Some((s, e))
      p = e
    }
    val (ds, de) = dcd.getOrElse(return None)
    if (de - ds < 13) return None
    val oti = b(ds) & 0xff
    // sub-descriptors of DecoderConfig: find DecoderSpecificInfo (0x05)
    var q = ds + 13
    var asc: Option[(Int, Int)] = None
    while (q < de && asc.isEmpty) {
      val (tag, s, e) = descriptor(q, de).getOrElse(return None)
      if (tag == 0x05) asc = Some((s, e))
      q = e
    }
    // DecoderSpecificInfo is OPTIONAL per ISO 14496-1 §7.2.6.6 —
    // MP3-in-mp4a (OTI 0x6B) legitimately carries none: the OTI is
    // still the routing fact, so report it with unspecified fields
    // rather than lumping a valid record with corrupt ones
    if (asc.isEmpty) return Some(AudioConfig("esds", oti, -1, -1))
    val (as0, ae) = asc.get
    if (ae - as0 < 2) return None
    val b0 = b(as0) & 0xff
    val b1 = b(as0 + 1) & 0xff
    val aot = (b0 >> 3) & 0x1f
    if (aot == 0 || aot == 31) return None // reserved / escaped form
    val freqIdx = ((b0 & 0x07) << 1) | (b1 >> 7)
    val (rate, chanBitsAt) =
      if (freqIdx == 0xf) {
        // 24-bit explicit frequency follows the index
        if (ae - as0 < 5) return None
        val f = ((b1 & 0x7f) << 17) | ((b(as0 + 2) & 0xff) << 9) |
          ((b(as0 + 3) & 0xff) << 1) | ((b(as0 + 4) >> 7) & 1)
        (f, 4) // channels: bits 1..4 of byte as0+4
      } else if (freqIdx < AscRates.length) (AscRates(freqIdx), 1)
      else return None // 13/14 reserved
    val channels =
      if (chanBitsAt == 1) (b1 >> 3) & 0x0f
      else (b(as0 + 4) >> 3) & 0x0f
    if (rate <= 0) return None
    Some(AudioConfig("esds", oti, rate, channels))
  }

  /** dOps (Opus-in-ISOBMFF §4.3.2 OpusSpecificBox payload —
    * OpusHead's fields without the magic): Version(1)==0,
    * OutputChannelCount(1), PreSkip(2 BE), InputSampleRate(4 BE),
    * OutputGain(2), ChannelMappingFamily(1) [+ mapping table when
    * family != 0]. */
  def parseDOps(b: Array[Byte], from: Int, until: Int)
      : Option[AudioConfig] = {
    if (until - from < 11 || b(from) != 0) return None
    val channels = b(from + 1) & 0xff
    val rate = ((b(from + 4) & 0xffL) << 24) | ((b(from + 5) & 0xffL) << 16) |
      ((b(from + 6) & 0xffL) << 8) | (b(from + 7) & 0xffL)
    val family = b(from + 10) & 0xff
    val expected = if (family == 0) 11 else 11 + 2 + channels
    if (until - from != expected) return None
    // InputSampleRate 0 = "unspecified" (RFC 7845 §5.1 — the field is
    // informational); real muxers write it, so it is NOT malformed
    if (channels < 1 || rate < 0 || rate > Int.MaxValue) return None
    Some(AudioConfig("dOps", -1, rate.toInt, channels))
  }

  /** Dispatch on the audio config-box fourcc
    * ([[Mp4Index.audioConfigBoxFor]]). */
  def parseAudio(kind: String, b: Array[Byte], from: Int, until: Int)
      : Option[AudioConfig] = kind match {
    case "esds" => parseEsds(b, from, until)
    case "dOps" => parseDOps(b, from, until)
    case _ => None
  }

  /** A minimal valid esds record for fixtures: 1-byte expandable
    * lengths, AAC-LC AudioSpecificConfig (16 bits exactly for the
    * GA frame-length/coreCoder/extension tail). */
  def encodeEsdsRecord(freqIdx: Int, channels: Int,
      oti: Int = 0x40, aot: Int = 2): Array[Byte] = {
    require(freqIdx >= 0 && freqIdx <= 12 && channels >= 1 &&
      channels <= 15 && aot > 0 && aot < 31)
    val asc = Array[Byte](
      (((aot & 0x1f) << 3) | ((freqIdx >> 1) & 0x07)).toByte,
      (((freqIdx & 1) << 7) | ((channels & 0x0f) << 3)).toByte)
    val dsi = Array[Byte](0x05, asc.length.toByte) ++ asc
    // fixed DecoderConfig fields: OTI + streamType/upStream +
    // bufferSizeDB(3) + maxBitrate(4) + avgBitrate(4) = 13 bytes
    val dcd = Array[Byte](0x04, (13 + dsi.length).toByte,
      oti.toByte, 0x15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ dsi
    val es = Array[Byte](0x03, (3 + dcd.length).toByte,
      0, 1, 0) ++ dcd
    Array[Byte](0, 0, 0, 0) ++ es
  }

  /** A dOps record for fixtures (mapping family 0). */
  def encodeDOpsRecord(channels: Int, inputRateHz: Int,
      preSkip: Int = 312): Array[Byte] =
    Array[Byte](0, channels.toByte,
      ((preSkip >> 8) & 0xff).toByte, (preSkip & 0xff).toByte,
      ((inputRateHz >> 24) & 0xff).toByte,
      ((inputRateHz >> 16) & 0xff).toByte,
      ((inputRateHz >> 8) & 0xff).toByte, (inputRateHz & 0xff).toByte,
      0, 0, 0)

  // ---------------------------------------------------------------
  // synthetic record builders (specs/oracles)
  // ---------------------------------------------------------------

  /** A well-formed av1C record: header nibble fields + one synthetic
    * sequence-header OBU (type 1, has_size, `obuLen` payload bytes). */
  def encodeAv1CRecord(seqProfile: Int, seqLevelIdx: Int,
      highBitdepth: Boolean = false, twelveBit: Boolean = false,
      obuLen: Int = 10): Array[Byte] = {
    require(seqProfile >= 0 && seqProfile <= 7 &&
      seqLevelIdx >= 0 && seqLevelIdx <= 31 && obuLen >= 0 && obuLen < 128)
    val b2 = ((if (highBitdepth) 0x40 else 0) |
      (if (twelveBit) 0x20 else 0) | 0x0c).toByte // 4:2:0 x=y=1
    Array[Byte](0x81.toByte,
      (((seqProfile & 0x07) << 5) | (seqLevelIdx & 0x1f)).toByte,
      b2, 0x00) ++
      (Array[Byte](0x0a, obuLen.toByte) ++ // OBU_SEQUENCE_HEADER + size
        Array.tabulate[Byte](obuLen)(i => ((i * 29 + 5) & 0x7f).toByte))
  }

  /** A well-formed vpcC record (FullBox payload): version 1, the
    * given profile/level/bit-depth, 4:2:0 colocated chroma, studio
    * range, BT.709 colour, zero init data. */
  def encodeVpcCRecord(profile: Int, level: Int,
      bitDepth: Int = 8): Array[Byte] = {
    require(Set(8, 10, 12)(bitDepth))
    Array[Byte](1, 0, 0, 0,
      profile.toByte, level.toByte,
      (((bitDepth & 0x0f) << 4) | (1 << 1)).toByte, // chroma 4:2:0 = 1
      1, 1, 1, // BT.709 primaries/transfer/matrix
      0, 0)
  }
}

