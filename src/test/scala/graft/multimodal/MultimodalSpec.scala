package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private def s = spark

  private def assets = Seq(
    (1L, "s3://bucket/cat.jpg", Array[Byte](1, 2, 3, 4)),
    (2L, "s3://bucket/dog.PNG", Array[Byte](5, 6)),
    (3L, "s3://bucket/song.mp3", Array[Byte](7)),
    (4L, "s3://bucket/clip.mp4", Array[Byte](8, 9)),
    (5L, "s3://bucket/readme.txt", Array[Byte](10))
  ).toDF("id", "uri", "bytes")

  test("toMediaAssets derives kind from suffix and length from bytes") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val kinds = media.collect().map(a => a.asset_id -> a.kind).toMap
    assert(kinds === Map(1L -> "image", 2L -> "image", 3L -> "audio",
      4L -> "video", 5L -> "unknown"))
    assert(media.filter(_.asset_id == 1L).head().content_length === 4L)
  }

  test("extractImageFeatures processes only images, deterministically") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val feats = Multimodal.extractImageFeatures(media).collect()
      .sortBy(_.asset_id)
    assert(feats.map(_.asset_id).toSeq === Seq(1L, 2L))
    val again = Multimodal.extractImageFeatures(media).collect()
      .sortBy(_.asset_id)
    assert(feats.toSeq === again.toSeq) // stub is deterministic
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 &&
      f.channels >= 1 && f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
  }

  test("sampleFrameIndexes fans out stride-spaced frames per video") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val frames = Multimodal.sampleFrameIndexes(media, stride = 10, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSeq === Seq((4L, 0), (4L, 10), (4L, 20), (4L, 30)))
  }

  test("repartitionForMedia sizes partitions by bytes") {
    val media = Multimodal.toMediaAssets(assets, "id", "uri", "bytes")
    val repart = Multimodal.repartitionForMedia(media,
      targetBytesPerPartition = 4L)
    assert(repart.rdd.getNumPartitions === 2) // 10 bytes / 4 per part
    assert(repart.count() === 5)
  }
}
