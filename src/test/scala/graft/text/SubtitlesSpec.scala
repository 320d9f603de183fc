package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** [[Subtitles]]: SRT/VTT cue parsing must carry exact millisecond
  * spans and whole texts out of well-formed documents and refuse
  * malformed ones whole.
  */
class SubtitlesSpec extends AnyFunSuite {

  private val srt =
    """1
      |00:00:01,500 --> 00:00:04,000
      |Hello there.
      |
      |2
      |00:00:04,200 --> 00:00:06,900
      |Two lines
      |of text.
      |
      |4
      |01:02:03,004 --> 01:02:05,006
      |Counter skipped 3 — legal.
      |""".stripMargin

  private val vtt =
    """WEBVTT - with a header comment
      |
      |NOTE
      |a comment block to skip
      |
      |intro
      |00:00:01.500 --> 00:00:04.000 align:start
      |Hello there.
      |
      |02:10.250 --> 02:12.000
      |Short-form times.
      |""".stripMargin

  test("SRT: spans, multi-line text, skipped counters") {
    val cues = Subtitles.parseSrt(srt).get
    assert(cues.map(c => (c.startMs, c.endMs)) ===
      Seq((1500L, 4000L), (4200L, 6900L), (3723004L, 3725006L)))
    assert(cues(1).text === "Two lines\nof text.")
    assert(cues.map(_.cueIdx) === Seq(0, 1, 2))
  }

  test("VTT: magic, NOTE skip, identifiers, settings, short-form times") {
    val cues = Subtitles.parseVtt(vtt).get
    assert(cues.map(c => (c.startMs, c.endMs)) ===
      Seq((1500L, 4000L), (130250L, 132000L)))
    assert(cues.head.text === "Hello there.")
    // the sniffing parse routes each format
    assert(Subtitles.parse(vtt).get._1 === "vtt")
    assert(Subtitles.parse(srt).get._1 === "srt")
    // BOM tolerated
    assert(Subtitles.parse("﻿" + vtt).get._2.length === 2)
  }

  test("cue identifiers merely STARTING with NOTE/REGION are cues, not comments") {
    val doc = Seq(
      "WEBVTT", "",
      "NOTES-1", "00:00:01.000 --> 00:00:02.000", "first", "",
      "REGIONAL", "00:00:03.000 --> 00:00:04.000", "second", "",
      "NOTE a real comment", "skipped", "",
      "NOTE", "also a real comment").mkString("\n")
    val cues = Subtitles.parseVtt(doc).get
    assert(cues.map(_.text) === Seq("first", "second"))
  }

  test("strictness: malformed docs refuse whole") {
    // decreasing counters
    assert(Subtitles.parseSrt(srt.replace("\n4\n", "\n2\n")).isEmpty)
    // comma/dot separator mixups cross formats
    assert(Subtitles.parseSrt(srt.replace(",", ".")).isEmpty)
    assert(Subtitles.parseVtt(vtt.replace(".", ",")).isEmpty)
    // end before start
    assert(Subtitles.parseSrt(srt.replace(
      "00:00:04,200 --> 00:00:06,900",
      "00:00:06,900 --> 00:00:04,200")).isEmpty)
    // minutes/seconds over 59
    assert(Subtitles.parseSrt(srt.replace("00:00:01,500",
      "00:61:01,500")).isEmpty)
    // a cue with no text
    assert(Subtitles.parseVtt(
      "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\n").isEmpty)
    // non-subtitle text
    assert(Subtitles.parse("just some prose\nwith lines").isEmpty)
    assert(Subtitles.parse("").isEmpty)
  }
}
