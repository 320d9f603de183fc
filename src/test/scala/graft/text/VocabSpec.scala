package graft.text

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("ids follow (freq desc, token) rank; encode preserves order; OOV is 0") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b zz")).toDF("id", "text")
    val vocab = Vocab.build(docs, "text", size = 3)
    val v = vocab.as[(String, Long)].collect().toMap
    assert(v === Map("b" -> 1L, "a" -> 2L, "c" -> 3L)) // b:4 > a:3 > c:1
    val enc = Vocab.encode(docs, vocab, "id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(enc(1L) === Seq(1L, 1L, 1L, 2L, 2L, 3L))
    assert(enc(2L) === Seq(2L, 1L, 0L)) // zz out-of-vocab -> 0
  }

  test("empty and punctuation-only docs encode as empty arrays, not dropped") {
    val docs = Seq(
      (1L, "a b"),
      (2L, ""),          // empty text
      (3L, "!!! ... ,"), // punctuation-only: zero tokens survive the split
      (4L, "b zz")).toDF("id", "text")
    val vocab = Vocab.build(Seq((0L, "a a b")).toDF("id", "text"), "text", 2)
    val enc = Vocab.encode(docs, vocab, "id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(enc.keySet === Set(1L, 2L, 3L, 4L)) // every input row present
    assert(enc(1L) === Seq(1L, 2L))
    assert(enc(2L) === Seq.empty[Long])
    assert(enc(3L) === Seq.empty[Long])
    assert(enc(4L) === Seq(2L, 0L))
  }

  test("size cap truncates the tail deterministically") {
    val docs = Seq((1L, "x x y y z")).toDF("id", "text")
    val v = Vocab.build(docs, "text", size = 2).as[(String, Long)]
      .collect().toMap
    assert(v === Map("x" -> 1L, "y" -> 2L)) // tie x/y broken by token; z cut
  }
}
