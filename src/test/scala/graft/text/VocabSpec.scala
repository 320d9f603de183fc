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

  test("bpePairCounts weights distinct-word pairs by corpus frequency") {
    // "low low low" + "lower": pairs lo,ow from both words; we,er from
    // one occurrence of "lower"; 1-char words contribute nothing
    val docs = Seq((1L, "low low, LOW a"), (2L, "lower a b")).toDF("id", "text")
    val got = Vocab.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map("lo" -> 4L, "ow" -> 4L, "we" -> 1L, "er" -> 1L))
  }

  test("bpeTrain reproduces the textbook merge sequence; bpeApply segments unseen words") {
    // Sennrich et al.'s canonical corpus shape: low×5 lower×2
    // newest×6 widest×3. Hand-derived merge order:
    //   1. (e,s) 9   (ties (s,t) 9 — (e,s) wins the pair ordering)
    //   2. (es,t) 9
    //   3. (l,o) 7   (ties (o,w) 7 — (l,o) wins)
    //   4. (lo,w) 7
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("id", "text")
    val rules = Vocab.bpeTrain(docs, "text", nMerges = 4)
    assert(rules === Seq((1, "e", "s"), (2, "es", "t"), (3, "l", "o"),
      (4, "lo", "w")))
    // the trained rules segment an UNSEEN word the textbook way
    val seg = Vocab.bpeApply(Seq((1L, "lowest low")).toDF("id", "text"),
        "id", "text", rules)
      .as[(Long, Seq[String])].collect().head._2
    assert(seg === Seq("low", "est", "low"))
  }

  test("bpeTrainFast reproduces the textbook merge sequence") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("id", "text")
    val rules = Vocab.bpeTrainFast(docs, "text", nMerges = 4)
    assert(rules === Seq((1, "e", "s"), (2, "es", "t"), (3, "l", "o"),
      (4, "lo", "w")))
  }

  test("bpeTrainFast ≡ sequential bpeTrain on a real corpus slice") {
    // the driver-side trainer must produce the IDENTICAL merge
    // sequence as the per-merge-job trainer: same pair counting (per
    // occurrence, not per word), same argmax tie-break (count desc,
    // (l, r) asc), same greedy fuse — over real text with ties,
    // repeats, punctuation
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 30)
      .select("doc_id", "text")
    val slow = Vocab.bpeTrain(docs, "text", nMerges = 25)
    val fast = Vocab.bpeTrainFast(docs, "text", nMerges = 25)
    assert(fast === slow)
    // exhaustion parity: ask for more merges than the corpus holds
    val tiny = Seq((1L, "ab ab")).toDF("id", "text")
    assert(Vocab.bpeTrainFast(tiny, "text", nMerges = 10) ===
      Vocab.bpeTrain(tiny, "text", nMerges = 10))
  }

  test("bpeTrainFast refuses a word table above the driver-memory guard") {
    val docs = Seq((1L, "aa bb cc dd")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Vocab.bpeTrainFast(docs, "text", nMerges = 2, maxWords = 2)
    }
    assert(e.getMessage.contains("maxWords"))
    // the refusal names the open-vocabulary recourse
    assert(e.getMessage.contains("minFreq"))
  }

  test("bpeTrainFast minFreq=1 is bit-exact parity with the unpruned table") {
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 30)
      .select("doc_id", "text")
    assert(Vocab.bpeTrainFast(docs, "text", nMerges = 25, minFreq = 1L) ===
      Vocab.bpeTrainFast(docs, "text", nMerges = 25))
  }

  test("bpeTrainFast minFreq ≡ training on the rare-word-filtered corpus; head merges match unpruned") {
    // minFreq's exact semantics: drop words with corpus frequency
    // < minFreq from the frequency table, train on what remains. So
    // the pruned run must be IDENTICAL to unpruned training on a
    // corpus from which those words were removed by hand…
    val frequent = Seq.fill(20)("low") ++ Seq.fill(10)("lower") ++
      Seq.fill(30)("newest") ++ Seq.fill(15)("widest")
    val hapax = Seq("qz", "qx", "qv", "qw", "qy") // freq 1 each
    val full = Seq((1L, (frequent ++ hapax).mkString(" "))).toDF("id", "text")
    val filtered = Seq((1L, frequent.mkString(" "))).toDF("id", "text")
    val pruned = Vocab.bpeTrainFast(full, "text", nMerges = 8, minFreq = 2L)
    assert(pruned ===
      Vocab.bpeTrainFast(filtered, "text", nMerges = 8))
    // …and because the pruned words' pair mass (≤ minFreq−1 per word)
    // cannot reach the head pair counts, the head merges agree with
    // the UNPRUNED sequence — the sequences diverge only once a
    // pruned pair would have won the argmax (here: never, within 8
    // merges, since every hapax pair has count 1 vs head counts ≥ 10)
    val unpruned = Vocab.bpeTrainFast(full, "text", nMerges = 8)
    assert(pruned === unpruned)
    // pruning can only shorten the trainable tail: with merges
    // exhausted, the pruned rule list is a prefix-or-equal subset
    val allPruned = Vocab.bpeTrainFast(full, "text", nMerges = 500,
      minFreq = 2L)
    val allUnpruned = Vocab.bpeTrainFast(full, "text", nMerges = 500)
    assert(allPruned.length <= allUnpruned.length)
  }

  test("bpeTrainFast minFreq pruning admits a vocabulary the guard refuses") {
    // open-vocabulary path: raw distinct words exceed maxWords, but
    // hapax pruning brings the table under the guard and training
    // proceeds — the recourse the refusal message advertises
    val docs = Seq((1L,
      "low low low low lower lower hapax1 hapax2 hapax3 hapax4 hapax5"))
      .toDF("id", "text")
    intercept[IllegalArgumentException] {
      Vocab.bpeTrainFast(docs, "text", nMerges = 2, maxWords = 4)
    }
    val rules = Vocab.bpeTrainFast(docs, "text", nMerges = 2,
      maxWords = 4, minFreq = 2L)
    assert(rules.nonEmpty)
    assert(rules === Vocab.bpeTrainFast(
      Seq((1L, "low low low low lower lower")).toDF("id", "text"),
      "text", nMerges = 2))
  }

  test("property: bpeApply's column fold ≡ reference greedy merge on adversarial repeats") {
    // reference greedy left-to-right non-overlapping merge
    def refMerge(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
        case a :: tail => out += a; rest = tail
        case Nil => ()
      }
      out.toList
    }
    val rnd = new scala.util.Random(20260814L)
    val alphabet = Seq("a", "b")
    // binary alphabet maximizes overlapping-pair traps (aaa, abab...)
    val words = (1 to 40).map(_ =>
      (1 to (2 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(2))).mkString)
    val ruleSets = Seq(
      Seq((1, "a", "a")),                         // self-overlap
      Seq((1, "a", "b"), (2, "ab", "ab")),        // merged-token pairs
      Seq((1, "b", "a"), (2, "a", "ba"), (3, "aba", "b")))
    for (rules <- ruleSets) {
      val expected = words.map(w =>
        rules.sortBy(_._1).foldLeft(w.map(_.toString).toList) {
          case (acc, (_, l, r)) => refMerge(acc, l, r)
        })
      val got = Vocab.bpeApply(
          words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
            .toDF("id", "text"), "id", "text", rules)
        .orderBy("id").as[(Long, Seq[String])].collect().map(_._2.toList)
      assert(got.toSeq === expected, s"rules $rules")
    }
  }
}
