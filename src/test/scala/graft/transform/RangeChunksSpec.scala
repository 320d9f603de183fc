package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[RangeChunks.withChunkId]]: deterministic, monotone in the sort
  * order, null/NaN-consistent with Spark's ascending sort, and pure
  * (no exchange, no checkpoint) — the properties the chunked-window
  * family's exactness argument rests on.
  */
class RangeChunksSpec extends SparkSpec {
  import spark.implicits._

  test("chunk ids are monotone in sort order and identical across evaluations") {
    val rnd = new scala.util.Random(1L)
    val df = (0 until 10000)
      .map(i => (i.toLong, s"k${i % 3}", rnd.nextInt(1000000).toLong))
      .toDF("id", "k", "o")
    val chunked = RangeChunks.withChunkId(df, Seq("k", "o", "id"), 32, "c")
    // two independent evaluations agree row for row (the property
    // spark_partition_id + repartitionByRange could NOT give)
    val a = chunked.select("id", "c").as[(Long, Int)].collect().toMap
    val b = chunked.select("id", "c").as[(Long, Int)].collect().toMap
    assert(a === b)
    // monotone: sorting by (k, o, id) never decreases the chunk id
    val ordered = chunked.orderBy("k", "o", "id")
      .select("c").as[Int].collect()
    assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y },
      "chunk id decreased along the sort order")
    // balanced-ish: >1 chunk used on 10k uniform rows, none overfull
    val sizes = chunked.groupBy("c").count().as[(Int, Long)].collect()
    assert(sizes.length > 4, s"expected many chunks, got ${sizes.length}")
    assert(sizes.map(_._2).max < 5000L, "one chunk swallowed half the corpus")
  }

  test("equal sort tuples share a chunk; nulls sort first consistently") {
    val df = Seq(
      (1L, Option.empty[String], Option.empty[Long]),
      (2L, Option.empty[String], Option(5L)),
      (3L, Option("a"), Option.empty[Long]),
      (4L, Option("a"), Option(1L)),
      (5L, Option("a"), Option(1L)), // duplicate tuple of id 4
      (6L, Option("b"), Option(0L))
    ).toDF("id", "k", "o")
    // force bounds to exist even on 6 rows: p larger than n
    val got = RangeChunks.withChunkId(df, Seq("k", "o"), 4, "c")
      .select("id", "c").as[(Long, Int)].collect().toMap
    assert(got(4L) === got(5L), "equal tuples split across chunks")
    // null-first ordering: ids in (k,o) ascending order must have
    // non-decreasing chunk ids with nulls leading
    val seq = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(got)
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y })
  }

  test("supplementary-plane strings keep chunk ids monotone (UTF-16 vs UTF-8 order)") {
    // java.lang.String sorts by UTF-16 code units (surrogates ≈
    // 0xD800 < 0xFFFD) while UTF8String sorts by UTF-8 bytes (4-byte
    // emoji > 3-byte U+FFFD) — the driver's bound selection and the
    // kernel's binary search MUST NOT disagree on order, or chunk ids
    // go non-monotone and every chunked-window result is silently
    // wrong. The kernel re-sorts bounds in ITS order at build; this
    // pins the property end to end.
    val base = Seq("a\uFFFD", "a\uD83D\uDE00", "a!", "a\uFFFDz", "ab")
    val df = (0 until 4000).map { i =>
      (i.toLong, base(i % base.size) * (1 + i % 3))
    }.toDF("id", "s")
    val chunked = RangeChunks.withChunkId(df, Seq("s", "id"), 64, "c")
    val ordered = chunked.orderBy("s", "id").select("c").as[Int].collect()
    assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y },
      "chunk id decreased along the UTF8 sort order")
  }

  test("empty input and p=1 degrade to a constant chunk") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "o")
    assert(RangeChunks.withChunkId(empty, Seq("o"), 32, "c").count() === 0L)
    val one = Seq((1L, 9L), (2L, 3L)).toDF("id", "o")
    val ids = RangeChunks.withChunkId(one, Seq("o"), 1, "c")
      .select("c").as[Int].collect().toSet
    assert(ids === Set(0))
  }

  test("the chunk-id column is a pure projection: no exchange, no checkpoint") {
    val df = (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("id", "o")
    val plan = graft.ops.EngineOps.explain(
      RangeChunks.withChunkId(df, Seq("o", "id"), 32, "c"), "formatted")
    assert(!plan.contains("Exchange"), s"chunk id introduced an exchange:\n$plan")
    assert(!plan.contains("ExistingRDD"),
      s"chunk id materialized the input:\n$plan")
  }
}
