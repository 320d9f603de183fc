package graft.sim

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("quantize bounds: |x - q*scale| <= scale/2, payload in [-127,127]") {
    val df = Seq(
      Array(1.0f, -2.5f, 0.25f, 127.5f),
      Array(0.0f, 0.0f, 0.0f, 0.0f), // all-zero vector: scale 0, q all 0
      Array(-1e-4f, 3e-4f, 1e-4f, -2e-4f) // tiny magnitudes scale too
    ).toDF("v")
    val z = df.select(col("v"), Quantization.quantize(col("v")).as("z"))
      .select(col("v"), col("z.scale").as("s"), col("z.q").as("q"))
    val checked = z.select(
      Quantization.reconstructionError(col("v"), col("q"), col("s")).as("err"),
      col("s"),
      coalesce(array_max(transform(col("q"), x => abs(x.cast("int")))), lit(0))
        .as("maxq"))
      .collect()
    checked.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) / 2 + 1e-12,
        s"err=${r.getDouble(0)} scale=${r.getDouble(1)}")
      assert(r.getInt(2) <= 127)
    }
  }

  test("int8 cosine approximates float cosine closely on real embeddings") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("va"),
        Quantization.quantize(col("embedding")).as("za"))
      .crossJoin(emb.select(col("vec_id").as("idb"),
        col("embedding").as("vb"),
        Quantization.quantize(col("embedding")).as("zb")))
      .filter(col("ida") < col("idb"))
      .select(
        Similarity.cosine(col("va"), col("vb")).as("exact"),
        Quantization.cosine8(col("za.q"), col("zb.q")).as("approx"))
    val maxDiff = pairs.agg(max(abs(col("exact") - col("approx"))))
      .first().getDouble(0)
    assert(maxDiff < 0.02, s"maxDiff=$maxDiff") // 64-dim int8: ~1e-3 typical
  }

  test("quantizedTopK recovers most exact neighbors") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id").isin(0, 1, 2))
    val quant = Quantization.quantizedTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
    val hits = quant.join(exact, Seq("query_id", "corpus_id")).count()
    assert(hits >= 12, s"recall ${hits}/15") // >= 80% overall
  }

  test("int8_quantize survives whole-stage codegen (SQL surface)") {
    val n = Seq(Array(3.0f, -1.5f)).toDF("v")
      .selectExpr("int8_quantize(v) AS z")
      .selectExpr("z.scale", "z.q[0] AS q0", "z.q[1] AS q1")
      .first()
    assert(math.abs(n.getDouble(0) - 3.0 / 127) < 1e-12)
    // -1.5/(3/127) = -63.5; Math.round half-up → -63
    assert(n.getByte(1) === 127.toByte && n.getByte(2) === (-63).toByte)
  }
}
