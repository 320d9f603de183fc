package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage-scale path for similarity
  * search: a 100 TB float32 corpus becomes 25 TB of int8 payloads plus
  * one double scale per vector, and cosine needs no dequantization
  * (scales cancel; [[graft.plans.Int8Cosine]]). Both hot-path kernels
  * are native codegen expressions; the composed helpers here are the
  * verification surface only.
  */
object Quantization {

  /** struct(scale double, q array<tinyint>) per vector (native expr). */
  def quantize(vec: Column): Column = call_function("int8_quantize", vec)

  /** Scale-free cosine over two quantized payloads (native expr). */
  def cosine8(a: Column, b: Column): Column = call_function("int8_cosine", a, b)

  /** Reconstruction xᵢ ≈ qᵢ·scale — verification path (interpreted
    * HOF; the hot path never dequantizes).
    */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Max |x − q·scale| over a vector — provably ≤ scale/2 (round is
    * the nearest multiple), the contract q_quantize's gate checks.
    */
  def reconstructionError(vec: Column, q: Column, scale: Column): Column =
    coalesce(array_max(zip_with(vec, dequantize(q, scale),
      (x, y) => abs(x.cast("double") - y))), lit(0.0))

  /** Brute-force top-k neighbors over a quantized corpus: same plan
    * shape as [[Similarity.bruteForceTopK]] (bounded queries broadcast,
    * corpus scanned once, per-query ranking window), but candidates are
    * scored on int8 payloads only.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def quantized(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), quantize(col(vecCol)).as("z"))
        .select(col(id), col("z.q").as(s"${id}_q"))
    val c = quantized(corpus, "corpus_id")
    val q = quantized(queries, "query_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine8(col("corpus_id_q"), col("query_id_q")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
