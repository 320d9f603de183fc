package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary build + order-preserving token-to-id
  * encoding — the fixed-vocab tokenization step between raw text and
  * a training shard. Build is the token-frequency aggregate with a
  * deterministic (count desc, token) ranking; encode explodes each
  * document positionally, equi-joins the vocabulary (a bounded table
  * — broadcast it), and reassembles ids in position order. Ids start
  * at 1; out-of-vocabulary tokens encode as 0. Shuffles: the build's
  * token count and the encode's per-doc reassembly — both keyed,
  * nothing quadratic; document order never depends on shuffle order
  * (positions ride the explode and sort the reassembly).
  */
object Vocab {

  /** Top-`size` tokens by (frequency desc, token asc): (token, id),
    * ids 1..size. The top-k runs as TakeOrdered (per-partition k, no
    * global sort over the full distinct-token space — which is
    * billions at corpus scale); the id-assigning window then sorts
    * only the ≤size surviving rows. */
  def build(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0)
    docs
      .select(explode(split(lower(trim(col(textCol))),
        "[\\s\\p{Punct}]+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(size)
      .withColumn("id", row_number().over(
        Window.orderBy(col("n").desc, col("token"))))
      .select(col("token"), col("id").cast("long").as("id"))
  }

  /** Encode each document as its token-id sequence (OOV → 0),
    * preserving token order. Output: (idCol, ids array<long>) — one
    * row per INPUT row: a document that tokenizes to nothing (empty
    * or punctuation-only text) encodes as the empty array rather than
    * vanishing, so downstream pipelines composing encode after
    * chunking keep their row counts. */
  def encode(docs: DataFrame, vocab: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(split(lower(trim(col(textCol))), "[\\s\\p{Punct}]+"))
        .as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    // rename the vocab's id internally: a caller whose idCol is also
    // named "id" must not collide with it
    val v = vocab.select(col("token"), col("id").as("__vid"))
    val encoded = toks.join(broadcast(v), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("__vid"), lit(0L)).as("tid")))),
        e => e.getField("tid")).as("ids"))
    // restore rows the empty-token filter removed entirely: keyed left
    // join against the input id set, missing → empty array<long>
    docs.select(col(idCol))
      .join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ids"), array().cast("array<long>")).as("ids"))
  }
}
