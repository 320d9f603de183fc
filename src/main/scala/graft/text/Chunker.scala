package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the splitter that feeds both
  * pretraining (fixed context windows) and retrieval (passage units):
  * each document becomes ⌈(n−overlap′)/stride⌉ chunks of at most
  * `maxTokens` whitespace tokens, consecutive chunks sharing `overlap`
  * tokens. Pure array expressions (split → transform over the chunk-
  * start sequence → slice/concat) exploded at the end — per-row work
  * rides whole-stage codegen, the explode is the only row-multiplier,
  * and nothing shuffles: chunking 100 TB is a map-only pass.
  */
object Chunker {

  /** Chunk starts: 0, stride, 2·stride, … while start < n (a chunk
    * never starts past the end; the final chunk may be short). Blank
    * docs produce one empty chunk so no document silently vanishes.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val toks: Column = TextAnalysis.words(col(textCol))
    val n = size(toks)
    // number of chunks: 1 for n <= maxTokens, else 1 + ceil((n - maxTokens)/stride)
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(lit(1) + ceil((n - maxTokens).cast("double") / stride)
        .cast("int"))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => struct(
            concat_ws(" ",
              slice(col("__toks"), i * stride + 1, lit(maxTokens)))
              .as("chunk_text"),
            least(lit(maxTokens), size(col("__toks")) - i * stride)
              .as("n_tokens"))))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk_text").as("chunk_text"),
        greatest(col("__c.n_tokens"), lit(0)).as("n_tokens"))
  }
}
