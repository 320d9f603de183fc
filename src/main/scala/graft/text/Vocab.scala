package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** One BPE training iteration's candidate scoring: corpus-weighted
    * counts of ADJACENT character pairs within words — the statistic
    * the merge rule argmaxes over (Sennrich et al.'s algorithm; each
    * subsequent iteration re-runs this over the merged symbol
    * sequences). Scale shape: pair explosion runs over the DISTINCT
    * word table weighted by its frequencies, not over the corpus —
    * |distinct words| ≪ corpus tokens, and the pair aggregation is
    * map-side combined. Output: (pair, n), every within-word adjacent
    * 2-gram with its corpus frequency.
    */
  def bpePairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val wf = docs
      .select(explode(split(lower(trim(col(textCol))),
        "[\\s\\p{Punct}]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("f"))
      .groupBy("pair").agg(sum(col("f")).as("n"))
  }

  /** One greedy left-to-right merge pass: every non-overlapping
    * adjacent (l, r) symbol pair in the array becomes the fused
    * symbol — the BPE apply step as a pure column fold (no UDF).
    * `try_element_at` keeps the empty-accumulator probe null-safe
    * under ANSI mode.
    */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Iterative BPE training (Sennrich et al.): `nMerges` rounds of
    * score-pairs → take the (count desc, pair asc) argmax → fuse it
    * everywhere. The loop state is the DISTINCT-word symbol table
    * (localCheckpoint per round — same lineage discipline as the
    * PageRank fixpoint); each round's argmax is a bounded one-row
    * collect, the only thing that ever reaches the driver. Returns
    * the merge rules in priority order — (rank, left, right) — which
    * IS the trained tokenizer.
    */
  def bpeTrain(docs: DataFrame, textCol: String,
      nMerges: Int): Seq[(Int, String, String)] = {
    require(nMerges > 0)
    val charSplit = (w: Column) =>
      filter(split(w, ""), x => x =!= lit(""))
    var words = docs
      .select(explode(split(lower(trim(col(textCol))),
        "[\\s\\p{Punct}]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(charSplit(col("w")).as("syms"), col("f"))
      .localCheckpoint(eager = true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // fully-merged words (one symbol left) contribute no pairs; the
      // filter also dodges sequence(1, 0)'s DESCENDING-sequence trap,
      // which would index syms[1] out of bounds under ANSI mode
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS l, syms[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        rules += ((rank, l, r))
        words = words
          .select(mergeOnce(col("syms"), l, r).as("syms"), col("f"))
          .localCheckpoint(eager = true)
        rank += 1
      }
    }
    rules.toSeq
  }

  /** BPE training at real vocabulary scale: ONE corpus-sized Spark
    * job aggregates the distinct-word frequency table, then the
    * Sennrich merge loop runs DRIVER-SIDE over that bounded table
    * with an incremental pair index — [[bpeTrain]] launches a full
    * pair-scoring job per merge (32k merges = 32k Spark jobs,
    * impractical beyond spec toys), while here 32k merges are a
    * driver loop over a vocabulary-sized structure (the same
    * architecture as Sennrich's reference trainer, which operates on
    * the word-frequency dict, never the corpus).
    *
    * EXACT parity with [[bpeTrain]] (spec-verified): same word split,
    * same per-occurrence adjacent-pair counting, same argmax
    * tie-break (count desc, then (l, r) ascending), same greedy
    * left-to-right non-overlapping fuse. Per merge only the words
    * containing the fused pair are re-counted (pair → word-ids
    * index), and the argmax comes from a lazy-deletion max-heap —
    * O(affected words + log-heap) per merge, not O(vocab).
    *
    * `maxWords` is an explicit driver-memory guard: training REQUIRES
    * the distinct-word table to fit (it is vocabulary-sized —
    * millions, not corpus-sized), and refuses loudly rather than
    * silently truncating, because a truncated table changes the
    * trained merges.
    *
    * `minFreq` is the open-vocabulary scale path (standard Sennrich
    * practice): words rarer than `minFreq` are dropped from the
    * frequency table BEFORE the driver collect, bounding it by the
    * corpus's frequent-word vocabulary instead of its raw distinct
    * count (an open-web crawl has tens of millions of distinct
    * "words" — URLs, typos, code — almost all hapax). Pruning is a
    * DOCUMENTED approximation, not silent truncation: every pair
    * count is computed without the pruned words' (negligible,
    * ≤ minFreq−1 each) occurrence mass, so the trained sequence
    * matches the unpruned sequence exactly until the first merge
    * where that missing mass would have changed the argmax — on
    * Zipfian corpora the head merges (the ones that matter) are
    * identical (BpeMinFreqSpec). minFreq=1 is bit-exact parity with
    * the unpruned table.
    */
  def bpeTrainFast(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1 << 22,
      minFreq: Long = 1L): Seq[(Int, String, String)] = {
    require(nMerges > 0)
    require(minFreq >= 1L, s"bpeTrainFast: minFreq=$minFreq must be >= 1")
    val wfAll = docs
      .select(explode(split(lower(trim(col(textCol))),
        "[\\s\\p{Punct}]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    val wfDf =
      if (minFreq > 1L) wfAll.filter(col("f") >= minFreq) else wfAll
    val nWords = wfDf.count()
    require(nWords <= maxWords,
      s"bpeTrainFast: $nWords distinct words exceed maxWords=$maxWords" +
        (if (minFreq > 1L) s" (after minFreq=$minFreq pruning)" else "") +
        " — raise minFreq to prune rare words (the standard practice " +
        "for open-web vocabularies; see the minFreq contract above) " +
        "or raise the guard (driver memory permitting)")
    val rows = wfDf.collect()
    val words = new Array[Array[String]](rows.length)
    val freqs = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      words(i) = rows(i).getString(0).split("").filter(_.nonEmpty)
      freqs(i) = rows(i).getLong(1)
      i += 1
    }

    import scala.collection.mutable
    val pairCounts = mutable.Map.empty[(String, String), Long]
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]
    // max-heap: count desc, then (l, r) ASC — matches bpeTrain's
    // `orderBy(n desc, l, r)`; entries go stale when counts move and
    // are discarded lazily at pop time
    implicit val ord: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c
          else {
            val cl = b._2.compareTo(a._2)
            if (cl != 0) cl else b._3.compareTo(a._3)
          }
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]

    def touch(p: (String, String), delta: Long, wordId: Int,
        adding: Boolean): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n <= 0L) pairCounts.remove(p) else pairCounts(p) = n
      // keep the pair→word index EXACT both ways: a word being
      // re-counted negatively is about to be rewritten, so drop its
      // id now — pairs that survive the fuse re-add it on the +1
      // pass. Without this, stale ids accumulate across 32k merges
      // and every one still pays countWord/fuse on each later merge
      // of that pair.
      if (adding) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wordId
      else pairWords.get(p).foreach { set =>
        set -= wordId
        if (set.isEmpty) pairWords.remove(p)
      }
      if (n > 0L) heap.enqueue((n, p._1, p._2))
    }
    def countWord(id: Int, sign: Long): Unit = {
      val s = words(id)
      var j = 0
      while (j < s.length - 1) {
        touch((s(j), s(j + 1)), sign * freqs(id), id, sign > 0)
        j += 1
      }
    }
    i = 0
    while (i < words.length) { countWord(i, 1L); i += 1 }

    // greedy left-to-right non-overlapping fuse — the driver twin of
    // the mergeOnce column fold
    def fuse(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (out.nonEmpty && out.last == l && s(j) == r)
          out(out.length - 1) = l + r
        else out += s(j)
        j += 1
      }
      out.toArray
    }

    val rules = mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // lazy-deletion hygiene: every count change enqueues one entry,
      // so adversarial churn can grow the heap far past the live pair
      // set — when stale entries dominate (4×), rebuild from
      // pairCounts (O(live), amortized across the merges that grew it)
      if (heap.size > 1024 && heap.size > 4 * pairCounts.size) {
        heap.clear()
        pairCounts.foreach { case ((l, r), n) => heap.enqueue((n, l, r)) }
      }
      // pop until the top entry's count is current
      var top: Option[(String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        if (pairCounts.getOrElse((l, r), 0L) == n) top = Some((l, r))
      }
      top match {
        case None => exhausted = true
        case Some((l, r)) =>
          rules += ((rank, l, r))
          val affected = pairWords.getOrElse((l, r), mutable.Set.empty)
            .toArray
          affected.foreach { id =>
            countWord(id, -1L)
            words(id) = fuse(words(id), l, r)
            countWord(id, 1L)
          }
          // the fused pair is gone from every word that held it
          pairCounts.remove((l, r))
          pairWords.remove((l, r))
          rank += 1
      }
    }
    rules.toSeq
  }

  /** Segment documents with trained BPE rules: (idCol, tokens
    * array<string>) — each word char-split then run through every
    * merge in priority order, words flattened back in document order.
    * The whole tokenizer is ONE composed column expression (merges
    * fold into nested array-aggregates), so encoding is a plain
    * projection: no UDF, no join, no shuffle.
    */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String)]): DataFrame = {
    val ordered = merges.sortBy(_._1)
    val segmentWord = (w: Column) =>
      ordered.foldLeft(filter(split(w, ""), x => x =!= lit(""))) {
        case (acc, (_, l, r)) => mergeOnce(acc, l, r)
      }
    docs.select(col(idCol),
      flatten(transform(
        filter(split(lower(trim(col(textCol))), "[\\s\\p{Punct}]+"),
          w => w =!= lit("")),
        segmentWord)).as("tokens"))
  }
}
