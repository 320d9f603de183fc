package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.dedup.Dedup

/** Deduplication operators over the documents/embeddings corpus.
  * Exact + Jaccard + embedding paths have DuckDB oracles (list
  * functions mirror the set math); MinHash/SimHash signatures hash
  * with Spark's xxhash64, which has no DuckDB twin → rows-only checks
  * with correctness asserted on planted near-dups in DedupSpec.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact dedup keep-first (hash-groupBy shape) on (lang, source):
    * one representative doc per group.
    */
  val qDedupExact: QueryDef = QueryDef.sql(
    "q_dedup_exact",
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn = 1
      |ORDER BY lang, source""".stripMargin,
    doc = "exact dedup keep-first by key (dedup ops)") { (s, dir) =>
    Dedup.exactDedup(t(s, dir, "documents"), Seq("lang", "source"), "doc_id")
      .select("doc_id", "lang", "source")
      .orderBy("lang", "source")
  }

  /** All-pairs word-bigram Jaccard within a bounded scope (docs 0-39)
    * — the brute-force verifier of the near-dup pipeline, with the
    * shingle construction mirrored via DuckDB list comprehensions.
    * (Bigram shingles: the synthetic corpus shares vocabulary but not
    * longer n-grams, so 5-gram overlap is degenerate-zero there; the
    * 5-gram path is exercised on planted near-dups in DedupSpec.)
    */
  val qNgramJaccard: QueryDef = QueryDef.sql(
    "q_ngram_jaccard",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS sh
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM documents WHERE doc_id < 40))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(round(len(list_intersect(a.sh, b.sh)) /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS DOUBLE)
      |    AS jaccard
      |FROM sh a CROSS JOIN sh b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.sh, b.sh)) /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "n-gram Jaccard all-pairs within scope (dedup ops)") { (s, dir) =>
    Dedup.ngramJaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 40),
        "doc_id", "text", shingleSize = 2, minJaccard = 0.05)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding cosine near-dup pairs blocked by label (the IVF-cell
    * shape): same-label pairs with cosine ≥ 0.95, oracle via DuckDB
    * list_dot_product on double-cast vectors.
    */
  val qEmbedNearDup: QueryDef = QueryDef.sql(
    "q_embed_neardup",
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  CAST(round(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
      |    AS DOUBLE) AS cosine
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "embedding cosine near-dup pairs, label-blocked (dedup ops)") { (s, dir) =>
    Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.3, blockCol = Some("label"))
      .select(col("id_a"), col("id_b"),
        round(col("cosine"), 6).cast("double").as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** MinHash+LSH near-dup pairs over the FULL corpus (no doc bound)
    * plus planted near-dups, run in the LSH ≡ exact certainty regime:
    * at j ≥ 0.9 the per-pair miss probability of 16 2-row bands is
    * (1-0.81)^16 ≈ 3e-12, so the emitted pair set equals the exact SQL
    * truth DuckDB recomputes from raw text — a full contract oracle
    * (pair identities AND per-pair Jaccard), replacing the former
    * rows-only xxhash64 dump. The banding/bucket-cap/verification
    * machinery exercised is identical to a low-threshold run — the
    * threshold only gates the final verified-Jaccard filter. TRIGRAM
    * shingles (mirroring NgramHashes: len−2 windows, short docs
    * collapse to one whole-doc shingle): the shared-vocabulary
    * synthetic corpus overlaps heavily at bigram level, which turns
    * LSH buckets hot and candidate verification quadratic-ish —
    * trigrams keep the candidate set proportional to true near-dups.
    */
  val qDedupMinhash: QueryDef = QueryDef.sql(
    "q_dedup_minhash",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' xyzzy' FROM documents
      |  WHERE doc_id < 20),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+2], ' ')
      |                   FOR i IN range(1, greatest(len(tk) - 1, 2))]) AS s
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM corpus))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(round(len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS DOUBLE)
      |    AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "MinHash+LSH full-corpus near-dup pairs vs exact SQL truth (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text"))
    Dedup.minHashNearDupPairs(base.unionByName(planted), "doc_id", "text",
        shingleSize = 3, k = 32, bands = 16, threshold = 0.9)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** MinHash+LSH end-to-end, oracle-verified against the FULL exact
    * truth of a corpus with planted near-dups: docs 0-9 duplicated
    * in-plan with one appended token (bigram Jaccard ≈ 0.95-0.99), and
    * the oracle recomputes ALL pairs ≥ 0.9 from the raw text — planted
    * AND any natural near-identicals the corpus happens to contain (at
    * sf0.001 docs 8 and 12 are one). At j ≥ 0.9 the per-pair miss
    * probability of 16 2-row bands is (1-0.81)^16 ≈ 2e-12, so LSH ≡
    * exact is a certainty, not a hope — which is what makes the exact
    * SQL truth a valid oracle at every scale factor.
    */
  val qDedupMinhashPlanted: QueryDef = QueryDef.sql(
    "q_dedup_minhash_planted",
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 40),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 10000, text || ' xyzzy' FROM base WHERE doc_id < 10),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS s
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM corpus))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(round(len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS DOUBLE)
      |    AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "MinHash+LSH vs full exact truth on planted near-dups (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text"))
    Dedup.minHashNearDupPairs(base.unionByName(planted), "doc_id", "text",
        shingleSize = 2, k = 32, bands = 16, threshold = 0.9)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** SimHash over the FULL corpus plus planted doubled-text twins
    * (text||' '||text: a different string with the identical distinct
    * token SET, so the signature — which hashes the token set — must
    * match exactly). maxDistance = 0: candidate generation degenerates
    * to the exact-signature equi-join — ONE keyed shuffle, no bucket
    * cap in play, the correct 100 TB plan for identical-signature
    * dedup (a chunked run at this corpus's vocabulary overlap would
    * shed hot buckets and with them real pairs — measured at sf0.1:
    * 4730 of 35678). Emitted rows are the distance-0 pairs verified by
    * exact token-set equality, which DuckDB derives independently from
    * raw text (equal sorted distinct-token lists ⟺ identical
    * signatures): recall is certain, precision is the token-set
    * verification — a contract oracle replacing the former rows-only
    * dump. Distances 1-12 stay covered by [[qDedupSimhashPlanted]] and
    * DedupSpec recall tests.
    */
  val qDedupSimhash: QueryDef = QueryDef.sql(
    "q_dedup_simhash",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' ' || text FROM documents
      |  WHERE doc_id < 20),
      |tk AS (
      |  SELECT doc_id,
      |    array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(trim(text)), '[\s[:punct:]]+'))),
      |      chr(31)) AS key
      |  FROM corpus)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS distance
      |FROM tk a JOIN tk b ON a.key = b.key AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "SimHash distance-0 pairs vs token-set-equality SQL truth (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text"))
    val corpus = base.unionByName(planted)
    val tokenKey = array_join(sort_array(array_distinct(
      split(lower(trim(col("text"))), "[\\s\\p{Punct}]+"))), "\u001f")
    val keys = corpus.select(col("doc_id"), tokenKey.as("key"))
    Dedup.simHashNearDupPairs(corpus, "doc_id", "text", maxDistance = 0)
      .join(keys.select(col("doc_id").as("id_a"), col("key").as("key_a")),
        Seq("id_a"))
      .join(keys.select(col("doc_id").as("id_b"), col("key").as("key_b")),
        Seq("id_b"))
      .filter(col("key_a") === col("key_b"))
      .select(col("id_a"), col("id_b"), col("distance").cast("int").as("distance"))
      .orderBy("id_a", "id_b")
  }

  /** SimHash end-to-end, oracle-verified on provable invariants over
    * an in-plan corpus: an exact copy has distance 0, and — because the
    * signature hashes the DISTINCT TOKEN SET — a word-permuted copy
    * also has distance 0. Disjoint-vocabulary docs sit near the
    * expected hamming distance of 32 for independent signatures, far
    * above the cutoff (text literals are fixed, so those distances are
    * constants, not draws). The expected pair set is therefore exact:
    * the banding join, chunking arithmetic, and bit_count all
    * hash-fail if wrong. Complements DedupSpec's corpus recall tests.
    */
  val qDedupSimhashPlanted: QueryDef = QueryDef.sql(
    "q_dedup_simhash_planted",
    """SELECT * FROM (VALUES
      |  (1, 2, 0), (1, 3, 0), (2, 3, 0), (4, 5, 0))
      |  AS t(id_a, id_b, distance)
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "SimHash verified on in-plan copy/permutation invariants (dedup ops)") { (s, dir) =>
    import s.implicits._
    val docs = Seq(
      (1, "alpha beta gamma delta epsilon zeta eta theta"),
      (2, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (3, "theta eta zeta epsilon delta gamma beta alpha"), // permuted copy
      (4, "quick brown foxes jump over seventeen lazy sleeping dogs"),
      (5, "quick brown foxes jump over seventeen lazy sleeping dogs"),
      (6, "solar panels convert sunlight into renewable electric power")
    ).toDF("doc_id", "text")
    Dedup.simHashNearDupPairs(docs, "doc_id", "text", maxDistance = 3)
      .orderBy("id_a", "id_b")
  }

  /** Near-dup clustering oracled against true connected components:
    * the distributed min-label propagation must produce exactly the
    * components DuckDB derives by recursive reachability over the same
    * edge list (symmetric closure → min reachable id per node). Edge
    * set built in-plan: two chains, one 2-cycle-free pair, plus a
    * planted cycle (5,6),(6,7),(7,5) to prove cycle convergence.
    */
  val qDedupClusters: QueryDef = QueryDef.sql(
    "q_dedup_clusters",
    """WITH RECURSIVE edges AS (
      |  SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4), (10, 11),
      |    (21, 20), (5, 6), (6, 7), (7, 5)) AS t(a, b)),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (
      |  SELECT a AS id, b AS peer FROM sym
      |  UNION
      |  SELECT r.id, s.b FROM reach r JOIN sym s ON r.peer = s.a)
      |SELECT id, least(id, min(peer)) AS label FROM reach
      |GROUP BY id ORDER BY id""".stripMargin,
    doc = "near-dup connected components vs recursive reachability (dedup ops)") { (s, dir) =>
    import s.implicits._
    val pairs = Seq((1, 2), (2, 3), (3, 4), (10, 11), (21, 20),
      (5, 6), (6, 7), (7, 5)).toDF("id_a", "id_b")
    Dedup.nearDupClusters(pairs).orderBy("id")
  }

  /** The COMPLETE dedup pipeline as one plan — corpus + planted
    * near-dups → MinHash+LSH candidate pairs (j ≥ 0.9, where LSH ≡
    * exact with certainty) → verified Jaccard → connected components →
    * canonical keep — ending exactly where a training-data pipeline
    * ends: the surviving doc ids. The oracle runs the SAME pipeline in
    * pure SQL from the raw text: exact all-pairs ≥ 0.9, recursive
    * reachability for components, min-id canonical — so survivors
    * match at every scale factor even when the corpus carries natural
    * near-identical docs.
    */
  val qDedupPipeline: QueryDef = QueryDef.sql(
    "q_dedup_pipeline",
    """WITH RECURSIVE base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 40),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 10000, text || ' xyzzy' FROM base WHERE doc_id < 10),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS s
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM corpus)),
      |pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
      |sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      |reach AS (
      |  SELECT a AS id, b AS peer FROM sym
      |  UNION
      |  SELECT r.id, s.b FROM reach r JOIN sym s ON r.peer = s.a),
      |labels AS (
      |  SELECT id, least(id, min(peer)) AS label FROM reach GROUP BY id)
      |SELECT c.doc_id FROM corpus c LEFT JOIN labels l ON c.doc_id = l.id
      |WHERE l.label IS NULL OR l.label = c.doc_id
      |ORDER BY c.doc_id""".stripMargin,
    doc = "end-to-end dedup: LSH pairs -> clusters -> canonical keep vs SQL truth (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text"))
    val corpus = base.unionByName(planted)
    val pairs = Dedup.minHashNearDupPairs(corpus, "doc_id", "text",
      shingleSize = 2, k = 32, bands = 16, threshold = 0.9)
    val clusters = Dedup.nearDupClusters(pairs)
    Dedup.keepCanonical(corpus, "doc_id", clusters)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Incremental dedup against an existing corpus: a new batch (10
    * planted near-dups of corpus docs + one intra-batch near-dup pair)
    * checked against corpus docs 0-39 — never corpus×corpus. Same
    * LSH-certain regime as [[qDedupMinhashPlanted]] (j ≥ 0.9, 16
    * 2-row bands → miss probability ≈ 2e-12), so exact SQL truth over
    * pairs touching the new side (new ids ≥ 10000) is a valid oracle.
    */
  val qDedupIncremental: QueryDef = QueryDef.sql(
    "q_dedup_incremental",
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 40),
      |newb AS (
      |  SELECT doc_id + 10000 AS doc_id, text || ' xyzzy' AS text
      |  FROM base WHERE doc_id < 10
      |  UNION ALL
      |  SELECT doc_id + 20000, text FROM documents WHERE doc_id = 40
      |  UNION ALL
      |  SELECT doc_id + 30000, text || ' xyzzy' FROM documents WHERE doc_id = 40),
      |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM newb),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS s
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM corpus))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(round(len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS DOUBLE)
      |    AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE b.doc_id >= 10000
      |  AND len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "incremental LSH dedup of a new batch vs existing corpus (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val doc40 = t(s, dir, "documents").filter(col("doc_id") === 40)
    val newb = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text"))
      .unionByName(doc40.select((col("doc_id") + 20000).as("doc_id"),
        col("text")))
      .unionByName(doc40.select((col("doc_id") + 30000).as("doc_id"),
        concat(col("text"), lit(" xyzzy")).as("text")))
    Dedup.minHashNearDupPairsIncremental(newb, base, "doc_id", "text",
        shingleSize = 2, k = 32, bands = 16, threshold = 0.9)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup over the embeddings table with CORPUS-SCALED centroids —
    * k = max(8, N/256) per SemDeDup's own recipe (Abbas et al. 2023),
    * deterministic init (the k lowest vec_ids), so the gate exercises
    * the production parameterization: within-cell pairing is Σ|cell|²,
    * and a fixed k pins that at N²/k (the round-7 sweep measured 319 s
    * at 100× that way vs 33 s scaled — SemanticProbe). At sf0.01
    * (N=500) k stays 8, so the oracle rows are unchanged; at replica
    * scale k grows with N and the quadratic stays cell-bounded. Drop
    * rule: a vector drops iff a smaller-id cell-mate has cosine ≥ 0.3.
    * The oracle re-derives the same k, the argmax cell assignment
    * (row_number over cosine desc, cid tie-break — both engines
    * accumulate the same doubles left-to-right) and the
    * EXISTS-a-smaller-near-dup drop rule.
    */
  val qSemanticDedup: QueryDef = QueryDef.sql(
    "q_semantic_dedup",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e
      |      WHERE vec_id < (SELECT greatest(8, count(*) // 256) FROM e)),
      |asg AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cid AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, c.cv) /
      |          (sqrt(list_dot_product(e.v, e.v)) *
      |           sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |        c.cid) AS rn
      |    FROM e CROSS JOIN c) WHERE rn = 1),
      |dropped AS (
      |  SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) *
      |     sqrt(list_dot_product(b.v, b.v))) >= 0.3)
      |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
      |FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
      |ORDER BY a.vec_id""".stripMargin,
    doc = "SemDeDup semantic dedup verdicts: corpus-scaled centroid cells + within-cell cosine (dedup ops)") { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val k = math.max(8L, emb.count() / 256L)
    graft.sim.SemanticDedup.verdicts(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < k), "vec_id", "embedding",
        threshold = 0.3)
      .orderBy("vec_id")
  }

  /** The ScaleProbe terminal path as a CORRECTNESS-gated contract at
    * 10× replication: every doc 0-49 appears 10 times (exact copies —
    * Jaccard 1.0, so LSH candidate generation is CERTAIN: identical
    * texts yield identical signatures, hence identical band keys), the
    * full pairs → components → canonical-keep pipeline runs over the
    * 500-doc corpus, and the contract is the SURVIVOR COUNT — O(1)
    * output no matter how dup-heavy the input, which is exactly the
    * property that makes this the production shape at 100 TB (the pair
    * dump the bench runs is quadratic per cluster by construction).
    * Natural cross-doc near-dups (j ≥ 0.9) ride the same LSH-certain
    * regime as [[qDedupPipeline]]; the oracle recomputes exact truth.
    */
  val qDedupScale10x: QueryDef = QueryDef.sql(
    "q_dedup_scale10x",
    """WITH RECURSIVE base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 50),
      |corpus AS (
      |  SELECT doc_id + r * 100000 AS doc_id, text
      |  FROM base CROSS JOIN range(10) AS t(r)),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS s
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM corpus)),
      |pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s)) /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
      |sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      |reach AS (
      |  SELECT a AS id, b AS peer FROM sym
      |  UNION
      |  SELECT r.id, s.b FROM reach r JOIN sym s ON r.peer = s.a),
      |labels AS (
      |  SELECT id, least(id, min(peer)) AS label FROM reach GROUP BY id)
      |SELECT (SELECT count(*) FROM corpus) AS n_docs,
      |  count(*) AS n_survivors
      |FROM corpus c LEFT JOIN labels l ON c.doc_id = l.id
      |WHERE l.label IS NULL OR l.label = c.doc_id""".stripMargin,
    doc = "ScaleProbe terminal dedup path survivor-count contract at 10x replication (dedup ops)") { (s, dir) =>
    val base = t(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
    val corpus = base
      .withColumn("__r", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("__r") * 100000L).as("doc_id"), col("text"))
    val pairs = Dedup.minHashNearDupPairs(corpus, "doc_id", "text",
      shingleSize = 2, k = 32, bands = 16, threshold = 0.9)
    val clusters = Dedup.nearDupClusters(pairs)
    Dedup.keepCanonical(corpus, "doc_id", clusters)
      .agg(count(lit(1)).as("n_survivors"))
      .crossJoin(corpus.agg(count(lit(1)).as("n_docs")))
      .select("n_docs", "n_survivors")
  }

  /** Prefix-filtered EXACT set-similarity join
    * ([[Dedup.setSimJoinPrefix]]): the deterministic-recall scale
    * path for Jaccard-threshold pairs — inverted-index join on
    * rare-first prefixes + size filter + merge-walk verification —
    * run over the WHOLE corpus (no doc_id scope: the algorithm's
    * point is that it doesn't need one). Oracle is the naive
    * all-pairs cross join; identical output proves the prefix filter
    * loses nothing.
    */
  val qSetsimPrefix: QueryDef = QueryDef.sql(
    "q_setsim_prefix",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS sh
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM documents))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(round(len(list_intersect(a.sh, b.sh)) /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS DOUBLE)
      |    AS jaccard
      |FROM sh a CROSS JOIN sh b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.sh, b.sh)) /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "exact Jaccard join via prefix filtering, whole corpus (dedup ops)") { (s, dir) =>
    Dedup.setSimJoinPrefix(t(s, dir, "documents"),
        "doc_id", "text", shingleSize = 2, minJaccard = 0.3)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Bounded-output face of the prefix-filter join
    * ([[Dedup.setSimTopKPrefix]]): top-3 most-similar peers per doc at
    * J ≥ 0.3 — same candidates, same verification, N·k output rows
    * however replica-heavy the corpus (the 100×-sweepable production
    * terminal; the exact pair dump above is quadratic per clone group
    * by construction). Oracle is the naive symmetric all-pairs join
    * ranked per doc — identical rows prove both the prefix filter's
    * recall and the rank/tie-break parity.
    */
  val qSetsimTopK: QueryDef = QueryDef.sql(
    "q_setsim_topk",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(tk[i:i+1], ' ')
      |                   FOR i IN range(1, greatest(len(tk), 2))]) AS sh
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '[\s[:punct:]]+') AS tk
      |        FROM documents)),
      |p AS (
      |  SELECT a.doc_id, b.doc_id AS peer,
      |    len(list_intersect(a.sh, b.sh)) /
      |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      |      AS jaccard
      |  FROM sh a CROSS JOIN sh b
      |  WHERE a.doc_id <> b.doc_id),
      |r AS (
      |  SELECT doc_id, peer, jaccard,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY jaccard DESC, peer) AS rank
      |  FROM p WHERE jaccard >= 0.3)
      |SELECT doc_id, peer,
      |  CAST(round(jaccard, 6) AS DOUBLE) AS jaccard, rank
      |FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin,
    doc = "top-3 similar peers per doc via prefix-filtered exact Jaccard (dedup ops)") { (s, dir) =>
    Dedup.setSimTopKPrefix(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 2, minJaccard = 0.3, k = 3)
      .select(col("doc_id"), col("peer"),
        round(col("jaccard"), 6).cast("double").as("jaccard"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** Sorted-neighborhood dedup over the whole corpus — the third
    * blocking family (SNM: Hernández & Stolfo, SIGMOD'95) next to
    * MinHash-LSH and prefix filtering. Window w = 4 over the normalized
    * key order ⇒ exactly 3N candidate pairs whatever the data looks
    * like; distinct-word Jaccard ≥ 0.5 verifies. The oracle replays the
    * identical key, rank, window and Jaccard declaratively; the engine
    * side computes the global rank DISTRIBUTED (range partition +
    * partition-local row_number + P-row offsets — never a corpus-wide
    * single-partition window).
    */
  val qDedupSortedNbhd: QueryDef = QueryDef.sql(
    "q_dedup_sorted_nbhd",
    """WITH tkt AS (
      |  SELECT doc_id,
      |    list_distinct(string_split_regex(lower(trim(text)), '[\s[:punct:]]+')) AS tk,
      |    substr(regexp_replace(lower(trim(text)), '[^a-z0-9]', '', 'g'), 1, 24) AS key
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, tk, row_number() OVER (ORDER BY key, doc_id) AS rn
      |  FROM tkt)
      |SELECT least(a.doc_id, b.doc_id) AS id_a,
      |  greatest(a.doc_id, b.doc_id) AS id_b,
      |  CAST(b.rn - a.rn AS INT) AS rank_dist,
      |  CAST(round(len(list_intersect(a.tk, b.tk)) /
      |    (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 6)
      |    AS DOUBLE) AS jaccard
      |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
      |WHERE len(list_intersect(a.tk, b.tk)) /
      |  (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin,
    doc = "sorted-neighborhood near-dup pairs, w=4, word Jaccard >= 0.5 (dedup ops)") { (s, dir) =>
    Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"), "doc_id", "text",
        windowSize = 4, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("rank_dist"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  val all: Seq[QueryDef] = Seq(
    qDedupExact, qNgramJaccard, qEmbedNearDup, qDedupMinhash,
    qDedupMinhashPlanted, qDedupSimhash, qDedupSimhashPlanted,
    qDedupClusters, qDedupPipeline, qDedupIncremental, qSemanticDedup,
    qDedupScale10x, qSetsimPrefix, qSetsimTopK, qDedupSortedNbhd)
}
