package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: distinct 64-bit hashes of every
  * `n`-consecutive-token window of an `array<string>` — the shingle
  * set of near-dup detection, WITHOUT materializing shingle strings.
  * Output is SORTED ascending (a set, so order is free to choose):
  * pairwise verification then merge-walks instead of hashing.
  *
  * The composed-builtin form (`transform(sequence(…), i ⇒ concat_ws(
  * " ", slice(toks,…)))` + per-shingle xxhash64) allocates a string
  * per window in the interpreted lambda path — measured ~6s for 5k
  * docs. Here each token is hashed once (XXH64 over its UTF8 bytes)
  * and windows combine token hashes with a polynomial mix in a
  * primitive loop; `doGenCode` keeps it inside whole-stage codegen.
  *
  * Combining hashes instead of hashing the joined string changes the
  * hash family (not the set semantics modulo 2⁻⁶⁴ collisions) — fine
  * for MinHash/Jaccard, which only need a uniform deterministic
  * fingerprint per shingle.
  */
case class NgramHashes(child: Expression, n: Int,
    positional: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")

  // positional = true (`ngram_hashes_pos`): one hash per window IN
  // WINDOW ORDER, duplicates kept — the span-dedup occurrence form,
  // where array index i is the gram starting at token i+1. The
  // default (sorted-distinct) is the shingle-SET form for MinHash /
  // Jaccard. Same token hashing and window mix in both.
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (positional) "ngram_hashes_pos" else "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numToks = arr.numElements()
    val tokHash = new Array[Long](numToks)
    var j = 0
    while (j < numToks) {
      val t = arr.getUTF8String(j)
      tokHash(j) =
        if (t == null) 0L
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, 42L)
      j += 1
    }
    val windows = math.max(numToks - n + 1, if (numToks == 0) 0 else 1)
    val seen = new java.util.HashSet[java.lang.Long](windows * 2)
    val out = new Array[Long](windows)
    var m = 0
    var i = 0
    while (i < windows) {
      var c = -7046029254386353131L // xxprime seed
      var w = i
      val end = math.min(i + n, numToks)
      while (w < end) {
        c = (c ^ tokHash(w)) * -4417276706812531889L
        c ^= (c >>> 29)
        w += 1
      }
      if (positional) { out(i) = c }
      else if (seen.add(c)) { out(m) = c; m += 1 }
      i += 1
    }
    if (positional) new GenericArrayData(out)
    else {
      // sorted-ascending output: downstream pairwise verification
      // ([[JaccardSorted]]) runs an allocation-free merge walk instead
      // of building a hash set per candidate pair
      val trimmed = java.util.Arrays.copyOf(out, m)
      java.util.Arrays.sort(trimmed)
      new GenericArrayData(trimmed)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val numToks = ctx.freshName("numToks")
      val tokHash = ctx.freshName("tokHash")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val windows = ctx.freshName("windows")
      val t = ctx.freshName("t")
      // loop/temp locals also need freshName: bare `i`/`j`/`c`... would
      // shadow same-named enclosing generated locals, which janino
      // rejects — silently degrading the stage to interpreted
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val end = ctx.freshName("end")
      val w = ctx.freshName("w")
      s"""
         |int $numToks = $arr.numElements();
         |long[] $tokHash = new long[$numToks];
         |for (int $j = 0; $j < $numToks; $j++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($j);
         |  $tokHash[$j] = ($t == null) ? 0L :
         |    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |}
         |int $windows = java.lang.Math.max($numToks - $n + 1, $numToks == 0 ? 0 : 1);
         |long[] $out = new long[$windows];
         |int $m = 0;
       """.stripMargin + (if (positional) s"""
         |for (int $i = 0; $i < $windows; $i++) {
         |  long $c = -7046029254386353131L;
         |  int $end = java.lang.Math.min($i + $n, $numToks);
         |  for (int $w = $i; $w < $end; $w++) {
         |    $c = ($c ^ $tokHash[$w]) * -4417276706812531889L;
         |    $c ^= ($c >>> 29);
         |  }
         |  $out[$i] = $c;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin else s"""
         |java.util.HashSet<Long> $seen = new java.util.HashSet<Long>($windows * 2);
         |for (int $i = 0; $i < $windows; $i++) {
         |  long $c = -7046029254386353131L;
         |  int $end = java.lang.Math.min($i + $n, $numToks);
         |  for (int $w = $i; $w < $end; $w++) {
         |    $c = ($c ^ $tokHash[$w]) * -4417276706812531889L;
         |    $c ^= ($c >>> 29);
         |  }
         |  if ($seen.add($c)) { $out[$m] = $c; $m++; }
         |}
         |long[] ${out}T = java.util.Arrays.copyOf($out, $m);
         |java.util.Arrays.sort(${out}T);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${out}T);
       """.stripMargin)
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  /** Plan-time twin of the kernel's 1-gram hash: the value
    * `ngram_hashes_pos(array(token), 1)` emits for `token`. Lets a
    * literal probe set (stopwords, language markers) be pre-hashed on
    * the driver so per-row membership tests run over longs
    * ([[InSetCount]]) instead of interpreted string comparisons.
    * Parity with the codegen kernel is spec-pinned (NativeExprSpec).
    */
  def tokenGramHash(token: String): Long = {
    val u = UTF8String.fromString(token)
    val th =
      if (u == null) 0L
      else XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L)
    var c = -7046029254386353131L
    c = (c ^ th) * -4417276706812531889L
    c ^= (c >>> 29)
    c
  }
}

/** Custom Catalyst expression: how many elements of an `array<long>`
  * are members of a small plan-time literal probe set. The codegen
  * replacement for `size(filter(toks, t => t === w1 || ...))` — array
  * higher-order-function lambdas execute INTERPRETED per element, and
  * the stopword/language-marker counters run that lambda over every
  * token of every document. Here the probe set is a sorted long[]
  * baked into the generated class and membership is a binary search
  * per element, inside whole-stage codegen. Null elements never match;
  * duplicates in the input each count (the filter-count semantics).
  */
case class InSetCount(child: Expression, probes: Seq[Long])
    extends UnaryExpression {
  private val sortedProbes: Array[Long] = probes.distinct.sorted.toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "in_set_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_set_count needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(sortedProbes, arr.getLong(i)) >= 0)
        cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val probesRef = ctx.addReferenceObj("inSetProbes", sortedProbes,
        "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $arr.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) &&
         |      java.util.Arrays.binarySearch($probesRef, $arr.getLong($i)) >= 0)
         |    $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): InSetCount =
    copy(child = newChild)
}
