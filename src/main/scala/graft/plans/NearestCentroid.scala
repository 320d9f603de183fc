package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact nearest-centroid assignment as ONE pure-projection codegen
  * call — the scale fix for the N×k "cross join every vector with
  * every centroid, window-argmax per vector" assignment plan, which
  * materializes and SHUFFLES N×k rows (with corpus-scaled SemDeDup
  * centroids, k = N/256, that is N²/256 rows through one exchange —
  * the round-8 verdict's last superlinear gate term).
  *
  * Semantics are bit-identical to the windowed form: per vector, the
  * argmax of [[VecCosine]]-cosine over the centroid set, ties broken
  * by smallest centroid id (`row_number over (order by sim desc, cid
  * asc)`), zero-denominator cosine = 0.0. The kernel accumulates dot
  * and both norms left-to-right in doubles — the same sums VecCosine
  * and the DuckDB oracles compute — so the chosen cell and the
  * reported similarity are the identical doubles, and every oracle
  * riding ivfAssign is untouched.
  *
  * The scan is pruned Elkan/Hamerly-style with EXACT triangle-
  * inequality bounds on the unit sphere (cosine's argmax = chord-
  * distance argmin on normalized vectors): centroids are grouped
  * under ⌈√k⌉ farthest-point leaders at kernel build; per vector the
  * leader distances are computed first (√k dots), then a group is
  * scanned only if `d(x,leader) − radius(group) ≤ bestD + ε` and a
  * member only if `|d(x,leader) − d(c,leader)| ≤ bestD + ε`
  * (ε = 1e-6 chord slack, ~10⁹× the FP error of the bounds, so a
  * true winner can never be pruned; survivors are compared EXACTLY,
  * so the ε costs only a few extra exact scorings near the
  * boundary). Work per vector drops from k·d flops to
  * O((√k + scanned)·d); no candidate rows exist at all — the
  * operator is a map, embeds in whole-stage codegen, and shuffles
  * nothing.
  *
  * Scale posture: centroids ride a BROADCAST (built once on the
  * driver from the bounded centroid table — the same boundedness
  * ivfAssign's `broadcast(cents)` already required); kernel build is
  * O(k^1.5·d) driver flops (k = 10⁵, d = 64 ≈ 2·10⁸ — seconds), far
  * below the executor work it removes.
  */
final class CentroidKernel(
    val cids: Array[Long],
    val vecs: Array[Array[Double]]) extends Serializable {

  require(cids.length == vecs.length,
    s"cids(${cids.length}) / vecs(${vecs.length}) length mismatch")
  require(cids.length > 0, "empty centroid set")
  // strictly ascending cids: full-scan first-wins = smallest-cid tie-break
  require((1 until cids.length).forall(i => cids(i - 1) < cids(i)),
    "centroid ids must be strictly ascending")

  private val k = cids.length
  private val dim = vecs(0).length
  private val uniformDim = vecs.forall(_.length == dim)

  // ||c||² and ||c||, accumulated left-to-right (the VecCosine order)
  private val cNormSq: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }
  private val cNorm: Array[Double] = cNormSq.map(math.sqrt)

  private val EPS = 1e-6

  private def chord(cos: Double): Double =
    math.sqrt(math.max(0.0, 2.0 - 2.0 * cos))

  private def dotPrefix(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  // ---- pruning structure (unit sphere; exact-scoring never uses it) ----
  private val zeroIdx: Array[Int] = (0 until k).filter(cNorm(_) == 0.0).toArray
  private val nonZero: Array[Int] = (0 until k).filter(cNorm(_) > 0.0).toArray
  private val units: Array[Array[Double]] = Array.tabulate(k) { i =>
    if (cNorm(i) > 0.0) {
      val v = vecs(i); val u = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { u(j) = v(j) / cNorm(i); j += 1 }
      u
    } else null
  }
  private val nL = math.min(nonZero.length,
    math.max(1, math.ceil(math.sqrt(nonZero.length.toDouble)).toInt))

  // farthest-point leader seeding + member assignment + group radii
  private val (leaderUnits, groupMembers, memberChord) : (
      Array[Array[Double]], Array[Array[Int]], Array[Double]) = {
    if (nonZero.isEmpty)
      (Array.empty[Array[Double]], Array.empty[Array[Int]],
        new Array[Double](k))
    else {
      val leaders = new Array[Int](nL)
      val minD = new Array[Double](nonZero.length)
      leaders(0) = nonZero(0)
      var j = 0
      while (j < nonZero.length) {
        minD(j) = chord(dotPrefix(units(nonZero(j)), units(leaders(0))))
        j += 1
      }
      var l = 1
      while (l < nL) {
        var arg = 0; var best = -1.0
        var i = 0
        while (i < nonZero.length) {
          if (minD(i) > best) { best = minD(i); arg = i }
          i += 1
        }
        leaders(l) = nonZero(arg)
        i = 0
        while (i < nonZero.length) {
          val d = chord(dotPrefix(units(nonZero(i)), units(leaders(l))))
          if (d < minD(i)) minD(i) = d
          i += 1
        }
        l += 1
      }
      val mChord = new Array[Double](k)
      val groupOf = new Array[Int](k)
      j = 0
      while (j < nonZero.length) {
        val ci = nonZero(j)
        var bestG = 0; var bestDist = Double.PositiveInfinity
        var g = 0
        while (g < nL) {
          val d = chord(dotPrefix(units(ci), units(leaders(g))))
          if (d < bestDist) { bestDist = d; bestG = g }
          g += 1
        }
        groupOf(ci) = bestG; mChord(ci) = bestDist
        j += 1
      }
      val members = Array.fill(nL)(Vector.newBuilder[Int])
      nonZero.foreach(ci => members(groupOf(ci)) += ci)
      (leaders.map(units(_)), members.map(_.result().toArray), mChord)
    }
  }
  private val radius: Array[Double] =
    groupMembers.map(m => if (m.isEmpty) 0.0 else m.map(memberChord).max)

  /** (centroid_id, centroid_sim) for one vector. Exact scoring only:
    * pruning decides what gets SCORED, exact doubles decide what WINS.
    */
  def assign(x: ArrayData, isFloat: Boolean): InternalRow = {
    val n = x.numElements()
    val xd = new Array[Double](n)
    var i = 0
    while (i < n) {
      xd(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }

    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var bestD = Double.PositiveInfinity

    def consider(ci: Int, sim: Double): Unit =
      if (sim > bestSim || (sim == bestSim && cids(ci) < bestCid)) {
        bestSim = sim; bestCid = cids(ci); bestD = chord(sim)
      }

    // VecCosine min-prefix semantics only coincide with precomputed
    // full norms when every vector shares one dimension — anything
    // else takes the exact per-pair path (no pruning, full scan)
    if (!uniformDim || n != dim) {
      var ci = 0
      while (ci < k) {
        val v = vecs(ci)
        val m = math.min(n, v.length)
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var j = 0
        while (j < m) {
          dot += xd(j) * v(j); nx += xd(j) * xd(j); ny += v(j) * v(j)
          j += 1
        }
        val den = math.sqrt(nx) * math.sqrt(ny)
        consider(ci, if (den == 0.0) 0.0 else dot / den)
        ci += 1
      }
    } else {
      var xNormSq = 0.0
      i = 0
      while (i < n) { xNormSq += xd(i) * xd(i); i += 1 }
      val sxn = math.sqrt(xNormSq)
      if (sxn == 0.0) {
        // cosine 0.0 against every centroid; smallest cid wins
        return new GenericInternalRow(Array[Any](cids(0), 0.0))
      }
      i = 0
      while (i < zeroIdx.length) { consider(zeroIdx(i), 0.0); i += 1 }

      val nGroups = leaderUnits.length
      val dxl = new Array[Double](nGroups)
      var g = 0
      while (g < nGroups) {
        dxl(g) = chord(dotPrefix(xd, leaderUnits(g)) / sxn)
        g += 1
      }
      // scan nearest group first so bestD tightens before the rest
      val order = Array.range(0, nGroups)
        .sortBy(dxl) // tiny (√k) — allocation-cheap
      var oi = 0
      while (oi < nGroups) {
        val gi = order(oi)
        if (dxl(gi) - radius(gi) <= bestD + EPS) {
          val members = groupMembers(gi)
          var mi = 0
          while (mi < members.length) {
            val ci = members(mi)
            if (math.abs(dxl(gi) - memberChord(ci)) <= bestD + EPS) {
              val v = vecs(ci)
              var dot = 0.0
              var j = 0
              while (j < n) { dot += xd(j) * v(j); j += 1 }
              val den = sxn * cNorm(ci)
              consider(ci, if (den == 0.0) 0.0 else dot / den)
            }
            mi += 1
          }
        }
        oi += 1
      }
    }
    new GenericInternalRow(Array[Any](bestCid, bestSim))
  }

  /** The `p` nearest centroid ids, best-first (sim desc, cid asc on
    * ties) — the meta-probe step of the two-level assignment route
    * ([[graft.sim.Similarity.ivfAssign]]'s corpus-scaled-k guard).
    * Same exact-scoring / triangle-pruning scan as [[assign]], with
    * the pruning radius keyed to the CURRENT p-th best instead of the
    * best (valid for the same reason: nothing outside worstD + ε can
    * enter the top p). Probing all leaders when p ≥ k degrades to the
    * full exact ranking.
    */
  def assignTop(x: ArrayData, isFloat: Boolean, p: Int): ArrayData = {
    val n = x.numElements()
    val xd = new Array[Double](n)
    var i = 0
    while (i < n) {
      xd(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val cap = math.min(p, k)
    val topSim = Array.fill(cap)(Double.NegativeInfinity)
    val topCid = Array.fill(cap)(Long.MaxValue)
    var filled = 0

    def worstD: Double =
      if (filled < cap) Double.PositiveInfinity else chord(topSim(cap - 1))

    def consider(ci: Int, sim: Double): Unit = {
      val cid = cids(ci)
      // insert position by (sim desc, cid asc)
      var pos = filled
      while (pos > 0 &&
          (sim > topSim(pos - 1) ||
            (sim == topSim(pos - 1) && cid < topCid(pos - 1)))) pos -= 1
      if (pos < cap) {
        val last = math.min(filled, cap - 1)
        var j = last
        while (j > pos) {
          topSim(j) = topSim(j - 1); topCid(j) = topCid(j - 1); j -= 1
        }
        topSim(pos) = sim; topCid(pos) = cid
        if (filled < cap) filled += 1
      }
    }

    if (!uniformDim || n != dim) {
      var ci = 0
      while (ci < k) {
        val v = vecs(ci)
        val m = math.min(n, v.length)
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var j = 0
        while (j < m) {
          dot += xd(j) * v(j); nx += xd(j) * xd(j); ny += v(j) * v(j)
          j += 1
        }
        val den = math.sqrt(nx) * math.sqrt(ny)
        consider(ci, if (den == 0.0) 0.0 else dot / den)
        ci += 1
      }
    } else {
      var xNormSq = 0.0
      i = 0
      while (i < n) { xNormSq += xd(i) * xd(i); i += 1 }
      val sxn = math.sqrt(xNormSq)
      if (sxn == 0.0) {
        // cosine 0.0 everywhere: the smallest cap ids win the tiebreak
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          cids.take(cap))
      }
      i = 0
      while (i < zeroIdx.length) { consider(zeroIdx(i), 0.0); i += 1 }
      val nGroups = leaderUnits.length
      val dxl = new Array[Double](nGroups)
      var g = 0
      while (g < nGroups) {
        dxl(g) = chord(dotPrefix(xd, leaderUnits(g)) / sxn)
        g += 1
      }
      val order = Array.range(0, nGroups).sortBy(dxl)
      var oi = 0
      while (oi < nGroups) {
        val gi = order(oi)
        if (dxl(gi) - radius(gi) <= worstD + EPS) {
          val members = groupMembers(gi)
          var mi = 0
          while (mi < members.length) {
            val ci = members(mi)
            if (math.abs(dxl(gi) - memberChord(ci)) <= worstD + EPS) {
              val v = vecs(ci)
              var dot = 0.0
              var j = 0
              while (j < n) { dot += xd(j) * v(j); j += 1 }
              val den = sxn * cNorm(ci)
              consider(ci, if (den == 0.0) 0.0 else dot / den)
            }
            mi += 1
          }
        }
        oi += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      topCid.take(filled))
  }
}

/** `nearest_centroid(vec)` against a broadcast [[CentroidKernel]]:
  * returns `struct(centroid_id bigint, centroid_sim double)`. Built
  * by [[graft.sim.Similarity.ivfAssign]]; not registered as a SQL
  * function because the kernel is a runtime object, not a literal.
  */
case class NearestCentroid(child: Expression,
    kernel: Broadcast[CentroidKernel]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("centroid_sim", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    kernel.value.assign(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("nearestCentroidKernel", kernel,
        classOf[Broadcast[_]].getName)
      s"""${ev.value} = ((graft.plans.CentroidKernel) $ref.value())
         |  .assign($x, $isFloat);""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

/** `nearest_centroids(vec, p)` against a broadcast [[CentroidKernel]]:
  * the `p` nearest centroid ids best-first, as `array<bigint>` — the
  * meta-probe projection of the two-level assignment route. Same
  * broadcast/codegen posture as [[NearestCentroid]].
  */
case class NearestCentroidsTopP(child: Expression,
    kernel: Broadcast[CentroidKernel], p: Int) extends UnaryExpression {

  require(p >= 1, s"top-p needs p >= 1, got $p")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids needs array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    kernel.value.assignTop(a.asInstanceOf[ArrayData], isFloat, p)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("nearestCentroidsKernel", kernel,
        classOf[Broadcast[_]].getName)
      s"""${ev.value} = ((graft.plans.CentroidKernel) $ref.value())
         |  .assignTop($x, $isFloat, $p);""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidsTopP = copy(child = newChild)
}
