package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property checks for the incremental-view-maintenance algebra: the
  * schedule-independence contracts hold for ARBITRARY batch
  * assignments and mutation batches, not just the hand-picked splits
  * in the example-based specs.
  */
class IvmPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val mv = MatViewDef("p", Seq("k"), Seq(
    MvMeasure("count"), MvMeasure("sum", "v"), MvMeasure("min", "v"),
    MvMeasure("max", "v"), MvMeasure("avg", "v"), MvMeasure("hll", "id")))

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("property: any batch assignment folds to the one-shot aggregate") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      nBatches <- Gen.chooseNum(1, 4)
      assign <- Gen.listOfN(n, Gen.chooseNum(0, nBatches - 1))
      seed <- Gen.long
    } yield (assign, nBatches, seed)
    check(Prop.forAll(gen) { case (assign, nBatches, seed) =>
      val rnd = new scala.util.Random(seed)
      val data = assign.zipWithIndex.map { case (b, i) =>
        (i.toLong, rnd.nextInt(4).toLong,
          math.rint(rnd.nextGaussian() * 50) / 10, b)
      }.toDF("id", "k", "v", "b")
      val inc = (0 until nBatches)
        .map(i => MatView.partial(data.filter(col("b") === i), mv))
        .reduce(MatView.mergeStates(_, _, mv))
      rows(MatView.finalizeView(inc, mv)) ==
        rows(MatView.finalizeView(MatView.partial(data, mv), mv))
    }, n = 12)
  }

  test("property: snapshot diff recovers an arbitrary mutation batch") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      seed <- Gen.long
    } yield (n, seed)
    check(Prop.forAll(gen) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val before = (0 until n).map(i => (i.toLong, rnd.nextInt(5).toDouble))
      // random disjoint delete/update key sets + fresh inserts
      val deletes = before.map(_._1).filter(_ => rnd.nextBoolean()).toSet
      val updates = before.map(_._1)
        .filterNot(deletes).filter(_ => rnd.nextBoolean()).toSet
      val inserts = (0 until rnd.nextInt(5))
        .map(i => ((n + i).toLong, rnd.nextInt(5).toDouble))
      val after = before.filterNot(r => deletes(r._1))
        .map { case (k, v) => if (updates(k)) (k, v + 100) else (k, v) } ++
        inserts
      val bDf = before.toDF("k", "v"); val aDf = after.toDF("k", "v")
      val got = SnapshotDiff.diff(bDf, aDf, Seq("k"))
        .as[(Long, String)].collect().toMap
      val expected =
        deletes.map(_ -> "delete").toMap ++
          updates.map(_ -> "update").toMap ++
          inserts.map(_._1 -> "insert").toMap
      // and the payload feed applied to `before` rebuilds `after`
      val rebuilt = SnapshotDiff.applyChanges(bDf,
        SnapshotDiff.changes(bDf, aDf, Seq("k")), Seq("k"))
        .as[(Long, Double)].collect().toSeq.sorted
      got == expected && rebuilt == after.sorted
    }, n = 12)
  }

  test("property: delta-join fold equals the full join for any schedule") {
    val gen = for {
      nL <- Gen.chooseNum(0, 25)
      nR <- Gen.chooseNum(0, 25)
      nBatches <- Gen.chooseNum(1, 3)
      aL <- Gen.listOfN(nL, Gen.chooseNum(0, 2))
      aR <- Gen.listOfN(nR, Gen.chooseNum(0, 2))
      seed <- Gen.long
    } yield (aL, aR, nBatches, seed)
    check(Prop.forAll(gen) { case (aL, aR, nBatches, seed) =>
      val rnd = new scala.util.Random(seed)
      val left = aL.zipWithIndex.map { case (b, i) =>
        (rnd.nextInt(6).toLong, i.toLong, b % nBatches) }
      val right = aR.zipWithIndex.map { case (b, i) =>
        (rnd.nextInt(6).toLong, (i + 1000).toLong, b % nBatches) }
      val lDf = left.toDF("k", "lid", "b")
      val rDf = right.toDF("k", "rid", "b")
      var aLx = lDf.select("k", "lid").limit(0)
      var aRx = rDf.select("k", "rid").limit(0)
      var view = aLx.join(aRx, Seq("k"))
      (0 until nBatches).foreach { i =>
        val nl = lDf.filter(col("b") === i).select("k", "lid")
        val nr = rDf.filter(col("b") === i).select("k", "rid")
        view = view.unionByName(nl.join(aRx, Seq("k")))
          .unionByName(aLx.unionByName(nl).join(nr, Seq("k")))
        aLx = aLx.unionByName(nl); aRx = aRx.unionByName(nr)
      }
      val got = view.as[(Long, Long, Long)].collect().toSeq
      val full = lDf.select("k", "lid").join(rDf.select("k", "rid"), Seq("k"))
        .as[(Long, Long, Long)].collect().toSeq
      got.sorted == full.sorted && got.size == got.toSet.size
    }, n = 10)
  }
}
