package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Theta-sketch partials: partition-invariance (the estimate must depend
  * only on the distinct-value set, not how rows were split), accuracy
  * bounds, and intersection correctness vs exact overlap. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(ids: Seq[Int], scope: String, parts: Int) = {
    val df = ids.map(i => (scope, s"user_$i")).toDF("sc", "item")
      .repartition(parts)
    val rows = ThetaSketch.partials(df, col("sc"), col("item")).collect()
    assert(rows.forall(_.getString(0) == scope))
    assert(rows.length <= parts)
    ThetaSketch.union(rows.map(_.getAs[Array[Byte]](1)).toSeq)
  }

  test("union of partials is partition-invariant and within error bounds") {
    val ids = 1 to 20000
    val a = sketchOf(ids, "a", 3)
    val b = sketchOf(ids, "a", 11)
    assert(a.getEstimate === b.getEstimate,
      "estimate changed with partitioning")
    assert(a.getLowerBound(3) <= 20000 && 20000 <= a.getUpperBound(3))
    assert(math.abs(a.getEstimate - 20000) / 20000.0 < 0.05)
  }

  test("below nominal entries the sketch is exact") {
    val sk = sketchOf(1 to 3000, "a", 5)
    assert(sk.getEstimate === 3000.0)
  }

  test("difference estimate brackets the exact A-not-B count") {
    val x = sketchOf(1 to 12000, "x", 4)
    val y = sketchOf(8001 to 20000, "y", 4)
    val diff = ThetaSketch.diffBytes(x.toByteArray, y.toByteArray)
    assert(diff.getLowerBound(3) <= 8000 && 8000 <= diff.getUpperBound(3))
    assert(math.abs(diff.getEstimate - 8000) / 8000.0 < 0.1)
  }

  test("intersection estimate brackets the exact overlap") {
    val x = sketchOf(1 to 12000, "x", 4)
    val y = sketchOf(8001 to 20000, "y", 4)
    val i = ThetaSketch.intersect(Seq(x, y))
    assert(i.getLowerBound(3) <= 4000 && 4000 <= i.getUpperBound(3))
    assert(math.abs(i.getEstimate - 4000) / 4000.0 < 0.1)
  }
}
