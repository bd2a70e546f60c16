package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, UpdateSketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-aggregatable THETA sketches for distinct counting with SET
  * INTERSECTION support (SURVEY.md §2.11 extension tier — the companion of
  * the HLL partials in Analytics and the CMS partials in [[CmsSketch]]).
  *
  * Why a third sketch family: HLL answers unions only — "distinct users who
  * did A AND B" (audience overlap, cross-corpus shared-vocabulary size,
  * contamination overlap estimates) has no HLL formulation, while theta
  * sketches support union / intersection / difference over the same stored
  * partials. At 100 TB the alternative is a distinct self-join per pair of
  * scopes; theta partials are built in ONE corpus pass (constant bytes per
  * scope × partition), stored, and any pairwise overlap is answered from
  * the partials without rescanning.
  *
  * Determinism: a theta sketch's retained set is the k smallest value
  * hashes, so union results depend only on the distinct-value SET (not
  * row order or partitioning) as long as per-partition builders don't
  * purge below the global k-th smallest — guaranteed here because the
  * builder never purges until 2k distincts land in one partition, and the
  * k smallest of any subset retain through [[SetOperation]] trimming.
  * Estimates on saturated sketches carry the published relative standard
  * error ~1/sqrt(k) (k = 4096 → ~1.6%); getLowerBound/getUpperBound give
  * the confidence envelope the self-checking query asserts.
  */
object ThetaSketch {

  /** Nominal entries (k). 4096 → ~1.6% RSE, ~32 KB max per sketch. */
  val NominalEntries = 4096

  /** One corpus pass → per-(input partition, scope) compact sketch rows
    * `(scope string, theta binary)`. No shuffle: partials are emitted
    * map-side exactly like streaming sketch partials; callers persist them
    * or reduce them with [[union]]. The per-partition state is one
    * builder per scope (bounded: scopes × 2k longs). */
  def partials(df: DataFrame, scopeCol: Column, itemCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(scopeCol.cast("string").as("scope"),
        itemCol.cast("string").as("item"))
      .as[(String, String)]
      .mapPartitions { it =>
        val builders = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (scope, item) =>
          if (scope != null && item != null)
            builders.getOrElseUpdate(scope,
              UpdateSketch.builder().setNominalEntries(NominalEntries).build())
              .update(item)
        }
        builders.iterator.map { case (scope, sk) =>
          (scope, sk.compact().toByteArray)
        }
      }
      .toDF("scope", "theta")
  }

  /** Union serialized partials into one sketch (set-deterministic). */
  def union(parts: Seq[Array[Byte]]): CompactSketch = {
    val u = SetOperation.builder().setNominalEntries(NominalEntries)
      .buildUnion()
    parts.foreach(b => u.union(Sketches.wrapSketch(Memory.wrap(b))))
    u.getResult
  }

  /** Intersection estimate over two or more sketches. */
  def intersect(sketches: Seq[Sketch]): CompactSketch = {
    require(sketches.nonEmpty, "nothing to intersect")
    val i = SetOperation.builder().setNominalEntries(NominalEntries)
      .buildIntersection()
    sketches.foreach(i.intersect)
    i.getResult
  }

  /** Serialized-form intersection — the executor-side shape (sketches
    * arrive as binary columns). */
  def intersectBytes(a: Array[Byte], b: Array[Byte]): CompactSketch =
    intersect(Seq(
      Sketches.wrapSketch(Memory.wrap(a)),
      Sketches.wrapSketch(Memory.wrap(b))))

  /** Set difference A \ B (serialized form) — with [[union]] and
    * [[intersect]] this completes the set algebra stored theta partials
    * can answer. */
  def diffBytes(a: Array[Byte], b: Array[Byte]): CompactSketch = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.wrapSketch(Memory.wrap(a)))
    op.notB(Sketches.wrapSketch(Memory.wrap(b)))
    op.getResult(true)
  }
}
