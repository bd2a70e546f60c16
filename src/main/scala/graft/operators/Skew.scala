package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4.2 / SCALE.md): explicit key
  * salting for when a fact table's join key is pathologically hot and the
  * small side is too large to broadcast outright — the manual complement to
  * AQE's skew-join splitting.
  *
  * Shape: the large side appends a deterministic salt in [0, n) derived
  * from non-key columns; the small side is replicated n times (one row per
  * salt value); the join key becomes (key, salt), splitting each hot key's
  * rows across n tasks. Replication factor n multiplies the small side —
  * choose n ≈ (hottest key rows) / (target rows per task).
  */
object Skew {

  /** Deterministic per-row salt in [0, n): hash of the whole row (salting
    * must not depend on the join key alone, or hot keys stay hot). */
  def salt(n: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong)).cast("int")

  /** Salted inner equi-join of `large` and `small` on `key`. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltCols = large.columns.filterNot(_ == key).map(col).toSeq
    val l = large.withColumn("__salt",
      salt(saltBuckets, if (saltCols.nonEmpty) saltCols else Seq(col(key))))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
