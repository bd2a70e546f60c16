package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut mode for the batch iterative loops (PageRank, label
  * propagation, k-core peeling, BPE merge training, connected
  * components) — r13 VERDICT Next #1.
  *
  * `localCheckpoint` stores the cut state in EXECUTOR block storage:
  * fast (no FS round-trip) and correct, but not fault-tolerant — once
  * lineage is truncated, losing one executor after a cut kills the job
  * with no recovery path. On a laptop or a dedicated local[32] box that
  * trade is right; on a 1000-executor preemptible cluster running a
  * multi-hour loop over 100 TB it is not — there the loop state must
  * survive executor loss, which is exactly what a RELIABLE checkpoint
  * (`df.checkpoint()` into `sc.setCheckpointDir`'s HDFS/object-store
  * path) provides: the cut state is re-readable from the FS by any
  * surviving executor, so a preempted node costs a task retry, not the
  * whole run.
  *
  * The knob is the Spark conf `spark.graft.checkpoint.mode`
  * (runtime-settable, so a cluster job flips it with `--conf` and no
  * code change):
  *
  *  - `"local"` (default) — `localCheckpoint`: executor-stored blocks.
  *  - `"reliable"` — `checkpoint` into the directory previously set
  *    via `sc.setCheckpointDir(...)`; fails fast with a clear message
  *    if no directory is set.
  *
  * Cost: each reliable cut adds one FS write + read of the cut table
  * per checkpoint interval. The loop tables this guards are O(nodes)
  * — orders of magnitude smaller than the edge/corpus tables — so the
  * delta is bounded by state size, not input size; SCALE.md records
  * the measured sf1 delta. Scalar-anchor checkpoints elsewhere (1-row
  * stat tables consumed within one short query) intentionally stay on
  * `localCheckpoint`: their loss window is seconds and their recompute
  * is one cheap aggregate, so an FS round-trip per anchor would be
  * pure overhead. */
object Checkpoint {

  /** Conf key selecting the cut implementation: "local" | "reliable". */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** True when the session is in reliable mode (used by loops that
    * want mode-specific assertions in tests). */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ModeKey, "local") == "reliable"

  /** Cut the lineage of `df` under the session's configured mode.
    * `eager` mirrors `localCheckpoint(eager)` — the loops cut eagerly
    * (the default) so each round's job cost is paid inside the round
    * that caused it. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable(df)) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ModeKey=reliable requires sc.setCheckpointDir(<fault-" +
          "tolerant path>) before the first iterative operator runs")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)

  /** `.cut` / `.cutLazy` chain syntax so loop bodies read like the
    * `.localCheckpoint()` calls they replace. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cut: DataFrame = Checkpoint.cut(df)
    def cutLazy: DataFrame = Checkpoint.cut(df, eager = false)
  }
}
