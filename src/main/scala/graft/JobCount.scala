package graft
import org.apache.spark.sql.SparkSession

/** Per-query Spark-JOB count probe (optimization round instrumentation).
  *
  * The round-15 floor decomposition showed most of the 385-query surface
  * sits near the per-job fixed cost (~0.1–0.2 s/job locally), so the
  * number of sequential jobs a query runs IS its cost model at bench
  * scale. This main runs every registered query to the noop sink inside
  * its own job group and reports `query  jobs  stages  tasks` TSV rows
  * (via the public `SparkStatusTracker` — no listener-bus races), so the
  * multi-job offenders can be ranked and attacked (fuse anchors, overlap
  * independent jobs — guide §2.6).
  *
  * Not part of the driver contract; purely a measurement tool like
  * PlanDump. Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_BENCH_ONLY.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val tracker = spark.sparkContext.statusTracker
    println("query\tjobs\tstages\ttasks\tsec")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
        spark.sparkContext.setJobGroup(name, name)
        // anchors materialized from parMat/Future threads don't inherit
        // the (thread-local) job group; they land in the null group, so
        // the before/after delta of the null group catches them
        val nogroup0 = tracker.getJobIdsForGroup(null).length
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          val jobs = tracker.getJobIdsForGroup(name) ++
            tracker.getJobIdsForGroup(null).drop(nogroup0)
          val stageIds = jobs.flatMap(j =>
            tracker.getJobInfo(j).map(_.stageIds().toSeq).getOrElse(Seq.empty))
          val tasks = stageIds.flatMap(s =>
            tracker.getStageInfo(s).map(_.numTasks())).sum
          println(f"$name\t${jobs.length}\t${stageIds.length}\t$tasks\t$dt%.3f")
        } catch {
          case e: Throwable =>
            println(s"$name\tERR\t${e.getClass.getSimpleName}")
        } finally spark.sparkContext.clearJobGroup()
      }
    spark.stop()
  }
}
