package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` output for selected queries to files —
  * the before/after plan evidence an optimization round commits under
  * plans/<round>/ (the judge checks plan claims against these).
  *
  * {{{ sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r15 _before q_mmd|q_kcore" }}}
  *
  * Args: sfDir outDir suffix [name-regex]. Writes
  * `<outDir>/<query><suffix>.txt` per matching query. Session config
  * matches Bench exactly (shuffle partitions = SPARK_GRAFT_CPUS) so the
  * dumped plan is the plan the bench times. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val only = args.lift(3).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.all
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, q) =>
        try {
          val plan = q.fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
          println(s"[plandump] wrote $name$suffix.txt")
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
