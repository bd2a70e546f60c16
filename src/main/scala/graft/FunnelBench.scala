package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: the one-plan `q_prep_funnel` (lazy composition — each
  * stage's yield aggregate re-derives its ancestry inside one plan)
  * vs [[graft.operators.Corpus.prepFunnelMaterialized]] (the
  * production mode — every stage survivor written to parquet and
  * re-read by the next stage). The one-plan form is the oracle-
  * replayable demo; the materialized form is what a 100 TB run does,
  * and this bench is the measured evidence for the crossover the
  * funnel's own doc comment predicts: the lazy plan recomputes the
  * multiply-referenced shingle table per consumer, so materialization
  * should win as soon as the recomputation outweighs the write+read.
  * Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.FunnelBench"
  * Results are recorded in SCALE.md ("funnel: one-plan vs materialized").
  */
object FunnelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(body: => Unit): Double = (1 to reps).map(_ => time(body)).min

    // warmup both paths once (JIT + file-index caches)
    SparkEntry.queries("q_prep_funnel")(spark, sfDir).collect()
    val onePlan = best {
      SparkEntry.queries("q_prep_funnel")(spark, sfDir).collect()
    }
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_funnel_bench").toString
    graft.operators.Corpus.prepFunnelMaterialized(spark, sfDir, outDir)
      .collect()
    val mat = best {
      graft.operators.Corpus
        .prepFunnelMaterialized(spark, sfDir, outDir).collect()
    }
    println(f"""{"metric":"funnel","sf":"$sfDir","reps":$reps,""" +
      f""""one_plan_sec":$onePlan%.3f,"materialized_sec":$mat%.3f}""")
    spark.stop()
  }
}
