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

    // resume-from-checkpoint: re-derive stage 5 from the LANDED s4
    // product alone (split buckets + 8-gram decontamination, the same
    // recipe the funnel runs) and require it to reproduce the stage-5
    // yield — the thing a restarted run that lost stages 5+ would do
    val s4 = spark.read.parquet(s"$out/s4_near_dedup")
      .withColumn("bucket",
        pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
          16, 10), lit(100)))
    val sh8 = s4.filter(size($"toks") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("sg"))
      .select($"doc_id", md5($"sg").as("h8")).distinct()
    val heldSh = s4.filter($"bucket" >= 80)
      .select($"doc_id").join(sh8, "doc_id").select($"h8").distinct()
    val contaminated = sh8.join(heldSh, "h8").select($"doc_id").distinct()
    val resumed = s4.filter($"bucket" < 80)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)), coalesce(sum($"n_tokens"), lit(0L)))
      .collect()(0)
    val s5Row = onePlan.find(_(1) == "train_decontaminated").get
    assert(resumed.getLong(0) == s5Row(2) && resumed.getLong(1) == s5Row(3),
      s"resumed=(${resumed.getLong(0)},${resumed.getLong(1)}) yield=$s5Row")
  }
}
