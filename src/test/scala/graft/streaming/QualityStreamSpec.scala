package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val corpus = graft.Tables.load(spark, dir, "documents")
    .select($"doc_id", $"lang", $"text")

  // slice by doc_id hash so each batch carries whole documents (the
  // stated contract: docs never span batches) but every lang does
  private def batches = Seq(
    corpus.filter(pmod(hash($"doc_id"), lit(3)) === 0),
    corpus.filter(pmod(hash($"doc_id"), lit(3)) === 1),
    corpus.filter(pmod(hash($"doc_id"), lit(3)) === 2))

  private def rows(path: String) =
    QualityStream.mixFromPartials(spark, path)
      .as[(String, String, Long, Long)].collect().toSeq.sorted

  test("k-batch ingest (with a replay) under the batch query's own " +
    "calibration equals LIVE q_ppl_bucket bit-for-bit") {
    val cal = QualityStream.calibrate(corpus)
    val incr = Files.createTempDirectory("graft_qual_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      QualityStream.bucketPartials(b, i.toLong, incr, cal)
    }
    // replay batch 1 (failure re-delivery) — must overwrite
    QualityStream.bucketPartials(batches(1), 1L, incr, cal)

    val live = graft.SparkEntry.queries("q_ppl_bucket")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(rows(incr) == live, "streamed mix != live q_ppl_bucket")
  }

  test("planted novel-vocab batch: nonzero oov_mass surfaces while " +
    "the mix stays pinned to live q_ppl_bucket") {
    val cal = QualityStream.calibrate(corpus)
    val p = Files.createTempDirectory("graft_qual_oov").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      QualityStream.bucketPartials(b, i.toLong, p, cal)
    }
    // calibrated-on-self batches drop nothing: the LM saw every bigram
    val oov0 = QualityStream.oovFromPartials(spark, p)
      .as[(String, Long, Long)].collect().toSeq
    assert(oov0.forall(r => r._2 == 0L && r._3 == 0L),
      s"self-calibrated stream must have zero OOV mass, got $oov0")
    // batch 3: vocabulary the calibration LM has never seen — before
    // r14 these documents vanished in the score join with no signal
    val novel = Seq(
      ("oov_doc_a", "en", "zzqx1 zzqx2 zzqx3 zzqx4"), // 3 OOV bigrams
      ("oov_doc_b", "en", "zzqx5 zzqx6 zzqx7"))       // 2 OOV bigrams
      .toDF("doc_id", "lang", "text")
    QualityStream.bucketPartials(novel, 3L, p, cal)
    val live = graft.SparkEntry.queries("q_ppl_bucket")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(rows(p) == live,
      "mix must stay pinned: unscored docs are excluded from the mix")
    val oov = QualityStream.oovFromPartials(spark, p)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(oov("en") == ((5L, 2L)),
      s"expected en -> (oov_mass=5, unscored_docs=2), got ${oov.get("en")}")
  }

  test("a stream of known-tail documents reads as 100% tail") {
    val cal = QualityStream.calibrate(corpus)
    val tailDocs = graft.operators.Text.pplCe(corpus, cal.scored)
      .filter($"ce6" > cal.t2).select($"doc_id")
      .join(corpus, "doc_id")
      .select($"doc_id", $"lang", $"text")
    val p = Files.createTempDirectory("graft_qual_tail").toString
    QualityStream.bucketPartials(tailDocs, 0L, p, cal)
    val mix = rows(p)
    assert(mix.nonEmpty && mix.forall(_._2 == "tail"),
      s"expected all-tail mix, got $mix")
  }
}
