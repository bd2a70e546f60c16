package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** r13 VERDICT Next #3 — the ADVERSARIAL-SLICING property over every
  * stored-partials monitor: ONE generator produces a random partition
  * of the input into k micro-batches — every slicing is FORCED to
  * contain at least one EMPTY batch and at least one 1-ROW batch (the
  * two degenerate shapes a fixed 3-batch replay spec never exercises)
  * — and the property asserts each monitor's readout over the k-batch
  * ingest equals its one-shot ingest row-for-row.
  *
  * This is the PartialsStore contract stated in its scaladoc
  * ("the merged table over ANY batch slicing equals a one-shot pass
  * bit-for-bit") finally tested as a property instead of at three
  * hand-picked slicings. All 11 monitors ride the same generator:
  * eval (pass@k + majority vote), anomaly z-scores, experiment
  * report, drift PSI, conformal coverage, SRM, dispersion, quality
  * mix (+ its r14 OOV readout), and the r14 Wilson-CI conversion
  * and QTE-grid monitors, and the r15 retention
  * monitor (whose first-seen cohort min is DERIVED at readout —
  * slicing a user's first day across batches is exactly what this
  * property stresses).
  *
  * Slicing grain: raw rows for the event/order monitors (cells span
  * batches freely — the harder direction); whole documents for the
  * quality monitor (its stated contract: docs never span batches). */
object MonitorSlicingProps extends Properties("PartialsStore.monitors") {

  // each case ingests ~10 monitors x ~7 batches; 4 cases x the forced
  // degenerate shapes already cover far more slicings than the fixed
  // replay specs, without a multi-minute suite hit
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4).withWorkers(1)

  private lazy val spark = graft.SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  /** Base table with a dense 1..n slice index (checkpointed once so
    * every slicing filters the same frozen rows). */
  private def indexed(t: String, by: String): DataFrame =
    graft.Tables.load(spark, dir, t)
      .withColumn("__idx",
        row_number().over(Window.orderBy(col(by))).cast("long"))
      .localCheckpoint()

  private lazy val events = indexed("events", "event_id")
  private lazy val orders = indexed("orders", "o_orderkey")
  private lazy val docs = indexed("documents", "doc_id")
    .select(col("doc_id"), col("lang"), col("text"), col("__idx"))

  private lazy val cutoff: String = events
    .filter(col("value").isNotNull)
    .agg(date_add(min(to_date(col("ts"))), 14).cast("string"))
    .collect().head.getString(0)
  private lazy val cal = QualityStream.calibrate(docs.drop("__idx"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** `producer` is the `Object.method` name of the partials sink this
    * monitor ingests through — the registry key the source-scan
    * property below matches against the actual `*Stream` files, so a
    * NEW monitor cannot land with a partials producer and skip this
    * slicing property (r14 VERDICT Next #6). */
  private final case class Monitor(name: String, producer: String,
      base: () => DataFrame,
      sink: (DataFrame, Long, String) => Unit,
      readouts: Seq[String => Seq[String]])

  private lazy val monitors: Seq[Monitor] = Seq(
    Monitor("eval", "EvalStream.evalPartials", () => events,
      EvalStream.evalPartials,
      Seq(p => rows(EvalStream.passAtKFromPartials(spark, p)),
        p => rows(EvalStream.voteFromPartials(spark, p)))),
    Monitor("anomaly", "AnomalyStream.momentPartials", () => events,
      AnomalyStream.momentPartials,
      Seq(p => rows(AnomalyStream.zscoresFromPartials(spark, p)))),
    Monitor("experiment", "ExperimentStream.expPartials", () => events,
      ExperimentStream.expPartials,
      Seq(p => rows(ExperimentStream.reportFromPartials(spark, p)))),
    Monitor("drift", "DriftStream.binPartials", () => events,
      (b, i, p) => DriftStream.binPartials(b, i, p, cutoff),
      Seq(p => rows(DriftStream.psiFromPartials(spark, p)))),
    Monitor("conformal", "ConformalStream.dayPartials", () => orders,
      ConformalStream.dayPartials,
      Seq(p => rows(ConformalStream.conformalFromPartials(spark, p)))),
    Monitor("srm", "SrmStream.armPartials", () => events,
      SrmStream.armPartials,
      Seq(p => rows(SrmStream.srmFromPartials(spark, p)))),
    Monitor("dispersion", "DispersionStream.countPartials", () => events,
      DispersionStream.countPartials,
      Seq(p => rows(DispersionStream.dispersionFromPartials(spark, p)))),
    Monitor("quality", "QualityStream.bucketPartials", () => docs,
      (b, i, p) => QualityStream.bucketPartials(b, i, p, cal),
      Seq(p => rows(QualityStream.mixFromPartials(spark, p)),
        p => rows(QualityStream.oovFromPartials(spark, p)))),
    Monitor("ci", "CiStream.convPartials", () => events,
      CiStream.convPartials,
      Seq(p => rows(CiStream.wilsonFromPartials(spark, p)))),
    Monitor("qte", "QteStream.gridPartials", () => events,
      QteStream.gridPartials,
      Seq(p => rows(QteStream.qteFromPartials(spark, p)))),
    Monitor("retention", "RetentionStream.presencePartials", () => events,
      RetentionStream.presencePartials,
      Seq(p => rows(RetentionStream.retentionFromPartials(spark, p)))))

  /** Producers deliberately OUTSIDE the bit-for-bit slicing contract:
    * EventStream's sketch sinks merge HLL/KLL summaries whose internal
    * layout is merge-order dependent by design (KLL compaction order);
    * their weaker estimate-envelope invariants live in
    * SketchPartialsSpec. Anything else found by the scan MUST appear
    * in `monitors`. */
  private val excludedProducers: Set[String] = Set(
    "EventStream.sketchPartials", "EventStream.kllPartials")

  property("the monitor registry enumerates EVERY *Stream partials " +
    "producer (new monitors cannot land unsliced)") = {
    val dir = new java.io.File("src/main/scala/graft/streaming")
    val files = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith("Stream.scala"))
    // the scan must actually see the sources — a wrong cwd silently
    // passing would defeat the gate
    assert(files.nonEmpty, s"no *Stream.scala under ${dir.getAbsolutePath}")
    val sig = """def (\w+Partials)\(batch: DataFrame, batchId: Long""".r
    val found = files.flatMap { f =>
      val obj = f.getName.stripSuffix(".scala")
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      sig.findAllMatchIn(text).map(m => s"$obj.${m.group(1)}")
    }.toSet
    val covered = monitors.map(_.producer).toSet ++ excludedProducers
    Prop(found == covered) :|
      (s"uncovered producers: ${(found -- covered).toSeq.sorted}; " +
        s"stale registry entries: ${(covered -- found).toSeq.sorted}")
  }

  private lazy val counts: Map[String, Long] =
    monitors.map(m => m.name -> m.base().count()).toMap

  /** One-shot baseline readouts, computed once per monitor. */
  private lazy val oneShot: Map[String, Seq[Seq[String]]] =
    monitors.map { m =>
      val p = Files.createTempDirectory(s"graft_prop1_${m.name}").toString
      m.sink(m.base().drop("__idx"), 0L, p)
      m.name -> m.readouts.map(_(p))
    }.toMap

  /** Random slicing as FRACTIONS of [0, 1] (scaled per table):
    * 0-4 uniform cut points, plus a forced (j, j, j+1) triple that
    * guarantees one empty batch and one 1-row batch in every case. */
  private val genSlicing: Gen[(List[Double], Double)] = for {
    k <- Gen.choose(0, 4)
    cuts <- Gen.listOfN(k, Gen.choose(0.0, 1.0))
    fj <- Gen.choose(0.0, 1.0)
  } yield (cuts, fj)

  private def bounds(n: Long, cuts: List[Double], fj: Double)
      : Seq[(Long, Long)] = {
    val j = math.max(0L, math.min((fj * (n - 1)).toLong, n - 2))
    val bs = (cuts.map(f => (f * n).toLong) ++
      Seq(0L, n, j, j, j + 1)).sorted
    bs.zip(bs.tail)
  }

  property("k-batch ingest == one-shot for all 11 monitors under " +
    "random slicings with forced empty + 1-row batches") =
    Prop.forAll(genSlicing) { case (cuts, fj) =>
      Prop.all(monitors.flatMap { m =>
        val p = Files.createTempDirectory(s"graft_prop_${m.name}").toString
        bounds(counts(m.name), cuts, fj).zipWithIndex.foreach {
          case ((lo, hi), i) =>
            m.sink(m.base()
              .filter(col("__idx") > lo && col("__idx") <= hi)
              .drop("__idx"), i.toLong, p)
        }
        m.readouts.zipWithIndex.map { case (r, ri) =>
          (r(p) == oneShot(m.name)(ri)): Prop // scalastyle:ignore
        }.zipWithIndex.map { case (pr, ri) =>
          pr :| s"${m.name} readout #$ri diverged from one-shot"
        }
      }: _*)
    }
}
