package graft.xml

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** spark-submit entry point — the reference's `process_xml_to_parquet(
  * input_folder, output_dir)` call (`R/main.R:57`) as a submittable job,
  * so a reference user's cron line ports to:
  *
  * {{{
  * spark-submit --class graft.xml.Main graft.jar \
  *   /data/xml /data/out [/data/schemas] \
  *   [--incremental] [--no-validate] [--run-id 42] [--stream]
  * }}}
  *
  * `--stream` switches to the Structured Streaming ingest ([[XmlStream]]):
  * each invocation drains files not yet ingested (exactly-once via the
  * sink checkpoint) instead of the batch star-schema run.
  * `--stream-groups` is its mixed-corpus variant: one stream per
  * (row tag, charset) group ([[XmlStream.drainGroups]]), reaching batch
  * grouped-read parity when the drop directory mixes record shapes.
  *
  * `schemaDir` defaults to the input directory (findSchemaFile also
  * searches beside each XML file, mirroring the reference's resolution
  * order). `--run-id` makes runs reproducible (SURVEY.md §8 Q6 — the
  * reference stamped a random batch id); without it the wall-clock
  * millis stand in, which is the right default for a cron job and the
  * wrong one for tests (tests pass [[run]] an explicit id). Exit code 1
  * when integrity violations are found, so schedulers alert. */
object Main {

  final case class Config(
      inputDir: String,
      outputDir: String,
      schemaDir: String,
      incremental: Boolean,
      validate: Boolean,
      runId: Option[Long],
      stream: Boolean = false,
      streamGroups: Boolean = false)

  def parse(args: Array[String]): Config = {
    val positional = scala.collection.mutable.Buffer.empty[String]
    var incremental = false
    var validate = true
    var runId: Option[Long] = None
    var stream = false
    var streamGroups = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--incremental" => incremental = true
        case "--no-validate" => validate = false
        case "--stream" => stream = true
        case "--stream-groups" => streamGroups = true
        case f if f.startsWith("--run-id=") =>
          runId = Some(f.stripPrefix("--run-id=").toLong)
        case "--run-id" =>
          require(i + 1 < args.length, "--run-id needs a value")
          runId = Some(args(i + 1).toLong)
          i += 1
        case f if f.startsWith("--") =>
          throw new IllegalArgumentException(s"unknown flag: $f")
        case p => positional += p
      }
      i += 1
    }
    require(positional.length >= 2 && positional.length <= 3,
      "usage: graft.xml.Main <inputDir> <outputDir> [schemaDir] " +
        "[--incremental] [--no-validate] [--run-id N] [--stream] " +
        "[--stream-groups]")
    Config(
      inputDir = positional(0),
      outputDir = positional(1),
      schemaDir = positional.lift(2).getOrElse(positional(0)),
      incremental = incremental,
      validate = validate,
      runId = runId,
      stream = stream,
      streamGroups = streamGroups)
  }

  /** Testable core: runs the pipeline on an existing session. */
  def run(spark: SparkSession, cfg: Config,
      now: () => Long = () => System.currentTimeMillis())
      : XmlPipeline.PipelineReport = {
    val runId = cfg.runId.getOrElse(now())
    val loadTs = new Timestamp(now())
    if (cfg.incremental)
      XmlPipeline.processIncremental(spark, cfg.inputDir, cfg.outputDir,
        cfg.schemaDir, runId, loadTs, cfg.validate)
    else
      XmlPipeline.process(spark, cfg.inputDir, cfg.outputDir,
        cfg.schemaDir, runId, loadTs, cfg.validate)
  }

  /** `--stream` mode: one AvailableNow drain of the drop directory into
    * `outputDir/records` (exactly-once via the sink log under
    * `outputDir/_checkpoint`) — the cron line stops re-reading old files.
    * The stream setup (row tag, charset, schema, max repetitions) is
    * probed on the FIRST invocation and persisted beside the checkpoint;
    * later invocations reuse it, so the sink schema cannot flip when
    * late files change the corpus's dominant tag, and the per-run probe
    * cost disappears. Schema evolution = delete the setup file and
    * restart. Validation stays a batch-side or [[XmlStream
    * .validationStream]] concern. */
  def runStream(spark: SparkSession, cfg: Config): Long = {
    val setupPath = s"${cfg.outputDir}/_graft_stream_setup.json"
    val s = XmlStream.loadSetup(setupPath).getOrElse {
      val fresh = XmlStream.setup(spark, cfg.inputDir)
      XmlStream.saveSetup(fresh, setupPath)
      fresh
    }
    val q = XmlStream.sink(
      XmlStream.records(spark, cfg.inputDir, s),
      s"${cfg.outputDir}/records", s"${cfg.outputDir}/_checkpoint")
    q.awaitTermination()
    spark.read.parquet(s"${cfg.outputDir}/records").count()
  }

  /** `--stream-groups` mode: the mixed-corpus twin of [[runStream]] —
    * one exactly-once drain per (tag, charset) group under
    * `outputDir/records/<groupId>` with per-group checkpoints. Group
    * setups are probed once and persisted (manifest + one setup JSON
    * per group), so later invocations reuse schemas and a late burst of
    * files cannot flip any group's sink schema; NEW groups appearing
    * after first setup require deleting the manifest (an explicit
    * operator action, like single-stream schema evolution). */
  def runStreamGroups(spark: SparkSession, cfg: Config): Long = {
    val manifest = java.nio.file.Paths.get(
      s"${cfg.outputDir}/_graft_stream_groups.txt")
    val setups =
      if (java.nio.file.Files.exists(manifest)) {
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(manifest)).asScala.toSeq
          .filter(_.nonEmpty)
          .map { gid =>
            XmlStream.loadSetup(
              s"${cfg.outputDir}/_graft_stream_setup_$gid.json")
              .getOrElse(throw new IllegalStateException(
                s"manifest names group $gid but its setup file is missing"))
          }
      } else {
        val fresh = XmlStream.setupGroups(spark, cfg.inputDir)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(cfg.outputDir))
        fresh.foreach(st => XmlStream.saveSetup(st,
          s"${cfg.outputDir}/_graft_stream_setup_${XmlStream.groupId(st)}.json"))
        java.nio.file.Files.writeString(manifest,
          fresh.map(XmlStream.groupId).mkString("\n"))
        fresh
      }
    XmlStream.drainGroups(spark, cfg.inputDir, setups,
        s"${cfg.outputDir}/records", s"${cfg.outputDir}/_checkpoint")
      .foreach(_._2.awaitTermination())
    XmlStream.readGroups(spark, s"${cfg.outputDir}/records").count()
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = SparkSession.builder()
      .appName("graft-xml-to-parquet")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    if (cfg.streamGroups) {
      val rows = runStreamGroups(spark, cfg)
      // scalastyle:off println
      println(s"rows=$rows (per-group streaming drain)")
      // scalastyle:on println
      spark.stop()
      return
    }
    if (cfg.stream) {
      val rows = runStream(spark, cfg)
      // scalastyle:off println
      println(s"rows=$rows (streaming drain)")
      // scalastyle:on println
      spark.stop()
      return
    }
    val report = run(spark, cfg)
    // scalastyle:off println
    println(s"files=${report.filesTotal} skipped=${report.filesSkipped} " +
      s"rows=${report.rows} violations=${report.violations.size}")
    report.violations.foreach(v => println(s"violation: $v"))
    // scalastyle:on println
    spark.stop()
    if (report.violations.nonEmpty) sys.exit(1)
  }
}
