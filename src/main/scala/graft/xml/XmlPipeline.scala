package graft.xml

import java.sql.Timestamp

import graft.profile.SchemaProfiler
import graft.star.{StarSchema, StarTransformer}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end XML -> star-schema -> Parquet pipeline — the rebuild of the
  * reference's `process_xml_to_parquet` entry point (`R/main.R:58-126`),
  * reshaped for Spark (SURVEY.md §3.1): one declarative job per stage, no
  * manual batching, dims built globally, per-FILE error isolation via the
  * distributed validation pre-pass.
  *
  * Outputs mirror the reference's layout (`R/parquet_writer.R`):
  * `fact_main.parquet`, `dim_<col>.parquet`, `processing_errors.csv`,
  * `processing_manifest.csv`, `parquet_metadata.csv`,
  * `schema_documentation.csv` (as directories — distributed writers).
  */
object XmlPipeline {

  final case class PipelineReport(
      filesTotal: Int,
      filesSkipped: Int,
      rows: Long,
      star: StarSchema,
      violations: Seq[String],
      outputs: Seq[String])

  /** Columns never profiled for roles (fixes the reference's audit-column
    * leak, SURVEY.md §8 Q2). */
  private val AuditCols = Set(
    "source_file_name", "source_file_path", "load_timestamp",
    "business_key_name", "business_key_value")

  def process(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      schemaDir: String,
      runId: Long,
      loadTs: Timestamp,
      validate: Boolean = true,
      explicitXsd: Option[String] = None,
      profileSampleFiles: Int = 100,
      structureSampleFiles: Int = 16): PipelineReport = {

    val log = new graft.io.PipelineLogger(s"$outputDir/logs")

    // 1. discovery (R/main.R:80)
    val files = XmlIngest.listXmlFiles(spark, inputDir)
    require(files.nonEmpty, s"no *.xml files in $inputDir")
    log.info(s"queued ${files.size} XML files from $inputDir")

    // 2. per-file validation pre-pass; invalid files are SKIPPED, the
    // pipeline continues (R/xml_parser.R:34-42)
    val (goodFiles, errorsDf) =
      if (validate) {
        val verdicts =
          XmlValidation.validateBatch(spark, files, schemaDir, explicitXsd)
            .cache()
        val bad = verdicts.filter(col("verdict") === "invalid")
        val badSet = bad.select("file").collect().map(_.getString(0)).toSet
        badSet.toSeq.sorted.foreach(f => log.error(s"validation failed: $f"))
        (files.filterNot(badSet), bad)
      } else (files, spark.emptyDataFrame)

    // 3. structured read + flatten + lineage + record ids (§1.4, S15).
    // Structure is inferred from a bounded FILE SAMPLE (the reference's
    // SCHEMA_SAMPLE_SIZE bound, R/main.R:19,95) and applied to the full
    // read — one inference pass over <=100 files instead of a discovery
    // scan of the whole corpus; files outside the sample union-with-fill
    // into that schema (missing elements -> null). The structured read is
    // cached: the flattener's repetition-count aggregate, the profile pass
    // and the star build all reuse one parse.
    // Physical structure needs far fewer sample files than role inference
    // (the discovery pass is single-threaded); elements appearing only
    // beyond the sample are dropped — same bounded-sample tradeoff the
    // reference makes for roles (R/main.R:19).
    val rowTag = XmlIngest.probeRowTag(spark, inputDir)
    val schema = XmlIngest
      .readFiles(spark, goodFiles.take(structureSampleFiles), rowTag).schema
    // input_file_name() must be stamped BEFORE the cache — it reads from
    // the scan node and returns "" once rows come from the cached relation.
    val raw = XmlIngest
      .readFilesWithSchema(spark, goodFiles, rowTag, schema)
      .withColumn("source_file_path", input_file_name())
      .cache()
    val flat = XmlFlatten.flatten(raw) // lineage string passes through
    val withLineage = XmlIngest.ensureRecordId(
      flat
        .withColumn("source_file_name",
          element_at(split(col("source_file_path"), "/"), -1))
        .withColumn("load_timestamp", lit(loadTs)))

    // 4. business keys from comments (S6)
    val keys = CommentKeys.scan(spark, goodFiles)
    val data = CommentKeys.attach(withLineage, keys)

    // 5. role classification on a bounded sample of files (R/main.R:95)
    val sampleFiles = goodFiles.take(profileSampleFiles)
      .map(f => f.split('/').last)
    val profileCols = data.columns.filterNot(AuditCols)
      .filterNot(c => keys.columns.contains(c)).toSeq
    val sample = data.filter(col("source_file_name").isin(sampleFiles: _*))
    // Role classification needs only approximate distinct counts — the HLL
    // profile is one aggregate pass (no per-value shuffle); the exact
    // profile (with sample values) stays available for explicit profiling.
    val profiled = SchemaProfiler.profileApprox(sample, profileCols).cache()
    val roles = profiled.select("col_name", "classification")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // 6. star transform, global dims (fixes §8 Q3). The fact feeds several
    // actions (write, count, integrity joins) — cache it so each doesn't
    // re-derive from the raw parse.
    val star0 = StarTransformer.build(data, "record_id", roles, runId, loadTs)
    // fact feeds write/count/integrity; dims feed write/join/integrity —
    // cache both (dims are <50 rows each by the classifier contract).
    val star = StarSchema(star0.fact.cache(),
      star0.dims.map { case (n, d) => n -> d.cache() })

    // 7. sinks (R/parquet_writer.R): snappy parquet (dictionary encoding is
    // on by default in Spark's parquet writer)
    val factPath = s"$outputDir/fact_main.parquet"
    star.fact.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(factPath)
    val dimPaths = star.dims.toSeq.sortBy(_._1).map { case (name, dim) =>
      val p = s"$outputDir/dim_$name.parquet"
      // dims are tiny by the classifier contract -> one file
      dim.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("compression", "snappy").parquet(p)
      p
    }
    if (validate && !errorsDf.isEmpty)
      errorsDf.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$outputDir/processing_errors.csv")
    profiled.orderBy("classification", "col_name")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outputDir/schema_documentation.csv")

    // 8. manifest + parquet metadata read-back (S13/S14)
    val rows = star.fact.count()
    val nSkipped = files.size - goodFiles.size
    import spark.implicits._
    Seq((loadTs.toString, files.size, goodFiles.size, nSkipped, rows,
      goodFiles.size.toDouble / files.size, runId))
      .toDF("run_timestamp", "files_total", "files_processed",
        "files_skipped", "fact_rows", "success_rate", "batch_id")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outputDir/processing_manifest.csv")
    val outputs = factPath +: dimPaths
    outputs.map { p =>
      val df = spark.read.parquet(p)
      (p.split('/').last, df.count(), df.columns.length)
    }.toDF("file", "rows", "cols")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outputDir/parquet_metadata.csv")

    raw.unpersist()
    outputs.foreach(p => log.audit(s"wrote $p"))
    log.info(s"processed ${goodFiles.size}/${files.size} files, " +
      s"$rows fact rows, batch_id=$runId")
    val violations = StarTransformer.validateIntegrity(star)
    star.fact.unpersist()
    PipelineReport(files.size, nSkipped, rows, star, violations, outputs)
  }
}
