package graft.xml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming twin of the batch XML pipeline: continuous ingest of a
  * DROP DIRECTORY (files land over time; each is parsed once, flattened
  * with the reference's rule, and appended to a parquet sink
  * exactly-once) — the deployment shape the reference serves with cron
  * re-runs over "new files" (`R/main.R` directory scan), re-expressed as
  * a Structured Streaming file source.
  *
  * Division of labor with the batch pipeline:
  *  - a STREAM needs a fixed schema and a plan with no data-dependent
  *    jobs, so the two data-dependent steps of the batch read — XML
  *    structure discovery and [[XmlFlatten.maxRepetitions]] — run ONCE at
  *    stream setup over a bounded batch sample of files already present
  *    ([[setup]]); the per-microbatch work is then pure projection
  *    ([[XmlFlatten.flattenWithMaxLens]]), exactly as scale demands: a
  *    late file whose structure exceeds the sampled schema fills missing
  *    columns with null / truncates extra repetitions rather than
  *    re-planning mid-stream (grow the sample, or restart with a fresh
  *    setup, to widen).
  *  - record ids are CONTENT-derived (`record_id` = md5 of the source
  *    path + every flattened column) instead of the batch pipeline's
  *    per-file sequence: restart-stable and idempotent-sink-friendly,
  *    but positionless — identical records within one file share an id
  *    (documented divergence; batch ingestion keeps positional ids).
  *  - single row tag + charset per stream (the file source takes one of
  *    each): [[setup]] picks the DOMINANT (tag, charset) of the probed
  *    corpus and reports every minority group in [[Setup.otherGroups]] —
  *    a minority-tag file IS read by this stream but yields zero records
  *    (its row tag never matches). A caller seeing a non-empty
  *    `otherGroups` runs the PER-GROUP path instead: [[setupGroups]] +
  *    [[drainGroups]] spawn one records+sink pair per (tag, charset)
  *    group under shared output/checkpoint roots, reaching parity with
  *    the batch grouped read ([[XmlIngest.readFilesGrouped]]);
  *    [[readGroups]] reunifies the group sinks by name with null fill.
  *    Silently dropping minority tags is the reference-divergent
  *    data-loss mode the batch path fixed — the streaming path covers
  *    it per group, and the single-group setup still SURFACES it.
  *
  * 100 TB notes: the file-source maxFilesPerTrigger option bounds each
  * micro-batch; the parquet sink's transaction log gives exactly-once
  * appends across restarts (asserted by the replay test); no shuffle
  * anywhere in the stream — ingest parallelism is file-granular, like
  * the batch read.
  */
object XmlStream {

  /** Everything a stream needs that must be fixed before it starts —
    * probed/inferred from files already in the directory. */
  final case class Setup(
      rowTag: String,
      charset: String,
      schema: StructType,
      maxLens: Map[String, Int],
      /** Minority (tag, charset) groups present at setup with their file
        * counts — files THIS stream reads but yields no records for (see
        * object Scaladoc). Empty for the common single-tag corpus. */
      otherGroups: Seq[(String, String, Int)] = Nil)

  /** One-time stream setup from a bounded sample of the files already
    * present: dominant (row tag, charset) via the fused prefix probe,
    * XML structure from `sampleFiles` of that group (the batch
    * pipeline's SCHEMA_SAMPLE_SIZE bound, `R/main.R:19,95`), max
    * repetitions from the same sample read. */
  def setup(spark: SparkSession, dir: String, sampleFiles: Int = 16)
      : Setup = {
    val groups = probeGroups(spark, dir)
    val ((tag, enc), groupFiles) = groups.head
    val sample = XmlIngest.readFiles(
      spark, groupFiles.take(sampleFiles), tag, enc)
    Setup(tag, enc, sample.schema, XmlFlatten.maxRepetitions(sample),
      groups.tail.map { case ((t, e), fs) => (t, e, fs.size) })
  }

  /** The (tag, charset) groups present in `dir`, dominant first, with
    * their member files — the shared probe behind [[setup]] (dominant
    * group only) and [[setupGroups]] (all of them). */
  private def probeGroups(spark: SparkSession, dir: String)
      : Seq[((String, String), Seq[String])] = {
    val files = XmlIngest.listXmlFiles(spark, dir)
    require(files.nonEmpty, s"no *.xml files in $dir to sample a schema from")
    val probed = XmlIngest.probePrefixes(spark, files)
    val groups = probed.toSeq
      .collect { case (f, (enc, Some(tag))) => (tag, enc) -> f }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy { case ((tag, enc), fs) => (-fs.size, tag, enc) }
    require(groups.nonEmpty, s"no records found in any of ${files.size} files")
    groups
  }

  /** One [[Setup]] PER (tag, charset) group in the directory — the
    * streaming twin of the batch grouped read
    * ([[XmlIngest.readFilesGrouped]]), closing the mixed-corpus gap the
    * single-group [[setup]] only SURFACES via `otherGroups`: drive each
    * returned setup through its own [[records]]+[[sink]] pair (see
    * [[drainGroups]]) and every record in a mixed drop directory lands,
    * exactly like the batch path. Each setup's `otherGroups` lists its
    * siblings, so per-group monitoring keeps the full picture. */
  def setupGroups(spark: SparkSession, dir: String, sampleFiles: Int = 16)
      : Seq[Setup] = {
    val groups = probeGroups(spark, dir)
    groups.map { case ((tag, enc), groupFiles) =>
      val sample = XmlIngest.readFiles(
        spark, groupFiles.take(sampleFiles), tag, enc)
      Setup(tag, enc, sample.schema, XmlFlatten.maxRepetitions(sample),
        groups.collect { case ((t, e), fs) if (t, e) != ((tag, enc)) =>
          (t, e, fs.size)
        })
    }
  }

  /** The streaming flattened-record source: one row per XML record in
    * files that LAND in `dir`, flattened + lineage-stamped like the batch
    * pipeline. Pure projection per micro-batch (no jobs, no shuffle).
    * `load_timestamp` is each record's processing time (the batch
    * pipeline stamps one run-level timestamp; a stream has no single
    * run). `maxFilesPerTrigger` bounds micro-batch size (0 = unbounded). */
  def records(
      spark: SparkSession,
      dir: String,
      s: Setup,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.format("xml")
      .option("rowTag", s.rowTag)
      .option("encoding", s.charset)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .option("pathGlobFilter", "*.xml")
      .schema(s.schema)
    val withTrigger =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    // flatten is pure projection over the scan, so input_file_name still
    // resolves after it; the content-derived id hashes every data column
    // (null-safe: control-char separator/sentinel cannot occur in parsed
    // XML text, so distinct rows cannot collide)
    val flat = XmlFlatten.flattenWithMaxLens(
      withTrigger.load(dir), s.maxLens)
      .withColumn("source_file_path", input_file_name())
      .withColumn("source_file_name",
        element_at(split(input_file_name(), "/"), -1))
      .withColumn("load_timestamp", current_timestamp())
    val dataCols = flat.columns
      .filterNot(Set("load_timestamp").contains)
      .map(c => coalesce(col(s"`$c`").cast("string"), lit("\u0000")))
    flat.withColumn("record_id", md5(concat_ws("\u0001", dataCols.toSeq: _*)))
  }

  /** Persist a [[Setup]] as JSON (schema via Spark's own schema-JSON
    * form) so repeated drains of the same drop directory REUSE the
    * first run's setup instead of re-deriving it: (1) the per-invocation
    * O(files) prefix probe disappears — a cron drain then pays only the
    * source's own listing plus the new files' parse; (2) more
    * importantly, the sink SCHEMA stays stable by construction — a late
    * burst of minority-tag files could otherwise flip the dominant tag
    * on re-probe and write a different schema into the same parquet
    * directory. Schema evolution is an explicit operator action (delete
    * the setup file + restart), never an accident of arrival order. */
  def saveSetup(s: Setup, path: String): Unit = {
    import org.json4s.JsonDSL._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("rowTag" -> s.rowTag) ~ ("charset" -> s.charset) ~
          ("schemaJson" -> s.schema.json) ~ ("maxLens" -> s.maxLens)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** Load a [[Setup]] written by [[saveSetup]]; None when absent.
    * `otherGroups` is deliberately NOT persisted — it is a point-in-time
    * observation, not configuration. */
  def loadSetup(path: String): Option[Setup] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val j = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(p))
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      Some(Setup(
        (j \ "rowTag").extract[String],
        (j \ "charset").extract[String],
        org.apache.spark.sql.types.DataType
          .fromJson((j \ "schemaJson").extract[String])
          .asInstanceOf[StructType],
        (j \ "maxLens").extract[Map[String, Int]]))
    }
  }

  /** Streaming companion to [[records]] for the VALIDATION half of the
    * batch pipeline: one verdict row per file landing in `dir`, via the
    * same per-file `validateAuto` chain (internal-DTD sniff → 5-location
    * XSD/DTD resolution → well-formedness fallback) the batch scan runs.
    * Built on the binaryFile source (file-granular, like validation
    * itself; the source's read of the bytes is the same order of work as
    * the SAX parse). Feed it the SAME checkpoint discipline as the
    * ingest sink and each file is validated exactly once — a standing
    * `validation_report` that grows as files land, without the batch
    * re-scan of old files. */
  def validationStream(
      spark: SparkSession,
      dir: String,
      schemaDir: String): DataFrame = {
    import spark.implicits._
    // the binaryFile source's fixed schema, stated explicitly (streaming
    // sources don't infer); only `path` is consumed downstream
    val binSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .schema(binSchema)
      .load(dir)
      .select($"path")
      .as[String]
      .mapPartitions(_.map { p =>
        val v = XmlValidation.validateAuto(p, schemaDir)
        (v.file,
          v.valid.map(b => if (b) "valid" else "invalid")
            .getOrElse("no_schema"),
          v.errors.mkString("; "),
          v.schemaUsed.getOrElse(""))
      })
      .toDF("file", "verdict", "errors", "schema_used")
  }

  /** Exactly-once parquet append sink for [[records]]: the parquet sink's
    * transaction log (under `checkpointDir`) deduplicates replayed
    * batches across restarts. `Trigger.AvailableNow` drains everything
    * currently in the directory then stops — the cron-shaped deployment
    * (the reference's scheduled re-run, minus its re-parse of old
    * files); omit it (`continuous = true`) for a long-running ingest.
    * Note `continuous = true` means an UNBOUNDED MICRO-BATCH stream
    * (default ProcessingTime(0) trigger), not `Trigger.Continuous`. */
  def sink(
      df: DataFrame,
      outDir: String,
      checkpointDir: String,
      continuous: Boolean = false): StreamingQuery = {
    val w = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
    (if (continuous) w else w.trigger(Trigger.AvailableNow())).start()
  }

  /** Filesystem-safe directory name for a (tag, charset) group. The
    * sanitized name alone can collide across distinct groups (tag "a-b"
    * charset "c" and tag "a" charset "b-c" both sanitize to `a_b_c`, and
    * a collision would silently share one sink directory AND checkpoint
    * between two streams), so an 8-hex md5 of the RAW pair — injective
    * up to hash collision — is appended to keep ids distinct. */
  def groupId(s: Setup): String = {
    val raw = s"${s.rowTag}\u0000${s.charset}"
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val sane =
      s"${s.rowTag}_${s.charset}".map(c => if (c.isLetterOrDigit) c else '_')
    s"${sane}_$h"
  }

  /** One [[records]]+[[sink]] pair PER group under shared output /
    * checkpoint roots: group g writes `outRoot/groupId(g)` with
    * checkpoint `checkpointRoot/groupId(g)` — separate sinks because
    * each group has its own fixed schema (a parquet streaming sink must
    * not see two); separate checkpoints because a checkpoint belongs to
    * exactly one query. Together the streams reach batch-read parity on
    * a mixed drop directory: every record of every group lands
    * exactly-once ([[readGroups]] reunifies them).
    *
    * Cost note, stated rather than hidden: the XML file source cannot
    * pre-filter by row tag, so each group's stream reads EVERY file and
    * discards non-matching ones — a G-group corpus pays G file scans.
    * Real mixed corpora have single-digit G; at larger G (or huge
    * files), partition the drop directory by convention so each stream
    * gets its own subdirectory, or run the batch grouped read.
    *
    * Returns the started queries paired with their setups; with the
    * default AvailableNow trigger, `awaitTermination()` each to complete
    * the drain. */
  def drainGroups(
      spark: SparkSession,
      dir: String,
      setups: Seq[Setup],
      outRoot: String,
      checkpointRoot: String,
      maxFilesPerTrigger: Int = 0,
      continuous: Boolean = false): Seq[(Setup, StreamingQuery)] =
    setups.map { s =>
      val gid = groupId(s)
      (s, sink(records(spark, dir, s, maxFilesPerTrigger),
        s"$outRoot/$gid", s"$checkpointRoot/$gid", continuous))
    }

  /** Batch-parity union read over every group sink under `outRoot`:
    * union-by-name with null fill across the per-group schemas — the
    * same shape [[XmlIngest.readFilesGrouped]] produces for the batch
    * path. Group subdirectories that exist but have produced no data
    * yet are skipped. */
  def readGroups(spark: SparkSession, outRoot: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
      .sorted
      .flatMap { p =>
        try Some(spark.read.parquet(p))
        catch { case scala.util.control.NonFatal(_) => None } // empty sink
      }
    require(parts.nonEmpty, s"no group outputs under $outRoot")
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
