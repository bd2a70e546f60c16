package graft.xml

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** XML directory ingestion (`R/main.R:80`, `R/xml_parser.R:92-131`):
  * row-tag probing with the reference's candidate list and root-children
  * fallback, stringly-typed read through the native XML source, lineage
  * stamping, and per-file fallback record ids.
  *
  * Scale notes: the probe reads ONE file's prefix on the driver; the read
  * itself is the streaming StAX-based native source (memory bounded per
  * record, one input split per file — or many for a huge file), and lineage
  * columns derive from `input_file_name()` with zero extra IO.
  */
object XmlIngest {

  /** The reference's record XPath alternatives (`R/xml_parser.R:98-103`). */
  val RowTagCandidates: Seq[String] = Seq("record", "Record", "item", "Item")

  /** Reads up to `maxBytes` of one file through the Hadoop FS API (works on
    * any supported filesystem, not just local). */
  def readPrefix(spark: SparkSession, file: String, maxBytes: Int = 65536)
      : String = {
    val path = new Path(file)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](maxBytes)
      var off = 0
      var n = in.read(buf, off, maxBytes - off)
      while (n > 0 && off < maxBytes) { off += n; n = in.read(buf, off, maxBytes - off) }
      new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Lists `*.xml` files under a directory (`R/main.R:80`). */
  def listXmlFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xml"))
      .map(_.getPath.toString)
      .sorted
  }

  /** Row tag of ONE document prefix, streamed with StAX: first element
    * matching a candidate (anywhere, like the `.//record` XPath), else the
    * first child-of-root element (the reference's fallback). Candidates
    * match on LOCAL name, but the returned tag is the QUALIFIED name as
    * written in the document (`cat:record`) — the XML source matches row
    * tags verbatim, so a namespaced corpus needs the prefix (the
    * reference's prefix-less `.//record` XPath would find nothing). None
    * for a prefix with no second-level element (empty root / not XML). */
  def rowTagOfPrefix(prefix: String): Option[String] = {
    val fac = XMLInputFactory.newInstance()
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = fac.createXMLStreamReader(new StringReader(prefix))
    var depth = 0
    var firstChildOfRoot: Option[String] = None
    def qualified: String =
      Option(r.getPrefix).filter(_.nonEmpty)
        .map(p => s"$p:${r.getLocalName}").getOrElse(r.getLocalName)
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            if (RowTagCandidates.contains(r.getLocalName)) return Some(qualified)
            if (depth == 2 && firstChildOfRoot.isEmpty)
              firstChildOfRoot = Some(qualified)
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ =>
        }
      }
    } catch {
      // prefix may cut mid-document — whatever was seen is enough
      case _: javax.xml.stream.XMLStreamException =>
    } finally r.close()
    firstChildOfRoot
  }

  /** Row tag of the FIRST file in a directory (the fast single-tag path;
    * mixed-tag corpora need [[probeRowTags]] — the reference applies its
    * XPath PER FILE, `R/xml_parser.R:98-103`). */
  def probeRowTag(spark: SparkSession, dir: String): String = {
    val files = listXmlFiles(spark, dir)
    require(files.nonEmpty, s"no *.xml files in $dir")
    rowTagOfPrefix(readPrefix(spark, files.head)).getOrElse(
      throw new IllegalArgumentException(s"no records found in ${files.head}"))
  }

  /** Fused per-file prefix probe for a whole batch, run DISTRIBUTED (ONE
    * prefix read per file — O(files), not O(bytes) — yielding BOTH facts a
    * grouped read needs): `file -> (declared charset, row tag if any)`.
    * The prolog is sniffed from the raw bytes (ASCII-safe under any
    * declarable charset), then the prefix is decoded with that charset
    * before the row-tag probe. `None` row tag means no discoverable
    * second-level element (empty root, not XML, unreadable) — callers
    * skip those files, as the reference's per-file error isolation does.
    * [[probeEncodings]] / [[probeRowTags]] are views over this; the
    * pipeline's no-validation path calls it ONCE instead of twice. */
  def probePrefixes(spark: SparkSession, files: Seq[String])
      : Map[String, (String, Option[String])] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    files.toDS().mapPartitions { it =>
      it.map { f =>
        val (enc, tag) = try {
          val path = new org.apache.hadoop.fs.Path(f)
          val fs = path.getFileSystem(conf.value)
          val in = fs.open(path)
          val raw = try {
            val buf = new Array[Byte](65536)
            var off = 0
            var n = in.read(buf, off, buf.length - off)
            while (n > 0 && off < buf.length) {
              off += n; n = in.read(buf, off, buf.length - off)
            }
            java.util.Arrays.copyOf(buf, off)
          } finally in.close()
          val prolog = new String(raw, 0, math.min(raw.length, 256),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val declared = sniffDeclaredEncoding(prolog)
          val cs = try {
            java.nio.charset.Charset.forName(declared.getOrElse("UTF-8"))
          } catch { case _: IllegalArgumentException =>
            java.nio.charset.StandardCharsets.UTF_8
          }
          (declared.getOrElse("UTF-8"), rowTagOfPrefix(new String(raw, cs)))
        } catch { case _: java.io.IOException => ("UTF-8", None) }
        (f, enc, tag)
      }
    }.collect().map { case (f, enc, tag) => f -> (enc, tag) }.toMap
  }

  /** Per-file row tags for a whole batch (the reference applies its
    * record XPath per file, `R/xml_parser.R:98-103`, so a corpus mixing
    * `<record>` files with `<item>` files parses BOTH; probing only the
    * first file would silently drop every minority-tag file's rows).
    * Files with no discoverable tag are absent from the map. A view over
    * [[probePrefixes]] — callers needing charsets too should call that
    * once instead. */
  def probeRowTags(spark: SparkSession, files: Seq[String])
      : Map[String, String] =
    probePrefixes(spark, files)
      .collect { case (f, (_, Some(tag))) => f -> tag }

  private val EncodingDeclRe = "encoding=[\"']([A-Za-z0-9._-]+)[\"']".r

  /** Declared encoding in an XML prolog prefix, if any. ASCII-safe: every
    * encoding a declaration can name preserves the ASCII prolog bytes, so
    * the prefix may be decoded with any ASCII-superset charset before
    * sniffing. */
  def sniffDeclaredEncoding(head: String): Option[String] =
    EncodingDeclRe.findFirstMatchIn(head).map(_.group(1))

  /** Declared encoding of ONE file's XML declaration (`encoding="..."`);
    * UTF-8 when absent. The XML source decodes with ITS option, not the
    * declaration — without this a Latin-1 corpus silently reads as
    * mojibake. */
  def probeEncoding(spark: SparkSession, file: String): String = {
    val head = readPrefix(spark, file, maxBytes = 256)
    sniffDeclaredEncoding(head).getOrElse("UTF-8")
  }

  /** Per-file declared encodings for a whole batch. Files without a
    * declaration map to UTF-8. A corpus may legally mix per-file encodings
    * (ADVICE r2): one file's declaration says nothing about its siblings.
    * A view over [[probePrefixes]] — callers needing row tags too should
    * call that once instead. */
  def probeEncodings(spark: SparkSession, files: Seq[String])
      : Map[String, String] =
    probePrefixes(spark, files).map { case (f, (enc, _)) => f -> enc }

  /** Stringly-typed structured read of an XML directory. */
  def read(spark: SparkSession, dir: String, rowTag: String,
      charset: String = "UTF-8"): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("encoding", charset)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .option("inferSchema", "false") // stringly typed, like the reference
      .option("pathGlobFilter", "*.xml")
      .load(dir)

  /** Same, over an explicit file list (the post-validation good files). */
  def readFiles(spark: SparkSession, files: Seq[String], rowTag: String,
      charset: String = "UTF-8")
      : DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("encoding", charset)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .option("inferSchema", "false")
      .load(files: _*)

  /** Read with an explicit schema — skips the source's structure-discovery
    * pass over the data entirely. */
  def readFilesWithSchema(spark: SparkSession, files: Seq[String],
      rowTag: String, schema: org.apache.spark.sql.types.StructType,
      charset: String = "UTF-8")
      : DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("encoding", charset)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .schema(schema)
      .load(files: _*)

  /** Structured read of a file batch whose members may declare DIFFERENT
    * encodings (`charsets`: per-file declared encoding, e.g. from
    * [[probeEncodings]] or the fused validation scan; unlisted files
    * default to UTF-8). The XML source takes ONE `encoding` option per
    * read, so the batch reads once per distinct charset — almost always
    * exactly one group — unioned by name under the schema inferred from a
    * bounded sample of the LARGEST group. Lineage (`source_file_path`) is
    * stamped per group, before any union/cache (input_file_name() reads
    * the scan node and returns "" from a cached relation). */
  def readFilesGroupedByCharset(
      spark: SparkSession,
      files: Seq[String],
      rowTag: String,
      charsets: Map[String, String],
      structureSampleFiles: Int = 16,
      logMixed: String => Unit = _ => ()): DataFrame = {
    val groups = files
      .groupBy(f => charsets.getOrElse(f, "UTF-8")).toSeq
      .sortBy(-_._2.size)
    if (groups.size > 1)
      logMixed(groups.map { case (cs, fs) => s"$cs(${fs.size})" }
        .mkString(", "))
    val (mainCharset, mainFiles) = groups.head
    val schema = readFiles(
      spark, mainFiles.take(structureSampleFiles), rowTag, mainCharset)
      .schema
    groups.map { case (cs, fs) =>
      readFilesWithSchema(spark, fs, rowTag, schema, cs)
        .withColumn("source_file_path", input_file_name())
    }.reduce(_.unionByName(_))
  }

  /** Structured read of a file batch whose members may use DIFFERENT row
    * tags (and, within a tag, different charsets): one
    * [[readFilesGroupedByCharset]] read per distinct tag, unioned by name
    * with missing-column fill — restoring the reference's per-file XPath
    * semantics (`R/xml_parser.R:98-103`), where a directory mixing
    * `<record>` files with `<item>` files parses ALL of them. Tag groups
    * union largest-first, so the dominant tag's columns lead the schema.
    * Files absent from `rowTags` (no discoverable records) are excluded —
    * the caller logs them. Almost always exactly one tag group, so the
    * single-tag corpus pays nothing beyond the per-file probe.
    * `logInfo` receives complete messages (unlike the per-charset
    * helper's group-list-only callback). */
  def readFilesGrouped(
      spark: SparkSession,
      files: Seq[String],
      rowTags: Map[String, String],
      charsets: Map[String, String],
      structureSampleFiles: Int = 16,
      logInfo: String => Unit = _ => ()): DataFrame = {
    val tagGroups = files.filter(rowTags.contains)
      .groupBy(rowTags).toSeq
      .sortBy { case (tag, fs) => (-fs.size, tag) }
    require(tagGroups.nonEmpty,
      s"no records found in any of ${files.size} files")
    if (tagGroups.size > 1)
      logInfo("mixed row tags: " + tagGroups
        .map { case (tag, fs) => s"<$tag>(${fs.size})" }.mkString(", "))
    tagGroups.map { case (tag, fs) =>
      readFilesGroupedByCharset(spark, fs, tag, charsets,
        structureSampleFiles,
        gs => logInfo(s"mixed per-file encodings (<$tag>): $gs"))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Audit/lineage columns (`R/xml_parser.R:332-335`); the load timestamp is
    * injected for reproducibility (SURVEY.md §8 Q6). */
  def withLineage(df: DataFrame, loadTs: java.sql.Timestamp): DataFrame =
    df.withColumn("source_file_path", input_file_name())
      .withColumn("source_file_name",
        element_at(split(input_file_name(), "/"), -1))
      .withColumn("load_timestamp", lit(loadTs))

  /** Fallback record ids when the XML carries no `id` attribute: sequential
    * per file in document order (fixes the reference's per-chunk restart,
    * SURVEY.md §8 Q4). Requires lineage columns.
    *
    * SCALE CONSTRAINT: the `partitionBy(source_file_path)` window shuffles
    * the whole dataset and puts each FILE into ONE reducer partition — fine
    * for many-small-files corpora (the reference's shape), pathological for
    * one multi-split giant file. For that case use
    * [[ensureRecordIdNoShuffle]], which assigns the same dense per-file ids
    * with two narrow passes and zero shuffle. */
  def ensureRecordId(df: DataFrame): DataFrame =
    if (df.columns.contains("id"))
      df.withColumn("record_id", col("id"))
    else
      df.withColumn("record_id",
        row_number().over(Window.partitionBy(col("source_file_path"))
          .orderBy(monotonically_increasing_id())).cast("string"))

  /** Shuffle-free dense per-file record ids (the scale path for huge or
    * skewed files): pass 1 collects per-(partition, file) row COUNTS (tiny
    * — a partition touches few files), the driver turns them into start
    * offsets, pass 2 stamps offset + local counter. Both passes are narrow;
    * the data never moves. Requires a DETERMINISTIC input (a file scan or a
    * cached plan) so the two passes see identical partitioning — the same
    * contract `zipWithIndex` has. Ids are dense 1..n per file in partition
    * order, which for a file-split scan is document order. */
  def ensureRecordIdNoShuffle(df: DataFrame): DataFrame = {
    if (df.columns.contains("id")) return df.withColumn("record_id", col("id"))
    val spark = df.sparkSession
    val pathIdx = df.schema.fieldIndex("source_file_path")
    val counts: Array[(Int, Seq[(String, Long)])] =
      df.rdd.mapPartitionsWithIndex { (pid, it) =>
        val perFile = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { r =>
          val f = r.getString(pathIdx)
          perFile(f) = perFile.getOrElse(f, 0L) + 1L
        }
        Iterator.single(pid -> perFile.toSeq)
      }.collect()
    val offsets = {
      val running = scala.collection.mutable.Map[String, Long]()
      val m = Map.newBuilder[(Int, String), Long]
      counts.sortBy(_._1).foreach { case (pid, files) =>
        files.foreach { case (f, n) =>
          val prev = running.getOrElse(f, 0L)
          m += ((pid, f) -> prev)
          running(f) = prev + n
        }
      }
      m.result()
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = df.schema.add("record_id",
      org.apache.spark.sql.types.StringType, nullable = false)
    val tagged = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.Map[String, Long]()
      it.map { r =>
        val f = r.getString(pathIdx)
        val n = local.getOrElse(f, 0L) + 1L
        local(f) = n
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ (bc.value.getOrElse((pid, f), 0L) + n).toString)
      }
    }
    spark.createDataFrame(tagged, outSchema)
  }
}
