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

  /** Determines the row tag by streaming the first file's prefix: first
    * element matching a candidate (anywhere, like the `.//record` XPath),
    * else the first child-of-root element (the reference's fallback). */
  def probeRowTag(spark: SparkSession, dir: String): String = {
    val files = listXmlFiles(spark, dir)
    require(files.nonEmpty, s"no *.xml files in $dir")
    val prefix = readPrefix(spark, files.head)
    val fac = XMLInputFactory.newInstance()
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = fac.createXMLStreamReader(new StringReader(prefix))
    var depth = 0
    var firstChildOfRoot: Option[String] = None
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            depth += 1
            val name = r.getLocalName
            if (RowTagCandidates.contains(name)) return name
            if (depth == 2 && firstChildOfRoot.isEmpty)
              firstChildOfRoot = Some(name)
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ =>
        }
      }
    } catch {
      // prefix may cut mid-document — whatever was seen is enough
      case _: javax.xml.stream.XMLStreamException =>
    } finally r.close()
    firstChildOfRoot.getOrElse(
      throw new IllegalArgumentException(s"no records found in ${files.head}"))
  }

  /** Stringly-typed structured read of an XML directory. */
  def read(spark: SparkSession, dir: String, rowTag: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .option("inferSchema", "false") // stringly typed, like the reference
      .option("pathGlobFilter", "*.xml")
      .load(dir)

  /** Same, over an explicit file list (the post-validation good files). */
  def readFiles(spark: SparkSession, files: Seq[String], rowTag: String)
      : DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .option("inferSchema", "false")
      .load(files: _*)

  /** Read with an explicit schema — skips the source's structure-discovery
    * pass over the data entirely. */
  def readFilesWithSchema(spark: SparkSession, files: Seq[String],
      rowTag: String, schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .schema(schema)
      .load(files: _*)

  /** Audit/lineage columns (`R/xml_parser.R:332-335`); the load timestamp is
    * injected for reproducibility (SURVEY.md §8 Q6). */
  def withLineage(df: DataFrame, loadTs: java.sql.Timestamp): DataFrame =
    df.withColumn("source_file_path", input_file_name())
      .withColumn("source_file_name",
        element_at(split(input_file_name(), "/"), -1))
      .withColumn("load_timestamp", lit(loadTs))

  /** Fallback record ids when the XML carries no `id` attribute: sequential
    * per file in document order (fixes the reference's per-chunk restart,
    * SURVEY.md §8 Q4). Requires lineage columns. */
  def ensureRecordId(df: DataFrame): DataFrame =
    if (df.columns.contains("id"))
      df.withColumn("record_id", col("id"))
    else
      df.withColumn("record_id",
        row_number().over(Window.partitionBy(col("source_file_path"))
          .orderBy(monotonically_increasing_id())).cast("string"))
}
