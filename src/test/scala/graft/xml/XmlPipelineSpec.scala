package graft.xml

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixtures are written by the test itself (own content, reference-shaped:
  * flat records with attributes; nested blocks; repeated elements; a
  * business-key comment; a malformed file; an XSD). Golden expectations are
  * hand-derived from the SURVEY.md §1.4 flattening semantics. */
class XmlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-03-04 05:06:07")

  private def writeFixtures(dir: Path): Unit = {
    Files.writeString(dir.resolve("catalog1.xml"),
      """<?xml version="1.0"?>
        |<!-- Division:North -->
        |<catalog>
        |  <record id="1" status="active">
        |    <title>Alpha</title>
        |    <price>10.50</price>
        |    <detail>
        |      <total>31.50</total>
        |      <qty>3</qty>
        |    </detail>
        |    <tag>red</tag>
        |    <tag>blue</tag>
        |  </record>
        |  <record id="2" status="retired">
        |    <title>Beta</title>
        |    <price>7.25</price>
        |    <detail>
        |      <total>7.25</total>
        |      <qty>1</qty>
        |    </detail>
        |    <tag>green</tag>
        |  </record>
        |</catalog>
        |""".stripMargin)
    Files.writeString(dir.resolve("catalog2.xml"),
      """<?xml version="1.0"?>
        |<catalog>
        |  <record id="3" status="active">
        |    <title>Gamma</title>
        |    <price>99.00</price>
        |    <detail>
        |      <total>99.00</total>
        |      <qty>1</qty>
        |    </detail>
        |    <tag>red</tag>
        |  </record>
        |</catalog>
        |""".stripMargin)
    Files.writeString(dir.resolve("broken.xml"),
      "<catalog><record id=\"9\"><title>Oops</title></catalog>\n")
  }

  private def mkPipelineDirs(): (Path, Path, Path) = {
    val in = Files.createTempDirectory("graft_xml_in")
    val out = Files.createTempDirectory("graft_xml_out")
    val schemas = Files.createTempDirectory("graft_schemas")
    writeFixtures(in)
    (in, out, schemas)
  }

  test("flatten: depth-1 leaves, depth-2 collapse, repeated names, attrs") {
    val (in, _, _) = mkPipelineDirs()
    val raw = XmlIngest.readFiles(spark,
      Seq(in.resolve("catalog1.xml").toString), "record")
    val flat = XmlFlatten.flatten(raw)
    // attributes first (prefix stripped), then elements in schema order,
    // repeated <tag> as tag, tag.1
    assert(flat.columns.toSet ==
      Set("id", "status", "title", "price", "detail", "tag", "tag.1"))
    val r1 = flat.filter($"id" === "1").head()
    assert(r1.getAs[String]("title") == "Alpha")
    assert(r1.getAs[String]("price") == "10.50")
    // depth-2 block collapsed to space-joined grandchildren text (schema
    // order: qty sorts before total — see XmlFlatten divergence note 2)
    assert(r1.getAs[String]("detail") == "3 31.50")
    assert(r1.getAs[String]("tag") == "red")
    assert(r1.getAs[String]("tag.1") == "blue")
    val r2 = flat.filter($"id" === "2").head()
    assert(r2.getAs[String]("tag.1") == null) // single tag -> null overflow
  }

  test("probeRowTag finds candidate tags and root-children fallback") {
    val (in, _, _) = mkPipelineDirs()
    assert(XmlIngest.probeRowTag(spark, in.toString) == "record")
    val other = Files.createTempDirectory("graft_xml_other")
    Files.writeString(other.resolve("data.xml"),
      "<root><thing><a>1</a></thing><thing><a>2</a></thing></root>\n")
    assert(XmlIngest.probeRowTag(spark, other.toString) == "thing")
  }

  test("comment business keys are scanned and attached per file") {
    val (in, _, _) = mkPipelineDirs()
    val files = XmlIngest.listXmlFiles(spark, in.toString)
    val keys = CommentKeys.scan(spark, files)
    val got = keys.collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "Division")
    assert(got.head.getString(2) == "North")
    assert(CommentKeys.extractFromContent("<!-- not a key -->") == None)
    assert(CommentKeys.extractFromContent("<!--  Zone:East  -->") ==
      Some(("Zone", "East")))
  }

  test("validation: malformed file is flagged, others pass") {
    val (in, _, schemas) = mkPipelineDirs()
    val files = XmlIngest.listXmlFiles(spark, in.toString)
    val verdicts = XmlValidation
      .validateBatch(spark, files, schemas.toString)
      .collect().map(r => r.getString(0).split('/').last -> r.getString(1))
      .toMap
    assert(verdicts("broken.xml") == "invalid")
    assert(verdicts("catalog1.xml") == "no_schema") // well-formed, no schema
    assert(verdicts("catalog2.xml") == "no_schema")
  }

  test("XSD validation verdicts and 5-location schema resolution") {
    val (in, _, schemas) = mkPipelineDirs()
    val xsd =
      """<?xml version="1.0"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="catalog">
        |    <xs:complexType><xs:sequence>
        |      <xs:element name="record" maxOccurs="unbounded">
        |        <xs:complexType>
        |          <xs:sequence>
        |            <xs:element name="title" type="xs:string"/>
        |            <xs:element name="price" type="xs:decimal"/>
        |            <xs:element name="detail">
        |              <xs:complexType><xs:sequence>
        |                <xs:element name="total" type="xs:decimal"/>
        |                <xs:element name="qty" type="xs:integer"/>
        |              </xs:sequence></xs:complexType>
        |            </xs:element>
        |            <xs:element name="tag" type="xs:string" maxOccurs="unbounded"/>
        |          </xs:sequence>
        |          <xs:attribute name="id" type="xs:string"/>
        |          <xs:attribute name="status" type="xs:string"/>
        |        </xs:complexType>
        |      </xs:element>
        |    </xs:sequence></xs:complexType>
        |  </xs:element>
        |</xs:schema>
        |""".stripMargin
    Files.writeString(schemas.resolve("default.xsd"), xsd)
    val f = in.resolve("catalog2.xml").toString
    // resolution: no <base>.xsd / schema.xsd anywhere -> default.xsd
    assert(XmlValidation.findSchemaFile(f, "xsd", schemas.toString)
      .exists(_.endsWith("default.xsd")))
    // specific schema takes priority once present
    Files.writeString(schemas.resolve("catalog2.xsd"), xsd)
    assert(XmlValidation.findSchemaFile(f, "xsd", schemas.toString)
      .exists(_.endsWith("catalog2.xsd")))
    assert(XmlValidation.validateXsd(f, schemas.resolve("catalog2.xsd")
      .toString).valid.contains(true))
    // a file violating the schema (comment fixture lacks nothing — make one)
    val badDir = Files.createTempDirectory("graft_bad")
    Files.writeString(badDir.resolve("bad.xml"),
      "<catalog><record id=\"7\"><title>NoPrice</title></record></catalog>\n")
    val v = XmlValidation.validateXsd(badDir.resolve("bad.xml").toString,
      schemas.resolve("default.xsd").toString)
    assert(v.valid.contains(false) && v.errors.nonEmpty)
  }

  private def catalogXml(ids: Range, statuses: Seq[String]): String = {
    val recs = ids.map { i =>
      val st = statuses(i % statuses.size)
      s"""  <record id="$i" status="$st"><title>T$i</title><price>${i * 1.5}</price></record>"""
    }
    s"""<?xml version="1.0"?>\n<catalog>\n${recs.mkString("\n")}\n</catalog>\n"""
  }

  test("incremental: ledger skip, fact append, stable merged dim keys") {
    val in = Files.createTempDirectory("graft_inc_in")
    val out = Files.createTempDirectory("graft_inc_out")
    val schemas = Files.createTempDirectory("graft_inc_sch")
    Files.writeString(in.resolve("a.xml"),
      catalogXml(1 to 40, Seq("active", "retired", "pending")))
    val r1 = XmlPipeline.process(spark, in.toString, out.toString,
      schemas.toString, runId = 1L, loadTs = ts)
    assert(r1.rows == 40)
    val dim1 = spark.read.parquet(s"$out/dim_status.parquet")
      .select("status_key", "status").as[(Int, String)].collect().toMap
    assert(dim1.size == 3)

    // new file arrives, carrying a NEW status value
    Files.writeString(in.resolve("b.xml"),
      catalogXml(41 to 50, Seq("active", "archived")))
    val r2 = XmlPipeline.processIncremental(spark, in.toString, out.toString,
      schemas.toString, runId = 2L, loadTs = ts)
    assert(r2.rows == 10) // only the new file's records
    val fact = spark.read.parquet(s"$out/fact_main.parquet")
    assert(fact.count() == 50)
    val dim2 = spark.read.parquet(s"$out/dim_status.parquet")
      .select("status_key", "status").as[(Int, String)].collect().toMap
    assert(dim2.size == 4)
    // old keys unchanged; the new value keyed above the max
    dim1.foreach { case (k, v) => assert(dim2(k) == v) }
    assert(dim2.maxBy(_._1)._2 == "archived")
    // batch ids distinguish the runs in the appended fact
    assert(fact.select("batch_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L))

    // third run with nothing new: everything skipped
    val r3 = XmlPipeline.processIncremental(spark, in.toString, out.toString,
      schemas.toString, runId = 3L, loadTs = ts)
    assert(r3.rows == 0)
    assert(spark.read.parquet(s"$out/fact_main.parquet").count() == 50)
  }

  test("DTD validation: internal DOCTYPE drives the verdict") {
    val dir = Files.createTempDirectory("graft_dtd")
    Files.writeString(dir.resolve("good.xml"),
      """<?xml version="1.0"?>
        |<!DOCTYPE catalog [
        |  <!ELEMENT catalog (record+)>
        |  <!ELEMENT record (title)>
        |  <!ELEMENT title (#PCDATA)>
        |  <!ATTLIST record id CDATA #REQUIRED>
        |]>
        |<catalog><record id="1"><title>ok</title></record></catalog>
        |""".stripMargin)
    Files.writeString(dir.resolve("bad.xml"),
      """<?xml version="1.0"?>
        |<!DOCTYPE catalog [
        |  <!ELEMENT catalog (record+)>
        |  <!ELEMENT record (title)>
        |  <!ELEMENT title (#PCDATA)>
        |]>
        |<catalog><record><wrong>x</wrong></record></catalog>
        |""".stripMargin)
    assert(XmlValidation.hasInternalDtd(dir.resolve("good.xml").toString))
    val good = XmlValidation.validateAuto(dir.resolve("good.xml").toString,
      dir.toString)
    assert(good.valid.contains(true), good.errors)
    val bad = XmlValidation.validateAuto(dir.resolve("bad.xml").toString,
      dir.toString)
    assert(bad.valid.contains(false) && bad.errors.nonEmpty)
  }

  test("end-to-end pipeline: star outputs, error isolation, manifest") {
    val (in, out, schemas) = mkPipelineDirs()
    val report = XmlPipeline.process(spark, in.toString, out.toString,
      schemas.toString, runId = 7L, loadTs = ts)
    // broken.xml skipped, 3 good records survive
    assert(report.filesTotal == 3 && report.filesSkipped == 1)
    assert(report.rows == 3)
    assert(report.violations.isEmpty)
    val fact = spark.read.parquet(s"$out/fact_main.parquet")
    assert(fact.count() == 3)
    // status (2 uniques in 3 sampled rows... small-sample: verify the dim
    // exists only if classified) — price/total/qty promoted to measures
    assert(fact.schema("price").dataType.typeName == "double")
    // lineage + injected run id
    assert(fact.select("batch_id").distinct().as[Long].head() == 7L)
    assert(fact.select("source_file_name").distinct().count() == 2)
    // business-key column attached
    val dataCols = fact.columns.toSet
    assert(dataCols.contains("record_count"))
    // manifest written with the declared columns
    val manifest = spark.read.option("header", "true")
      .csv(s"$out/processing_manifest.csv").head()
    assert(manifest.getAs[String]("files_total") == "3")
    assert(manifest.getAs[String]("files_skipped") == "1")
    val errs = spark.read.option("header", "true")
      .csv(s"$out/processing_errors.csv")
    assert(errs.filter(col("file").contains("broken.xml")).count() == 1)
  }
}
