package graft.xml

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming XML ingest: batch-parity of the flattened output, incremental
  * pickup of files landing after the stream started, and exactly-once
  * parquet appends across a query restart (the sink's transaction log). */
class XmlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: Path, name: String, ids: Range): Unit =
    Files.writeString(dir.resolve(name),
      s"""<?xml version="1.0"?>
         |<catalog>
         |${ids.map(i =>
            s"""  <record id="$i" status="active">
               |    <title>T$i</title>
               |    <measure>m${i}a</measure>
               |    <measure>m${i}b</measure>
               |  </record>""".stripMargin).mkString("\n")}
         |</catalog>
         |""".stripMargin)

  private def drain(records: org.apache.spark.sql.DataFrame,
      out: String, cp: String): Unit = {
    val q = XmlStream.sink(records, out, cp)
    q.awaitTermination()
  }

  test("streamed records match the batch flatten on the same corpus") {
    val in = Files.createTempDirectory("graft_xs_in")
    writeFile(in, "a.xml", 1 to 3)
    writeFile(in, "b.xml", 4 to 5)
    val s = XmlStream.setup(spark, in.toString)
    assert(s.rowTag == "record")
    assert(s.maxLens.values.max == 2) // repeated <measure> observed

    val out = Files.createTempDirectory("graft_xs_out").toString
    val cp = Files.createTempDirectory("graft_xs_cp").toString
    drain(XmlStream.records(spark, in.toString, s), out, cp)

    val batch = XmlFlatten.flatten(XmlIngest.readFiles(
      spark, XmlIngest.listXmlFiles(spark, in.toString), s.rowTag, s.charset))
    val dataCols = batch.columns.toSeq
    val streamed = spark.read.parquet(out)
    // same data columns in the same order, plus lineage + record_id
    assert(streamed.columns.toSeq ==
      dataCols ++ Seq("source_file_path", "source_file_name",
        "load_timestamp", "record_id"))
    val a = streamed.select(dataCols.map(graft.qcol): _*).orderBy("id")
      .collect().map(_.toSeq)
    val b = batch.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // content-derived ids are unique here (all records distinct)
    assert(streamed.select("record_id").distinct().count() == 5)
    assert(streamed.filter($"source_file_name".isin("a.xml", "b.xml"))
      .count() == 5)
  }

  test("files landing after stream start are picked up; replays append " +
      "nothing (exactly-once across restart)") {
    val in = Files.createTempDirectory("graft_xs2_in")
    writeFile(in, "a.xml", 1 to 2)
    val s = XmlStream.setup(spark, in.toString)
    val out = Files.createTempDirectory("graft_xs2_out").toString
    val cp = Files.createTempDirectory("graft_xs2_cp").toString

    drain(XmlStream.records(spark, in.toString, s), out, cp)
    assert(spark.read.parquet(out).count() == 2)

    // a file lands later: a NEW AvailableNow run (same checkpoint) reads
    // ONLY it — the already-ingested file is not re-parsed or re-appended
    writeFile(in, "late.xml", 3 to 6)
    drain(XmlStream.records(spark, in.toString, s), out, cp)
    val afterLate = spark.read.parquet(out)
    assert(afterLate.count() == 6)
    assert(afterLate.filter($"source_file_name" === "late.xml").count() == 4)

    // restart with NO new files: the sink log deduplicates — zero growth
    drain(XmlStream.records(spark, in.toString, s), out, cp)
    assert(spark.read.parquet(out).count() == 6)
  }

  test("records() is pure projection: no aggregate, join, sort, or " +
      "repartition anywhere in the streaming plan") {
    val in = Files.createTempDirectory("graft_xsp_in")
    writeFile(in, "a.xml", 1 to 2)
    val s = XmlStream.setup(spark, in.toString)
    import org.apache.spark.sql.catalyst.plans.logical._
    val lp = XmlStream.records(spark, in.toString, s).queryExecution.logical
    val offending = lp.collect {
      case n: Aggregate => n
      case n: Join => n
      case n: Sort => n
      case n: RepartitionOperation => n
    }
    assert(offending.isEmpty,
      offending.map(_.nodeName).mkString(", "))
  }

  test("--stream CLI mode: parse + one AvailableNow drain, idempotent " +
      "re-invocation (the cron line)") {
    val cfg = Main.parse(Array("/in", "/out", "--stream"))
    assert(cfg.stream && cfg.validate)
    val in = Files.createTempDirectory("graft_xcli_in")
    val out = Files.createTempDirectory("graft_xcli_out").toString
    writeFile(in, "a.xml", 1 to 4)
    val c = Main.Config(in.toString, out, in.toString,
      incremental = false, validate = true, runId = None, stream = true)
    assert(Main.runStream(spark, c) == 4)
    assert(Main.runStream(spark, c) == 4) // re-run: nothing new, no dupes
    writeFile(in, "b.xml", 5 to 6)
    assert(Main.runStream(spark, c) == 6)
    // the persisted setup roundtrips and pins the sink schema: a late
    // MAJORITY of <item> files must NOT flip the tag on re-invocation
    val setupPath = s"$out/_graft_stream_setup.json"
    val persisted = XmlStream.loadSetup(setupPath)
    assert(persisted.exists(_.rowTag == "record"))
    assert(persisted.exists(_.maxLens.values.max == 2))
    (1 to 5).foreach(i => Files.writeString(in.resolve(s"item$i.xml"),
      s"""<?xml version="1.0"?>
         |<inventory><item id="i$i"><title>X</title></item></inventory>
         |""".stripMargin))
    assert(Main.runStream(spark, c) == 6) // item files: zero records, no flip
    assert(XmlStream.loadSetup(setupPath).exists(_.rowTag == "record"))
  }

  test("--stream-groups CLI mode: per-group drain of a mixed corpus, " +
      "idempotent, setups persisted per group") {
    val cfg = Main.parse(Array("/in", "/out", "--stream-groups"))
    assert(cfg.streamGroups && !cfg.stream)
    val in = Files.createTempDirectory("graft_xgcli_in")
    val out = Files.createTempDirectory("graft_xgcli_out").toString
    writeFile(in, "a.xml", 1 to 4)
    Files.writeString(in.resolve("items.xml"),
      """<?xml version="1.0"?>
        |<inventory><item sku="s1"><qty>7</qty></item>
        |<item sku="s2"><qty>8</qty></item></inventory>
        |""".stripMargin)
    val c = Main.Config(in.toString, out, in.toString,
      incremental = false, validate = true, runId = None,
      streamGroups = true)
    assert(Main.runStreamGroups(spark, c) == 6) // 4 records + 2 items
    assert(Main.runStreamGroups(spark, c) == 6) // idempotent re-drain
    // late files of BOTH groups picked up by their streams
    writeFile(in, "b.xml", 5 to 6)
    assert(Main.runStreamGroups(spark, c) == 8)
    // the manifest + per-group setups persisted
    assert(Files.exists(
      java.nio.file.Paths.get(s"$out/_graft_stream_groups.txt")))
  }

  test("validationStream: per-file verdicts land exactly once as files " +
      "arrive; setup surfaces minority tag groups") {
    val in = Files.createTempDirectory("graft_xv_in")
    val schemas = Files.createTempDirectory("graft_xv_sch")
    Files.writeString(schemas.resolve("default.xsd"),
      """<?xml version="1.0"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="catalog">
        |    <xs:complexType><xs:sequence>
        |      <xs:element name="record" maxOccurs="unbounded">
        |        <xs:complexType>
        |          <xs:sequence>
        |            <xs:element name="title" type="xs:string"/>
        |            <xs:element name="measure" type="xs:string"
        |              maxOccurs="unbounded"/>
        |          </xs:sequence>
        |          <xs:attribute name="id" type="xs:string"/>
        |          <xs:attribute name="status" type="xs:string"/>
        |        </xs:complexType>
        |      </xs:element>
        |    </xs:sequence></xs:complexType>
        |  </xs:element>
        |</xs:schema>
        |""".stripMargin)
    writeFile(in, "good.xml", 1 to 2)
    Files.writeString(in.resolve("bad.xml"),
      """<?xml version="1.0"?>
        |<catalog><record id="9"><measure>no-title</measure></record>
        |</catalog>
        |""".stripMargin)
    val out = Files.createTempDirectory("graft_xv_out").toString
    val cp = Files.createTempDirectory("graft_xv_cp").toString
    drain(XmlStream.validationStream(spark, in.toString, schemas.toString),
      out, cp)
    val v1 = spark.read.parquet(out)
      .select("file", "verdict").as[(String, String)].collect()
      .map { case (f, v) => f.split('/').last -> v }.toMap
    assert(v1 == Map("good.xml" -> "valid", "bad.xml" -> "invalid"))
    // a file lands later: only IT is validated on the next drain
    writeFile(in, "later.xml", 3 to 4)
    drain(XmlStream.validationStream(spark, in.toString, schemas.toString),
      out, cp)
    val v2 = spark.read.parquet(out)
    assert(v2.count() == 3)
    assert(v2.filter($"file".endsWith("later.xml") && $"verdict" === "valid")
      .count() == 1)

    // minority-tag surfacing: an <item> file joins the <record> corpus
    Files.writeString(in.resolve("minority.xml"),
      """<?xml version="1.0"?>
        |<inventory><item id="z"><title>M</title></item></inventory>
        |""".stripMargin)
    val s = XmlStream.setup(spark, in.toString)
    assert(s.rowTag == "record")
    assert(s.otherGroups.map { case (t, _, n) => (t, n) } == Seq(("item", 1)))
  }

  test("late file with an unsampled column fills null; extra repetitions " +
      "truncate into the fixed schema") {
    val in = Files.createTempDirectory("graft_xs3_in")
    writeFile(in, "a.xml", 1 to 2)
    val s = XmlStream.setup(spark, in.toString)
    val out = Files.createTempDirectory("graft_xs3_out").toString
    val cp = Files.createTempDirectory("graft_xs3_cp").toString
    // 3 measures (sample max was 2) and a brand-new <extra> element
    Files.writeString(in.resolve("wide.xml"),
      """<?xml version="1.0"?>
        |<catalog>
        |  <record id="9" status="x">
        |    <title>W</title>
        |    <measure>w1</measure><measure>w2</measure><measure>w3</measure>
        |    <extra>ignored</extra>
        |  </record>
        |</catalog>
        |""".stripMargin)
    drain(XmlStream.records(spark, in.toString, s), out, cp)
    val got = spark.read.parquet(out).filter($"id" === "9")
      .select(col("measure"), col("`measure.1`"))
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(("w1", "w2"))) // third repetition truncated
    assert(!spark.read.parquet(out).columns.contains("extra"))
  }

  test("mixed-tag drop directory: per-group streams land EVERY row, " +
      "reaching batch grouped-read parity") {
    val in = Files.createTempDirectory("graft_xs4_in")
    // dominant group: <record> (2 files, 5 rows)
    writeFile(in, "a.xml", 1 to 3)
    writeFile(in, "b.xml", 4 to 5)
    // minority group: <item> rows with a DIFFERENT shape (3 rows)
    Files.writeString(in.resolve("items.xml"),
      """<?xml version="1.0"?>
        |<inventory>
        |  <item sku="s1"><qty>7</qty></item>
        |  <item sku="s2"><qty>8</qty></item>
        |  <item sku="s3"><qty>9</qty></item>
        |</inventory>
        |""".stripMargin)

    val setups = XmlStream.setupGroups(spark, in.toString)
    assert(setups.map(_.rowTag) == Seq("record", "item"), // dominant first
      setups.map(s => (s.rowTag, s.charset)).toString)
    // each setup names its sibling group
    assert(setups.head.otherGroups.map(g => (g._1, g._3)) == Seq(("item", 1)))
    assert(setups(1).otherGroups.map(g => (g._1, g._3)) ==
      Seq(("record", 2)))

    val outRoot = Files.createTempDirectory("graft_xs4_out").toString
    val cpRoot = Files.createTempDirectory("graft_xs4_cp").toString
    XmlStream.drainGroups(spark, in.toString, setups, outRoot, cpRoot)
      .foreach(_._2.awaitTermination())

    // every row of BOTH groups landed, in its group's own schema
    val rec = spark.read.parquet(
      s"$outRoot/${XmlStream.groupId(setups.head)}")
    val itm = spark.read.parquet(
      s"$outRoot/${XmlStream.groupId(setups(1))}")
    assert(rec.count() == 5 && itm.count() == 3,
      s"rec=${rec.count()} itm=${itm.count()}")
    assert(itm.columns.contains("att_sku") || itm.columns.contains("sku"),
      itm.columns.mkString(","))

    // the union reader reaches the batch grouped read's shape: all 8
    // rows, columns null-filled across group schemas
    val all = XmlStream.readGroups(spark, outRoot)
    assert(all.count() == 8)
    assert(all.filter($"title".isNotNull).count() == 5)
    assert(all.filter($"qty".isNotNull).count() == 3)

    // a replayed drain of either group appends nothing (exactly-once per
    // group checkpoint)
    XmlStream.drainGroups(spark, in.toString, setups, outRoot, cpRoot)
      .foreach(_._2.awaitTermination())
    assert(XmlStream.readGroups(spark, outRoot).count() == 8)
  }

  test("groupId is collision-proof across distinct (tag, charset) pairs") {
    import org.apache.spark.sql.types.StructType
    // both sanitize to a_b_c_ prefix-wise; the raw-pair hash must split them
    val g1 = XmlStream.Setup("a-b", "c", new StructType(), Map.empty)
    val g2 = XmlStream.Setup("a", "b-c", new StructType(), Map.empty)
    assert(XmlStream.groupId(g1) != XmlStream.groupId(g2))
    // deterministic and filesystem-safe
    assert(XmlStream.groupId(g1) == XmlStream.groupId(g1))
    assert(XmlStream.groupId(g1).forall(c => c.isLetterOrDigit || c == '_'))
  }
}
