package graft.xml

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

class XsdSchemaSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_xsd")
    Files.writeString(d.resolve("items.xsd"),
      """<?xml version="1.0"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="inventory">
        |    <xs:complexType><xs:sequence>
        |      <xs:element name="entry" maxOccurs="unbounded">
        |        <xs:complexType>
        |          <xs:sequence>
        |            <xs:element name="label" type="xs:string"/>
        |            <xs:element name="cost" type="xs:decimal"/>
        |            <xs:element name="units" type="xs:integer"/>
        |          </xs:sequence>
        |          <xs:attribute name="id" type="xs:string"/>
        |        </xs:complexType>
        |      </xs:element>
        |    </xs:sequence></xs:complexType>
        |  </xs:element>
        |</xs:schema>
        |""".stripMargin)
    Files.writeString(d.resolve("data.xml"),
      """<inventory>
        |  <entry id="a"><label>bolt</label><cost>0.25</cost><units>900</units></entry>
        |  <entry id="b"><label>nut</label><cost>0.10</cost><units>1500</units></entry>
        |</inventory>
        |""".stripMargin)
    d
  }

  test("XSD-declared types surface as typed Spark columns") {
    val schema = XsdSchema.schemaFor(dir.resolve("items.xsd").toString, "entry")
    assert(schema("label").dataType == StringType)
    assert(schema("cost").dataType.isInstanceOf[DecimalType])
    assert(schema("units").dataType.isInstanceOf[DecimalType] ||
      schema("units").dataType == LongType) // xs:integer maps to decimal(38,0)
  }

  test("typed read parses values with the XSD schema, no inference pass") {
    val df = XsdSchema.readTyped(spark, dir.toString, "entry",
      dir.resolve("items.xsd").toString)
    assert(df.count() == 2)
    val total = df.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col("cost"))).head().getDecimal(0)
    assert(total.doubleValue() == 0.35)
  }
}
