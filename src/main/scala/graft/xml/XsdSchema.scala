package graft.xml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XSD-driven typed reads (SURVEY.md §1.3): the reference validates against
  * XSD but still ingests strings; Spark can do better — derive the Spark
  * schema from the XSD (`XSDToSchema`, shipped in Spark 4's XML source) so
  * `xs:decimal`/`xs:integer` columns arrive typed, and optionally validate
  * every ROW against the XSD during the scan (`rowValidationXSDPath`),
  * complementing the file-level pre-pass of [[XmlValidation]].
  */
object XsdSchema {

  /** Spark schema for the row tag inside an XSD-described document.
    * `XSDToSchema` returns the schema of the root element; `rowTag` selects
    * the nested record element's struct. */
  def schemaFor(xsdPath: String, rowTag: String): StructType = {
    val full = org.apache.spark.sql.execution.datasources.xml.XSDToSchema
      .read(new org.apache.hadoop.fs.Path(localPath(xsdPath)))
    def find(st: StructType, tag: String): Option[StructType] =
      st.fields.collectFirst {
        case f if f.name == tag => f.dataType match {
          case s: StructType => Some(s)
          case org.apache.spark.sql.types.ArrayType(s: StructType, _) => Some(s)
          case _ => None
        }
      }.flatten.orElse(
        st.fields.iterator.map(_.dataType).collectFirst {
          case s: StructType if find(s, tag).isDefined => find(s, tag).get
          case org.apache.spark.sql.types.ArrayType(s: StructType, _)
            if find(s, tag).isDefined => find(s, tag).get
        })
    find(full, rowTag).getOrElse(
      throw new IllegalArgumentException(s"row tag $rowTag not in $xsdPath"))
  }

  private def localPath(p: String): String =
    if (p.startsWith("file:")) new java.io.File(new java.net.URI(p)).getPath
    else p

  /** Typed XML read: schema from the XSD (no inference pass over the data)
    * plus optional per-row XSD validation inside the scan. */
  def readTyped(
      spark: SparkSession,
      dir: String,
      rowTag: String,
      xsdPath: String,
      rowValidation: Boolean = false): DataFrame = {
    val reader = spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("attributePrefix", XmlFlatten.AttributePrefix)
      .option("valueTag", XmlFlatten.ValueTag)
      .schema(schemaFor(xsdPath, rowTag))
    (if (rowValidation) reader.option("rowValidationXSDPath", xsdPath)
     else reader).load(dir)
  }
}
