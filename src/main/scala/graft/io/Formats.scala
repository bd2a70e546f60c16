package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format table IO (SURVEY.md §2.1 source/sink tier,
  * generalized past the reference's parquet+CSV pair — R/parquet_writer.R
  * writes snappy parquet only, R/logger.R writes CSVs).
  *
  * One facade over the four self-describing-or-not batch formats Spark
  * ships in-box: parquet and ORC carry their own schema + column stats
  * (both get predicate pushdown and column pruning — asserted in
  * FormatsSpec); JSON and CSV are text formats whose read-back REQUIRES
  * the caller's schema to round-trip types (schema inference re-reads the
  * data and widens types — never acceptable on a 100 TB table, so this
  * API makes the schema parameter non-optional for them).
  */
object Formats {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Orc extends Format { val name = "orc" }
  case object Json extends Format { val name = "json" }
  case object Csv extends Format { val name = "csv" }

  val all: Seq[Format] = Seq(Parquet, Orc, Json, Csv)

  /** Columnar formats: self-describing schema + min/max stats. */
  def columnar(f: Format): Boolean = f == Parquet || f == Orc

  def write(df: DataFrame, path: String, format: Format): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    format match {
      case Parquet => w.option("compression", "snappy").parquet(path)
      case Orc => w.option("compression", "snappy").orc(path)
      case Json => w.option("compression", "gzip").json(path)
      case Csv => w.option("header", "true")
        .option("compression", "gzip").csv(path)
    }
  }

  /** Read a table back. `schema` is applied verbatim for text formats
    * (no inference pass over the data). For columnar formats it is also
    * applied when given (ADVICE r2): Spark then prunes the scan to the
    * named columns and enforces the declared types, instead of returning
    * the full file schema. */
  def read(
      spark: SparkSession, path: String, format: Format,
      schema: Option[StructType] = None): DataFrame = format match {
    case Parquet =>
      schema.map(spark.read.schema).getOrElse(spark.read).parquet(path)
    case Orc =>
      schema.map(spark.read.schema).getOrElse(spark.read).orc(path)
    case Json =>
      val r = schema.map(spark.read.schema)
        .getOrElse(throw new IllegalArgumentException(
          "JSON read-back requires an explicit schema (inference re-scans)"))
      r.json(path)
    case Csv =>
      val r = schema.map(spark.read.schema)
        .getOrElse(throw new IllegalArgumentException(
          "CSV read-back requires an explicit schema (inference re-scans)"))
      r.option("header", "true").csv(path)
  }
}
