package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native unicode_norm expression must match java.text.Normalizer on
  * every form, survive codegen on real data, and handle nulls/defaults. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // decomposed e + COMBINING ACUTE (U+0301), plus a compatibility char
  // (U+FB01 LATIN SMALL LIGATURE FI) that only the K-forms touch.
  private val decomposed = "café ﬁn"

  test("NFC composes, NFD decomposes, NFKC folds compatibility chars") {
    val df = Seq(decomposed).toDF("s")
    val row = df.select(
      expr("unicode_norm(s, 'NFC')").as("nfc"),
      expr("unicode_norm(s, 'NFD')").as("nfd"),
      expr("unicode_norm(s, 'NFKC')").as("nfkc"),
      expr("unicode_norm(s)").as("dflt")).head()
    assert(row.getString(0) == "caf\u00e9 \uFB01n")
    assert(row.getString(1) == decomposed)
    assert(row.getString(2) == "caf\u00e9 fin")
    // one-arg default is NFC
    assert(row.getString(3) == row.getString(0))
  }

  test("matches java.text.Normalizer on real corpus text under codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .withColumn("raw", concat(lit(decomposed + " "), col("text")))
    val got = docs.select(col("raw"), expr("unicode_norm(raw, 'NFKD')"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val want = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFKD)
      assert(r.getString(1) == want)
    }
  }

  test("null input yields null; bad form rejected at analysis") {
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(expr("unicode_norm(s, 'NFC')")).head().isNullAt(0))
    val err = intercept[Exception] {
      Seq("x").toDF("s").select(expr("unicode_norm(s, 'NOPE')")).collect()
    }
    assert(err.getMessage.contains("unicode_norm"))
  }
}
