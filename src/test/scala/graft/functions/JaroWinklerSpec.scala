package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.expr

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // golden vectors probed from DuckDB's jaro_winkler_similarity /
  // jaro_similarity (the independent implementation q_record_linkage's
  // oracle runs) — exact doubles, not approximations
  private val golden = Seq(
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
    ("CRANE", "ACRE", 0.7833333333333333, 0.7833333333333333),
    ("abc", "abc", 1.0, 1.0),
    ("", "abc", 0.0, 0.0),
    ("a", "", 0.0, 0.0),
    // below the 0.7 boost threshold: prefix must NOT boost
    ("abcdef", "abzzzz", 0.5555555555555555, 0.5555555555555555),
    ("aaaaaa", "aaabbb", 0.6666666666666666, 0.6666666666666666),
    ("ABCDE", "abcde", 0.0, 0.0), // case-sensitive
    // non-BMP (surrogate pairs): DuckDB runs over the raw UTF-8 buffer,
    // so these are the BYTE-level values (😀bc = SIX bytes, 5 of which
    // match 😀bd; the codepoint answer would be 0.7778) — ADVICE r6
    ("😀bc", "😀bd",
      0.888888888888889, 0.9333333333333333),
    ("ma😀tha", "mat😀ha",
      0.9259259259259259, 0.9407407407407408))

  test("static matcher reproduces DuckDB's values bit-for-bit") {
    golden.foreach { case (a, b, j, jw) =>
      assert(JaroWinklerExpr.jaro(a, b) == j, s"jaro($a, $b)")
      assert(JaroWinklerExpr.similarity(a, b) == jw, s"jw($a, $b)")
    }
  }

  test("expression matches the static matcher under codegen, null-safe") {
    val df = golden.map { case (a, b, _, jw) => (a, b, jw) }
      .toDF("a", "b", "expect")
    val got = df.selectExpr("jaro_winkler(a, b) AS got", "expect")
      .collect()
    got.foreach(r =>
      assert(r.getDouble(0) == r.getDouble(1), r.toString))
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b)").collect()
    assert(withNull.head.isNullAt(0))
    // symmetric
    assert(spark.sql(
      "SELECT jaro_winkler('dixon', 'dicksonx') = jaro_winkler('dicksonx', 'dixon')")
      .head().getBoolean(0))
    // a literal NULL argument analyzes (NullType admitted) and yields NULL
    assert(spark.sql("SELECT jaro_winkler('abc', NULL)").head().isNullAt(0))
  }

  test("non-string inputs are rejected at analysis") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b").selectExpr("jaro_winkler(a, b)").collect()
    }
  }
}
