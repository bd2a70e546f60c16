package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Unicode normalization (NFC/NFD/NFKC/NFKD) over a string
  * column — the text-domain sibling of [[CosineSimilarityExpr]] in the
  * "custom Catalyst Expression" tier of SURVEY.md §7.3. Normalization is
  * the first step of any real text-dedup pipeline (decomposed "é"
  * and composed "é" must fingerprint identically or exact/near dedup
  * silently misses pairs), and Spark has no built-in for it — the usual
  * workaround is a Scala UDF, which breaks whole-stage codegen and
  * serializes String per row. This expression stays inside codegen:
  * the JDK's `java.text.Normalizer` is called directly in the generated
  * Java, with the form resolved to a compile-time constant (the form
  * argument must be a foldable literal, validated at construction — no
  * per-row `Form.valueOf`).
  *
  * Oracle story: `q_nfc_normalize` pins this against DuckDB's
  * `nfc_normalize` (utf8proc) — both implement Unicode normalization, so
  * lengths and md5 fingerprints of normalized output must agree exactly.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalizeExpr.Forms.contains(form),
    s"unicode_norm form must be one of ${UnicodeNormalizeExpr.Forms}, got $form")

  @transient private lazy val normForm =
    java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_norm expects a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, normForm))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // `form` is validated against the closed Forms set above, so inlining
    // it as a Java identifier is safe.
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "unicode_norm"
}

object UnicodeNormalizeExpr {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
