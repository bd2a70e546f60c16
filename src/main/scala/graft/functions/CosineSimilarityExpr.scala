package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two float-array columns — the
  * "custom Catalyst Expression" tier of SURVEY.md §7.3, used where the
  * built-in higher-order functions (zip_with + aggregate) pay a per-element
  * lambda-interpretation cost in the pairwise hot loop.
  *
  * Math is OPERATION-FOR-OPERATION identical to
  * [[VectorOps.cosine]] (float widened to double, left-to-right
  * accumulation, dot / (sqrt(na) * sqrt(nb))), so swapping it in cannot
  * change oracle-verified results. Generated code is a single fused loop —
  * one pass, three accumulators, no per-element closure dispatch.
  *
  * Registered as SQL function `cosine_sim` by [[GraftExtensions]].
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Session extension registering graft's native expressions and optimizer
  * rules; enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarityExpr(children.head, children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sq_l2"),
      new ExpressionInfo(classOf[SquaredL2Expr].getName, "sq_l2"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sq_l2 takes exactly 2 arguments")
        SquaredL2Expr(children.head, children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_norm"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "unicode_norm takes (str) or (str, form)")
        val form =
          if (children.size == 2) {
            val f = children(1)
            require(f.foldable && f.dataType ==
              org.apache.spark.sql.types.StringType,
              "unicode_norm form must be a string literal")
            f.eval().toString.toUpperCase(java.util.Locale.ROOT)
          } else "NFC"
        UnicodeNormalizeExpr(children.head, form)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinklerExpr(children.head, children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_pack"),
      new ExpressionInfo(classOf[SimHashPackExpr].getName, "simhash_pack"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "simhash_pack takes (hash_array, nbits_literal)")
        val nb = children(1)
        require(nb.foldable, "simhash_pack nbits must be a literal")
        SimHashPackExpr(children.head,
          nb.eval().asInstanceOf[Number].intValue())
      }))
  }
}
