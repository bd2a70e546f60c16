package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen squared-L2 distance — the k-means/embedding sibling of
  * [[CosineSimilarityExpr]], promised by q_kmeans' scale notes: the HOF
  * form (`aggregate(transform(sequence(...), ...))`) pays per-element
  * interpreted-lambda dispatch in the assignment hot loop, k times per
  * row per round; this is one fused loop with a single accumulator.
  *
  * Two signatures, chosen by the RIGHT side's element type:
  *  - `(array<bigint>, array<bigint>) -> bigint` — the exact integer
  *    distance of micro-unit vectors (round-1 assignment);
  *  - `(array<bigint>, array<double>) -> double` — integer vector vs
  *    exact-rational centroid (round-2 assignment), folding
  *    `((double) a_i - b_i)^2` LEFT TO RIGHT, operation-for-operation
  *    identical to the HOF/DuckDB formulations (long widens to double
  *    first, exactly like SQL's implicit promotion) — so swapping the
  *    expression in cannot change oracle-verified results (pinned by a
  *    parity test in MlFitSpec).
  *
  * Registered as SQL function `sq_l2` by [[GraftExtensions]].
  */
case class SquaredL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def rightIsDouble = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType =
    if (rightIsDouble) DoubleType else LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_l2 expects (array<bigint>, array<bigint|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (rightIsDouble) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val t = x.getLong(i).toDouble - y.getDouble(i)
        acc += t * t
        i += 1
      }
      acc
    } else {
      var acc = 0L
      var i = 0
      while (i < n) {
        val t = x.getLong(i) - y.getLong(i)
        acc += t * t
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      if (rightIsDouble)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $t = (double) $a.getLong($i) - $b.getDouble($i);
           |  $acc += $t * $t;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $t = $a.getLong($i) - $b.getLong($i);
           |  $acc += $t * $t;
           |}
           |${ev.value} = $acc;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_l2"
}
