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
  * Malformed input is REJECTED, not silently coerced (ADVICE r7: the HOF
  * executable spec null-propagates where ArrayData.getLong would read a
  * null element as 0, and a length mismatch used to min-truncate):
  * vectors of different lengths or with null elements throw — the
  * fixed-D embedding contract every caller relies on, now enforced at
  * the expression. The null check is emitted only when the child's
  * static type admits null elements, so provably non-null inputs keep
  * the branch-free loop.
  *
  * Registered as SQL function `sq_l2` by [[GraftExtensions]].
  */
case class SquaredL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def rightIsDouble = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def mayHaveNullElems(t: DataType): Boolean = t match {
    case ArrayType(_, cn) => cn
    case _ => true
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
    val n = x.numElements()
    SquaredL2Expr.checkLengths(n, y.numElements())
    val checkL = mayHaveNullElems(left.dataType)
    val checkR = mayHaveNullElems(right.dataType)
    if (rightIsDouble) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i)))
          SquaredL2Expr.nullElement(i)
        val t = x.getLong(i).toDouble - y.getDouble(i)
        acc += t * t
        i += 1
      }
      acc
    } else {
      var acc = 0L
      var i = 0
      while (i < n) {
        if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i)))
          SquaredL2Expr.nullElement(i)
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
      val cls = classOf[SquaredL2Expr].getName.stripSuffix("$")
      val nullGuard =
        (if (mayHaveNullElems(left.dataType))
           s"if ($a.isNullAt($i)) $cls.nullElement($i);\n" else "") +
          (if (mayHaveNullElems(right.dataType))
             s"if ($b.isNullAt($i)) $cls.nullElement($i);\n" else "")
      if (rightIsDouble)
        s"""
           |int $n = $a.numElements();
           |$cls.checkLengths($n, $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullGuard
           |  double $t = (double) $a.getLong($i) - $b.getDouble($i);
           |  $acc += $t * $t;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |$cls.checkLengths($n, $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullGuard
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

object SquaredL2Expr {
  /** Called from generated code (static forwarder): the fixed-D contract. */
  def checkLengths(a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"sq_l2: vector length mismatch ($a vs $b) — both sides must share " +
        "the embedding dimension")

  /** Called from generated code: null element = corrupt vector, reject. */
  def nullElement(i: Int): Nothing =
    throw new IllegalArgumentException(
      s"sq_l2: null element at index $i — embedding vectors must be " +
        "fully populated")
}
