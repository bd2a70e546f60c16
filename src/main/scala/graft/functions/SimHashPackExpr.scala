package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen SimHash bit-vote packing: given a per-token hash array,
  * tallies the +1/-1 vote each hash casts per bit and packs the vote
  * signs into one `nbits`-wide fingerprint (bit i set iff vote total is
  * positive — ties fall to 0, matching the SQL and DuckDB formulations).
  *
  * Exists for the same reason as [[CosineSimilarityExpr]]: the
  * higher-order-function formulation (`aggregate(sequence(0, n-1), ...,
  * aggregate(hashes, ...))`) re-walks the token hashes once PER BIT and
  * every lambda step is interpreted — measured 18 s for q_simhash at
  * sf0.1 vs well under a second for this fused single pass (one loop over
  * the hashes, an int[nbits] of votes, integer shifts only). Fingerprint
  * construction is the embarrassingly-parallel half of SimHash dedup, so
  * it must cost one linear scan — at 100 TB the fingerprint pass IS the
  * corpus read.
  *
  * `nbits` comes in as a foldable literal (1..64), validated at
  * construction like [[UnicodeNormalizeExpr]]'s form.
  */
case class SimHashPackExpr(child: Expression, nbits: Int)
    extends UnaryExpression {

  require(nbits >= 1 && nbits <= 64, s"simhash_pack nbits must be 1..64, got $nbits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_pack expects array<bigint> token hashes, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](nbits)
    var j = 0
    val n = hs.numElements()
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < nbits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < nbits) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[$nbits];
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $nbits; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < $nbits; $i++) {
         |  if ($votes[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "simhash_pack"
}
