package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` columns using built-in higher-order
  * functions (zip_with/aggregate) — no UDFs, so the expressions serialize
  * into the plan and need no closure shipping. Floats are widened to double
  * before multiplication (exact: 24-bit mantissa products fit in 53 bits),
  * and the fold runs left-to-right in array order on every engine, keeping
  * results deterministic for the oracle compare. */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
