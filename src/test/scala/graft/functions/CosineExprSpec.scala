package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen cosine must be BIT-IDENTICAL to the higher-order-function
  * formulation on the real embeddings fixture (same widening, same
  * accumulation order, same sqrt/divide). */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim == VectorOps.cosine bit-for-bit on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val both = e.crossJoin(broadcast(q))
      .select(
        expr("cosine_sim(embedding, q_emb)").as("native"),
        VectorOps.cosine($"embedding", $"q_emb").as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim rejects non-float-array inputs at analysis time") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("cosine_sim(a, b)")).collect()
    }
    assert(err.getMessage.contains("cosine_sim") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("null array yields null similarity") {
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)")).head()
    assert(out.isNullAt(0))
  }
}
