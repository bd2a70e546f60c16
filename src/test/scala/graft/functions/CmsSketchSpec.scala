package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private lazy val perSource = CmsSketch
    .tokenSketches(docs, $"source", $"text")
    .as[(String, Array[Byte])].collect().toMap

  private lazy val exact = docs
    .select(explode(graft.Fns.tokens($"text")).as("tok"))
    .groupBy($"tok").agg(count(lit(1)).as("n"))
    .as[(String, Long)].collect().toMap

  test("merged per-source partials answer global counts within the ε bound") {
    val merged = CmsSketch.merge(perSource.values.toSeq)
    val total = exact.values.sum
    val eps = 0.001
    // probe the 5 heaviest + 5 rare tokens
    val probes = exact.toSeq.sortBy(-_._2).take(5) ++
      exact.toSeq.sortBy(_._2).take(5)
    probes.foreach { case (tok, truth) =>
      val est = CmsSketch.estimate(merged, tok)
      assert(est >= truth, s"CMS must never undercount: $tok $est < $truth")
      assert(est <= truth + (eps * total).ceil.toLong,
        s"$tok est $est exceeds truth $truth + eps*N")
    }
  }

  test("union of partials is bit-identical to a direct global sketch") {
    val direct = CmsSketch
      .tokenSketches(docs, lit("all"), $"text")
      .as[(String, Array[Byte])].head()._2
    val merged = CmsSketch.merge(perSource.values.toSeq)
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    assert(java.util.Arrays.equals(out.toByteArray, direct),
      "counter addition must equal the single-pass sketch")
  }
}
