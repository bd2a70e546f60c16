package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Independent single-machine reimplementation of q_ivfpq_search's PQ
  * half (the MlFitSpec/BpeSpec golden pattern): codes and ADC distances
  * recomputed locally with the formula codebook over the collected
  * corpus must reproduce the distributed top-10 exactly. The IVF half
  * (cell choice) is checked structurally — one cell, and the cell the
  * returned candidates actually live in. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q_ivfpq_search == local codes + ADC over the probed cell") {
    val got = SparkEntry.queries("q_ivfpq_search")(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 10)
    assert(got.map(_._2) == got.map(_._2).sorted, "adc must ascend")

    val all = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vi")
      .as[(Long, Int, Array[Long])].collect()
    val byId = all.map(r => r._1 -> r).toMap

    // the IVF half: every returned candidate lives in ONE cell
    val labels = got.map(g => byId(g._1)._2).distinct
    assert(labels.size == 1, s"candidates span cells: $labels")
    val cellLabel = labels.head

    // the PQ half, reimplemented: formula codebook
    // c(m,k,j) = (((m*31 + k*17 + j*7) % 13) - 6) * 80000
    def cw(m: Int, k: Int, j: Int): Long =
      (((m * 31 + k * 17 + j * 7) % 13) - 6).toLong * 80000L
    def subDists(vi: Array[Long], m: Int): Array[Long] =
      Array.tabulate(8) { k =>
        var s = 0L
        var j = 0
        while (j < 16) {
          val t = vi(m * 16 + j) - cw(m, k, j); s += t * t; j += 1
        }
        s
      }
    val qvi = byId(0L)._3
    val qtab = Array.tabulate(4)(m => subDists(qvi, m))
    val expected = all.toSeq
      .filter(r => r._2 == cellLabel && r._1 != 0L)
      .map { case (id, _, vi) =>
        val adc = (0 until 4).map { m =>
          val ds = subDists(vi, m)
          qtab(m)(ds.indexOf(ds.min)) // first-minimum code, like the query
        }.sum
        (id, adc)
      }
      .sortBy { case (id, adc) => (adc, id) }
      .take(10)
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
