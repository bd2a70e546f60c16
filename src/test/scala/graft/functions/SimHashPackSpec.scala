package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native codegen `simhash_pack` vote expression against the
  * higher-order-function SQL formulation it replaced (which re-walked the
  * hash array once per bit, interpreted — the old `SimHash.simhashExpr`
  * body). The HOF form stays here as the independent reference so a codegen
  * regression cannot silently change fingerprints. */
class SimHashPackSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-native formulation, kept verbatim as the oracle. */
  private def hofPack(hsCol: String, nbits: Int): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(
         |  sequence(0, ${nbits - 1}), 0L,
         |  (acc, i) -> acc + IF(
         |    aggregate($hsCol, 0L,
         |      (v, t) -> v + IF((shiftright(t, i) & 1L) = 1L, 1L, -1L)
         |    ) > 0L,
         |    shiftleft(1L, i), 0L))""".stripMargin)

  test("native pack matches the HOF reference for 32 and 64 bits") {
    val docs = (1 to 200).map(i => (i.toLong,
      (0 until (i % 7) + 1).map(j => s"tok_${i % 23}_$j")))
      .toDF("id", "toks")
      .withColumn("hs", expr("transform(toks, t -> xxhash64(t))"))
    for (nbits <- Seq(32, 64)) {
      val diff = docs
        .withColumn("native", expr(s"simhash_pack(hs, $nbits)"))
        .withColumn("hof", hofPack("hs", nbits))
        .filter($"native" =!= $"hof")
        .count()
      assert(diff === 0, s"nbits=$nbits fingerprints diverged")
    }
  }

  test("empty hash array packs to 0 (all votes tie downward)") {
    val row = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(expr("simhash_pack(hs, 64)").as("fp"))
      .head()
    assert(row.getLong(0) === 0L)
  }

  test("null input stays null; bad nbits and non-array types are rejected") {
    val r = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("hs")
      .select(expr("simhash_pack(hs, 16)").as("fp")).head()
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT simhash_pack(array(1L), 65)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT simhash_pack(array('x'), 8)").collect()
    }
  }
}
