package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprinting (SURVEY.md §2.11 X2): each token votes
  * +1/-1 per bit of its hash; the sign of each bit's vote total becomes the
  * fingerprint bit. Near-duplicates have small Hamming distance.
  *
  * Built entirely from higher-order expressions — the fingerprint is a
  * per-row projection. Candidate blocking uses the standard chunk trick:
  * two 64-bit hashes within Hamming distance d must share at least one of
  * d+1 equal-width chunks, so a join on (chunk index, chunk value) finds
  * all candidates without an all-pairs comparison.
  */
object SimHash {

  /** 64-bit SimHash over a token-array column name: xxhash64 per token,
    * then the native codegen vote-pack ([[SimHashPackExpr]], registered
    * by [[GraftExtensions]] — required on the session). The earlier
    * higher-order-lambda formulation walked the token hashes once per
    * bit, interpreted; the native pack is one fused loop. */
  def simhashExpr(tokensCol: String): Column = expr(
    s"simhash_pack(transform($tokensCol, t -> xxhash64(t)), 64)")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Splits a fingerprint into `chunks` equal bit-chunks for blocking
    * (SQL form — shiftright by a lambda variable). */
  def chunkExpr(fpCol: String, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    expr(
      s"""transform(sequence(0, ${chunks - 1}),
         |  i -> struct(i AS chunk,
         |    shiftright($fpCol, i * $width) & ${mask}L AS v))""".stripMargin)
  }

  /** Near-dup pairs with Hamming distance <= maxHamming, blocked on
    * (maxHamming + 1 rounded up to a divisor of 64) chunks. */
  def nearDuplicates(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = Seq(1, 2, 4, 8, 16).find(_ >= maxHamming + 1).getOrElse(16)
    val fp = df.select(col(idCol), simhashExpr(tokensCol).as("fp"))
    val blocks = fp.select(col(idCol), col("fp"),
      explode(chunkExpr("fp", chunks)).as("b"))
      .select(col(idCol), col("fp"),
        col("b.chunk").as("chunk"), col("b.v").as("v"))
    val a = blocks.as("a")
    val b = blocks.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
