package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BIGINT-output horizons of the micro-stat family (VERDICT
  * r11 "Next round" #5): several stat queries emit exact integers that
  * grow SUPERLINEARLY with corpus rows (pair counts, doubled rank
  * sums) or linearly with a large micro/cent multiplier — each is
  * BIGINT-safe only below a documented row count. This spec computes
  * each family's horizon from its actual bound expression via exact
  * BigInt search, so the numbers in SCALE.md's "BIGINT output-column
  * horizons" table can never drift from the math. The queries' decimal
  * INTERNALS are unaffected (products always form in DECIMAL); these
  * horizons are about the final BIGINT cast of the OUTPUT columns.
  */
class BigIntBoundsSpec extends AnyFunSuite {

  private val L = BigInt(Long.MaxValue)

  /** Largest n >= 1 with f(n) <= Long.MaxValue, f monotone. */
  private def horizon(f: BigInt => BigInt): BigInt = {
    var lo = BigInt(1); var hi = BigInt(1)
    while (f(hi) <= L) hi *= 2
    while (lo < hi - 1) {
      val mid = (lo + hi) / 2
      if (f(mid) <= L) lo = mid else hi = mid
    }
    lo
  }

  test("pair counts (q_kendall_tau conc/disc): n(n-1)/2 fits BIGINT " +
    "until n = 2^32 rows") {
    val h = horizon(n => n * (n - 1) / 2)
    assert(h == BigInt(2).pow(32)) // 4,294,967,296 (~4.3e9 rows)
    assert(h * (h - 1) / 2 <= L && (h + 1) * h / 2 > L)
  }

  test("doubled U (q_mannwhitney u2): max 2*n1*n2 at an even split " +
    "fits BIGINT until ~4.29e9 total rows (~2.1e9 per flag)") {
    // worst case over splits of n: n1 = ceil(n/2), n2 = floor(n/2)
    val h = horizon(n => 2 * ((n + 1) / 2) * (n / 2))
    assert(h == BigInt(4294967295L), s"got $h")
    // the comment in Analytics.scala states ~2.1e9 rows per flag
    assert(h / 2 > BigInt(2100000000L))
  }

  test("doubled signed-rank sum (q_wilcoxon w2_plus): n(n+1) over the " +
    "test's PAIR grain fits BIGINT until ~3.04e9 pairs") {
    val h = horizon(n => n * (n + 1))
    assert(h == BigInt(3037000499L), s"got $h")
    assert(h * (h + 1) <= L && (h + 1) * (h + 2) > L)
  }

  test("micro sums of squares (q_anova ssb/ssw_micro): worst-case " +
    "per-row term (49^2 * 1e6 on the l_quantity [1,50] grid) fits " +
    "BIGINT until ~3.8e9 rows") {
    val perRowMax = BigInt(49) * 49 * 1000000
    val h = horizon(n => n * perRowMax)
    assert(h == L / perRowMax)
    assert(h > BigInt(3800000000L), s"got $h")
  }

  test("micro-scaled money (q_theil_sen intercept_microdollar): " +
    "cents * 1e4 fits BIGINT until the weekly-revenue intercept " +
    "reaches ~$9.2 trillion") {
    val h = horizon(cents => cents * 10000) // intercept in cents
    assert(h == L / 10000)
    assert(h / 100 > BigInt("9200000000000")) // dollars
  }
}
