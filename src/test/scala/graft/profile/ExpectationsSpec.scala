package graft.profile

import graft.SparkSpec
import graft.profile.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("a realistic contract over orders: passes and failures verdict " +
    "correctly in one pass") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val n = orders.count()
    val report = check(orders, Seq(
      NotNull("o_orderkey"),                      // pass: key column
      Unique(Seq("o_orderkey")),                  // pass: primary key
      Unique(Seq("o_custkey")),                   // FAIL: many orders/cust
      InRange("o_totalprice", 0.0, 1e9),          // pass
      InRange("o_totalprice", 0.0, 100.0),        // FAIL: most above 100
      InSet("o_orderstatus", Seq("O", "F", "P")), // pass: TPC-H domain
      MatchesRegex("o_orderdate", "^\\d{4}-\\d{2}-\\d{2}"), // pass: ISO
      RowCountBetween(n, n),                      // pass: exact
      RowCountBetween(n + 1, n + 2)))             // FAIL
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(3))).toMap

    assert(report("not_null(o_orderkey)")._2)
    assert(report("unique(o_orderkey)") == ((0.0, true)))
    val (dupFrac, custUnique) = report("unique(o_custkey)")
    assert(!custUnique && dupFrac > 0.0, s"dupFrac=$dupFrac")
    assert(report("in_range(o_totalprice,0.0,1.0E9)")._2)
    val (inCheap, cheapOk) = report("in_range(o_totalprice,0.0,100.0)")
    assert(!cheapOk && inCheap < 0.5, s"frac=$inCheap")
    assert(report("in_set(o_orderstatus,{O|F|P})")._2)
    assert(report("matches_regex(o_orderdate,^\\d{4}-\\d{2}-\\d{2})")._2)
    assert(report(s"row_count_between($n,$n)") == ((n.toDouble, true)))
    assert(!report(s"row_count_between(${n + 1},${n + 2})")._2)
  }

  test("metrics match independent recomputation; allPassed gates") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val report = check(docs, Seq(
      NotNull("lang"),
      InSet("lang", Seq("en", "zh"), minFrac = 0.4)))
    val langFrac = docs.filter($"lang".isin("en", "zh")).count().toDouble /
      docs.filter($"lang".isNotNull).count()
    val got = report.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("in_set(lang,{en|zh})") - langFrac) < 1e-9)
    assert(allPassed(report) == (langFrac >= 0.4))
  }

  test("observed(): metrics ride the caller's own action — report " +
      "matches check() with no second scan; Unique rejected") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val n = orders.count()
    val contract = Seq(
      NotNull("o_orderkey"),
      InRange("o_totalprice", 0.0, 1e9),
      InRange("o_totalprice", 0.0, 100.0), // FAIL
      InSet("o_orderstatus", Seq("O", "F", "P")),
      MatchesRegex("o_orderdate", "^\\d{4}-\\d{2}-\\d{2}"),
      RowCountBetween(n, n))
    val (instrumented, report) = Expectations.observed(orders, contract)
    // the action we were running anyway: a sink write (noop = executors
    // consume every row, same shape as a parquet write)
    instrumented.write.format("noop").mode("overwrite").save()
    val obsRows = report().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3))).toSet
    val checkRows = check(orders, contract).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3))).toSet
    assert(obsRows == checkRows, s"observed:\n$obsRows\ncheck:\n$checkRows")
    assert(obsRows.exists { case (l, _, ok) =>
      l.startsWith("in_range(o_totalprice,0.0,100.0") && !ok })

    // Unique needs countDistinct — observe() cannot collect it
    val rejected = intercept[IllegalArgumentException] {
      Expectations.observed(orders, Seq(Unique(Seq("o_orderkey"))))
    }
    assert(rejected.getMessage.contains("Unique"))

    // a report read WITHOUT having run the action fails fast with a
    // descriptive error (bounded wait) instead of hanging forever
    val (_, forgotten) =
      Expectations.observed(orders, Seq(NotNull("o_orderkey")),
        timeoutSec = 2L)
    val hung = intercept[IllegalStateException] { forgotten() }
    assert(hung.getMessage.contains("run an action"))
  }

  test("labels distinguish same-column checks with different parameters") {
    // ADVICE r7: in_set/matches_regex labels used to omit their payload,
    // so two different contracts on one column collided in the report
    assert(InSet("c", Seq("a", "b")).label != InSet("c", Seq("a")).label)
    assert(MatchesRegex("c", "^a").label != MatchesRegex("c", "^b").label)
    // long payloads hash instead of exploding the label width
    val long = InSet("c", (1 to 100).map(_.toString)).label
    assert(long.length < 30, s"expected hashed label, got $long")
    assert(long != InSet("c", (1 to 99).map(_.toString)).label)
  }

  test("all-null and empty-frame edges do not crash or mis-verdict") {
    val empty = Seq.empty[(Option[Int], String)].toDF("a", "b")
    val r1 = check(empty, Seq(NotNull("a"), Unique(Seq("b")),
      InRange("a", 0, 1), RowCountBetween(0, 0))).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(r1.values.forall(identity), s"empty frame must pass: $r1")

    val nulls = Seq((Option.empty[Int], "x"), (Option.empty[Int], "x"))
      .toDF("a", "b")
    val r2 = check(nulls, Seq(NotNull("a"), Unique(Seq("b")),
      InRange("a", 0, 1))).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(r2("not_null(a)") == ((1.0, false)))   // 100% null
    assert(!r2("unique(b)")._2)                   // duplicate 'x'
    assert(r2("in_range(a,0.0,1.0)")._2)          // vacuously true
  }
}
