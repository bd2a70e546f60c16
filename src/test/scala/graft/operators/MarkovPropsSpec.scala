package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** Randomized invariants for q_markov_attribution over GENERATED
  * journey sets (seeded, deterministic): the fixed point must satisfy
  * the chain axioms regardless of the journey distribution —
  * properties the single-fixture recounts cannot probe.
  *
  *  - removal effects lie in [0, 1e6] (removing a channel can never
  *    INCREASE conversion in an absorbing chain);
  *  - attribution shares partition the credit (sum ~ 1e6);
  *  - base conversion matches the plain converted-journey share when
  *    journeys are memoryless by construction;
  *  - a channel that appears in NO journey gets exactly 0 credit. */
class MarkovPropsSpec extends SparkSpec {
  import spark.implicits._

  private def run(journeys: Seq[Seq[String]]): Seq[(String, Long, Long, Long)] = {
    val rows = journeys.zipWithIndex.flatMap { case (j, u) =>
      j.zipWithIndex.map { case (t, i) =>
        (u.toLong, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00",
          (u * 1000 + i).toLong, t)
      }
    }
    val dir = Files.createTempDirectory("graft_mkprop").toString
    rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select($"user_id",
        org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"),
        $"event_id", $"event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_markov_attribution")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("chain axioms hold on 6 seeded random journey sets") {
    val rnd = new scala.util.Random(42)
    // 'error' never generated — its credit must be exactly 0
    val alphabet = Seq("click", "view", "signup")
    for (trial <- 1 to 6) {
      val journeys = (1 to 20 + rnd.nextInt(30)).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val body = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
        if (rnd.nextBoolean()) body :+ "purchase" else body
      }
      // ensure at least one conversion so the base probability is > 0
      val js = journeys :+ Seq("click", "purchase")
      val got = run(js)
      assert(got.map(_._1) == Seq("click", "error", "signup", "view"),
        s"trial $trial channels")
      got.foreach { case (c, re, share, _) =>
        assert(re >= 0L && re <= 1000000L, s"trial $trial re($c)=$re")
        assert(share >= 0L && share <= 1000000L,
          s"trial $trial share($c)")
      }
      assert(math.abs(got.map(_._3).sum - 1000000L) <= 4,
        s"trial $trial shares don't partition")
      assert(got.find(_._1 == "error").get._2 == 0L,
        s"trial $trial absent channel credited")
      // p_base consistency: identical on every row, in [0, 1e6]
      val bases = got.map(_._4).distinct
      assert(bases.size == 1 && bases.head >= 0L &&
        bases.head <= 1000000L, s"trial $trial p_base")
    }
  }

  test("uniform memoryless journeys: model conversion tracks the " +
    "empirical converted share") {
    // geometric journeys with a constant per-step conversion hazard
    // ARE a Markov chain — the model's absorption probability should
    // sit near the empirical share (not exact: finite-sample
    // transition estimates)
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("click", "view", "signup")
    val js = (1 to 400).map { _ =>
      val b = scala.collection.mutable.Buffer[String]()
      var done = false
      while (!done && b.length < 20) {
        if (rnd.nextDouble() < 0.3) { b += "purchase"; done = true }
        else b += alphabet(rnd.nextInt(3))
        if (!done && rnd.nextDouble() < 0.2) done = true
      }
      b.toSeq
    }
    val got = run(js)
    val pModel = got.head._4 / 1e6
    val pEmp = js.count(_.contains("purchase")).toDouble / js.length
    assert(math.abs(pModel - pEmp) < 0.12,
      s"model $pModel vs empirical $pEmp")
  }
}
