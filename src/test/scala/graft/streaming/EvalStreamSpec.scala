package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  // slice by EVENT id so every task's attempts SPAN batches — the
  // associativity actually under test (a user_id slice would keep each
  // task whole within one batch and prove nothing)
  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  test("streamed eval partials reproduce the LIVE q_pass_at_k answer " +
    "exactly; replay is idempotent") {
    val path = Files.createTempDirectory("graft_eval_partials").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      EvalStream.evalPartials(b, i.toLong, path)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not double
    EvalStream.evalPartials(batches(1), 1L, path)

    val streamed = EvalStream.passAtKFromPartials(spark, path)
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("q_pass_at_k")(spark, dir)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed $streamed != batch $batch — partials not associative " +
        "or attempt-field derivations drifted")
  }

  test("vote rollup: mode of summed counts, smallest-answer tie-break, " +
    "matches an uncapped batch recompute") {
    val path = Files.createTempDirectory("graft_eval_partials2").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      EvalStream.evalPartials(b, i.toLong, path)
    }

    val streamed = EvalStream.voteFromPartials(spark, path)
      .as[(Long, Long, Long)].collect().head

    // independent batch recompute: uncapped majority vote over all
    // attempts (the STATED streaming contract — no first-8 cut)
    val hash8 = (c: org.apache.spark.sql.Column) =>
      pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(8L))
    val ev = events.select($"user_id".as("task"),
      when(pmod(conv(substring(md5($"event_id".cast("string")), 1, 8),
        16, 10).cast("long"), lit(3L)) === 0L, hash8($"user_id"))
        .otherwise(hash8($"event_id")).as("ans"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy($"task").orderBy($"cnt".desc, $"ans".asc)
    val expected = ev.groupBy($"task", $"ans").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(rk)).filter($"rn" === 1)
      .withColumn("ref", hash8($"task"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(($"ans" === $"ref").cast("long")).as("n_correct"))
      .as[(Long, Long)].collect().head

    assert(streamed._1 == expected._1, "task count mismatch")
    assert(streamed._2 == expected._2, "correct count mismatch")
    assert(streamed._3 ==
      math.round(expected._2.toDouble / expected._1 * 1000000.0),
      "accuracy micro mismatch")
  }

  test("a task entirely inside ONE batch and a task split across all " +
    "three agree with the one-shot ingest") {
    val oneShot = Files.createTempDirectory("graft_eval_oneshot").toString
    EvalStream.evalPartials(events, 0L, oneShot)
    val incr = Files.createTempDirectory("graft_eval_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      EvalStream.evalPartials(b, i.toLong, incr)
    }
    val a = EvalStream.passAtKFromPartials(spark, oneShot)
      .as[(Int, Long, Long)].collect().toSet
    val b = EvalStream.passAtKFromPartials(spark, incr)
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b, s"one-shot $a != incremental $b")
  }
}
