package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Executes the FULL plan (incl. final sorts/projections, which
    * `.count()` lets Catalyst eliminate via EliminateSorts) without any
    * driver-side materialization: the built-in noop sink consumes every
    * row on the executors. */
  private def sink(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Runs one query to the noop sink. A THROW returns `Left(err)` instead
    * of a timing: the old swallow-everything behavior recorded a broken
    * query as a ~0.01 s entry indistinguishable from a fast one, which
    * could mask a real failure for a whole round because Bench and Verify
    * run on different SFs (VERDICT r10 "What's missing" #3). */
  def runOne(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Either[String, Double] = {
    val t0 = System.nanoTime()
    try {
      sink(fn(spark, sfDir))
      Right((System.nanoTime() - t0) / 1e9)
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("").replace('\n', ' ')
        Left(s"${e.getClass.getSimpleName}: ${msg.take(200)}")
    }
  }

  /** 1-minute system load from /proc/loadavg, sampled around every rep:
    * the mechanical discount the round-12/13 verdicts asked for. Five
    * headline queries regressed >30% in r13 on provably untouched code
    * and the only rebuttal was narrative; with pre/post load per rep the
    * record itself shows whether a slow rep ran next to a co-tenant.
    * NaN when the file is unreadable (non-Linux). */
  private[graft] def loadAvg1: Double =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8).split("\\s+")(0).toDouble
    catch { case scala.util.control.NonFatal(_) => Double.NaN }

  private def f2(v: Double): String =
    if (v.isNaN) "null"
    else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  /** `"load_per_rep"` JSON object: query -> [[pre, post], ...] in rep
    * order. Lives in the FULL record (bench.json / BENCH_FULL) — ~15 KB
    * at 350 queries x 3 reps, fine for a file, too big for the driver's
    * tail window. */
  private[graft] def loadPerRepJson(
      loads: Seq[(String, Seq[(Double, Double)])]): String =
    loads.map { case (q, ls) =>
      s""""$q":${ls.map { case (a, b) => s"[${f2(a)},${f2(b)}]" }
        .mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")

  /** Run-level `"load"` summary for the compact line the driver parses:
    * min/mean/max of the per-rep PRE samples plus max POST. A round whose
    * pre_max is 3x pre_min was measured on contended hardware. */
  private[graft] def loadSummaryJson(samples: Seq[(Double, Double)]): String = {
    val pre = samples.map(_._1).filterNot(_.isNaN)
    val post = samples.map(_._2).filterNot(_.isNaN)
    if (pre.isEmpty) """{"n_reps":0}"""
    else s"""{"n_reps":${samples.size},"pre_min":${f2(pre.min)},""" +
      s""""pre_mean":${f2(pre.sum / pre.size)},""" +
      s""""pre_max":${f2(pre.max)},""" +
      s""""post_max":${f2(if (post.isEmpty) Double.NaN else post.max)}}"""
  }

  /** Minimal JSON string escaping for error messages (timings never need
    * it; query names are identifier-safe by construction). */
  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 3 reps: the reported min needs at least one sample that dodges a GC
    // pause / noisy-neighbor stall (observed run-to-run swings up to 4x on
    // shared hardware with identical code)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen/file-index so the first timed query isn't charged
    // for session bootstrap (~5s of JIT + parquet footer reads). Touch
    // EVERY table's file index + footers (metadata-only counts — cheap),
    // not just one: the round-4 driver record showed multi-second times on
    // trivial queries that were merely the first to scan their table in a
    // contended environment.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case scala.util.control.NonFatal(_) => }
    }
    SparkEntry.queries.get("q_agg_basic").foreach(fn =>
      try sink(fn(spark, sfDir)) catch { case _: Throwable => })
    // Deterministic sorted order, >=2 reps per query, report the min: one
    // rep measures plan+GC noise as much as the query, and a hash Map's
    // arbitrary order made run-to-run diffs incomparable (VERDICT r1 #1).
    // Optional name filter for isolated profiling (the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    // Escape hatch for a much larger future surface (BASELINE.md policy):
    // when SPARK_GRAFT_BENCH_TAIL_REPS is set below `reps`, only the CORE —
    // the slowest `SPARK_GRAFT_BENCH_CORE_N` queries by first-rep time —
    // keeps full reps; the cheap tail runs fewer. Default: tail = reps,
    // i.e. min-of-`reps` for every query (the current policy).
    val tailReps = math.max(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TAIL_REPS", reps.toString).toInt, 1)
    val coreN = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORE_N", "40").toInt
    // Optional per-rep JVM profile (SPARK_GRAFT_BENCH_PROFILE=<file>):
    // one TSV row per rep — query, rep index, elapsed, GC-time delta,
    // JIT-compilation-time delta, post-rep heap — the instrumentation
    // the round-9 verdict asked for to attribute late-full-run inflation
    // (GC pressure? JIT re-compilation? neither?) with data.
    val profileOut = sys.env.get("SPARK_GRAFT_BENCH_PROFILE").map { p =>
      val w = new java.io.PrintWriter(new java.io.FileWriter(p))
      w.println("query\trep\telapsed_s\tgc_delta_ms\tjit_delta_ms\theap_mb")
      w
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def jitMs: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    // per-query rep index (a single global counter was a run-wide sequence
    // number that defeated the per-query GC/JIT attribution the profile
    // TSV exists for — ADVICE r10)
    val repIdx = scala.collection.mutable.Map.empty[String, Int]
    // first error per query; errored queries are EXCLUDED from the timing
    // map and reported under "errors" so a thrown query can never
    // masquerade as a fast one
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // per-query per-rep (pre, post) 1-min loadavg, in rep order
    val loads = scala.collection.mutable
      .LinkedHashMap.empty[String, Vector[(Double, Double)]]
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String = ""): Double = {
      val (g0, j0) = (gcMs, jitMs)
      val l0 = loadAvg1
      val t0 = System.nanoTime()
      val res = runOne(spark, sfDir, fn)
      val dt = res.getOrElse((System.nanoTime() - t0) / 1e9)
      loads(name) = loads.getOrElse(name, Vector.empty) :+ (l0, loadAvg1)
      res.left.foreach { err =>
        if (!errors.contains(name)) errors(name) = err
        System.err.println(s"BENCH_ERR $name: $err")
      }
      profileOut.foreach { w =>
        val heap = java.lang.management.ManagementFactory.getMemoryMXBean
          .getHeapMemoryUsage.getUsed / (1024 * 1024)
        val rep = repIdx.getOrElse(name, 0)
        repIdx(name) = rep + 1
        w.println(f"$name\t$rep\t$dt%.3f\t" +
          s"${gcMs - g0}\t${jitMs - j0}\t$heap")
        w.flush()
      }
      dt
    }
    val firstRep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .map { case (name, fn) => (name, fn, time(fn, name)) }
      .filter { case (name, _, _) => !errors.contains(name) }
    val core: Set[String] =
      if (tailReps >= reps) firstRep.map(_._1).toSet // everyone is core
      else firstRep.sortBy(-_._3).take(coreN).map(_._1).toSet
    val results = firstRep.map { case (name, fn, t1) =>
      val extra = (if (core(name)) math.max(reps, 1) else tailReps) - 1
      name -> (t1 +: (1 to extra).map(_ => time(fn, name))).min
    }.filter { case (name, _) => !errors.contains(name) }
    // The driver records only the final ~2000 chars of combined output and
    // parses the JSON line out of that window. A 100-query map at full
    // double precision is a ~4 KB line, so its head fell off the front of
    // the window in rounds 1-2 and nothing parsed (BENCH_r0{1,2}.json
    // "parsed": null). Emit TWO lines: a full-detail line first (for local
    // analysis; front-truncation is fine), then — after spark.stop(), so no
    // shutdown chatter follows it — a compact line holding the headline
    // metric plus only the slowest queries, sized to fit the tail window
    // whole.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s""""$k":${f3(v)}""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // thrown queries surface as a first-class JSON key, never a timing
    val errJson =
      if (errors.isEmpty) ""
      else s""","errors":${errors.map { case (k, v) =>
        s""""$k":${jsonStr(v)}""" }.mkString("{", ",", "}")}"""
    val loadJson = s""","load":${loadSummaryJson(
      loads.valuesIterator.flatten.toSeq)}"""
    println(s"""BENCH_FULL {"queries":${qmap(results)}$errJson$loadJson}""")
    spark.stop()
    val top = results.sortBy(-_._2).take(30)
    val compact = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries_are_slowest":${top.size},"queries":${qmap(top)}$errJson$loadJson}"""
    // Persist the full record for humans/diffing, independent of what the
    // driver's tail window captures.
    val fullJson = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries":${qmap(results)}$errJson$loadJson,"load_per_rep":${loadPerRepJson(loads.toSeq)}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench.json"),
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"WARN bench.json not written: $e")
    }
    // Last line of the run, bare (build.sbt strips sbt's [info] prefix and
    // [success] trailer): this is the line the driver parses.
    println(compact)
    System.out.flush()
  }
}
