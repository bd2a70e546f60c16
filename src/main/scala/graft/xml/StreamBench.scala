package graft.xml

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Streaming-ingest benchmark over the same reference-shaped corpus as
  * [[PipelineBench]]: measures (1) a cold full drain of N files through
  * [[XmlStream]] (setup probe + AvailableNow ingest to parquet), and
  * (2) the INCREMENTAL drain — 1% more files land, a new invocation
  * ingests only them — which is the number the batch pipeline cannot
  * have: its re-run cost is a function of the whole directory, a
  * stream's of the delta.
  *
  * Usage: `runMain graft.xml.StreamBench [nFiles] [recordsPerFile]`
  * (defaults 1000 x 1550 — the reference's published 1,000-file tier).
  * Prints one JSON line.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000)
    val perFile = args.lift(1).map(_.toInt).getOrElse(1550)
    val in = Files.createTempDirectory("graft_sbench_in").toString
    val out = Files.createTempDirectory("graft_sbench_out").toString
    val cp = Files.createTempDirectory("graft_sbench_cp").toString
    val bytes = PipelineBench.writeCorpus(in, nFiles, perFile)

    val spark = SparkSession.builder()
      .appName("graft-stream-bench")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drain(): Double = {
      val t0 = System.nanoTime()
      val s = XmlStream.setup(spark, in)
      XmlStream.sink(XmlStream.records(spark, in, s), out, cp)
        .awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = drain()
    val rows0 = spark.read.parquet(out).count()
    // 1% more files land; a fresh invocation ingests only the delta
    val deltaFiles = math.max(nFiles / 100, 1)
    (0 until deltaFiles).foreach { i =>
      val p = java.nio.file.Paths.get(in, f"late$i%04d.xml")
      Files.writeString(p,
        s"""<?xml version="1.0"?>
           |<catalog><record id="late$i" status="active">
           |  <title>Late</title><price>1.0</price>
           |  <detail><total>1.0</total><qty>1</qty></detail>
           |  <tag>t</tag><tag>u</tag>
           |</record></catalog>
           |""".stripMargin)
    }
    val incr = drain()
    val rows1 = spark.read.parquet(out).count()
    // scalastyle:off println
    println(f"""{"files":$nFiles,"bytes":$bytes,"rows":$rows0,"cold_sec":$cold%.2f,"delta_files":$deltaFiles,"delta_rows":${rows1 - rows0},"incr_sec":$incr%.2f}""")
    // scalastyle:on println
    spark.stop()
  }
}
