package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the standing-store modules ([[DedupStore]],
  * [[DecontamStore]]): batch-partitioned-data presence probe and the
  * parameter-metadata file that makes mismatched append/screen
  * parameters a loud refusal instead of a silent miss. */
private[operators] object StoreLayout {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff `dir` exists and holds at least one `batch_id=` partition. */
  def hasBatchData(spark: SparkSession, dir: String): Boolean = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    f.exists(p) &&
      f.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** First caller writes `params` to `metaPath`; every later caller must
    * present the identical parameters or the call is refused — a store's
    * layout (hash counts, banding, partition prefixes) is fixed at
    * creation, and a quiet mismatch would make lookups silently miss. */
  def checkOrWriteMeta(
      spark: SparkSession,
      metaPath: String,
      params: Seq[(String, String)]): Unit = {
    val f = fs(spark, metaPath)
    val mp = new Path(metaPath)
    if (!f.exists(mp)) {
      val os = f.create(mp, false)
      os.write(params.map { case (k, v) => s"$k=$v" }
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.close()
    } else {
      val in = f.open(mp)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val stored = bytes.toString("UTF-8").linesIterator
        .filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v
        }.toSeq
      require(stored == params,
        s"store at $metaPath was built with ${stored.toMap}; " +
          s"refusing use with ${params.toMap}")
    }
  }

  /** Requires that a meta file exists and matches (read-side check for
    * callers that must not create one). */
  def checkMeta(
      spark: SparkSession,
      metaPath: String,
      params: Seq[(String, String)]): Unit = {
    require(fs(spark, metaPath).exists(new Path(metaPath)),
      s"no store metadata at $metaPath")
    checkOrWriteMeta(spark, metaPath, params)
  }
}
