package graft.streaming

import java.sql.Timestamp

import graft.Fns
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document arriving on the stream. */
final case class DocArrival(ts: Timestamp, doc_id: Long, text: String)

/** A document's LSH view in one band bucket. */
final case class DocSig(doc_id: Long, sig: Seq[Long], band: String)

/** Near-dup flag: `doc_id` matched already-seen `dup_of` with
  * `est_sim` = fraction of agreeing MinHash slots (unbiased Jaccard
  * estimate). */
final case class NearDupHit(doc_id: Long, dup_of: Long, est_sim: Double)

/** Bucket state: the (doc_id, signature) pairs seen in this band bucket. */
final case class BucketState(docs: List[(Long, Seq[Long])])

/** Streaming near-duplicate detection (extension X2 under readStream) —
  * the streaming counterpart of the batch MinHash+LSH pass: flag each
  * arriving document against everything already seen, WITHOUT ever holding
  * the corpus — state is per-band-bucket signature lists, a few hundred
  * bytes per bucket, evicted on idle timeout.
  *
  * The signature math is the `q_minhash_sig` formula (md5-derived shingle
  * hash, eight affine permutations mod 2^31-1 — [[Dedup.mhPerms]]), computed
  * HERE as pure per-row array expressions: a document's signature is the
  * min over its own shingles, so no aggregation, no shuffle, no state is
  * needed to produce it — exactly what a streaming stage wants. Batch and
  * stream therefore share one signature definition, and the batch oracle
  * (`q_minhash_sig` vs DuckDB) transitively verifies the streaming math —
  * pinned in DedupStreamSpec by comparing this signature column against the
  * batch explode+groupBy formulation row-for-row.
  *
  * Scale notes: each doc fans out to exactly 2 band rows; the shuffle is
  * keyed by band bucket (the same banding the batch pass buckets on);
  * per-bucket state is capped at [[MaxBucket]] signatures mirroring the
  * batch bucket cap, so a degenerate bucket (boilerplate corpus) cannot
  * grow state without bound; idle buckets evict via processing-time
  * timeout. */
object DedupStream {

  /** Hard cap on signatures retained per band bucket (mirrors the batch
    * LSH bucket cap): a hot bucket stops ACCUMULATING state but still
    * flags new arrivals against the retained prefix. */
  val MaxBucket = 50

  /** Appends `sig` (array of 8 minhash slots) and the two band keys to
    * `df`, as per-row expressions over `textCol` — shared by the stream
    * and the spec's batch-parity check. */
  def withSignature(df: DataFrame, textCol: String): DataFrame = {
    val perms = Dedup.mhPerms
      .map { case (a, b) => s"array_min(transform(hs, h -> pmod($a * h + $b, ${Dedup.MhPrime}L)))" }
      .mkString("array(", ", ", ")")
    df
      .withColumn("__toks", Fns.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 3)
      .withColumn("hs", expr(
        "transform(transform(sequence(1, size(__toks) - 2), " +
          "i -> concat_ws(' ', slice(__toks, i, 3))), " +
          "sh -> CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT))"))
      .withColumn("sig", expr(perms))
      .withColumn("band1", md5(expr(
        "concat_ws('|', transform(slice(sig, 1, 4), x -> CAST(x AS STRING)))")))
      .withColumn("band2", md5(expr(
        "concat_ws('|', transform(slice(sig, 5, 4), x -> CAST(x AS STRING)))")))
      .drop("__toks", "hs")
  }

  /** Streaming near-dup pairs: each arriving doc is checked against every
    * signature already seen in either of its band buckets; a hit fires
    * when at least `minMatch` of 8 slots agree (6/8 ≈ Jaccard 0.75).
    * Output is per-(band, pair) — a pair caught by both bands surfaces
    * twice; downstream consumers dedupe, as the spec does. */
  def nearDupPairs(
      docs: DataFrame,
      textCol: String = "text",
      minMatch: Int = 6,
      idleTimeout: Option[String] = None): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val sigs = withSignature(docs, textCol)
      .select(col("doc_id").cast("long").as("doc_id"), col("sig"),
        explode(array(col("band1"), col("band2"))).as("band"))
      .as[DocSig]
    // Eviction is a deploy-time choice: ProcessingTimeTimeout makes the
    // engine run continuous no-data batches to poll deadlines (wasteful
    // under test, correct under a real trigger interval), so it is opt-in.
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    sigs.groupByKey(_.band)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), timeoutConf) {
        (_: String, batch: Iterator[DocSig], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(BucketState(Nil)).docs
            val hits = List.newBuilder[NearDupHit]
            // doc_id order makes re-delivered batches deterministic
            batch.toSeq.sortBy(_.doc_id).foreach { d =>
              seen.foreach { case (prevId, prevSig) =>
                if (prevId != d.doc_id) {
                  val m = prevSig.iterator.zip(d.sig.iterator)
                    .count { case (x, y) => x == y }
                  if (m >= minMatch)
                    hits += NearDupHit(d.doc_id, prevId, m / 8.0)
                }
              }
              if (seen.size < MaxBucket && !seen.exists(_._1 == d.doc_id))
                seen = (d.doc_id, d.sig) :: seen
            }
            state.update(BucketState(seen))
            idleTimeout.foreach(state.setTimeoutDuration)
            hits.result().iterator
          }
      }
  }
}
