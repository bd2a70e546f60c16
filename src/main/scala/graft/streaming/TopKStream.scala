package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.functions.CmsSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.CountMinSketch

/** Per-bucket heavy-hitter state: a serialized count-min sketch plus the
  * capped candidate set (key -> current CMS estimate). */
final case class TopKBucketState(cms: Array[Byte], cand: Map[String, Long])

/** One heavy-hitter candidate as emitted per micro-batch (Update mode). */
final case class HeavyHitter(bucket: Int, key: String, est: Long)

/** Streaming heavy hitters over an UNBOUNDED key domain with BOUNDED
  * state (SURVEY.md §2.10 + the X4 frequency tier, composed): the
  * streaming shape of the batch CMS partials in
  * [[graft.functions.CmsSketch]].
  *
  * Why not plain keyed counts: `flatMapGroupsWithState` keyed by the
  * item holds one state row PER DISTINCT KEY — at 100 TB/day of
  * free-text tokens or URLs that state is the vocabulary, unbounded.
  * Here keys hash into a FIXED number of buckets; each bucket's state is
  * one CMS (fixed counter grid — counts every key it has ever seen,
  * within ε·N overcount) plus at most `maxCandidates` candidate keys
  * with their current estimates. Total state = buckets × (CMS grid +
  * candidate cap) — a few MB, independent of key cardinality.
  *
  * Guarantee (the standard CMS+heap argument): estimates never
  * undercount, so any key whose true count exceeds the bucket's lowest
  * retained estimate at eviction time is retained; a true heavy hitter
  * can only be missing if `maxCandidates` keys in ITS bucket out-count
  * it — sizing buckets × maxCandidates ≥ a few × k makes the global
  * top-k safe in practice, and bucketing by hash spreads the hitters so
  * no single bucket must hold them all.
  *
  * Scale shape: each micro-batch pre-aggregates map-side per key inside
  * the group iterator (one CMS update per DISTINCT key per bucket per
  * batch, not per row), buckets process in parallel (state is
  * bucket-keyed), and Update-mode output emits each bucket's current
  * candidates — the downstream [[topKFromUpdates]] reduces the sink to
  * the latest estimate per key and takes the global top-k over a
  * buckets × maxCandidates-row table. */
object TopKStream {

  /** CMS grid parameters: eps 0.005 → width 544, confidence 0.99 →
    * depth 5; ~22 KB serialized per bucket. */
  val Eps = 0.005
  val Confidence = 0.99

  private def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** The streaming heavy-hitter operator: `keys` is the (possibly
    * unbounded-cardinality) item stream; emits each hash bucket's
    * current candidate set every micro-batch (Update mode). */
  def heavyHitters(
      keys: Dataset[String],
      buckets: Int = 64,
      maxCandidates: Int = 32): Dataset[HeavyHitter] = {
    import keys.sparkSession.implicits._
    keys
      .map(k => (math.floorMod(k.hashCode, buckets), k))
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKBucketState, HeavyHitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Int, rows: Iterator[(Int, String)],
         state: GroupState[TopKBucketState]) =>
          val prev = state.getOption
          val cms = prev.map(s => CountMinSketch.readFrom(
              new ByteArrayInputStream(s.cms)))
            .getOrElse(CountMinSketch.create(Eps, Confidence, CmsSketch.Seed))
          // batch-local pre-aggregation: one CMS update per distinct key
          val counts = scala.collection.mutable.HashMap.empty[String, Long]
          rows.foreach { case (_, k) =>
            counts.update(k, counts.getOrElse(k, 0L) + 1L)
          }
          counts.foreach { case (k, c) =>
            cms.addBinary(
              k.getBytes(java.nio.charset.StandardCharsets.UTF_8), c)
          }
          // candidates = previous survivors + this batch's keys, all
          // re-estimated against the updated sketch, then capped
          // (deterministic eviction: estimate desc, key asc)
          val cand = (prev.map(_.cand.keySet).getOrElse(Set.empty) ++
              counts.keySet)
            .map(k => k -> CmsSketch.estimate(cms, k)).toSeq
            .sortBy { case (k, e) => (-e, k) }
            .take(maxCandidates)
          state.update(TopKBucketState(serialize(cms), cand.toMap))
          cand.iterator.map { case (k, e) => HeavyHitter(bucket, k, e) }
      }
  }

  /** Reduce an Update-mode sink of [[HeavyHitter]] rows to the global
    * top-k: latest = max estimate per key (estimates only grow), over a
    * buckets × maxCandidates-bounded table. */
  def topKFromUpdates(updates: DataFrame, k: Int): DataFrame =
    updates
      .groupBy(col("key"))
      .agg(max(col("est")).as("est"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
}
