package graft.operators

import graft.{GQuery, Tables}
import graft.functions.VectorOps.cosine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.11 X3):
  * brute-force cosine top-k as the correctness baseline, a k-NN similarity
  * join, an IVF-style coarse-quantizer search as the scale path, and a
  * label-blocked embedding near-dup pass.
  *
  * Scale notes: brute force is a broadcast of the (tiny) query set against a
  * scan of the corpus — embarrassingly parallel, no shuffle until top-k
  * (TakeOrderedAndProject). The IVF variant is the 100 TB shape: nearest
  * coarse centroid prunes the corpus to one cell before scoring, turning a
  * full scan into a partition-pruned scan when the corpus is written
  * partitioned by cell id. */
object Similarity {

  private def emb(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** DuckDB cosine over DOUBLE[] — float inputs are widened first so both
    * engines do exact float→double conversion then identical double math. */
  private def duckCos(a: String, b: String) =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  val queries: Seq[(String, GQuery)] = Seq(

    // X3 brute-force cosine top-k for one query vector, scored by the
    // native codegen expression (functions.CosineSimilarityExpr): one fused
    // loop per pair, no per-element lambda dispatch, math identical to
    // VectorOps.cosine.
    "q_similarity" -> GQuery(
      (s, d) => {
        import s.implicits._
        import graft.functions.VectorOps
        val e = emb(s, d)
        val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
        e.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            expr("cosine_sim(embedding, q_emb)").as("cos_sim"))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, ${duckCos("e.embedding", "q.q_emb")} AS cos_sim
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
      "brute-force cosine top-k (extension X3)"),

    // X3 k-NN similarity join: top-3 neighbors for each of 5 query vectors
    // via a per-query rank window (partitioned — no global sort).
    "q_knn_join" -> GQuery(
      (s, d) => {
        import s.implicits._
        import graft.functions.VectorOps
        val e = emb(s, d)
        val q = e.filter($"vec_id" < 5)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
        val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
        e.crossJoin(broadcast(q))
          .filter($"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            expr("cosine_sim(embedding, q_emb)").as("cos_sim"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"q_id", $"vec_id", $"cos_sim", $"rn")
          .orderBy($"q_id", $"rn")
      },
      Some(s"""WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id, ${duckCos("e.embedding", "q.q_emb")} AS cos_sim
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, cos_sim, rn FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rn
        |  FROM scored) WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin),
      "k-NN similarity join (extension X3)"),

    // X3 IVF-style search: coarse centroids (per-label element-wise mean),
    // route the query to its nearest cell, brute-force only inside the cell.
    // Centroids come from the PRECOMPUTED persisted index (IvfIndex) — the
    // query path never re-trains; decimal-exact sums in the index keep the
    // centroid bit-identical to the oracle's formulation.
    "q_ivf_search" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = emb(s, d)
        val cent = IvfIndex.centroidsExact(s, d)
        val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
        val best = cent.crossJoin(broadcast(q))
          .select($"label", cosine($"cvec", $"q_emb").as("ccos"))
          .orderBy($"ccos".desc, $"label")
          .limit(1)
          .select($"label")
        e.join(broadcast(best), Seq("label"))
          .filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id", cosine($"embedding", $"q_emb").as("cos_sim"))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
      },
      Some(s"""WITH x AS (
        |  SELECT label, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
        |  FROM x GROUP BY 1, 2),
        |centa AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY label),
        |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        |best AS (
        |  SELECT label FROM centa, q
        |  ORDER BY list_cosine_similarity(cvec, CAST(q_emb AS DOUBLE[])) DESC, label
        |  LIMIT 1)
        |SELECT e.vec_id, ${duckCos("e.embedding", "q.q_emb")} AS cos_sim
        |FROM embeddings e JOIN best USING (label), q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
      "IVF coarse-quantizer ANN search (extension X3)"),

    // X2/X3 embedding near-dup, blocked by label (the blocked-join shape:
    // candidate pairs only within a coarse block, never the full n² join),
    // scored by the native codegen cosine.
    "q_embed_neardup" -> GQuery(
      (s, d) => {
        import s.implicits._
        import graft.functions.VectorOps
        val e = emb(s, d)
        val a = e.select($"label", $"vec_id".as("v1"), $"embedding".as("e1"))
        val b = e.select($"label", $"vec_id".as("v2"), $"embedding".as("e2"))
        a.join(b, Seq("label"))
          .filter($"v1" < $"v2")
          .select($"v1", $"v2",
            expr("cosine_sim(e1, e2)").as("cos_sim"))
          .orderBy($"cos_sim".desc, $"v1", $"v2")
          .limit(20)
      },
      Some(s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  ${duckCos("a.embedding", "b.embedding")} AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, v1, v2 LIMIT 20""".stripMargin),
      "label-blocked embedding near-dup pairs (extension X2)"),

    // X3 mean-pooling: the element-wise centroid of each label's vectors —
    // the pooled-document-embedding / class-prototype primitive. Shape:
    // posexplode to (label, pos, val), one partial-agg shuffle on
    // (label, pos) — never collects vectors to the driver. Sums need an
    // ORDER-INDEPENDENT exact representation (float addition orders differ
    // between engines AND between Spark partitions); decimal accumulation
    // gave that but cost 23.7 s at sf0.1 (VERDICT r3 #1). Long micro-units
    // are equally exact and stay in cheap integer codegen: widen float ->
    // double (exact), scale by 1e9, round half-up (identical semantics in
    // both engines), sum as BIGINT (associative). A single global long sum
    // would wrap once a (label,pos) group exceeds ~9e9 rows (ADVICE r4), so
    // the sum is two-stage: stage 1 groups by (label, pos, physical input
    // partition) and sums longs — bounded by rows-per-scan-partition (a
    // 1 GiB partition of floats is ~2.7e8 values -> |partial| <= ~2.7e17
    // for unit-normalized embeddings, 33x under Long.MaxValue; holds for
    // any |v| <= 30) — then stage 2 merges the <=num_partitions partials
    // per group in decimal(38,0), which is exact for any group size. Only
    // the tiny merge (num_partitions rows/group) pays decimal cost; the
    // per-element hot path stays integer codegen. The mean then divides
    // engine-identical integers in double space (both engines round the
    // same exact integer to the nearest double).
    "q_embed_pool" -> GQuery(
      (s, d) => {
        import s.implicits._
        emb(s, d)
          .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
          .withColumn("part", spark_partition_id())
          .groupBy($"label", $"pos", $"part")
          .agg(
            sum(round($"v".cast("double") * lit(1e9), 0).cast("long"))
              .as("psum"),
            count(lit(1)).as("pn"))
          .groupBy($"label", $"pos")
          .agg(
            sum($"psum".cast("decimal(38,0)")).as("sum_u"),
            sum($"pn").as("n"))
          .select($"label", $"pos",
            ($"sum_u".cast("double") / lit(1e9) / $"n").as("mean_v"))
          .orderBy($"label", $"pos")
      },
      Some("""SELECT label, CAST(u.i - 1 AS INT) AS pos,
        |  CAST(SUM(CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1e9, 0)
        |    AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*) AS mean_v
        |FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin),
      "per-label mean-pooled embedding (extension X3)"),

    // X3 sign-random-projection (SRP) LSH — the hashing-family companion
    // to the IVF index: 8 fixed hyperplanes, each embedding mapped to the
    // 8-bit sign pattern of its projections, near-dup candidates = pairs
    // sharing a bucket (P[bit match] = 1 - angle/pi, the SRP guarantee).
    // Everything is EXACTLY oracle-checkable, which float-dot LSH never
    // is: the "random" planes are a deterministic integer formula
    // w(j,i) = ((j*31 + i*17) mod 7) - 3 both engines compute literally,
    // and dots are taken in micro-unit longs (round(v*1e6) as bigint), so
    // the SIGN — the only thing that matters — cannot flip on float
    // summation order. Shape: one posexplode + one vec-keyed partial-agg
    // shuffle for signatures (the embed_pool shape), then a self-join on
    // the 8-bit bucket — sub-linear candidates, no all-pairs.
    "q_srp_lsh" -> GQuery(
      (s, d) => {
        import s.implicits._
        val planes = 0 until 8
        val dots = planes.map(j =>
          sum($"u" * (pmod(lit(j * 31) + $"i" * 17, lit(7)) - 3))
            .as(s"d$j"))
        val sigs = emb(s, d)
          .select($"vec_id", posexplode(
            transform($"embedding",
              x => round(x.cast("double") * lit(1e6), 0).cast("long")))
            .as(Seq("i", "u")))
          .groupBy($"vec_id")
          .agg(dots.head, dots.tail: _*)
          .select($"vec_id",
            planes.map(j =>
              when(col(s"d$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
              .reduce(_ + _).as("sig"))
        sigs.as("a").join(sigs.as("b"),
            $"a.sig" === $"b.sig" && $"a.vec_id" < $"b.vec_id")
          .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
            $"a.sig".as("sig"))
          .orderBy($"v1", $"v2")
      },
      Some("""WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS uu
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id, j,
        |    SUM(uu[i] * (((j*31 + (i-1)*17) % 7) - 3)) AS dot
        |  FROM u,
        |       unnest(generate_series(1, len(uu))) AS s(i),
        |       unnest(generate_series(0, 7)) AS sj(j)
        |  GROUP BY vec_id, j),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN dot >= 0 THEN (1 << j) ELSE 0 END)
        |      AS BIGINT) AS sig
        |  FROM d GROUP BY vec_id)
        |SELECT a.vec_id AS v1, b.vec_id AS v2, a.sig
        |FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
        |ORDER BY v1, v2""".stripMargin),
      "sign-random-projection LSH buckets + candidate pairs (X3)"),

    // X3 L2-normalize + symmetric int8 quantization — the storage-shrink
    // pass before ANN indexing (4x smaller vectors). Per-row map only: the
    // squared-norm folds the array IN INDEX ORDER on both engines
    // (aggregate / list_reduce), so the doubles are bit-identical; the
    // int8 codes are emitted as one comma-joined signature string per
    // vector (robust cross-engine compare, no array-type equality games).
    "q_embed_quantize" -> GQuery(
      (s, d) => {
        import s.implicits._
        emb(s, d)
          .withColumn("norm", sqrt(expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), " +
              "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
          .select($"vec_id", $"norm",
            expr("concat_ws(',', transform(embedding, " +
              "x -> CAST(round(127.0 * CAST(x AS DOUBLE) / norm, 0) AS INT)))")
              .as("qsig"))
          .orderBy($"vec_id")
      },
      Some("""WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(
        |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (acc, x) -> acc + x)) AS norm
        |  FROM embeddings)
        |SELECT vec_id, norm,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(round(127.0 * CAST(x AS DOUBLE) / norm, 0) AS INT)), ',') AS qsig
        |FROM n ORDER BY vec_id""".stripMargin),
      "L2-normalize + int8 quantization signature (extension X3)"),
  )
}
