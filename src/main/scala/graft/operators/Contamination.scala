package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus contamination / decontamination operators (SURVEY.md §2.11
  * X1/X2 extension tier — the eval-hygiene pass every training-data
  * pipeline runs before a corpus ships).
  *
  * Both operators are shingle-containment joins: explode distinct 5-token
  * shingles, drop stop-phrases (df cap, mirrored in the oracle), inverted-
  * index join against the other corpus, aggregate containment =
  * |A∩B| / |A|. The benchmark side of `q_contamination` is tiny by
  * construction (one eval suite vs the whole corpus), so Catalyst
  * broadcasts it; the corpus side never self-joins. `q_cross_dedup` is the
  * pairwise variant (per (a,b) doc pair, not vs the union) — the shape is
  * identical to q_ngram_jaccard's inverted index, linear in shared-shingle
  * pairs, never |A|×|B|.
  */
object Contamination {
  import Fns._

  /** Stop-phrase cap shared with [[Dedup.MaxShingleDf]] semantics. */
  val MaxShingleDf = 100

  /** Distinct 5-token shingles per doc: (doc_id, source, shingle). */
  private def shingles(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // spread BEFORE the explode: the sf-scale documents file is a single
    // scan split, which would serialize the shingle battery on one core
    spread(docs.select($"doc_id", $"source", $"text"))
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 5)
      .select($"doc_id", $"source", explode(array_distinct(expr(
        "transform(sequence(1, size(toks)-4), i -> concat_ws(' ', slice(toks, i, 5)))")))
        .as("shingle"))
  }

  /** DuckDB fragment mirroring [[shingles]] (5-token shingles, distinct). */
  private val sqlShingles =
    s"""t AS (
       |  SELECT doc_id, source, ${sqlTokens("text")} AS toks FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, source,
       |    unnest(list_transform(generate_series(1, len(toks)-4),
       |      i -> array_to_string(toks[i:i+4], ' '))) AS shingle
       |  FROM t WHERE len(toks) >= 5)""".stripMargin

  val queries: Seq[(String, GQuery)] = Seq(

    // Benchmark contamination: fraction of each corpus doc's 5-gram
    // shingles that appear anywhere in the benchmark set (source src0
    // stands in for an eval suite). Benchmark shingle set is distinct +
    // small -> broadcast; corpus side is one explode + one aggregation.
    "q_contamination" -> GQuery(
      (s, d) => {
        import s.implicits._
        val sh = shingles(Tables.load(s, d, "documents"))
        val bench = sh.filter($"source" === "src0")
          .select($"shingle").distinct()
          .withColumn("hit", lit(1))
        sh.filter($"source" =!= "src0")
          .join(broadcast(bench), Seq("shingle"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shingles"), count($"hit").as("n_hit"))
          .select($"doc_id", $"n_shingles", $"n_hit",
            ($"n_hit".cast("double") / $"n_shingles".cast("double"))
              .as("contamination"))
          .orderBy($"contamination".desc, $"doc_id")
      },
      Some(s"""WITH $sqlShingles,
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
        |c AS (
        |  SELECT s.doc_id, COUNT(*) AS n_shingles,
        |    COUNT(b.shingle) AS n_hit
        |  FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
        |  WHERE s.source != 'src0' GROUP BY s.doc_id)
        |SELECT doc_id, n_shingles, n_hit,
        |  CAST(n_hit AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS contamination
        |FROM c ORDER BY contamination DESC, doc_id""".stripMargin),
      "benchmark-contamination ratio per doc (eval-hygiene pass)"),

    // Cross-corpus near-dedup: corpus A (src0..src9) docs whose 5-gram
    // containment in some corpus B (src10..src19) doc reaches 0.8, with
    // the best-matching B doc. Inverted-index join on shingle + one
    // window for the argmax — the pairs that survive the df cap are the
    // only rows shuffled.
    "q_cross_dedup" -> GQuery(
      (s, d) => {
        import s.implicits._
        val wsh = Window.partitionBy($"shingle")
        val sh = shingles(Tables.load(s, d, "documents"))
          .withColumn("df", count(lit(1)).over(wsh))
          .filter($"df" <= MaxShingleDf)
          .drop("df")
          .withColumn("half",
            (substring($"source", 4, 10).cast("int") >= 10).cast("int"))
        val wdoc = Window.partitionBy($"a_id")
        val na = Window.partitionBy($"doc_id")
        val a = sh.filter($"half" === 0)
          .withColumn("n_a", count(lit(1)).over(na))
          .select($"doc_id".as("a_id"), $"n_a", $"shingle")
        val b = sh.filter($"half" === 1)
          .select($"doc_id".as("b_id"), $"shingle")
        val best = a.join(b, "shingle")
          .groupBy($"a_id", $"b_id", $"n_a")
          .agg(count(lit(1)).as("inter"))
          .select($"a_id", $"b_id",
            ($"inter".cast("double") / $"n_a".cast("double"))
              .as("containment"))
          .withColumn("rk", row_number().over(
            wdoc.orderBy($"containment".desc, $"b_id")))
          .filter($"rk" === 1 && $"containment" >= 0.8)
        best.select($"a_id", $"b_id", $"containment").orderBy($"a_id")
      },
      Some(s"""WITH $sqlShingles,
        |capped AS (
        |  SELECT doc_id, source, shingle FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh)
        |  WHERE df <= $MaxShingleDf),
        |h AS (SELECT doc_id, shingle,
        |    CAST(substr(source, 4) AS INT) >= 10 AS half FROM capped),
        |a AS (SELECT doc_id AS a_id, shingle,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n_a FROM h WHERE NOT half),
        |b AS (SELECT doc_id AS b_id, shingle FROM h WHERE half),
        |p AS (
        |  SELECT a_id, b_id, CAST(COUNT(*) AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      AS containment
        |  FROM a JOIN b USING (shingle) GROUP BY a_id, b_id, n_a),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY a_id
        |    ORDER BY containment DESC, b_id) AS rk FROM p)
        |SELECT a_id, b_id, containment FROM r
        |WHERE rk = 1 AND containment >= 0.8 ORDER BY a_id""".stripMargin),
      "cross-corpus near-dup removal with best-match attribution"),
  )
}
