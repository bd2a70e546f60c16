package graft.star

import java.sql.{Date, Timestamp}

import graft.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema bundle: one fact table + named dimension tables
  * (`R/star_transformer.R:42-45`). */
final case class StarSchema(fact: DataFrame, dims: Map[String, DataFrame])

/** Star transformer — rebuild of `R/star_transformer.R` with the reference's
  * defects fixed (SURVEY.md §8):
  *  - dims are built GLOBALLY, not per batch (fixes cross-batch surrogate-key
  *    collisions, Q3);
  *  - fact rows join dimension keys on the dimension VALUE, not a repeated
  *    record id (fixes the fan-out bug, Q5);
  *  - the run id and clock are injected, not random/wall-clock (Q6), so runs
  *    are reproducible and oracle-comparable.
  *
  * Scale notes: each dimension is tiny by the classifier's contract
  * (<50 distinct values — `R/schema_analyzer.R:34`), so the surrogate-key
  * window over the post-distinct values is a few rows on one partition, and
  * every fact-to-dim join is a broadcast-hash join: the fact table is never
  * shuffled. For generic (unbounded) dims use [[buildDimScalable]], which
  * assigns keys without a single-partition sort.
  */
object StarTransformer {

  /** Dimension build (`R/star_transformer.R:51-68`): distinct non-null
    * values, sorted, keyed 1..n by row_number, plus dimension metadata. */
  def buildDim(df: DataFrame, valueCol: String, loadDate: Date): DataFrame = {
    val keyCol = s"${valueCol}_key"
    df.select(qcol(valueCol)).filter(qcol(valueCol).isNotNull)
      .distinct()
      .withColumn(keyCol, row_number().over(Window.orderBy(qcol(valueCol))))
      .select(qcol(keyCol), qcol(valueCol),
        lit(loadDate).as("created_date"), lit(true).as("is_active"))
  }

  /** Incremental dimension merge: values already in `existing` KEEP their
    * surrogate keys (appended fact rows stay consistent with historical
    * ones); genuinely new values get fresh keys above the current max, in
    * value order. This is what the reference's per-batch keying should have
    * been (SURVEY.md §8 Q3). */
  def mergeDim(existing: DataFrame, df: DataFrame, valueCol: String,
      loadDate: Date): DataFrame = {
    val keyCol = s"${valueCol}_key"
    val maxKey = existing.agg(max(qcol(keyCol))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.get(0).asInstanceOf[Number].longValue()
    }
    val newVals = df.select(qcol(valueCol)).filter(qcol(valueCol).isNotNull)
      .distinct()
      .join(existing.select(qcol(valueCol)), Seq(valueCol), "left_anti")
    val keyed = newVals
      .withColumn(keyCol,
        (row_number().over(Window.orderBy(qcol(valueCol))) + lit(maxKey))
          .cast(existing.schema(keyCol).dataType))
      .select(qcol(keyCol), qcol(valueCol),
        lit(loadDate).as("created_date"), lit(true).as("is_active"))
    existing.select(keyed.columns.map(qcol): _*).unionByName(keyed)
  }

  /** Key assignment for dims too large for one partition: zipWithIndex over
    * a sorted distinct — keys are still dense, unique, value-deterministic,
    * but no single-partition window. (Sort is a range-partitioned exchange;
    * index = partition offset + position, computed per partition.) */
  def buildDimScalable(df: DataFrame, valueCol: String, loadDate: Date)
      : DataFrame = {
    val spark = df.sparkSession
    val distinctSorted = df.select(qcol(valueCol))
      .filter(qcol(valueCol).isNotNull).distinct().orderBy(qcol(valueCol))
    val schema = distinctSorted.schema
      .add(s"${valueCol}_key", org.apache.spark.sql.types.LongType)
    val keyed = spark.createDataFrame(
      distinctSorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
    keyed.select(qcol(s"${valueCol}_key"), qcol(valueCol),
      lit(loadDate).as("created_date"), lit(true).as("is_active"))
  }

  /** Fact build (`R/star_transformer.R:74-124`): id + measures (promoted to
    * double with silent-null semantics) + audit columns, then a broadcast
    * left join per dimension to attach surrogate keys. */
  def buildFact(
      df: DataFrame,
      idCol: String,
      measureCols: Seq[String],
      dims: Map[String, DataFrame],
      auditCols: Seq[String],
      runId: Long,
      loadTs: Timestamp): DataFrame = {
    val base = df.select(
      (qcol(idCol) +:
        measureCols.map(m =>
          expr(s"try_cast(cast(`$m` AS string) AS double)").as(m))) ++
        dims.keys.toSeq.sorted.map(qcol) ++
        auditCols.filter(df.columns.contains).map(qcol): _*)
    val withKeys = dims.toSeq.sortBy(_._1).foldLeft(base) {
      case (acc, (dimCol, dim)) =>
        acc.join(
          broadcast(dim.select(qcol(s"${dimCol}_key"), qcol(dimCol))),
          Seq(dimCol), "left")
          .drop(dimCol)
    }
    withKeys
      .withColumn("record_count", lit(1))
      .withColumn("batch_id", lit(runId))
      .withColumn("load_timestamp", lit(loadTs))
  }

  /** Full transform: classified roles -> dims + fact
    * (`R/star_transformer.R:4-46`). `roles` maps column name to its
    * classification (from [[graft.profile.SchemaProfiler]]). */
  def build(
      df: DataFrame,
      idCol: String,
      roles: Map[String, String],
      runId: Long,
      loadTs: Timestamp): StarSchema = {
    val loadDate = new Date(loadTs.getTime)
    val dimCols = roles.collect { case (c, "dimension") => c }.toSeq.sorted
    val measureCols = roles.collect { case (c, "measure") => c }.toSeq.sorted
      .filterNot(_ == idCol)
    val dims = dimCols.map(c => c -> buildDim(df, c, loadDate)).toMap
    val fact = buildFact(df, idCol, measureCols, dims,
      Seq("source_file_name", "source_file_path"), runId, loadTs)
    StarSchema(fact, dims)
  }

  /** Read-back aggregation (`R/star_transformer.R:148-165`): group by dims,
    * per-measure sum/avg/min/max/count with suffixed names. */
  def aggregateFactData(fact: DataFrame, groupCols: Seq[String],
      measureCols: Seq[String]): DataFrame =
    fact.groupBy(groupCols.map(qcol): _*)
      .agg(
        measureCols.flatMap(m => Seq(
          sum(qcol(m)).as(s"${m}_sum"),
          avg(qcol(m)).as(s"${m}_avg"),
          min(qcol(m)).as(s"${m}_min"),
          max(qcol(m)).as(s"${m}_max"),
          count(qcol(m)).as(s"${m}_count"))).head,
        measureCols.flatMap(m => Seq(
          sum(qcol(m)).as(s"${m}_sum"),
          avg(qcol(m)).as(s"${m}_avg"),
          min(qcol(m)).as(s"${m}_min"),
          max(qcol(m)).as(s"${m}_max"),
          count(qcol(m)).as(s"${m}_count"))).tail: _*)

  /** Integrity checks (`R/star_transformer.R:168-199`): non-empty fact/dims,
    * unique+dense surrogate keys, and (beyond the reference) FK integrity —
    * every fact key must resolve. Returns human-readable violations. */
  def validateIntegrity(star: StarSchema): Seq[String] = {
    val violations = Seq.newBuilder[String]
    if (star.fact.isEmpty) violations += "fact table is empty"
    star.dims.foreach { case (name, dim) =>
      val keyCol = s"${name}_key"
      val n = dim.count()
      if (n == 0) violations += s"dimension $name is empty"
      val distinctKeys = dim.select(qcol(keyCol)).distinct().count()
      if (distinctKeys != n)
        violations += s"dimension $name has duplicate surrogate keys"
      val unresolved = star.fact.filter(qcol(keyCol).isNotNull)
        .join(dim, Seq(keyCol), "left_anti").count()
      if (unresolved > 0)
        violations += s"$unresolved fact rows have unresolved $keyCol"
    }
    violations.result()
  }
}
