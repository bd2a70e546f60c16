package graft.xml

import scala.collection.mutable

import graft.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's XML flattening rule (`R/xml_parser.R:134-199`,
  * SURVEY.md §1.4), applied to the native XML source's structured output:
  *
  *  - record attributes (`_`-prefixed by `attributePrefix`) become columns
  *    named as-is (prefix stripped), FIRST in column order;
  *  - depth-1 child elements become one column each, valued by their text
  *    (an element with attributes contributes only its text, `_VALUE`);
  *  - depth>=2 children are COLLAPSED: a child that itself has children
  *    becomes a single string column joining its descendant leaf texts with
  *    a space (divergence note 1: the reference README claims nested
  *    measures surface individually; the code space-concatenates — the code
  *    wins, `README.md:334-345` vs `R/xml_parser.R:187-190`; divergence
  *    note 2: the reference joins in DOCUMENT order, but the native XML
  *    source sorts sibling names during schema inference, so we join in
  *    schema (alphabetical) order — deterministic, but a different
  *    permutation of the same texts);
  *  - repeated child names become `name, name.1, name.2, ...` (R
  *    `make.unique` semantics) up to the max repetition observed in the data;
  *  - direct text content of the record becomes `text_content`.
  *
  * All outputs are strings — the reference is stringly typed at ingest
  * (read with `inferSchema=false`); numeric promotion happens later in the
  * star transform.
  *
  * Scale notes: flattening is pure per-row projection (no shuffle). The only
  * extra job is ONE aggregate computing max repetition counts for array
  * columns (needed to materialize `name.N` columns); everything else is
  * schema-driven at plan time.
  */
object XmlFlatten {

  val AttributePrefix = "_"
  val ValueTag = "_VALUE"

  /** Text of a struct-typed element per the reference rule. `_VALUE` may
    * be scalar (simple text) or an ARRAY (mixed content: the text runs
    * around child elements) — arrays are space-joined, never cast raw (a
    * raw cast leaks `[a, b]` formatting). An element with both text and
    * children contributes text first, then child texts in schema order. */
  private def structText(c: Column, st: StructType): Column = {
    val valueTxt = st.fields.filter(_.name == ValueTag).toSeq.map { f =>
      f.dataType match {
        case ArrayType(_, _) =>
          array_join(c.getField(ValueTag).cast("array<string>"), " ")
        case _ => c.getField(ValueTag).cast("string")
      }
    }
    val parts = valueTxt ++ leafTexts(c, st)
    if (parts.size == 1) parts.head else concat_ws(" ", parts: _*)
  }

  /** Descendant leaf texts of a nested element, in schema-field order,
    * skipping attribute fields (ValueTag is `_`-prefixed, so text content
    * is contributed by [[structText]], not double-counted here). */
  private def leafTexts(c: Column, st: StructType): Seq[Column] =
    st.fields.filterNot(_.name.startsWith(AttributePrefix)).toSeq.flatMap { f =>
      val child = c.getField(f.name)
      f.dataType match {
        case st2: StructType =>
          Seq(structText(child, st2))
        case ArrayType(st2: StructType, _) =>
          Seq(array_join(transform(child, x => structText(x, st2)), " "))
        case ArrayType(_, _) =>
          Seq(array_join(child.cast("array<string>"), " "))
        case _ => Seq(child.cast("string"))
      }
    }

  /** Output column names drop any namespace prefix (`cat:title` →
    * `title`) — matching what an un-namespaced corpus yields; collisions
    * across namespaces fall into the make.unique numbering. Struct FIELD
    * access keeps the real (qualified) names. */
  private def localName(n: String): String = {
    val i = n.lastIndexOf(':')
    if (i >= 0) n.substring(i + 1) else n
  }

  /** R `make.unique`: first occurrence keeps the name, repeats get `.k`. */
  def makeUnique(names: Seq[String]): Seq[String] = {
    val seen = mutable.Map.empty[String, Int]
    names.map { n =>
      seen.get(n) match {
        case None => seen(n) = 0; n
        case Some(k) => seen(n) = k + 1; s"$n.${k + 1}"
      }
    }
  }

  /** Flattens one XML-source DataFrame to the reference's flat string table.
    * Array columns (repeated elements) need the max observed repetition —
    * computed in a single aggregate over all array columns. */
  def flatten(df: DataFrame): DataFrame =
    flattenWithMaxLens(df, maxRepetitions(df))

  /** Max observed repetition per array column (the data-dependent half of
    * [[flatten]]): ONE aggregate job over all array columns at once.
    * Streaming callers compute this on a bounded BATCH sample and pass it
    * to [[flattenWithMaxLens]] — an aggregate-then-project is not
    * expressible inside a single streaming query, and a stream needs a
    * FIXED output schema anyway (a late file with more repetitions than
    * the sample truncates into `name.N` columns; pick the sample to cover
    * the schema, as the batch pipeline's structure sample does). */
  def maxRepetitions(df: DataFrame): Map[String, Int] = {
    val arrayFields = df.schema.fields.toSeq
      .filter(_.dataType.isInstanceOf[ArrayType])
    if (arrayFields.isEmpty) Map.empty
    else {
      val aggs = arrayFields.map(f =>
        coalesce(max(size(qcol(f.name))), lit(0)).as(f.name))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      arrayFields.map(f => f.name -> row.getAs[Int](f.name)).toMap
    }
  }

  /** The pure-projection half of [[flatten]]: schema-driven at plan time,
    * no jobs, no shuffle — safe on a STREAMING DataFrame (given maxLens
    * from a batch sample via [[maxRepetitions]]). */
  def flattenWithMaxLens(df: DataFrame, maxLens: Map[String, Int])
      : DataFrame = {
    val fields = df.schema.fields.toSeq

    val attrCols = fields
      .filter(f => f.name.startsWith(AttributePrefix) && f.name != ValueTag)
      .map(f => localName(f.name.stripPrefix(AttributePrefix)) ->
        qcol(f.name).cast("string"))

    val elemCols = fields
      .filterNot(f => f.name.startsWith(AttributePrefix))
      .flatMap { f =>
        f.dataType match {
          case st: StructType =>
            Seq(localName(f.name) -> structText(qcol(f.name), st))
          case ArrayType(et, _) =>
            val n = maxLens.getOrElse(f.name, 0)
            (0 until math.max(n, 1)).map { i =>
              // try_element_at: rows with fewer repetitions get null
              val elem = try_element_at(qcol(f.name), lit(i + 1))
              val c = et match {
                case st: StructType => structText(elem, st)
                case _ => elem.cast("string")
              }
              localName(f.name) -> c
            }
          case _ => Seq(localName(f.name) -> qcol(f.name).cast("string"))
        }
      }

    val textCols = fields.filter(_.name == ValueTag)
      .map(_ => "text_content" -> col(ValueTag).cast("string"))

    val all = attrCols ++ elemCols ++ textCols
    val named = makeUnique(all.map(_._1)).zip(all.map(_._2))
    df.select(named.map { case (n, c) => c.as(n) }: _*)
  }
}
