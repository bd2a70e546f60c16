package graft

import graft.profile.SchemaProfiler
import graft.xml.XmlFlatten
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Pure-function properties (ScalaCheck, sbt-native runner). */
object MakeUniqueProps extends Properties("XmlFlatten.makeUnique") {
  private val names = Vector("a", "b", "tag", "id", "x")
  private val genName = Gen.choose(0, names.size - 1).map(names)

  property("output names are unique") =
    Prop.forAll(Gen.listOfN(20, genName)) { ns =>
      val out = XmlFlatten.makeUnique(ns)
      out.distinct.size == out.size
    }

  property("first occurrence keeps its name; order preserved") =
    Prop.forAll(Gen.listOfN(20, genName)) { ns =>
      val out = XmlFlatten.makeUnique(ns)
      out.size == ns.size &&
        ns.distinct.forall(n => out.indexOf(n) == ns.indexOf(n))
    }
}

/** Classifier rules re-modeled independently and checked against the real
  * Column expression over 300 seeded-random metric rows in ONE Spark pass —
  * the SURVEY.md §5 property: any column with numeric_ratio > 0.8 must be a
  * measure unless a name rule fires, etc. */
class ClassifierPropertySpec extends SparkSpec {
  import spark.implicits._

  private def model(name: String, nr: Double, uniq: Long, n: Long): String =
    if (Seq("id", "record_id").contains(name)) "identifier"
    else if (Seq("source_file_name", "source_file_path", "load_timestamp")
      .contains(name)) "audit"
    else if (nr > 0.8) "measure"
    else if (uniq < n * 0.1 && uniq < 50) "dimension"
    else if (uniq == n) "potential_key"
    else "attribute"

  test("classify column expression matches the rule model on random input") {
    val rnd = new scala.util.Random(42)
    val names = Seq("id", "record_id", "source_file_name", "load_timestamp",
      "price", "qty", "category", "note")
    val cases = (1 to 300).map { _ =>
      val n = 10L + rnd.nextInt(10000)
      (names(rnd.nextInt(names.length)), rnd.nextDouble(),
        rnd.nextInt(n.toInt + 1).toLong, n)
    }
    val got = cases.toDF("name", "nr", "uniq", "n")
      .select(SchemaProfiler.classify($"name", $"nr", $"uniq", $"n"))
      .as[String].collect()
    cases.zip(got).foreach { case ((name, nr, uniq, n), actual) =>
      assert(actual == model(name, nr, uniq, n),
        s"($name, $nr, $uniq, $n)")
    }
  }

  test("surrogate keys are dense, unique, and value-deterministic") {
    val rnd = new scala.util.Random(7)
    val values = (1 to 500).map(_ => s"v${rnd.nextInt(30)}")
    val df = values.toDF("cat")
    val dim = graft.star.StarTransformer
      .buildDim(df, "cat", java.sql.Date.valueOf("2024-01-01"))
      .select($"cat_key".cast("long"), $"cat").as[(Long, String)]
      .collect().sortBy(_._1)
    val distinctSorted = values.distinct.sorted
    assert(dim.map(_._1).toSeq == (1L to distinctSorted.size))
    assert(dim.map(_._2).toSeq == distinctSorted)
  }
}
