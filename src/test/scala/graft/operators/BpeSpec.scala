package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer golden tests: the distributed merge loop must agree with an
  * independent single-machine reference implementation, on the classic
  * textbook corpus and on randomized corpora. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala BPE reference (Sennrich-style): word-freq table, argmax
    * pair (lexicographic tie-break), greedy left-to-right non-overlapping
    * merge. */
  private def referenceBpe(words: Map[String, Long], numMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) => w.map(_.toString).toVector -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to numMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((p1, p2), n) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, p1, p2, n))
        state = state.toSeq.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
              merged += (p1 + p2); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def trainOn(texts: Seq[String], n: Int) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Bpe.train(docs, col("text"), n)._1
  }

  test("classic corpus: merges match the reference, greedily non-overlapping") {
    // Sennrich et al.'s running example, as a whitespace corpus
    val texts = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = trainOn(texts, 4)
    val want = referenceBpe(words, 4)
    assert(got == want)
    // first merge is the famous (e, s) with weight 9
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
  }

  test("overlapping runs merge left-to-right: aaaa -> [aa, aa]") {
    val got = trainOn(Seq("aaaa aaaa aaaa"), 1)
    assert(got == Seq((1, "a", "a", 9L))) // 3 adjacent pairs x 3 words
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val state = Bpe.applyMerge(
      Bpe.wordState(docs, col("text")), "a", "a")
    assert(state.select($"syms").as[Seq[String]].head() == Seq("aa", "aa"))
  }

  /** Reference encode: apply merges in rank order, greedy left-to-right
    * non-overlapping per merge. */
  private def referenceEncode(word: String, merges: Seq[(String, String)])
      : Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (syms, (p1, p2)) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
          out += (p1 + p2); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

  test("encodeWords reproduces the reference tokenization for every word") {
    val texts = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "),
      "lowest newlow widower aaaa")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, col("text"), 4)._1.map(m => (m._2, m._3))
    val words = docs
      .select(explode(graft.Fns.tokens(col("text"))).as("word")).distinct()
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    val got = Bpe.encodeWords(words, merges)
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    got.foreach { case (w, syms) =>
      assert(syms == referenceEncode(w, merges), s"word $w merges $merges")
    }
    // unseen-at-train words still encode (subset of merges apply)
    assert(got.contains("widower") && got.contains("aaaa"))
  }

  test("randomized corpora agree with the reference") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocab = Seq("ab", "abc", "bca", "cab", "aabb", "bbc", "ca")
      val ws = (1 to 40).map(_ => vocab(rnd.nextInt(vocab.length)))
      val words = ws.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val got = trainOn(Seq(ws.mkString(" ")), 3)
      assert(got == referenceBpe(words, 3), s"trial $trial")
    }
  }
}
