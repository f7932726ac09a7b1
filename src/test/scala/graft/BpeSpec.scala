package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder vs an independent driver-side reference
  * implementation (the k-means pattern: the loop is deterministic but
  * not SQL-expressible, so the pin is exact equality with a
  * from-scratch reimplementation, not an oracle). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (driver-side, no Spark) -------------

  private def refSyms(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndMark

  private def refMergeOnce(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  private def refTrain(freqs: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words = freqs.map { case (w, f) => (refSyms(w), f) }.toVector
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), w) => (-w, a, b) }.head._1
        merges += ((l, r))
        words = words.map { case (s, f) => (refMergeOnce(s, l, r), f) }
        i += 1
      }
    }
    merges.toSeq
  }

  private def corpusOf(rows: (Long, String)*) = rows.toDF("id", "sentence")

  test("initial segmentation is chars plus the end marker") {
    val got = spark.range(1).select(Bpe.segment(lit("abc"), Nil)).head.getSeq[String](0)
    assert(got == Seq("a", "b", "c", Bpe.EndMark))
  }

  test("merge pass is leftmost-greedy and non-overlapping") {
    val got = spark.range(1)
      .select(Bpe.mergeOnce(Bpe.segment(lit("aaaa"), Nil), "a", "a"))
      .head.getSeq[String](0)
    // "aaaa</w>": (a,a) merges positions 0-1 and 2-3, never the
    // overlapping middle pair
    assert(got == Seq("aa", "aa", Bpe.EndMark))
    assert(got == refMergeOnce(refSyms("aaaa"), "a", "a"))
  }

  test("trained merges equal the reference implementation exactly") {
    val corpus = corpusOf(
      0L -> "low lower lowest low low",
      1L -> "newer newest new wider wide",
      2L -> "low lower newest newest wide")
    val freqs = corpus.select(explode(graft.operators.TextAnalytics.tokens(col("sentence"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.train(corpus, 10)
    assert(got == refTrain(freqs, 10))
    assert(got.size == 10)
  }

  test("training is deterministic across invocations") {
    val corpus = corpusOf(0L -> "banana bandana ban banana", 1L -> "cabana banana band")
    assert(Bpe.train(corpus, 6) == Bpe.train(corpus, 6))
  }

  test("encoder reproduces the reference segmentation and round-trips") {
    val corpus = corpusOf(
      0L -> "low lower lowest low low",
      1L -> "newer newest new wider wide")
    val merges = Bpe.train(corpus, 8)
    val words = Seq("low", "lowest", "newer", "wide", "unseen")
    val got = words.toDF("w")
      .select(col("w"), Bpe.segment(col("w"), merges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (w <- words) {
      val ref = merges.foldLeft(refSyms(w)) { case (s, (l, r)) => refMergeOnce(s, l, r) }
      assert(got(w) == ref, s"segmentation mismatch for $w")
      // round trip: pieces concatenate back to word + end marker
      assert(got(w).mkString("") == w + Bpe.EndMark)
    }
  }

  test("merge exhaustion stops early instead of looping") {
    val corpus = corpusOf(0L -> "ab")
    // "ab</w>" offers pairs (a,b),(b,</w>) then (ab,</w>) then one
    // symbol — at most 3 merges exist
    val merges = Bpe.train(corpus, 50)
    assert(merges.size <= 3 && merges.nonEmpty)
  }

  test("driver-corpus pair stats surface is well-formed") {
    val df = Bpe.pairCountsFor(spark, sfSmall)
    val rows = df.collect()
    assert(rows.length == 25)
    val weights = rows.map(_.getLong(2))
    assert(weights.sameElements(weights.sortBy(-_)))
  }

  test("corpus-wide encoder audit: every vocabulary word round-trips in bounds") {
    val r = Bpe.encodeAudit(spark, sfSmall).collect().head
    assert(r.getLong(0) > 0L)          // n_words
    assert(r.getBoolean(1))            // all_roundtrip
    assert(r.getBoolean(2))            // all_in_bounds
    assert(r.getLong(3) == 16L)        // n_merges applied
    // the merges actually compress: some word ends with fewer symbols
    // than its initial char+marker segmentation
    val merges = Bpe.mergesFor(spark, sfSmall)
    import org.apache.spark.sql.functions._
    val shrunk = Bpe.wordFreqs(
        graft.sources.Ingest.corpusFromDocuments(spark, sfSmall))
      .select(col("word"), Bpe.segment(col("word"), merges).as("syms"))
      .where(size(col("syms")) < length(col("word")) + 1)
      .count()
    assert(shrunk > 0L)
  }
}
