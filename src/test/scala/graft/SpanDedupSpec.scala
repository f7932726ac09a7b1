package graft

import org.apache.spark.sql.DataFrame
import graft.operators.SpanDedup

/** Span-level exact substring dedup (Lee et al. 2022 EXACTSUBSTR
  * semantics re-expressed Spark-first — see SpanDedup scaladoc):
  * windows duplicated corpus-wide mark spans, overlapping windows
  * merge maximally, within-doc repeats count, unique text stays
  * untouched. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "sentence")

  private def spans(df: DataFrame, w: Int = 8): Seq[(Long, Int, Int, Long)] =
    SpanDedup.dupSpans(df, w).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  // 26 distinct filler tokens so no accidental window repeats
  private def filler(tag: Char, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a shared 8-token run marks one exact span in both documents") {
    val shared = "the quick brown fox jumps over lazy dogs"
    val df = corpus(
      0L -> s"${filler('a', 10)} $shared ${filler('b', 10)}",
      1L -> s"${filler('c', 4)} $shared ${filler('d', 12)}")
    // doc 0: shared run occupies token positions 10..17; doc 1: 4..11
    assert(spans(df) == Seq((0L, 10, 18, 1L), (1L, 4, 12, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 10 shared tokens -> 3 duplicated 8-windows at starts 0,1,2 in a
    // doc that is exactly the shared run: they merge to [0, 10)
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val df = corpus(
      0L -> shared,
      1L -> s"${filler('x', 7)} $shared")
    assert(spans(df) == Seq((0L, 0, 10, 3L), (1L, 7, 17, 3L)))
  }

  test("within-document repetition is duplication too") {
    val loop = (0 until 8).map(i => s"r$i").mkString(" ")
    val df = corpus(0L -> s"$loop ${filler('m', 8)} $loop")
    // both occurrences of the 8-token loop mark spans; the unique
    // middle does not bridge them
    assert(spans(df) == Seq((0L, 0, 8, 1L), (0L, 16, 24, 1L)))
  }

  test("unique text yields no spans; short docs are skipped") {
    val df = corpus(
      0L -> filler('u', 20),
      1L -> "too short for a window",
      2L -> filler('v', 9))
    assert(spans(df).isEmpty)
  }

  test("abutting spans merge only when windows overlap or touch") {
    // two shared runs separated by ONE unique token: windows never
    // touch across it (coverage ends at 8, next starts at 9), so two
    // spans survive
    val a = (0 until 8).map(i => s"a$i").mkString(" ")
    val b = (0 until 8).map(i => s"b$i").mkString(" ")
    val df = corpus(
      0L -> s"$a only $b",
      1L -> s"${filler('p', 3)} $a ${filler('q', 3)} $b")
    assert(spans(df).filter(_._1 == 0L) == Seq((0L, 0, 8, 1L), (0L, 9, 17, 1L)))
  }

  test("dupStats reports the duplicated-token fraction per document") {
    val shared = "the quick brown fox jumps over lazy dogs"
    val df = corpus(
      0L -> s"$shared ${filler('z', 12)}",
      1L -> s"$shared",
      2L -> filler('w', 10))
    val st = SpanDedup.dupStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(st(0L) == ((20L, 8L, 0.4)))
    assert(st(1L) == ((8L, 8L, 1.0)))
    assert(st(2L) == ((10L, 0L, 0.0)))
  }

  test("persisted window index reproduces the batch computation") {
    val shared = "the quick brown fox jumps over lazy dogs"
    val df = corpus(
      0L -> s"${filler('a', 10)} $shared ${filler('b', 10)}",
      1L -> s"${filler('c', 4)} $shared ${filler('d', 12)}",
      2L -> filler('e', 20))
    val dir = tmpDir("span-idx")
    SpanDedup.saveWindowIndex(df, dir)
    val viaIndex = SpanDedup.dupSpansWithIndex(spark, dir, df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val batch = SpanDedup.dupSpans(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(viaIndex == batch && batch.nonEmpty)
  }

  test("appending to the index equals a fresh build over the union") {
    val shared = (0 until 9).map(i => s"s$i").mkString(" ")
    val first = corpus(0L -> s"${filler('a', 6)} $shared")
    val second = corpus(
      1L -> s"$shared ${filler('b', 6)}",
      2L -> filler('u', 15))
    val union = first.union(second)
    val dir = tmpDir("span-idx-append")
    SpanDedup.saveWindowIndex(first, dir)
    // the shared run is unique in `first` alone: no spans yet
    assert(SpanDedup.dupSpansWithIndex(spark, dir, first).count() == 0)
    val appended = SpanDedup.appendWindowIndex(spark, dir, second)
    assert(appended > 0)
    val viaIndex = SpanDedup.dupSpansWithIndex(spark, dir, union).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val rebuild = SpanDedup.dupSpans(union).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(viaIndex == rebuild && rebuild.nonEmpty,
      "additive log counts must match a fresh build over the union")
  }

  test("driver-corpus surface is ordered and internally consistent") {
    val df = SpanDedup.dupSpansFor(spark, sfSmall)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty, "sf corpus has planted duplicate docs; spans expected")
    assert(rows.sameElements(rows.sortBy(t => (t._1, t._2))))
    assert(rows.forall { case (_, s, e) => s >= 0 && e - s >= 8 })
  }
}
