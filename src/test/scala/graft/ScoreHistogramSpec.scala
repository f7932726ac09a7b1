package graft

import graft.operators.ScoreHistogram
import org.apache.spark.sql.functions._

/** Fixed-width score histogram + tercile cut estimates: pinned against
  * a driver-side recompute from the raw scores, plus the measured
  * rank-bound flags. */
class ScoreHistogramSpec extends SparkSpec {

  private lazy val scores: Array[Double] =
    graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .select((length(regexp_replace(col("sentence"), "[^A-Za-z]", ""))
        .cast("double") / length(col("sentence"))).as("s"))
      .collect().map(_.getDouble(0))

  private def binOf(s: Double): Int =
    math.min(math.floor(s * ScoreHistogram.NBins).toInt, ScoreHistogram.NBins - 1)

  test("qualityHist matches a driver-side recount; cum is a faithful prefix sum") {
    val hist = ScoreHistogram.qualityHist(spark, sfSmall)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expected = scores.groupBy(binOf).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    assert(hist.map(h => (h._1, h._2)).toSeq == expected)
    assert(hist.map(_._2).sum == scores.length.toLong)
    var run = 0L
    hist.foreach { case (_, n, cum) => run += n; assert(cum == run) }
  }

  test("histCuts: flags hold and the estimates bracket the exact empirical terciles") {
    val r = ScoreHistogram.histCuts(spark, sfSmall).collect().head
    val (nDocs, t1, c1, c2) = (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
    assert(nDocs == scores.length.toLong && t1 == nDocs / 3)
    assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8),
      s"audit flags must all hold: $r")
    // the exact empirical tercile values sit at or below their
    // estimated cuts (the estimate is the covering bin's UPPER edge)
    val sorted = scores.sorted
    assert(sorted((nDocs / 3).toInt.max(1) - 1) <= c1 + 1e-12)
    assert(sorted((2 * nDocs / 3).toInt.max(1) - 1) <= c2 + 1e-12)
    // and each exact tercile falls no more than one bin width below
    // the estimate — the histogram guarantee restated on values
    assert(sorted((nDocs / 3).toInt.max(1) - 1) > c1 - 1.0 / ScoreHistogram.NBins - 1e-12)
  }
}
