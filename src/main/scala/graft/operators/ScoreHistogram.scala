package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Fixed-width score histogram — the SCALE path for quantile cuts over
  * a quality-score column. [[ExactRank]] computes exact percentile
  * cuts but pays a full sort-shuffle of the scored corpus; at 100 TB a
  * curation loop that only needs "where do the terciles roughly fall"
  * should not sort 10¹¹ rows. A fixed-bin histogram answers the same
  * question in ONE partial-aggregable pass (narrow map → 20-row count
  * shuffle), with a rank error PROVABLY bounded by the cut bin's own
  * population — and the bound is not just documented, it is measured
  * and flagged per run by [[histCuts]].
  *
  * The histogram rows are ADDITIVE integers (a per-wave histogram sums
  * into the standing one), so this is a log-family citizen: a growing
  * corpus can maintain its score distribution per ingest wave exactly
  * like the LM count logs, and cut refreshes never rescan. The
  * registered queries keep the one-shot shape; the additivity is the
  * 100 TB posture.
  *
  * Score choice: the alpha ratio (letters / length) from
  * [[TextAnalytics.textQuality]] — an exact integer-count / length
  * double division both engines reproduce bit-identically, so the
  * oracle match is hash-exact with no float caveat: bin =
  * least(floor(score·20), 19) rounds the same IEEE double once on
  * both sides.
  *
  * Cut semantics (mirrored verbatim in the DuckDB oracle): target
  * ranks t₁ = ⌊n/3⌋ and t₂ = ⌊2n/3⌋; cut bin bₖ = the smallest bin
  * whose cumulative count reaches tₖ; cut estimate = the bin's upper
  * edge (bₖ+1)/20. The audit then recomputes, DIRECTLY from the
  * corpus (a second aggregation path, not the histogram), how many
  * documents fall at or below each cut bin, and flags that (a) the
  * two paths agree exactly and (b) the direct rank overshoots the
  * target by at most the cut bin's population — the histogram
  * approximation guarantee, measured on the data.
  */
object ScoreHistogram {

  val NBins = 20

  /** Exact alpha ratio over a trimmed non-empty `sentence` column. */
  private def alphaRatio: Column =
    length(regexp_replace(col("sentence"), "[^A-Za-z]", "")).cast("double") /
      length(col("sentence"))

  /** bin ∈ [0, NBins): floor(score·NBins), top edge folded into the
    * last bin so score = 1.0 stays in range. */
  private def binCol: Column =
    least(floor(alphaRatio * NBins), lit((NBins - 1).toLong)).cast("int")

  private def binned(spark: SparkSession, sfDir: String): DataFrame =
    Ingest.corpusFromDocuments(spark, sfDir).select(binCol.as("bin"))

  /** Registered `quality_hist`: (bin, n, cum) over the present bins.
    * The cumulative window is GLOBAL but runs over the ≤ NBins-row
    * aggregate — the bounded single-partition stat-frame class the
    * plan audits pin as fine (never over corpus rows). */
  def qualityHist(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = binned(spark, sfDir).groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
    hist
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("bin").asc)
  }

  /** Registered `hist_cuts`: one row — corpus size, target ranks, the
    * two tercile cut estimates, and the measured audit flags (see
    * object scaladoc). Driver state is the ≤ NBins-row histogram (the
    * bounded-collect class); the direct-rank recount is one more
    * narrow-map aggregate over the corpus. */
  def histCuts(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = qualityHist(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(hist.nonEmpty, "hist_cuts: empty corpus")
    val nDocs = hist.last._3
    val t1 = nDocs / 3
    val t2 = 2 * nDocs / 3
    def cutBin(t: Long): (Int, Long, Long) =
      hist.find(_._3 >= t)
        .map { case (b, n, cum) => (b, n, cum) }
        .getOrElse(hist.last match { case (b, n, cum) => (b, n, cum) })
    val (b1, n1, cum1) = cutBin(t1)
    val (b2, n2, cum2) = cutBin(t2)
    val c1Est = (b1 + 1).toDouble / NBins
    val c2Est = (b2 + 1).toDouble / NBins
    val direct = binned(spark, sfDir).agg(
      sum(when(col("bin") <= b1, 1L).otherwise(0L)).as("le1"),
      sum(when(col("bin") <= b2, 1L).otherwise(0L)).as("le2")).head()
    val le1 = direct.getLong(0); val le2 = direct.getLong(1)
    import spark.implicits._
    Seq((nDocs, t1, t2, c1Est, c2Est,
        le1 == cum1 && le2 == cum2,
        le1 >= t1 && le1 - t1 <= n1,
        le2 >= t2 && le2 - t2 <= n2,
        c1Est <= c2Est))
      .toDF("n_docs", "t1", "t2", "c1_est", "c2_est",
        "faithful_ok", "rank1_bound_ok", "rank2_bound_ok", "monotone_ok")
  }
}
