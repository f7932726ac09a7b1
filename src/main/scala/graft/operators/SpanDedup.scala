package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Span-level exact substring deduplication — the "dedup inside the
  * document" pass LLM pipelines run AFTER document-level dedup (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models
  * Better", §3.1 EXACTSUBSTR): any token window of length `W` that
  * occurs more than once ANYWHERE in the corpus (another document or
  * another position of the same document) marks its span duplicated;
  * overlapping marked windows merge into maximal spans a downstream
  * pass can cut.
  *
  * The reference paper's construction is a suffix array over the
  * concatenated corpus — inherently single-machine. The Spark-first
  * re-expression avoids both the suffix array and any pair join:
  *
  *  1. slide a W-token window over each document (posexplode of a
  *     transform over token positions — a narrow map, no shuffle);
  *  2. ONE groupBy on the window text counts global occurrences —
  *     a window with count ≥ 2 is duplicated BY DEFINITION, so there
  *     is no pair explosion, no O(dups²) join key, and boilerplate
  *     that appears in a million documents costs exactly one
  *     aggregation row (contrast the pair-join dedup families, which
  *     need [[Dedup.MaxBandBucket]] caps for that shape);
  *  3. marked window starts merge into maximal [start, end) token
  *     spans per document — gaps-and-islands with a per-document
  *     running-max window, the only other shuffle.
  *
  * At 100 TB the group key can swap the raw window text for a 128-bit
  * hash (same plan shape, 16-byte keys); text keys keep the gate
  * oracle-exact (DuckDB reproduces string equality, not engine
  * hashing). Two shuffles total, both partial-aggregable. */
object SpanDedup {

  /** Duplicated-window starts per document: (id, pos) for every
    * position whose W-token window occurs ≥ 2 times corpus-wide. */
  private[graft] def dupWindowStarts(corpus: DataFrame, w: Int): DataFrame = {
    val toks = corpus.select(col("id"), TextAnalytics.tokens(col("sentence")).as("toks"))
      .filter(size(col("toks")) >= w)
    // windows: (id, pos, wtext) — join tokens with  (cannot occur
    // in [a-z0-9]+ tokens, so the joined form is collision-free)
    val windows = toks.select(col("id"),
        posexplode(expr(s"transform(sequence(0, size(toks) - $w), " +
          s"p -> array_join(slice(toks, p + 1, $w), ''))"))
          .as(Seq("pos", "wtext")))
    val dupTexts = windows.groupBy(col("wtext"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("wtext"))
    windows.join(dupTexts, Seq("wtext"), "left_semi")
      .select(col("id"), col("pos"))
  }

  /** Maximal duplicated token spans per document:
    * (id, span_start, span_end, n_windows) with [span_start, span_end)
    * in token positions, end exclusive. Overlapping AND abutting
    * windows merge (a window starting exactly where the previous
    * span's coverage ends extends it). */
  def dupSpans(corpus: DataFrame, w: Int = 8): DataFrame = {
    val starts = dupWindowStarts(corpus, w)
    // gaps-and-islands on [pos, pos + w): a new island starts when this
    // window begins past the furthest end seen so far in the document
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos").asc)
    val prevMax = max(col("pos") + w).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = starts
      .withColumn("new_island", when(prevMax.isNull || col("pos") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byDoc))
    islands.groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + w).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Registered-query surface over the driver corpus, ordered for the
    * oracle. */
  def dupSpansFor(spark: SparkSession, sfDir: String, w: Int = 8): DataFrame =
    dupSpans(Ingest.corpusFromDocuments(spark, sfDir), w)
      .orderBy(col("id").asc, col("span_start").asc)

  /** Per-document duplication summary — the curation signal (fraction
    * of tokens inside a duplicated span): (id, n_tokens, dup_tokens,
    * dup_fraction). Documents with no duplicated span report 0. */
  def dupStats(corpus: DataFrame, w: Int = 8): DataFrame = {
    val spans = dupSpans(corpus, w)
      .groupBy(col("id"))
      .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"))
    corpus.select(col("id"), size(TextAnalytics.tokens(col("sentence"))).cast("long").as("n_tokens"))
      .join(spans, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_fraction"))
  }
}
