package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Per-document curation scorecard — the composed verdict table a
  * pretraining pipeline materializes once per corpus snapshot, joining
  * every independent curation signal so downstream selection is a
  * single filter instead of five pipeline reruns:
  *
  *   - heuristic quality  (TextAnalytics.qualityKeep)
  *   - model-based quality (NbClassifier log-odds verdict)
  *   - LM perplexity + CCNet head/middle/tail bucket (NgramLm)
  *   - span-duplication fraction (SpanDedup — Lee et al. 2022 signal)
  *   - exact-duplicate collapse (min-id keeps)
  *
  * plus the composite `final_keep` a CCNet-flavored pipeline would
  * apply: heuristic AND classifier agree to keep, the document is the
  * canonical copy of its text, under a third of its tokens sit in
  * duplicated spans, and its perplexity is not in the worst tercile.
  *
  * Each signal is exactly the registered standalone operator's value
  * (shared code paths — the curation_decisions discipline), so the
  * scorecard's oracle composes the standalone oracles' SQL and the
  * whole table stays hash-exact. Composition cost at scale: the five
  * signal frames are each one-to-one per doc id, so the scorecard
  * adds only equi-joins on id to the standalone plans (broadcast- or
  * shuffle-joined as size dictates); nothing is recomputed per signal
  * that the standalone operator wouldn't compute. */
object CurationScorecard {

  /** Fraction of a doc's tokens inside duplicated spans above which it
    * is dropped (boilerplate-heavy). */
  private val MaxDupFraction = 1.0 / 3.0

  def scorecard(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Ingest.corpusFromDocuments(spark, sfDir)

    // one labeled frame carries the quality predicate for BOTH the
    // heuristic column and the NB weak labels (qualityKeep is a
    // regexp + HOF pass — defined once, not re-spelled per signal)
    val labeled = corpus.select(col("id"), col("sentence"),
      TextAnalytics.tokens(col("sentence")).as("toks"),
      TextAnalytics.qualityKeep(col("sentence")).as("label"))

    val quality = labeled.select(col("id"),
      col("label").as("keep_quality"),
      (col("id") === min(col("id")).over(Window.partitionBy(col("sentence"))))
        .as("dedup_kept"))

    val nb = NbClassifier.score(NbClassifier.train(labeled), labeled)
      .select(col("id"), col("nb_keep"))

    // exact NTILE(3) tercile from ExactRank cut points (shared with
    // lm_ppl_buckets via the memoized artifact): same value the oracle
    // states with a window, but the plan carries NO unpartitioned
    // window — at 100 TB the per-document verdict table never stalls
    // on a single-task sort (PlanSpec pins this shape)
    val (scored, _, cuts) = NgramLm.scoredWithCuts(spark, sfDir)
    val lm = scored
      .withColumn("ppl_bucket",
        graft.operators.ExactRank.bucketCol(col("ppl"), col("id"), cuts))
      .select(col("id"), col("ppl"), col("ppl_bucket"))

    val spans = SpanDedup.dupStats(corpus).select(col("id"), col("dup_fraction"))

    corpus.select(col("id"))
      .join(quality, Seq("id"))
      .join(nb, Seq("id"))
      .join(lm, Seq("id"), "left") // zero-token docs have no LM row
      .join(spans, Seq("id"))
      .withColumn("final_keep",
        col("keep_quality") && col("nb_keep") && col("dedup_kept") &&
          col("dup_fraction") < MaxDupFraction &&
          coalesce(col("ppl_bucket") < 3, lit(false)))
      .select(col("id"), col("keep_quality"), col("nb_keep"), col("dedup_kept"),
        col("ppl"), col("ppl_bucket"), col("dup_fraction"), col("final_keep"))
      .orderBy(col("id").asc)
  }
}
