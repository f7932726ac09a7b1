package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Byte-pair-encoding tokenizer training over the corpus — the
  * vocabulary-construction step a training-data pipeline runs before
  * tokenizing (Sennrich et al. 2016, word-level BPE with an
  * end-of-word marker). Deterministic by construction: no seed, and
  * every argmax tie-breaks on (weight desc, left asc, right asc).
  *
  * Spark-first shape: the word-frequency table stays DISTRIBUTED for
  * the whole training loop — each merge iteration is one
  * partial-aggregable pair-count shuffle plus a narrow higher-order
  * `aggregate` fold that rewrites the symbol arrays in place; only the
  * single winning pair crosses to the driver per iteration (the exact
  * analogue of the k-means driver loop, which collects only the
  * centroid matrix). At 100 TB the word table is the post-aggregation
  * vocabulary — orders of magnitude smaller than the corpus that
  * produced it — and every iteration's cost is independent of corpus
  * size.
  *
  * `EndMark` uses `</w>` (the paper's marker); it cannot collide with
  * corpus symbols because [a-z0-9]+ tokens never contain `<`. */
object Bpe {

  val EndMark = "</w>"

  /** (word, freq) over the engine's token normalization. */
  def wordFreqs(corpus: DataFrame): DataFrame =
    corpus.select(explode(TextAnalytics.tokens(col("sentence"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one symbol per character plus the
    * end-of-word marker. */
  private[graft] def initialSyms(word: Column): Column =
    concat(split(word, ""), array(lit(EndMark)))

  /** Adjacent symbol pairs weighted by word frequency:
    * (left_sym, right_sym, weight). */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    // a fully-merged word (single symbol) offers no pairs — and
    // sequence(1, 0) would count DOWN, not produce an empty array
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("weight"))

  /** One leftmost-greedy merge pass of pair (l, r) over a symbol
    * array, as a pure higher-order fold (codegen'd, narrow): a symbol
    * equal to `r` joins the accumulator's tail when that tail is `l`;
    * the merged symbol never re-matches as `l` in the same pass, which
    * is exactly the paper's left-to-right non-overlapping rule. */
  private[graft] def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** [[mergeOnce]] behind a codegen'd membership guard: the fold is an
    * interpreted higher-order function, and almost no word contains
    * the merged pair, so skipping the fold for rows lacking either
    * symbol removes most of each training iteration's cost. A word
    * with both symbols but no adjacency folds to an unchanged array —
    * the guard is purely an evaluation-cost filter, never a semantics
    * change. ONLY safe where `syms` is a plain column reference: the
    * guard mentions its input four times, so chaining it (as
    * [[segment]] does with the unguarded form) would grow the
    * expression tree 4^nMerges and OOM the driver — the trainer
    * materializes each generation, so its input is always a bare
    * attribute. */
  private def mergeOnceGuarded(syms: Column, l: String, r: String): Column =
    when(array_contains(syms, l) && array_contains(syms, r),
      mergeOnce(syms, l, r)).otherwise(syms)

  /** Rebase a derived word-table generation on its own PERSISTED RDD:
    * the returned frame's logical plan is a bare scan of that RDD, so
    * per-iteration analysis stays O(1) — persist alone caches the DATA
    * but keeps every prior fold in the plan, and analysis cost then
    * grows with the iteration number (measured: 85-90 s for 16 merges
    * at sf0.1 under plain persist vs ~4 s warm with the plan rebased).
    * Unlike localCheckpoint the RDD keeps its lineage, so an executor
    * loss mid-training recomputes instead of failing the job, and the
    * superseded generation's blocks are released EXPLICITLY as the
    * loop advances (no waiting on driver GC + ContextCleaner). */
  private def rebased(df: DataFrame)
  : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Train `nMerges` BPE merges. Returns the ordered merge table. Each
    * generation is [[rebased]] on its persisted RDD (plan stays flat,
    * lineage stays recomputable, superseded blocks are freed). */
  def train(corpus: DataFrame, nMerges: Int): Seq[(String, String)] = {
    // the word table is the post-aggregation vocabulary — tiny relative
    // to the corpus; collapse it to a few partitions so the per-merge
    // jobs are not scheduling-overhead-bound (32 near-empty tasks per
    // iteration × 2 jobs × nMerges adds up)
    var (words, wordsRdd) = rebased(wordFreqs(corpus)
      .coalesce(4)
      .select(col("word"), col("freq"), initialSyms(col("word")).as("syms")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("weight").desc, col("left_sym").asc, col("right_sym").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val (next, nextRdd) = rebased(words
          .select(col("word"), col("freq"), mergeOnceGuarded(col("syms"), l, r).as("syms")))
        wordsRdd.unpersist(blocking = false)
        words = next
        wordsRdd = nextRdd
        i += 1
      }
    }
    wordsRdd.unpersist(blocking = false)
    merges.toSeq
  }

  /** Segment a word column with an ordered merge table — the encoder:
    * the same fold the trainer used, applied merge-by-merge in
    * training order (the BPE encode contract). */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initialSyms(word)) { case (c, (l, r)) => mergeOnce(c, l, r) }

  private val mergeCache = JvmCaches.map[(String, Int), Seq[(String, String)]]()

  /** The registered surfaces' merge-table size. The encode-audit
    * oracle interpolates THIS constant into its SQL (n_merges column),
    * so the operator default and the oracle cannot drift apart. */
  val DefaultMerges = 16

  /** Memoized trained merge table per (corpus, nMerges) — the shared
    * warm artifact the encoder surfaces reuse (trainer = 2·nMerges
    * small jobs; see Bench's `bpe_merges` warm entry). */
  def mergesFor(spark: SparkSession, sfDir: String,
                nMerges: Int = DefaultMerges): Seq[(String, String)] =
    mergeCache.getOrElseUpdate((sfDir, nMerges), {
      train(Ingest.corpusFromDocuments(spark, sfDir), nMerges)
    })

  /** Registered-query surface: corpus-wide ENCODER audit, the
    * IndexAudits pattern (the iterative trainer itself is pinned by
    * BpeSpec against a driver-side reference; this verifies the encode
    * CONTRACT distributively over every vocabulary word):
    *  - `all_roundtrip`: concatenating a word's merged symbols
    *    reproduces word + `</w>` exactly (merges only ever concatenate
    *    adjacent symbols — any violation is an encoder bug);
    *  - `all_in_bounds`: 1 ≤ #symbols ≤ len(word) + 1;
    *  - `n_words` / `n_merges` restate exactly in SQL.
    * One row; flags oracle-stated literal TRUE. */
  def encodeAudit(spark: SparkSession, sfDir: String, nMerges: Int = DefaultMerges): DataFrame = {
    val merges = mergesFor(spark, sfDir, nMerges)
    wordFreqs(Ingest.corpusFromDocuments(spark, sfDir))
      .select(col("word"), segment(col("word"), merges).as("syms"))
      .agg(
        count(lit(1)).as("n_words"),
        min(array_join(col("syms"), "") === concat(col("word"), lit(EndMark)))
          .as("all_roundtrip"),
        min(size(col("syms")) >= 1 && size(col("syms")) <= length(col("word")) + 1)
          .as("all_in_bounds"),
        max(lit(merges.length)).cast("long").as("n_merges"))
  }

  /** Registered-query surface: the FIRST-iteration pair statistics —
    * the exact table the first merge argmaxes over, top-k by (weight
    * desc, pair asc). Fully SQL-restatable (the iterative trainer is
    * not; it is pinned by BpeSpec against a driver-side reference
    * implementation instead, the k-means pattern). */
  def pairCountsFor(spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame =
    pairCounts(
      wordFreqs(Ingest.corpusFromDocuments(spark, sfDir))
        .select(col("word"), col("freq"), initialSyms(col("word")).as("syms")))
      .orderBy(col("weight").desc, col("left_sym").asc, col("right_sym").asc)
      .limit(topK)
}
