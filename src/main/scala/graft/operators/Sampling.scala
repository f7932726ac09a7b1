package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Deterministic dataset splitting — the train/val/test assignment a
  * training pipeline needs to be REPRODUCIBLE and JOIN-FREE at any
  * scale (absent from the reference, whose corpus fits one screen;
  * north-star extension per BASELINE.json).
  *
  * Split by content-independent hash of the document id: stable under
  * reruns, shard-order, and corpus growth (adding docs never moves an
  * existing doc's split), and computable by any engine that has md5 —
  * the DuckDB oracle reproduces the assignment bit-for-bit. The first
  * two hex chars of `md5(salt || id)` are uniform over 256 values;
  * comparing against hex-literal thresholds gives ~80/10/10 without
  * any numeric conversion (hex-string order is ASCII order in both
  * engines).
  */
object Sampling {

  /** Per-document split assignment over the driver corpus:
    * (id, split) with split ∈ train|val|test at ~80/10/10. */
  def sampleSplit(spark: SparkSession, sfDir: String,
                  salt: String = "graft"): DataFrame =
    sampleSplitCorpus(Ingest.corpusFromDocuments(spark, sfDir), salt)

  def sampleSplitCorpus(corpus: DataFrame, salt: String = "graft"): DataFrame =
    corpus
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("id").cast("string"))), 1, 2))
      // 0x00..0xcc -> train (205/256 ~ 80.1%), 0xcd..0xe6 -> val
      // (26/256 ~ 10.2%), rest -> test (25/256 ~ 9.8%)
      .withColumn("split",
        when(col("hx") < "cd", "train")
          .when(col("hx") < "e7", "val")
          .otherwise("test"))
      .select(col("id"), col("split"))
      .orderBy(col("id").asc)

  /** LEAKAGE-SAFE train/val/test split: the split key is the
    * document's near-dup CLUSTER canonical id ([[Dedup.minhashClusters]]),
    * not its own id — so a near-duplicate pair can never straddle
    * train and test. Per-doc hash splits ([[sampleSplit]]) silently
    * leak: with ~80/10/10 odds a duplicated eval document has a ~17%
    * chance of a training-set twin, and at web scale (30-50% near-dup
    * rates before dedup) that contaminates a measurable fraction of
    * every held-out set. Hashing the canonical id keeps every member
    * of a duplicate group together while staying deterministic,
    * rerun-stable, and engine-reproducible (same md5 hex-threshold
    * device as [[sampleSplit]]).
    *
    * Scale = exactly [[Dedup.minhashClusters]] (banded LSH equi-join +
    * CC) plus a narrow map; the split step itself adds no shuffle. A
    * production pipeline runs the clustering ONCE for dedup and reuses
    * the same canonical ids here — assignment drift only happens when
    * the clustering is re-run, the same trade BM25's df/avgdl and the
    * IVF centroids make. */
  def leakageSafeSplit(spark: SparkSession, sfDir: String,
                       salt: String = "graft"): DataFrame =
    Dedup.minhashClusters(spark, sfDir)
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("canonical_id").cast("string"))), 1, 2))
      .withColumn("split",
        when(col("hx") < "cd", "train")
          .when(col("hx") < "e7", "val")
          .otherwise("test"))
      .select(col("id"), col("canonical_id"), col("split"))
      .orderBy(col("id").asc)

  /** Per-source sampling rates for the mixture (hex thresholds over
    * the first two md5 chars, same mechanism as sampleSplit):
    * src0 keeps ~80%, src1 ~50%, src2 ~25%, everything else ~10%. */
  val MixtureRates: Seq[(String, String)] =
    Seq("src0" -> "cd", "src1" -> "80", "src2" -> "40")
  val MixtureDefaultRate: String = "1a"

  /** Domain-mixture downsampling — reweighting sources to a target
    * mixture is the step between corpus assembly and training. Keep
    * decisions are per-row hash thresholds (deterministic, join-free,
    * content-independent — a row's fate never depends on other rows,
    * so the operator is a pure narrow filter at any scale). Returns
    * the per-source audit table (source, n_total, n_kept) a pipeline
    * logs as its mixture card. */
  def mixtureSample(spark: SparkSession, sfDir: String,
                    salt: String = "mix"): DataFrame = {
    val keepThreshold = MixtureRates.foldRight(lit(MixtureDefaultRate)) {
      case ((src, hex), els) => when(col("source") === src, lit(hex)).otherwise(els)
    }
    graft.Tables.documents(spark, sfDir)
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 2))
      .withColumn("keep", col("hx") < keepThreshold)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source").asc)
  }

  /** EXACT per-stratum sampling: the first `perStratum` documents of
    * each stratum (lang) in a content-independent deterministic order
    * — md5 of the salted id, the same reproducible-order device as
    * [[sampleSplit]], so the DuckDB oracle replays the selection
    * row-for-row. Hash-threshold splits give ~fractions; balanced
    * eval-set construction needs exact counts per stratum, which is
    * what the rank window delivers (strata smaller than `perStratum`
    * keep every row). One shuffle on the stratum key. */
  def stratifiedSample(spark: SparkSession, sfDir: String,
                       perStratum: Int = 50,
                       salt: String = "strat"): DataFrame =
    rankInStratum(documentsForStrata(spark, sfDir), salt)
      .filter(col("rank_in_stratum") <= perStratum)
      .select(col("id"), col("lang"), col("rank_in_stratum"))
      .orderBy(col("lang").asc, col("rank_in_stratum").asc)

  /** The 100 TB variant of [[stratifiedSample]]: ranking a giant
    * stratum sorts the whole stratum to keep its first `perStratum`
    * rows. This path pre-filters each stratum to ~`margin ×
    * perStratum` expected survivors by hash threshold (one tiny
    * counts aggregate broadcast back — per-row work stays a narrow
    * filter), then exact-ranks only the survivors: the window sort
    * touches O(margin · perStratum · nStrata) rows regardless of
    * corpus size. The threshold keeps the LOWEST hash values, and the
    * rank order is the same hash ascending, so the first `perStratum`
    * survivors are exactly the first `perStratum` of the full stratum
    * PROVIDED the threshold retained ≥ perStratum rows — guaranteed
    * for small strata (threshold collapses to keep-all) and holds
    * with overwhelming margin-dependent probability for large ones
    * (binomial tail; margin 4 at perStratum 50 puts it past 10σ).
    * Equality with the exact path is test-pinned on the fixed data. */
  def stratifiedSampleThresholded(spark: SparkSession, sfDir: String,
                                  perStratum: Int = 50, margin: Int = 4,
                                  salt: String = "strat"): DataFrame = {
    val docs = documentsForStrata(spark, sfDir)
    // per-stratum keep fraction → 8-hex-digit threshold over the rank
    // hash's first 8 chars (uniform over 2^32, same ASCII-order trick
    // as sampleSplit); fraction 1 keeps everything
    val thresholds = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("keep_frac",
        least(lit(1.0), lit(margin.toLong * perStratum) / col("n_stratum")))
      // "g" sorts above every hex digit, so keep-all strata pass every
      // row (lpad of the fraction-1 value would TRUNCATE 0x100000000
      // to an effective 1/16); hex() is uppercase, md5 lowercase —
      // normalize once here
      .withColumn("hex_threshold",
        when(col("keep_frac") >= 1.0, lit("g"))
          .otherwise(lpad(lower(hex(
            (col("keep_frac") * lit(4294967296.0)).cast("long"))), 8, "0")))
      .select(col("lang"), col("hex_threshold"))
    rankInStratum(
      docs.join(broadcast(thresholds), Seq("lang"))
        .filter(substring(md5(concat(lit(salt), col("id").cast("string"))), 1, 8)
          < col("hex_threshold")),
      salt)
      .filter(col("rank_in_stratum") <= perStratum)
      .select(col("id"), col("lang"), col("rank_in_stratum"))
      .orderBy(col("lang").asc, col("rank_in_stratum").asc)
  }

  /** Temperature-flattened language mixture — the multilingual
    * rebalancing step (mT5 / XLM-R style α-smoothing, here α = 0.5):
    * downsample each language with rate_l = sqrt(n_min / n_l), so
    * post-sample language shares are proportional to sqrt(p_l) —
    * head languages compressed toward the tail without upsampling.
    * The n_min-relative form needs NO normalization sum over
    * languages, so every arithmetic step (one double division, one
    * IEEE-correctly-rounded sqrt, one floor) is bit-identical in any
    * engine — that is what lets the DuckDB oracle restate the whole
    * construction including the keep decision.
    *
    * Selection is the [[sampleSplit]] device: per-row hash threshold
    * (content-independent, join-free narrow filter on the doc side;
    * the per-language threshold table is a broadcast of ≤ #languages
    * rows). The smallest language keeps everything by identity
    * (threshold "g" sorts above every hex digit). */
  def temperatureMixture(spark: SparkSession, sfDir: String,
                         salt: String = "temp"): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val nMin = counts.agg(min(col("n_lang")).as("n_min"))
    val thresholds = counts.crossJoin(broadcast(nMin))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_lang")))
      .withColumn("hex_threshold",
        when(col("n_lang") === col("n_min"), lit("g"))
          .otherwise(lpad(lower(hex(
            (col("rate") * lit(4294967296.0)).cast("long"))), 8, "0")))
      .select(col("lang"), col("hex_threshold"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 8))
      .select(col("doc_id"), col("lang"),
        (col("hx") < col("hex_threshold")).as("kept"))
      .orderBy(col("doc_id").asc)
  }

  /** Weight-proportional sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"):
    * every doc draws a deterministic uniform u and competes on key
    * u^(1/w) — the top-k keys are exactly a weight-proportional
    * without-replacement sample. Rate-based mixing ([[mixtureSample]],
    * [[temperatureMixture]]) keeps a FRACTION per group; this keeps an
    * EXACT COUNT with per-ROW weights (here n_chars — longer docs
    * proportionally likelier), the device for "pick 200 docs biased by
    * length/quality score" selection steps.
    *
    * Determinism & oracle: u comes from a salted integer LCG on doc_id
    * — pure BIGINT arithmetic, exact in any engine (the md5-hex device
    * can't feed a DOUBLE without hex→int conversion DuckDB lacks).
    * Keys are compared as round(ln(u)/w, 9) with a doc_id tiebreak
    * (ln is the one not-correctly-rounded-guaranteed op in the chain;
    * rounding before the rank absorbs cross-engine ulps, the
    * tfidf_keywords device) and the OUTPUT carries no float — only
    * membership — so a boundary flip would need two keys within 1e-9
    * AND straddling the k-th rank.
    *
    * Scale: the key is a narrow map; selection is a global top-k
    * (TakeOrdered — never a full sort); no joins, no driver state.
    * The mix is TWO multiply rounds so the full 64-bit id feeds the
    * uniform: round 1 hashes doc_id mod 2^31−1, round 2 folds in
    * doc_id div 2^31−1, so ids differing by 2^31−1 (same residue)
    * draw DIFFERENT u, and exact multiples of 2^31−1 are no longer
    * pinned to the minimum u. Every operand is reduced mod 2^31−1
    * before its multiply (largest product ≈ 2.15e9 × 2.25e9 ≈
    * 4.8e18 < 2^63−1; the pre-reduction sum ≤ 2^32 + 2^31), so the
    * arithmetic is overflow-free for ANY id — DuckDB errors on
    * BIGINT overflow rather than wrapping, so exactness there is
    * load-bearing. */
  def weightedSample(spark: SparkSession, sfDir: String,
                     k: Int = 200): DataFrame =
    weightedSampleOf(graft.Tables.documents(spark, sfDir), k)

  def weightedSampleOf(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("mix1",
        (col("doc_id") % lit(2147483647L)) * lit(2654435761L) % lit(2147483647L))
      .withColumn("u_int",
        ((expr("doc_id div 2147483647") + col("mix1")) % lit(2147483647L))
          * lit(2246822519L) % lit(2147483647L))
      .withColumn("u",
        (col("u_int") + lit(1L)).cast("double") / lit(2147483648.0))
      .withColumn("w", greatest(col("n_chars"), lit(1L)).cast("double"))
      .withColumn("es_key", round(log(col("u")) / col("w"), 9))
      .orderBy(col("es_key").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  private def documentsForStrata(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("lang"))

  private def rankInStratum(docs: DataFrame, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(concat(lit(salt), col("id").cast("string"))).asc,
        col("id").asc)
    docs.withColumn("rank_in_stratum", row_number().over(w))
  }
}
