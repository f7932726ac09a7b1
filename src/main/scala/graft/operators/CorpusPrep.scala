package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Corpus-preparation operators a training-data pipeline runs between
  * filtering and tokenizer ingest: PII scrubbing and fixed-window
  * chunking. Both are pure narrow maps (chunking fans rows out but
  * never crosses documents) — embarrassingly parallel at any scale,
  * no shuffle, built entirely from codegen'd built-ins.
  *
  * The regexes are deliberately written in the common subset of Java
  * regex and RE2 (character classes, bounded repetition, `\b`) so the
  * DuckDB oracle applies the IDENTICAL patterns.
  */
object CorpusPrep {

  /** Email / IPv4 / SSN-shaped spans, counted on the raw text and
    * replaced with typed placeholders. Replacement order (email →
    * SSN → IP) is part of the contract; counts are independent
    * per-pattern over the ORIGINAL text so they don't depend on
    * earlier replacements. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    piiRedactCorpus(Ingest.corpusFromDocuments(spark, sfDir))

  def piiRedactCorpus(corpus: DataFrame): DataFrame =
    corpus.select(
      col("id"),
      size(regexp_extract_all(col("sentence"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("sentence"), lit(SsnRe), lit(0)))
        .cast("long").as("n_ssns"),
      size(regexp_extract_all(col("sentence"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("sentence"), EmailRe, "<EMAIL>"),
          SsnRe, "<SSN>"),
        Ipv4Re, "<IP>").as("clean_text"))
      .orderBy(col("id").asc)

  /** The composed end-to-end curation decision table — what a corpus
    * actually ships through before tokenizer ingest, with one boolean
    * per stage so every drop is attributable:
    *
    *   keep_quality — surface-quality heuristics (TextAnalytics.textQuality)
    *   dedup_kept   — exact-dup canonical representative (min-id over
    *                  identical trimmed text; Dedup.dedupExact semantics)
    *   split        — reproducible train/val/test (Sampling.sampleSplit)
    *   mix_keep     — domain-mixture downsampling (Sampling.MixtureRates)
    *   final_keep   — conjunction (split is carried, not a filter)
    *
    * One window over identical-text groups is the only shuffle; the
    * quality/split/mixture stages are narrow maps, so the whole
    * decision table costs what dedup_exact costs at any scale. */
  def curationDecisions(spark: SparkSession, sfDir: String,
                        splitSalt: String = "graft",
                        mixSalt: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sfDir)
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), trim(col("text")).as("sentence"),
        col("source"))
    val mixThreshold = Sampling.MixtureRates.foldRight(lit(Sampling.MixtureDefaultRate)) {
      case ((src, hex), els) => when(col("source") === src, lit(hex)).otherwise(els)
    }
    val splitHex = substring(md5(concat(lit(splitSalt), col("id").cast("string"))), 1, 2)
    docs
      .withColumn("keep_quality", TextAnalytics.qualityKeep(col("sentence")))
      .withColumn("dedup_kept",
        col("id") === min(col("id")).over(Window.partitionBy(col("sentence"))))
      .withColumn("split",
        when(splitHex < "cd", "train").when(splitHex < "e7", "val")
          .otherwise("test"))
      .withColumn("mix_keep",
        substring(md5(concat(lit(mixSalt), col("id").cast("string"))), 1, 2)
          < mixThreshold)
      .withColumn("final_keep",
        col("keep_quality") && col("dedup_kept") && col("mix_keep"))
      .select(col("id"), col("keep_quality"), col("dedup_kept"), col("split"),
        col("mix_keep"), col("final_keep"))
      .orderBy(col("id").asc)
  }

  /** Fixed-size non-overlapping token windows — the context-window
    * pre-chunking step before tokenizer ingest (and the document
    * splitter for retrieval indexing). One output row per chunk:
    * (id, chunk_idx, n_chunk_tokens, chunk_text).
    *
    * The chunk list is built with one `transform(sequence(...))` over
    * ceil(n/chunkSize) elements — a HOF, but evaluated once per CHUNK
    * (not per token), so the CodegenFallback cost is bounded by the
    * output row count; the posexplode keeps construction relational.
    * Token order inside a chunk comes from `slice`, never from a
    * shuffle-order-dependent collect_list. */
  def docChunks(spark: SparkSession, sfDir: String,
                chunkSize: Int = 32): DataFrame =
    docChunksCorpus(Ingest.corpusFromDocuments(spark, sfDir), chunkSize)

  /** Sequence packing: each document's start offset in the
    * concatenated id-ordered token stream, and the fixed-length
    * training sequence (seq_id = offset div seqLen) its first token
    * lands in — the deterministic packing map a tokenizer-ingest job
    * materializes before writing training shards.
    *
    * A naive global cumulative sum is a no-partition window — every
    * row through one task (the WindowExec trap, BASELINE.md). Instead:
    * blocks of `blockSize` consecutive ids get LOCAL window cumsums
    * (partitioned by block — parallel), block totals are collected to
    * the driver (#blocks rows, bounded and tiny relative to the data:
    * 1e12 docs / 1e6-id blocks = 1e6 longs), prefix-summed there, and
    * joined back as a broadcast — the standard two-phase parallel
    * prefix sum expressed in DataFrame ops. */
  def packSequences(spark: SparkSession, sfDir: String,
                    seqLen: Long = 512L): DataFrame =
    packSequencesCorpus(Ingest.corpusFromDocuments(spark, sfDir), seqLen)

  def packSequencesCorpus(corpus: DataFrame, seqLen: Long = 512L,
                          blockSize: Long = 4096L): DataFrame =
    packOffsetsCorpus(corpus, seqLen, blockSize).orderBy(col("id").asc)

  /** The un-ordered offsets core shared by [[packSequencesCorpus]] and
    * [[packChunksCorpus]] (the chunk view aggregates, so forcing the
    * id sort first would be a wasted exchange). */
  private def packOffsetsCorpus(corpus: DataFrame, seqLen: Long,
                                blockSize: Long): DataFrame = {
    require(seqLen > 0 && blockSize > 0)
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    val docs = corpus
      .withColumn("n_tokens", size(TextAnalytics.tokens(col("sentence"))).cast("long"))
      .select(col("id"), col("n_tokens"),
        (col("id") / blockSize).cast("long").as("block"))
    val wLocal = Window.partitionBy(col("block")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = docs.withColumn("local_off",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    // block totals → driver prefix sum (bounded collect, primitive-
    // friendly row count) → broadcast join back
    val totals = docs.groupBy(col("block"))
      .agg(sum(col("n_tokens")).as("block_total"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val prefixSums = totals.scanLeft(0L)((acc, t) => acc + t._2)
    import spark.implicits._
    val prefixDf = totals.zip(prefixSums)
      .map { case ((blk, _), before) => (blk, before) }.toSeq
      .toDF("block", "block_prefix")
    withLocal
      .join(broadcast(prefixDf), Seq("block"))
      .withColumn("start_offset", col("block_prefix") + col("local_off"))
      .select(col("id"), col("n_tokens"), col("start_offset"),
        (col("start_offset") / seqLen).cast("long").as("seq_id"))
  }

  /** The per-SEQUENCE view of [[packSequences]] — for every
    * fixed-length training sequence, how many documents contribute to
    * it, how many of them are CUT by its boundaries (the
    * cross-document-attention accounting a packing-aware trainer
    * needs), and its exact token fill (only the final sequence may be
    * partial). Zero-token documents occupy no space and are excluded;
    * their absence does not move any offset. Each document explodes
    * into the ⌈n/seqLen⌉+1-bounded set of chunks it touches, so the
    * exploded row count is ≈ corpus tokens / seqLen — a REDUCTION for
    * any real seqLen — followed by one partial-aggregable integer
    * count shuffle. All integers: hash-exact cross-engine. */
  def packChunks(spark: SparkSession, sfDir: String,
                 seqLen: Long = 512L): DataFrame =
    packChunksCorpus(Ingest.corpusFromDocuments(spark, sfDir), seqLen)

  def packChunksCorpus(corpus: DataFrame, seqLen: Long = 512L): DataFrame =
    packOffsetsCorpus(corpus, seqLen, 4096L)
      .filter(col("n_tokens") > 0)
      .select(col("n_tokens"), col("start_offset"),
        explode(sequence(expr(s"start_offset div $seqLen"),
          expr(s"(start_offset + n_tokens - 1) div $seqLen"))).as("chunk_id"))
      .withColumn("contrib",
        least(col("start_offset") + col("n_tokens"), (col("chunk_id") + 1) * seqLen) -
          greatest(col("start_offset"), col("chunk_id") * seqLen))
      .withColumn("cut",
        when(col("start_offset") < col("chunk_id") * seqLen ||
          col("start_offset") + col("n_tokens") > (col("chunk_id") + 1) * seqLen, 1L)
          .otherwise(0L))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cut")).as("n_cut_docs"),
        sum(col("contrib")).as("n_tokens_filled"))
      .orderBy(col("chunk_id").asc)

  def docChunksCorpus(corpus: DataFrame, chunkSize: Int = 32): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    corpus
      .withColumn("toks", TextAnalytics.tokens(col("sentence")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") > 0)
      .select(
        col("id"), col("n_tokens"),
        posexplode(transform(
          sequence(lit(0L),
            ((col("n_tokens") + (chunkSize - 1)) / chunkSize).cast("long") - 1),
          i => concat_ws(" ", slice(col("toks"), (i * chunkSize + 1).cast("int"),
            lit(chunkSize))))).as(Seq("chunk_idx", "chunk_text")))
      .select(
        col("id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkSize.toLong),
          col("n_tokens") - col("chunk_idx") * chunkSize).as("n_chunk_tokens"),
        col("chunk_text"))
      .orderBy(col("id").asc, col("chunk_idx").asc)
  }
}
