package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** BM25 full-text ranking over the document corpus — the lexical
  * retrieval twin of the engine's vector search surface (the reference
  * retrieves by embedding distance only, app.py:58-75; a training-data
  * pipeline needs keyword retrieval for curation/inspection too).
  *
  * Execution shape, chosen for 100 TB:
  *  - tokens are exploded and IMMEDIATELY filtered to the query's
  *    terms, so only matching postings ever enter a shuffle — the
  *    moral equivalent of reading just the query terms' posting lists
  *    from an inverted index, not scanning the index;
  *  - corpus stats (N, avgdl) are one broadcast single-row aggregate
  *    (never a global window — see the WindowExec trap in
  *    BASELINE.md);
  *  - per-term document frequencies are a tiny broadcast (≤ one row
  *    per query term);
  *  - the final score sums a FIXED number of per-term contribution
  *    columns in a fixed order, so the result is deterministic
  *    double arithmetic the DuckDB oracle reproduces exactly
  *    (a SUM() over exploded rows would have engine-dependent
  *    accumulation order).
  */
object TextSearch {

  /** Lucene-style BM25: idf = ln((N - df + 0.5)/(df + 0.5) + 1),
    * contribution = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    * Returns the top-k documents by score (id ascending tie-break);
    * scores rounded to 6 decimals to absorb ulp-level ln() differences
    * across engines. */
  def bm25Search(spark: SparkSession, sfDir: String,
                 queryTerms: Seq[String] = DefaultQuery,
                 k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame =
    bm25Corpus(Ingest.corpusFromDocuments(spark, sfDir), queryTerms, k1, b, k)

  val DefaultQuery: Seq[String] = Seq("hash", "join", "window")

  def bm25Corpus(corpus: DataFrame, queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.distinct,
      "query terms must be non-empty and distinct")
    val docs = corpus
      .withColumn("toks", TextAnalytics.tokens(col("sentence")))
      .select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))

    // Corpus-level stats: one row, broadcast to every posting.
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // Postings restricted to query terms BEFORE any shuffle: the
    // explode emits one row per token, the filter drops everything but
    // the query's terms in the same narrow stage.
    val tf = docs
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

    // Document frequency per query term — at most |queryTerms| rows.
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col("id")).as("df"))

    val contrib = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))

    // Pivot the (at most |queryTerms|) contributions into fixed
    // columns and add them left-to-right: deterministic summation
    // order, mirrored verbatim by the SQL oracle.
    val perTerm = contrib.groupBy(col("id")).agg(
      max(when(col("term") === queryTerms.head, col("c"))).as(s"c_${queryTerms.head}"),
      queryTerms.tail.map(t =>
        max(when(col("term") === t, col("c"))).as(s"c_$t")): _*)
    val score = queryTerms
      .map(t => coalesce(col(s"c_$t"), lit(0.0)))
      .reduceLeft(_ + _)

    perTerm
      .select(col("id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
