package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009 —
  * the fusion Elasticsearch/Vespa/OpenSearch ship for combining
  * lexical and vector hits): given the BM25 top-k and the cosine-kNN
  * top-k for the same information need,
  *
  *   rrf(d) = Σ_systems 1 / (k0 + rank_system(d)),   k0 = 60
  *
  * summed over the systems that returned d. RRF needs only RANKS, so
  * it is score-scale-free — BM25 logs and cosine similarities fuse
  * without calibration, which is exactly why it is the production
  * default for hybrid search.
  *
  * Determinism: ranks come from the two source queries' total orders
  * ((score desc, id) / (sim desc, id) — both already oracle-exact),
  * and the fused score is a fixed-shape two-term sum of exact-integer
  * reciprocals (IEEE-identical in both engines), so the whole fusion
  * is hash-exact with no rounding step.
  *
  * Scale: the fusion itself touches 2k rows — the cost IS the two
  * source queries, each of which already has its own scale path
  * (partition-pruned BM25 buckets; IVF/PQ for the vector side). The
  * same fusion applies unchanged over those. */
object HybridSearch {

  /** Fuse two ranked hit lists on `id`: (id, lex_rank, sem_rank, rrf),
    * rrf-descending. Hits absent from one list contribute only the
    * other's term (their rank column stays null). */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k0: Int = 60): DataFrame =
    lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("sem_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col("id").asc)

  /** Registered surface: BM25 top-10 (documents) ⊕ cosine top-10
    * (the aligned embeddings table, query vector id 0), k0 = 60. */
  def hybridSearchRrf(spark: SparkSession, sfDir: String, k0: Int = 60): DataFrame = {
    val lex = TextSearch.bm25Search(spark, sfDir)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("lex_rank"))
    val sem = VectorSearchOps.knnExactCosine(spark, sfDir)
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id").as("id"), col("sem_rank"))
    rrfFuse(lex, sem, k0)
  }
}
