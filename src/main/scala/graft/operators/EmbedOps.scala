package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{embed_text, l2sq, vec_norm}
import graft.sources.Ingest

/** Corpus pipeline operators: text -> embedding -> search, the
  * reference's build-then-query flow (app.py:35-43 encode;
  * app.py:58-75 search) over the driver `documents` table. */
object EmbedOps {

  /** Embed every document (reference build_index's encode stage,
    * app.py:35-43): pure narrow map, embarrassingly parallel. */
  def embedDocuments(spark: SparkSession, sfDir: String,
                     dim: Int = graft.functions.Embedder.DefaultDim): DataFrame = {
    Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("embedding", embed_text(col("sentence"), dim))
      .select(col("id"), col("embedding"))
  }

  /** Oracle-able projection of the embed stage: `(id, dim, l2_norm)`.
    * The embedder L2-normalizes, so the norm is exactly 1.0 for any
    * document with ≥1 token and 0.0 otherwise — a scalar DuckDB can
    * reproduce (`regexp_matches(lower(text), '[a-z0-9]')`), unlike the
    * raw `array<float>` column, which the driver's hash-compare cannot
    * sort (round 2's `embed_documents` err). `round` collapses the
    * float→double norm residue (0.99999…) to the exact sentinel. */
  def embedDocumentsStats(spark: SparkSession, sfDir: String,
                          dim: Int = graft.functions.Embedder.DefaultDim): DataFrame = {
    embedDocuments(spark, sfDir, dim)
      .select(col("id"), size(col("embedding")).as("dim"),
        round(vec_norm(col("embedding"))).as("l2_norm"))
      .orderBy(col("id").asc)
  }

  /** Full reference pipeline in one query: embed corpus, take doc 0's
    * vector as the query, exact top-k by squared L2 (deterministic
    * (dist, id) tiebreak). */
  def docKnn(spark: SparkSession, sfDir: String, queryId: Long = 0L,
             k: Int = 10): DataFrame = {
    val emb = embedDocuments(spark, sfDir)
    val q = emb.filter(col("id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.join(broadcast(q))
      .filter(col("id") =!= queryId)
      .withColumn("dist", l2sq(col("embedding"), col("q_embedding")))
      .orderBy(col("dist").asc, col("id").asc)
      .limit(k)
      .select(col("id"), col("dist"))
  }
}
