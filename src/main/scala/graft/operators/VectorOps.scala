package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Grouped vector aggregations over the embeddings table — the
  * centroid-update aggregation at the heart of k-means (reference
  * app.py:52), exposed two ways:
  *
  *  - [[centroidsByLabel]]: relational posexplode formulation, fully
  *    SQL-expressible — the DuckDB oracle replays it exactly. Decimal
  *    summation makes the mean independent of partial-aggregation
  *    order (float/double sums are not associative across shuffles).
  *  - [[graft.functions.VectorMean]]: the typed Aggregator twin with a
  *    primitive (sums, count) buffer — no dim× row explosion; tested
  *    equal to this one within float tolerance.
  */
object VectorOps {

  /** Per-label component-wise mean: (label, pos, mean) rows. */
  def centroidsByLabel(spark: SparkSession, sfDir: String): DataFrame =
    centroidsOf(Tables.embeddings(spark, sfDir))

  /** Order-proof decimal quantization of a double column — the
    * engine-identical float→decimal route (double → decimal string →
    * DECIMAL(28,10) HALF_UP; engines disagree on DIRECT float→decimal
    * rounding). Magnitudes below the half-quantum are zeroed first: a
    * Spark-side no-op (HALF_UP sends them to 0 anyway) that defuses a
    * DuckDB VARCHAR→DECIMAL parser quirk where a scientific-notation
    * value entirely below the quantum rounds on its first SIGNIFICANT
    * digit ('6.375e-12' → 1E-10 instead of 0E-10 — caught by the
    * sf0.001 sweep on pca_stats' v² column). Oracle SQL mirrors the
    * guard with CASE WHEN ABS(x) < 5e-11 THEN 0 ELSE x END. */
  private[graft] def dec10(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(abs(c) < lit(5e-11), lit(0.0)).otherwise(c)
      .cast("string").cast(DecimalType(28, 10))

  private def centroidsOf(embeddings: DataFrame): DataFrame = {
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      // exact decimal sum (shuffle-order-proof), then a single double
      // division; see dec10 for the pinned quantization route
      .agg((sum(dec10(col("v").cast("double"))).cast("double") /
        count(lit(1))).as("mean"))
      .orderBy(col("label").asc, col("pos").asc)
  }

  /** Per-label centroid-distance outliers — the embedding-space
    * anomaly detector a curation pipeline runs over labeled (or
    * clustered) data: vectors farthest from their group's centroid are
    * the mislabeled / noisy / adversarial candidates (the standard
    * first-pass check before contrastive training; same geometry as
    * k-means' assignment step, reference app.py:52, pointed inward).
    *
    * Returns the top-`k` farthest members per label:
    * (label, rank, vec_id, dist2), ordered by (label, rank).
    *
    * Exactness chain (every link previously proven hash-exact):
    * centroids are the [[centroidsByLabel]] decimal-sum means (shuffle-
    * order-proof); dist² is the codegen'd [[graft.functions.l2sq]]
    * sequential double fold, which DuckDB's list_sum mirrors
    * term-for-term (the knn_exact_l2 device); the per-label rank
    * window tiebreaks on vec_id.
    *
    * Scale: centroids are ≤ #labels rows — broadcast; the distance is
    * a narrow map over the embeddings scan; the only shuffle is the
    * per-label top-k window (bounded keys, never a global sort). */
  def centroidOutliers(spark: SparkSession, sfDir: String,
                       k: Int = 10): DataFrame =
    centroidOutliersOf(Tables.embeddings(spark, sfDir), k)

  def centroidOutliersOf(embeddings: DataFrame, k: Int): DataFrame = {
    val cent = centroidsOf(embeddings)
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        x => x.getField("mean")).as("centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("dist2").desc, col("vec_id").asc)
    embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .join(broadcast(cent), Seq("label"))
      .withColumn("dist2", graft.functions.l2sq(col("emb"), col("centroid")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("vec_id"), col("dist2"))
      .orderBy(col("label").asc, col("rank").asc)
  }

  /** Typed-Aggregator centroids: (label, centroid) — the scale path
    * (one dim-length buffer per label per partition, no explosion). */
  def centroidsByLabelTyped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorMean.toColumn.name("centroid"))
      .toDF("label", "centroid")
      .orderBy(col("label").asc)
  }
}
