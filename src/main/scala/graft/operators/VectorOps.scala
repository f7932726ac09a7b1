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
  def centroidsByLabel(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      // exact decimal sum (shuffle-order-proof), then a single double
      // division. The float→decimal route is pinned explicitly
      // (double → shortest decimal string → decimal) because engines
      // disagree on direct float→decimal rounding; string→decimal
      // HALF_UP is identical everywhere.
      .agg((sum(col("v").cast("double").cast("string")
          .cast(DecimalType(28, 10))).cast("double") /
        count(lit(1))).as("mean"))
      .orderBy(col("label").asc, col("pos").asc)
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
