package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.l2sq

/** ε-threshold similarity clustering — the reference's second query
  * operator (`find_similarity_clusters`, /root/reference/app.py:77-114):
  * build a similarity graph (edge iff squared-L2 dist < ε, self-pairs
  * excluded), take connected components, number multi-member
  * components, singletons get cluster_id = -1.
  *
  * Deviations (declared, SURVEY.md §7.4): component labels are
  * canonical (min member id, then densely renumbered by that min — the
  * reference numbers by `nx.connected_components` iteration order,
  * which is not deterministic by contract); an exact-graph mode exists
  * alongside the reference's IVF-restricted approximate graph.
  */
object Clustering {

  /** Iterative connected components by min-label propagation — the one
    * genuinely multi-job driver-looped pipeline (SURVEY.md §4.3):
    * published MapReduce CC formulation (label propagation to
    * fixpoint), `localCheckpoint()` per round to cut lineage growth.
    *
    * `nodes`: one column `id`; `edges`: (`src`, `dst`), undirected
    * interpretation. Returns (`id`, `comp`) where comp = min id in the
    * component. Iteration count is bounded by graph diameter; at 100 TB
    * the upgrade path is alternating large-star/small-star (same loop
    * shape, fewer rounds) — the loop below is structured so only the
    * propagation step would change.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      val next = labels.select("id", "comp").union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Components -> cluster assignment (reference app.py:98-112):
    * multi-member components get contiguous ids 0,1,2,… (ordered by
    * min member id — canonical), singletons -1. */
  def assign(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val comp = connectedComponents(nodes, edges)
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("csize"))
    val multi = sizes.filter(col("csize") > 1)
      .withColumn("cluster_id",
        row_number().over(Window.orderBy(col("comp").asc)).cast("long") - 1)
      .select(col("comp"), col("cluster_id"))
    comp.join(broadcast(multi), Seq("comp"), "left")
      .select(col("id"), coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }

  /** Exact-graph clustering over the embeddings table: every pair with
    * dist < eps is an edge. O(n²) pair generation — the oracle-able
    * exact mode; the scale path is [[clusterIvf]]. */
  def clusterExact(spark: SparkSession, sfDir: String, eps: Double = 1.4): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val nodes = emb.select(col("vec_id").as("id"))
    val a = emb.select(col("vec_id").as("src"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("dst"), col("embedding").as("b_emb"))
    val edges = a.join(b, col("src") < col("dst"))
      .filter(l2sq(col("a_emb"), col("b_emb")) < eps)
      .select(col("src"), col("dst"))
    assign(nodes, edges)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id").asc)
  }

  /** Reference-parity clustering: the graph is approximate — limited
    * to each vector's k nearest neighbors within nprobe probed lists
    * (app.py:77,84-85 defaults k=10, nprobe=2), edge iff dist < ε
    * strictly with self-pairs excluded (app.py:91-93). The candidate
    * join is an equi-join on list_id (bucketed — no cartesian). */
  def clusterIvf(spark: SparkSession, sfDir: String, eps: Double = 0.75,
                 k: Int = 10, nlist: Int = 4, nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val index = IvfIndex.forEmbeddings(spark, sfDir, nlist)
    val knn = IvfIndex.searchAll(index, emb, "vec_id", "embedding", k, nprobe)
    val edges = knn.filter(col("dist") < eps)
      .select(col("src_id").as("src"), col("dst_id").as("dst"))
    val nodes = emb.select(col("vec_id").as("id"))
    assign(nodes, edges)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .orderBy(col("vec_id").asc)
  }

  /** Cluster summary (reference UI surface: sizes sorted desc, display
    * cap — app.py:289-295, T2/T3). */
  def clusterSizes(assignments: DataFrame, cap: Int = 100): DataFrame = {
    assignments.filter(col("cluster_id") =!= -1L)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("cluster_id").asc)
      .limit(cap)
  }

  /** CSV export of an assignment (reference app.py:283,313-319):
    * single header CSV named by the caller. */
  def exportCsv(assignments: DataFrame, path: String): Unit = {
    assignments.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
  }
}
