package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.l2sq

/** Graph-ANN — the engine's answer to FAISS's HNSW family, re-expressed
  * for a distributed engine (adjudication recorded in SURVEY.md §2.11):
  * HNSW itself is a sequential pointer-chasing structure (every insert
  * walks the graph built so far; search hops one node at a time through
  * executor-hostile random reads), so a faithful port would serialize on
  * the driver. What distributes is the shape the DiskANN/NSG line of
  * work uses: build a k-NN GRAPH with NN-descent (Dong et al., WWW'11 —
  * bounded iterations of "my neighbors' neighbors are candidate
  * neighbors", each one an equi-join + per-node top-k), persist it as a
  * plain (src, dst, dist) table, and serve queries with MULTI-SEED BEAM
  * search over that table (HNSW's upper layers exist to find good entry
  * points; seeding the beam from several hash-chosen entries buys the
  * same thing without the layer hierarchy).
  *
  * Scale posture:
  *  - init: each node is hashed into `R` virtual buckets of expected
  *    size ~[[InitBucket]] (xxhash64 — no window, no collect, no
  *    sort-by-random); within-bucket pairs seed the graph. Expected
  *    init cost is O(n · R · InitBucket), independent of skew because
  *    bucket ids are hashes of distinct vec_ids.
  *  - NN-descent rounds: undirected adjacency (≤ 2k per node) joined to
  *    itself through the shared middle node — fan-out is (2k)² per
  *    node, capped by `rho` sampling of the right side (the standard
  *    NN-descent sample rate). Per-node top-k via
  *    slice(array_distinct(array_sort(collect_list(struct(dist, dst)))))
  *    — a partial-aggregable groupBy, never a global window.
  *  - search: the beam lives on the driver (≤ ef entries — the same
  *    bounded-collect class as [[IvfIndex.probeLists]]); each hop is one
  *    pruned equi-scan of the graph table + one distance probe of the
  *    new candidate ids, both isin-bounded by ef·k.
  */
object GraphAnn {

  /** Expected members per virtual init bucket. */
  val InitBucket = 8

  /** All-rows-satisfy aggregate (the IndexAudits helper, restated). */
  private def forall(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(min(when(c, lit(1)).otherwise(lit(0))) === 1, lit(true))

  /** Build the k-NN graph: (src, dst, dist) rows, at most `k` per src,
    * sorted (dist, dst) ascending within each src. Deterministic — the
    * whole pipeline is hash-seeded (no k-means), so the same corpus
    * always yields the same graph.
    *
    * `buildFactor`: the descent runs on lists of `buildFactor·k`
    * neighbors and truncates to `k` at the end — the standard
    * NN-descent quality lever (high-dimensional corpora plateau on
    * exact-k lists because "neighbor of neighbor" locality weakens;
    * wider working lists restore the gradient). Measured recall vs the
    * exact 10-NN graph on the near-isotropic gate fixtures: at 500
    * rows 0.84 (factor 1) → 0.993 (factor 2); at the 4,000-row sf0.5
    * scale point — caught by the r14 cross-scale sweep, the fourth
    * consecutive scale decade to surface a real seam — factor 2 reads
    * 0.875 vs the 0.9 audit floor while factor 3 reads 0.979 (more
    * ITERATIONS plateau: 8 rounds buy +0.01, a wider list +0.10).
    * Factor 3 is therefore the default; build cost scales as
    * (2·factor·k)² per node per round. */
  def buildGraph(emb: DataFrame, idCol: String = "vec_id",
                 embCol: String = "embedding",
                 k: Int = 10, iters: Int = 6, rho: Double = 1.0,
                 seed: Long = 42L, buildFactor: Int = 3): DataFrame = {
    val kb = k * buildFactor
    val base = emb.select(col(idCol).as("id"), col(embCol).as("vec"))
    val n = base.count()
    require(n > 1, "graph-ann: need at least two vectors")
    val nBuckets = math.max(n / InitBucket, 1L)
    // R = 2 virtual buckets per node: expected 2·InitBucket co-bucketed
    // candidates each, enough for NN-descent to converge in few rounds
    val bucketed = base
      .withColumn("r", explode(array(lit(0), lit(1))))
      .withColumn("bkt", pmod(xxhash64(col("id"), col("r"), lit(seed)), lit(nBuckets)))
      .select(col("bkt"), col("id"), col("vec"))
    val init = bucketed.as("a")
      .join(bucketed.as("b"), Seq("bkt"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        l2sq(col("a.vec"), col("b.vec")).as("dist"))
    // localCheckpoint per round (the GraphRank discipline): each round's
    // plan references the previous round's twice (adjacency + merge), so
    // uncut lineage grows exponentially in `iters` and OOMs the planner
    // long before any data does. Exactly one checkpointed frame is live
    // at a time; superseded ones are unpersisted.
    var edges = topKPerSrc(init, kb).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val adj = edges.select(col("src"), col("dst"))
      val und = adj.union(adj.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val right = if (rho >= 1.0) und
        else und.sample(withReplacement = false, rho, seed + it)
      val cand = und.as("a")
        .join(right.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val scored = cand
        .join(base.select(col("id").as("src"), col("vec").as("sv")), Seq("src"))
        .join(base.select(col("id").as("dst"), col("vec").as("dv")), Seq("dst"))
        .select(col("src"), col("dst"), l2sq(col("sv"), col("dv")).as("dist"))
      val merged = topKPerSrc(edges.unionByName(scored), kb).localCheckpoint(true)
      edges.unpersist(blocking = false)
      edges = merged
      it += 1
    }
    // truncate the widened working lists to the requested k
    if (kb == k) edges else topKPerSrc(edges, k)
  }

  /** Per-src smallest-k by (dist, dst) — groupBy + bounded array ops,
    * no window. Duplicate (dist, dst) pairs (an edge rediscovered in a
    * later round) collapse via array_distinct before the slice. */
  private def topKPerSrc(edges: DataFrame, k: Int): DataFrame =
    edges.groupBy(col("src"))
      .agg(slice(array_distinct(array_sort(
        collect_list(struct(col("dist"), col("dst"))))), 1, k).as("top"))
      .select(col("src"), explode(col("top")).as("e"))
      .select(col("src"), col("e.dst").as("dst"), col("e.dist").as("dist"))

  /** Deterministic entry points: the `nSeeds` ids with the smallest
    * seeded hash — arbitrary but stable, spread uniformly over the
    * corpus (what HNSW's top layers approximate). One TakeOrdered over
    * the id column; callers cache per graph. */
  def seedIds(graph: DataFrame, nSeeds: Int, seed: Long = 42L): Seq[Long] =
    graph.select(col("src")).distinct()
      .orderBy(xxhash64(col("src"), lit(seed)).asc, col("src").asc)
      .limit(nSeeds)
      .collect().map(_.getLong(0)).toSeq

  /** Multi-seed best-first beam search over the persisted k-NN graph.
    * Driver-held beam of `ef` best-so-far; each hop expands every
    * not-yet-expanded beam member at once (a batched generation, not
    * HNSW's one-node-at-a-time walk), stops when a hop improves nothing
    * or `maxHops` generations pass. Returns (vec_id, dist) top-k.
    *
    * `maxHops` must cover the graph's hop-diameter from the seeds
    * (≈ log_k n): the 100k decade grid measured recall@10 0.41 at
    * 6 hops vs 0.75 at 12 with everything else fixed — small corpora
    * stop early via the no-improvement exit either way, so the larger
    * default costs nothing at gate scale. */
  def searchBeam(spark: SparkSession, graph: DataFrame, emb: DataFrame,
                 q: Array[Float], k: Int, ef: Int = 32, maxHops: Int = 12,
                 seeds: Seq[Long], excludeId: Option[Long] = None): DataFrame = {
    require(ef >= k, s"graph-ann: ef=$ef < k=$k")
    val base = emb.select(col("vec_id").as("id"), col("embedding"))
    def distsOf(ids: Seq[Long]): Seq[(Long, Double)] =
      if (ids.isEmpty) Nil
      else base.filter(col("id").isin(ids: _*))
        .select(col("id"), l2sq(col("embedding"), typedlit(q)).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // beam: best-ef (dist, id); visited: every id ever scored;
    // expanded: ids whose neighbor lists were already pulled
    var beam = distsOf(seeds).sortBy { case (id, d) => (d, id) }.take(ef)
    val visited = scala.collection.mutable.Set[Long](beam.map(_._1): _*)
    val expanded = scala.collection.mutable.Set[Long]()
    var hops = 0
    var improved = true
    while (improved && hops < maxHops) {
      val frontier = beam.map(_._1).filterNot(expanded.contains)
      if (frontier.isEmpty) { improved = false }
      else {
        expanded ++= frontier
        val nbrs = graph.filter(col("src").isin(frontier: _*))
          .select(col("dst")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val fresh = nbrs.filterNot(visited.contains)
        visited ++= fresh
        val scored = distsOf(fresh)
        val worst = if (beam.size < ef) Double.MaxValue else beam.last._2
        val merged = (beam ++ scored.map { case (id, d) => (id, d) })
          .sortBy { case (id, d) => (d, id) }
          .sortBy(_._2).take(ef)
        improved = scored.exists(_._2 < worst) || beam.size < ef
        beam = merged
      }
      hops += 1
    }
    import spark.implicits._
    val res = beam.filterNot { case (id, _) => excludeId.contains(id) }
      .sortBy { case (id, d) => (d, id) }.take(k)
    res.toDF("vec_id", "dist").orderBy(col("dist").asc, col("vec_id").asc)
  }

  // ---- persisted form ----------------------------------------------------

  /** Persist the graph as one parquet table (the adjacency IS the
    * index; no auxiliary state). */
  def saveGraph(graph: DataFrame, dir: String): Unit =
    graph.repartition(col("src")).write.mode("overwrite").parquet(dir)

  def loadGraph(spark: SparkSession, dir: String): DataFrame = {
    if (!new java.io.File(dir).exists())
      throw new java.io.FileNotFoundException(s"Graph directory not found: $dir")
    spark.read.parquet(dir)
  }

  // ---- memoized sf-table forms + registered audit queries -----------------

  private val graphCache = JvmCaches.sessionMap[(String, Int, Int), DataFrame]()
  private val seedCache = JvmCaches.map[(String, Int, Int), Seq[Long]]()

  def forEmbeddings(spark: SparkSession, sfDir: String,
                    k: Int = 10, iters: Int = 6): DataFrame =
    graphCache.getOrElseUpdate(spark, (sfDir, k, iters)) {
      buildGraph(Tables.embeddings(spark, sfDir), k = k, iters = iters)
    }

  def seedsForEmbeddings(spark: SparkSession, sfDir: String,
                         k: Int = 10, iters: Int = 6,
                         nSeeds: Int = 16): Seq[Long] =
    seedCache.getOrElseUpdate((sfDir, k, iters), {
      seedIds(forEmbeddings(spark, sfDir, k, iters), nSeeds)
    })

  /** Registered `knn_graph_stats` — the NN-descent build audit. WHICH
    * edges the descent finds is deterministic here (hash-seeded, no
    * k-means) but not SQL-expressible, so the registered columns are
    * the deterministic contract:
    *  - `n_nodes` — every node has an adjacency list (restated count);
    *  - `degree_ok` — out-degree is exactly k everywhere (n > k);
    *  - `no_self_loops_ok`, `sorted_unique_ok` — structural invariants;
    *  - `dists_exact_ok` — every stored edge distance equals the
    *    recomputed squared-L2 of its endpoints bit-for-bit;
    *  - `graph_recall` ≥ [[GraphRecallFloor]] — edge overlap with the
    *    EXACT k-NN graph (engine-side all-pairs twin; the embeddings
    *    tables are ≤ 4k rows at every gate scale, inside the
    *    ExactTwinGuard budget). Measured 1.000 at sf0.001/0.01 and
    *    ≥ 0.98 at sf0.1; floor 0.9 leaves margin. */
  def graphBuildAudit(spark: SparkSession, sfDir: String,
                      k: Int = 10, iters: Int = 6): DataFrame = {
    val g = forEmbeddings(spark, sfDir, k, iters)
    val emb = Tables.embeddings(spark, sfDir)
    val struct1 = g.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"),
        sum(when(col("src") === col("dst"), 1).otherwise(0)).as("selfs"))
      .agg(count(lit(1)).as("n_nodes"),
        (min(col("deg")) === k && max(col("deg")) === k).as("degree_ok"),
        (sum(col("selfs")) === 0).as("no_self_loops_ok"))
    val rec = g
      .join(emb.select(col("vec_id").as("src"), col("embedding").as("sv")), Seq("src"))
      .join(emb.select(col("vec_id").as("dst"), col("embedding").as("dv")), Seq("dst"))
      .agg(forall(col("dist") === l2sq(col("sv"), col("dv"))).as("dists_exact_ok"))
    // exact k-NN graph via the all-pairs twin — an O(n²) oracle anchor,
    // so it carries the shared guard; the scale path IS buildGraph
    ExactTwinGuard.check(emb.count(), ExactTwinGuard.MaxRows,
      "knn_graph_stats", "buildGraph + VECTOR_DECADE artifact")
    val exact = VectorSearchOps.knnBatchExact(spark, sfDir,
        nQueries = Int.MaxValue, k = k)
      .select(col("src_id").as("src"), col("dst_id").as("dst"))
    val hit = g.join(exact, Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val tot = exact.agg(count(lit(1)).as("n_exact"))
    struct1.crossJoin(broadcast(rec)).crossJoin(broadcast(hit))
      .crossJoin(broadcast(tot))
      .select(col("n_nodes"), lit(k).as("k"), col("degree_ok"),
        col("no_self_loops_ok"), col("dists_exact_ok"),
        (col("n_hit").cast("double") / col("n_exact").cast("double")
          >= GraphRecallFloor).as("graph_recall_ok"))
  }

  val GraphRecallFloor = 0.9
  val SearchRecallFloor = 0.8

  /** Registered `knn_graph_search` — the beam-search audit, mirroring
    * the f16/autotune audit discipline: n_hits restated, stored
    * distances bit-equal to the exact recomputation, and recall@k vs
    * the exact scan above [[SearchRecallFloor]] (deterministic — the
    * graph and the beam are both hash-seeded). */
  def graphSearchAudit(spark: SparkSession, sfDir: String,
                       queryId: Long = 0L, k: Int = 10, ef: Int = 32): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val g = forEmbeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === queryId)
      .select("embedding").head.getSeq[Float](0).toArray
    val res = searchBeam(spark, g, emb, q, k, ef,
      seeds = seedsForEmbeddings(spark, sfDir), excludeId = Some(queryId))
    val exact = VectorSearchOps.knnExactL2(spark, sfDir, queryId, k)
      .select(col("vec_id"))
    val base = res
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .agg(count(lit(1)).as("n_hits"),
        forall(col("dist") === l2sq(col("embedding"), typedlit(q)))
          .as("dists_exact_ok"))
    val hit = res.join(exact, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    base.crossJoin(broadcast(hit))
      .select(col("n_hits"), col("dists_exact_ok"),
        (col("n_hit") >= math.ceil(SearchRecallFloor * k).toLong).as("recall_ok"))
  }
}
