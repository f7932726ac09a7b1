package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank centrality over the near-duplicate graph — an iterative
  * whole-graph operator beyond connected components (the reference has
  * neither; north-star extension per BASELINE.json §graph).
  *
  * Why a curation pipeline wants it: connected components says WHICH
  * docs form a duplicate group; centrality says WHICH MEMBER is the
  * hub. Boilerplate templates (headers, licence blocks, mirrored
  * landing pages) show up as high-centrality nodes of the near-dup
  * graph, and picking the canonical representative by centrality —
  * rather than min-id — keeps the most-connected (most template-like)
  * variant for inspection while flagging the group. The same scores
  * rank "how duplicated is this doc's neighborhood" for mixture
  * debugging.
  *
  * EXACT INTEGER ARITHMETIC, deliberately: ranks are BIGINTs scaled by
  * `Scale` (1e12), damping 0.85 applied as `(85·s) div 100` via an
  * overflow-safe split: with s = 100q + r that equals
  * `85q + (85r) div 100`, whose largest intermediate is 0.85·s — the
  * damped share can never overflow BIGINT unless the sum itself
  * already had. Integer sums are
  * order-independent, so shuffle order can never change a result —
  * the DuckDB oracle unrolls the same five iterations and matches
  * hash-exact, no float-summation-order caveats anywhere. Dangling
  * nodes (degree 0) keep only the teleport term; their mass leaks by
  * design (documented deviation from mass-conserving PageRank — the
  * SCORES ORDER identically for ranking use, and the leak is the price
  * of an order-independent integer formulation).
  *
  * Scale posture (100 TB): edges come from the banded-LSH pair miner
  * ([[Dedup.dedupMinhash]] — bucket-capped equi-join, never a cross
  * product, linear-ish in corpus size), so the graph is sparse by
  * construction. Each iteration is ONE equi-join of the rank table
  * against the persisted (src, dst, deg) edge table plus ONE
  * partial-aggregable integer sum by dst — the canonical distributed
  * PageRank step. Iteration count is fixed (5), not convergence-driven,
  * so the job graph is static and the whole plan stays declarative.
  * The edge table is built once and persisted; rank frames reference
  * their predecessor exactly once, so plan depth is linear in
  * iterations. Nothing is collected to the driver.
  */
object GraphRank {

  /** Fixed-point scale: ranks are stored as rank·1e12. */
  val Scale: Long = 1000000000000L

  /** Teleport term floor(0.15 · Scale) — exact (15·Scale divisible by 100). */
  val Base: Long = 15L * Scale / 100L

  val Damping = 85L // percent

  val Iterations = 5

  // The symmetrized (src, dst, deg) edge table is reused once per
  // iteration; memoize it persisted so the banded-LSH mine runs once
  // per session×sfDir (the cachedSigs pattern).
  private val edgeCache = JvmCaches.sessionMap[String, DataFrame]()

  /** Five exact-integer PageRank iterations over the symmetrized
    * MinHash near-dup graph. Returns (id, rank) for every
    * signature-bearing document, rank = fixed-point BIGINT (·1e12),
    * ordered by id. */
  def pagerankDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = Dedup.minhashSignatures(spark, sfDir).select(col("id"))
    val ed = edgeCache.getOrElseUpdate(spark, sfDir) {
      val pairs = Dedup.dedupMinhash(spark, sfDir)
        .select(col("a_id"), col("b_id"))
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val e = edges.join(deg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }
    // disjoint column names per side (rid/rank vs src/dst/deg) keep the
    // repeated joins against the same persisted edge table unambiguous
    var ranks = nodes.select(col("id").as("rid")).withColumn("rank", lit(Scale))
    for (_ <- 1 to Iterations) {
      val contribs = ranks.join(ed, col("rid") === col("src"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.select(col("id").as("rid"))
        .join(contribs, col("rid") === col("dst"), "left")
        .select(col("rid"),
          (lit(Base) + coalesce(
            expr(s"(s div 100) * $Damping + ((s % 100) * $Damping) div 100"),
            lit(0L))).as("rank"))
    }
    ranks.select(col("rid").as("id"), col("rank")).orderBy(col("id").asc)
  }
}
