package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.GraphAnn

/** The r15 geometry-adaptive init + spread-seed contracts, pinned
  * against the decade's two catches: (a) a random NN-descent init
  * collapses under distance concentration (d384 graph recall ~0), and
  * (b) an LSH init degrades converged recall where distance contrast
  * exists (the 500k 64-dim point, 0.906 → 0.844). The relative-
  * contrast probe is the measured dial between them; spreadSeeds is
  * the seed-coverage answer on cluster-pure graphs. */
class GraphInitSpec extends SparkSpec {

  /** Clustered unit-sphere fixture (the decade generator's geometry,
    * small): nClusters centers, bias towards the center, seeded. */
  private def clustered(n: Int, dim: Int, nClusters: Int, bias: Float,
                        seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters) {
      val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nn = math.sqrt(raw.map(x => x * x).sum).toFloat
      raw.map(_ / nn)
    }
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      val g = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val gn = math.sqrt(g.map(x => x * x).sum).toFloat
      val v = Array.tabulate(dim)(d => g(d) / gn + bias * c(d))
      val vn = math.sqrt(v.map(x => x * x).sum).toFloat
      (i.toLong, v.map(_ / vn).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def baseOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("relative contrast separates gate geometry from concentrated geometry") {
    // 400 clusters ≫ the 64-partner probe sample: a random sample
    // misses the probe's own cluster, which is exactly the geometry
    // where the random init has no gradient (40 clusters would READ
    // high — any 64-sample finds a same-cluster partner — and the
    // random init indeed works there)
    val gate = GraphAnn.relativeContrast(
      baseOf(Tables.embeddings(spark, sfSmall)), 42L)
    val hi = GraphAnn.relativeContrast(
      baseOf(clustered(2000, 384, 400, 0.8f, 7)), 42L)
    info(f"rc gate=$gate%.3f concentrated-d384=$hi%.3f threshold=${GraphAnn.ContrastThreshold}")
    assert(gate > GraphAnn.ContrastThreshold,
      s"gate corpus RC $gate should sit above the threshold (random init)")
    assert(hi < GraphAnn.ContrastThreshold,
      s"concentrated d384 RC $hi should sit below the threshold (LSH init)")
    // deterministic: same corpus + seed, same statistic
    assert(gate == GraphAnn.relativeContrast(
      baseOf(Tables.embeddings(spark, sfSmall)), 42L))
  }

  test("auto init on the gate corpus equals the random init bit-for-bit") {
    val emb = Tables.embeddings(spark, sfSmall)
    val auto = GraphAnn.buildGraph(emb, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rand = GraphAnn.buildGraph(emb, iters = 2, initMode = "random")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == rand)
  }

  test("spreadSeeds: bounded, deterministic, and geometry-covering") {
    val emb = clustered(1500, 192, 15, 0.9f, 11)
    val s1 = GraphAnn.spreadSeeds(emb, 64)
    val s2 = GraphAnn.spreadSeeds(emb, 64)
    assert(s1 == s2, "spreadSeeds must be deterministic")
    assert(s1.nonEmpty && s1.size <= 128, s"seed count ${s1.size} out of bounds")
    assert(s1.distinct.size == s1.size)
    // coverage: every cluster (vec_id % 15) contributes at least one
    // seed-adjacent region — with 15 tight clusters and >=15 occupied
    // LSH cells per round, each cluster should hold >= 1 seed
    val clustersSeeded = s1.map(_ % 15).distinct.size
    info(s"clusters seeded: $clustersSeeded/15 (${s1.size} seeds)")
    assert(clustersSeeded >= 13, s"only $clustersSeeded/15 clusters seeded")
  }

  test("unknown initMode fails fast") {
    intercept[IllegalArgumentException](
      GraphAnn.buildGraph(Tables.embeddings(spark, sfSmall), initMode = "kmeans"))
  }
}
