package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{l2sq, mat_vec, pq_adc_by_list, pq_encode}

/** The composed compression ladder: PCA pre-transform → coarse IVF →
  * residual PQ codes → exact full-dim refine. This is FAISS's actual
  * production index shape, `IndexPreTransform(PCAMatrix, IndexIVFPQ)`
  * (the reference's IndexIVFFlat at app.py:47-48 is the base of the
  * family) — each stage already exists standalone in this repo
  * ([[Pca]], [[IvfIndex]], [[Pq]]); this object chains them so one
  * search touches, in order:
  *
  *   1. dOut floats per query (the PCA projection, a narrow
  *      codegen'd [[graft.functions.MatVec]] map — the CORPUS side is
  *      projected once at build);
  *   2. nlist driver-side centroid distances (coarse probe, in PCA
  *      space);
  *   3. m bytes per candidate in the probed lists only (residual ADC
  *      via per-list LUTs — the scan never reads a float vector);
  *   4. `rerank` full-dimension ORIGINAL vectors, fetched by a
  *      broadcast semi-join and scored with exact squared L2 — so the
  *      returned distances are exact and self-audit recomputable,
  *      while PCA/PQ error only ever costs recall, never correctness
  *      of the reported metric.
  *
  * Scale posture: the projected corpus is dOut/D of the raw bytes
  * (24/64 at the defaults), codes are m bytes per row (32× under the
  * raw floats), ADC scans only nprobe/nlist of those, and the full-dim
  * read is bounded by `rerank` rows per query. All maps are narrow;
  * the only exchanges are the two bounded top-k's and the broadcast
  * refine join.
  *
  * Training order matters and is pinned by [[ChainedIndexSpec]]: PQ
  * codebooks are trained on residuals IN PCA SPACE (project → assign →
  * subtract own centroid), because that is the distribution search
  * scores against — codebooks trained on raw-space residuals would
  * quantize a different variable than the LUTs look up.
  */
object ChainedIndex {

  /** Driver-side handle: the PCA transform, the coarse index over the
    * PROJECTED corpus, the residual codebooks (also PCA-space), and
    * the persisted coded postings (list_id, id, codes). */
  final case class Chained(pca: Pca.Model, index: IvfIndex.Index,
                           pq: Pq.Model, coded: DataFrame)

  private val cache = JvmCaches.sessionMap[(String, Int, Int, Int, Int), Chained]()

  /** Build (memoized per session): PCA model → projected corpus → IVF
    * in PCA space → residual PQ codebooks → coded postings. The
    * projected frame is persisted only for the duration of the build
    * (the IvfIndex.build training-cache hygiene); what survives is the
    * index's own postings plus the coded frame. */
  def forEmbeddings(spark: SparkSession, sfDir: String, dOut: Int = 24,
                    nlist: Int = 4, m: Int = 8, k: Int = 16): Chained =
    cache.getOrElseUpdate(spark, (sfDir, dOut, nlist, m, k)) {
      require(dOut % m == 0, s"chained: dOut=$dOut not divisible by m=$m")
      val pm = Pca.train(spark, sfDir, dOut)
      val proj = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), mat_vec(col("embedding"), pm.comps).as("p"))
      val index = IvfIndex.build(proj, "vec_id", "p", nlist)
      val pq = Pq.train(Pq.residualFrame(index), "resid", m, k)
      val coded = Pq.residualFrame(index)
        .select(col("list_id"), col("id"), pq_encode(col("resid"), pq.books).as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      coded.count()
      Chained(pm, index, pq, coded)
    }

  /** The query's PCA projection — the SAME mat_vec kernel as the
    * corpus side (one single-row job), so coarse distances are
    * bit-reproducible against the index (the knnPcaRerank
    * discipline). */
  private def projectQuery(spark: SparkSession, sfDir: String,
                           ch: Chained, queryId: Long): Array[Float] =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === queryId)
      .select(mat_vec(col("embedding"), ch.pca.comps).as("p"))
      .head().getSeq[Float](0).toArray

  /** Chained search: project → probe → residual ADC over probed codes
    * → exact refine against the ORIGINAL full-dim vectors. Returns
    * (vec_id, dist) with EXACT squared-L2 distances, ascending,
    * vec_id tie-break, query excluded.
    *
    * Pinned degenerate case ([[ChainedIndexSpec]]): nprobe = nlist and
    * rerank ≥ corpus size reproduces the exact global kNN — the probe
    * prunes nothing and the refine scores every candidate exactly, so
    * PCA and PQ error drop out entirely. */
  def search(spark: SparkSession, sfDir: String, queryId: Long = 0L,
             kNeighbors: Int = 10, dOut: Int = 24, nlist: Int = 4,
             nprobe: Int = 3, m: Int = 8, k: Int = 16,
             rerank: Int = 100): DataFrame = {
    require(rerank >= kNeighbors, s"chained: rerank=$rerank < k=$kNeighbors")
    val ch = forEmbeddings(spark, sfDir, dOut, nlist, m, k)
    val qp = projectQuery(spark, sfDir, ch, queryId)
    val probed = IvfIndex.probeLists(ch.index, qp, nprobe)
    val luts = Pq.residualLuts(ch.pq, ch.index, qp, probed)
    val shortlist = ch.coded
      .filter(col("list_id").isin(probed: _*))
      .filter(col("id") =!= queryId)
      .select(col("id").as("vec_id"),
        pq_adc_by_list(col("list_id"), col("codes"), luts).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(rerank)
      .select(col("vec_id"))
    val emb = Tables.embeddings(spark, sfDir)
    val qRow = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.join(broadcast(shortlist), Seq("vec_id"), "left_semi")
      .join(broadcast(qRow))
      .select(col("vec_id"), l2sq(col("embedding"), col("q_embedding")).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(kNeighbors)
  }

  /** Recall@k of the chained path against the exact global scan — the
    * quality probe before turning the ladder on. */
  def recall(spark: SparkSession, sfDir: String, queryId: Long = 0L,
             kNeighbors: Int = 10, dOut: Int = 24, nlist: Int = 4,
             nprobe: Int = 3, rerank: Int = 100): Double = {
    val exact = VectorSearchOps.knnExactL2(spark, sfDir, queryId, kNeighbors)
      .collect().map(_.getLong(0)).toSet
    val got = search(spark, sfDir, queryId, kNeighbors, dOut, nlist, nprobe,
      rerank = rerank)
      .collect().map(_.getLong(0)).toSet
    exact.intersect(got).size.toDouble / kNeighbors
  }
}
