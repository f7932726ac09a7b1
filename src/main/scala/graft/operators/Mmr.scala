package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) over an exact-cosine shortlist — the diversity pass a
  * retrieval pipeline runs after similarity search so the k results
  * aren't k near-duplicates (the reference returns the raw FAISS
  * top-k, app.py:60-68; this is the curation-side extension of that
  * surface).
  *
  * Scale shape: the DISTRIBUTED part is the shortlist — an exact
  * cosine top-`c` over the corpus (TakeOrdered, no shuffle beyond the
  * final exchange; at 100 TB the shortlist generator swaps for any of
  * the index paths — IVF/PQ/binary — without touching this operator).
  * The greedy selection itself is inherently sequential in k and runs
  * on the driver over the `c`-row shortlist — a BOUNDED collect
  * (c ≤ a few hundred, the [[Pq]] shortlist discipline), O(k·c·dim)
  * double arithmetic.
  *
  * Determinism contract (what makes `mmr_rerank` hash-exact oracled
  * rather than audit-flagged): every number is a fixed-order double
  * computation — cosines accumulate left-to-right exactly like the
  * engine's codegen'd [[graft.functions.CosineSim]] kernel and
  * DuckDB's `list_sum(list_transform(...))`, the score is
  * `lam·sim(q,d) − lamC·max_{s∈S} sim(d,s)` with both coefficients
  * passed as literals (never `1 − lam`, whose double value differs
  * from the 0.3 literal), ties break on ascending vec_id, and the
  * empty-selection max is literal 0.0. The DuckDB oracle replays the
  * whole greedy as a recursive CTE and hash-matches bit-for-bit.
  */
object Mmr {

  /** Sequential double dot — the [[graft.functions.DotProduct]]
    * accumulation order, so driver-side cosines equal the codegen'd
    * column values bit-for-bit. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Registered `mmr_rerank`: (rank, vec_id, mmr_score) — the k
    * diversity-selected results from the exact-cosine top-`c`
    * shortlist of `queryId`. */
  def mmrRerank(spark: SparkSession, sfDir: String, queryId: Long = 0L,
                k: Int = 10, c: Int = 30,
                lam: Double = 0.7, lamC: Double = 0.3): DataFrame = {
    require(math.abs(lam + lamC - 1.0) < 1e-9, "mmr: lam + lamC must be 1")
    // distributed shortlist: exact cosine top-c (sim desc, vec_id asc)
    val short = VectorSearchOps.knnExactCosine(spark, sfDir, queryId, c)
      .join(Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .select(col("vec_id"), col("sim"), col("embedding"))
      .collect() // bounded: c rows
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
    // driver greedy: argmax of lam·simq − lamC·maxSimToSelected
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val chosen = scala.collection.mutable.Set.empty[Long]
    val steps = math.min(k, short.length)
    var step = 0
    while (step < steps) {
      var bestId = -1L; var bestScore = 0.0; var bestVec: Array[Float] = null
      short.foreach { case (vid, simq, vec) =>
        if (!chosen.contains(vid)) {
          var maxSim = 0.0
          var first = true
          selVecs.foreach { sv =>
            val cs = cosine(vec, sv)
            if (first || cs > maxSim) { maxSim = cs; first = false }
          }
          val score = lam * simq - lamC * maxSim
          if (bestId < 0 || score > bestScore ||
            (score == bestScore && vid < bestId)) {
            bestId = vid; bestScore = score; bestVec = vec
          }
        }
      }
      selected += ((bestId, bestScore))
      selVecs += bestVec
      chosen += bestId
      step += 1
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((vid, score), i) => ((i + 1).toLong, vid, score) }
      .toDF("rank", "vec_id", "mmr_score")
  }
}
