package graft

import graft.operators.{Clustering, Dedup, ExactTwinGuard, VectorSearchOps}

/** The O(n²) oracle anchors fail FAST above their input-size bound —
  * a registered query must never launch a corpus×corpus stage at
  * production scale; the guard routes callers to the bucketed scale
  * twin instead. Below the bound (every oracle scale) they run
  * unchanged. */
class ExactTwinGuardSpec extends SparkSpec {

  private def firesWithTwin(twin: String)(body: => Unit): Unit = {
    val e = intercept[IllegalArgumentException](body)
    assert(e.getMessage.contains("O(n^2) oracle anchor"), e.getMessage)
    assert(e.getMessage.contains(twin), e.getMessage)
  }

  test("all five exact anchors refuse oversized inputs, naming their scale twin") {
    // sf0.001 has 500 embeddings; a bound of 10 makes them all "oversized"
    firesWithTwin("neardup_cosine_lsh")(
      VectorSearchOps.similarityJoinExact(spark, sfSmall, maxRows = 10).count())
    firesWithTwin("neardup_cosine_lsh")(
      VectorSearchOps.similarityJoinStats(spark, sfSmall, maxRows = 10).count())
    firesWithTwin("cluster_ivf")(
      Clustering.clusterExact(spark, sfSmall, eps = 99.0, maxRows = 10).count())
    firesWithTwin("doc_dedup")(
      Dedup.dedupEmbedExact(spark, sfSmall, maxRows = 10).count())
    firesWithTwin("neardup_cosine_lsh")(
      Dedup.neardupCosine(spark, sfSmall, maxRows = 10).count())
  }

  test("the guard fires BEFORE the pair join is declared (plan never built)") {
    // the guard throws out of the operator call itself — no DataFrame
    // is returned, so no quadratic plan can even be analyzed
    firesWithTwin("neardup_cosine_lsh") {
      VectorSearchOps.similarityJoinExact(spark, sfSmall, maxRows = 10)
      ()
    }
  }

  test("at or below the bound the anchors run (oracle scales unaffected)") {
    assert(VectorSearchOps
      .similarityJoinStats(spark, sfSmall, maxRows = 500).count() >= 0)
    assert(ExactTwinGuard.MaxRows >= 100000L)
  }
}
