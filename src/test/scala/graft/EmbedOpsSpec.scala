package graft

import graft.operators.EmbedOps

/** doc_knn — the reference's full build-then-query flow (app.py:35-75)
  * composed as embed → join → top-k — verified against a driver-side
  * brute force over the same (deterministic) embedded corpus. The
  * embedder kernel itself is covered by EmbedderSpec; this asserts the
  * COMPOSITION: self-exclusion, (dist, id) tiebreak, exact top-k. */
class EmbedOpsSpec extends SparkSpec {

  test("docKnn matches driver-side brute force on sf0.001") {
    val emb = EmbedOps.embedDocuments(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = emb.find(_._1 == 0L).get._2
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val expected = emb.toSeq.filterNot(_._1 == 0L)
      .map { case (id, v) => (id, l2(q, v)) }
      .sortBy { case (id, d) => (d, id) }
      .take(10)
    val got = EmbedOps.docKnn(spark, sfSmall, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
  }
}
