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

  test("hardNegatives: cross-label only, similarity-descending per anchor") {
    val labels = Tables.embeddings(spark, sfSmall)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = graft.operators.VectorSearchOps
      .hardNegatives(spark, sfSmall, nAnchors = 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20, "5 anchors x 4 negatives")
    rows.foreach { case (a, _, n, _) =>
      assert(labels(a) != labels(n), s"pair ($a,$n) shares a label")
    }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-(_: Double)).toSeq,
        "similarity must descend with rank")
    }
  }
}
