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

  test("hardNegativesLsh: corpus-wide anchors, cross-label only, recall floor vs exact") {
    val emb = Tables.embeddings(spark, sfSmall)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n = labels.size
    val lsh = graft.operators.VectorSearchOps
      .hardNegativesLsh(spark, sfSmall, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // corpus-wide: (almost) every vector mined as an anchor — a vector
    // can only miss if no cross-label candidate shared any band
    assert(lsh.map(_._1).distinct.length >= (0.95 * n).toInt,
      s"only ${lsh.map(_._1).distinct.length}/$n anchors mined")
    lsh.foreach { case (a, _, g, _) =>
      assert(labels(a) != labels(g), s"pair ($a,$g) shares a label")
    }
    // recall floor on the anchors the exact mode covers
    val exact = graft.operators.VectorSearchOps
      .hardNegatives(spark, sfSmall, nAnchors = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lshPairs = lsh.filter(_._1 < 20).map(t => (t._1, t._3)).toSet
    val recall = exact.intersect(lshPairs).size.toDouble / exact.size
    info(f"hard-negative LSH recall@5 over 20 anchors = $recall%.3f")
    assert(recall >= 0.8, // measured 0.95 on sf0.001
      f"recall=$recall%.3f — 16x4 banding should catch most moderate-cosine negatives")
  }
}
