package graft

import graft.operators.{ChainedIndex, IndexAudits, VectorSearchOps}

/** The composed PCA→IVF-PQ ladder: degenerate-case exactness, audit
  * flags, recall, and the training-space pin. */
class ChainedIndexSpec extends SparkSpec {

  test("full probe + full rerank degrades to the exact global kNN") {
    // nprobe = nlist prunes nothing; rerank >= corpus size means the
    // refine scores every candidate exactly — PCA and PQ error must
    // drop out entirely.
    val exact = VectorSearchOps.knnExactL2(spark, sfSmall, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val chained = ChainedIndex.search(spark, sfSmall, 0L, 10,
      nlist = 4, nprobe = 4, rerank = 500).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(chained.toSeq == exact.toSeq)
  }

  test("audit flags all hold at the smallest scale") {
    val row = IndexAudits.ivfPqPcaAudit(spark, sfSmall).collect().head
    assert(row.getLong(0) == 10L)
    (1 to 4).foreach(i => assert(row.getBoolean(i), s"flag $i false: $row"))
  }

  test("returned distances are exact (recompute from original vectors)") {
    val emb = graft.Tables.embeddings(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val q = emb(0L)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    ChainedIndex.search(spark, sfSmall, 0L, 10).collect().foreach { r =>
      assert(r.getDouble(1) == l2(emb(r.getLong(0)), q),
        s"dist for ${r.getLong(0)} is not the exact full-dim squared L2")
    }
  }

  test("codebooks are trained in PCA space (dsub = dOut / m)") {
    val ch = ChainedIndex.forEmbeddings(spark, sfSmall, dOut = 24, nlist = 4)
    assert(ch.pq.dsub == 24 / 8)
    assert(ch.pq.books.forall(_.forall(_.length == 3)))
    // the coarse index's postings live in PCA space too
    val p = ch.index.postings.select("embedding").head().getSeq[Float](0)
    assert(p.length == 24)
  }

  test("recall clears the documented floor at the smallest scale") {
    val r = ChainedIndex.recall(spark, sfSmall)
    assert(r >= 0.5, s"recall $r below the documented 0.5 floor")
  }

  test("OPQ rotation is orthogonal and the composed transform is an isometry of PCA space") {
    val dOut = 24
    val rot = graft.operators.Pq.rotationMatrix(dOut)
    for (i <- 0 until dOut; j <- 0 until dOut) {
      val dot = (0 until dOut).map(k => rot(i)(k).toDouble * rot(j)(k).toDouble).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-5,
        s"R·Rt[$i][$j] = $dot")
    }
    // rotating after PCA must preserve projected pairwise distances
    // (that is what keeps the exact refine and every audit unchanged)
    val pm = graft.operators.Pca.train(spark, sfSmall, dOut)
    val composed = ChainedIndex.composeRotation(rot, pm.comps)
    val emb = graft.Tables.embeddings(spark, sfSmall)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 20)
      .collect().map(_.getSeq[Float](1).toArray)
    def proj(m: Array[Array[Float]], v: Array[Float]): Array[Double] =
      m.map { row =>
        var acc = 0.0; var i = 0
        while (i < row.length) { acc += row(i).toDouble * v(i).toDouble; i += 1 }
        acc
      }
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (a <- emb.take(5); b <- emb.drop(5).take(5)) {
      val dPca = d2(proj(pm.comps, a), proj(pm.comps, b))
      val dRot = d2(proj(composed, a), proj(composed, b))
      assert(math.abs(dPca - dRot) <= 1e-4 * math.max(dPca, 1.0),
        s"rotation changed a projected distance: $dPca vs $dRot")
    }
  }

  test("rerank below k is rejected") {
    intercept[IllegalArgumentException] {
      ChainedIndex.search(spark, sfSmall, 0L, kNeighbors = 10, rerank = 5)
    }
  }

  test("persisted artifact roundtrips bit-identically and searches equal") {
    val mem = ChainedIndex.search(spark, sfSmall, 0L, 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dir = s"target/chained-spec-${System.nanoTime()}"
    ChainedIndex.save(spark, sfSmall, dir)
    val p = ChainedIndex.load(spark, dir)
    val ch = ChainedIndex.forEmbeddings(spark, sfSmall)
    assert(p.pca.mean.sameElements(ch.pca.mean))
    assert(p.pca.comps.indices.forall(i =>
      p.pca.comps(i).sameElements(ch.pca.comps(i))))
    assert(p.pq.books.indices.forall(s => p.pq.books(s).indices.forall(c =>
      p.pq.books(s)(c).sameElements(ch.pq.books(s)(c)))))
    assert(p.cents.sortBy(_._1).map(_._1).sameElements(
      ch.index.centroidArrays.sortBy(_._1).map(_._1)))
    val per = ChainedIndex.persistedSearch(spark, sfSmall, 0L, 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(per == mem, s"persisted != memory:\n$per\n$mem")
  }

  test("append audit: counts, replay no-op, coverage, code determinism") {
    val row = IndexAudits.ivfPqPcaAppendAudit(spark, sfSmall).collect().head
    val n = graft.Tables.embeddings(spark, sfSmall).count()
    assert(row.getLong(0) == n, s"n_total ${row.getLong(0)} != $n")
    assert(row.getLong(1) == n - n / 2)
    (2 to 5).foreach(i => assert(row.getBoolean(i), s"flag $i false: $row"))
  }

  test("cold load searches without retraining (caches cleared)") {
    val mem = ChainedIndex.search(spark, sfSmall, 0L, 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // force the persisted dir to exist, then clear every JVM memo so
    // the next persisted search can only come from the on-disk artifact
    graft.operators.ChainedIndex.persistedFor(spark, sfSmall)
    graft.operators.JvmCaches.clearAll()
    spark.catalog.clearCache()
    val per = ChainedIndex.persistedSearch(spark, sfSmall, 0L, 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(per == mem, s"cold-loaded persisted != memory:\n$per\n$mem")
  }
}
