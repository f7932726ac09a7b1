package graft

import graft.operators.VectorOps

/** Centroid-distance outlier detection over labeled embeddings. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("centroidOutliers: a planted far vector ranks first in its label") {
    // label 0: a tight cluster near (1,0,0,...) plus one vector at the
    // antipode; label 1: a tight cluster with no outlier
    val dim = 8
    def v(head: Float*) = (head ++ Seq.fill(dim - head.length)(0.0f)).toArray
    val rows = Seq(
      (0L, v(1.0f, 0.1f), 0),
      (1L, v(1.0f, -0.1f), 0),
      (2L, v(0.9f, 0.0f), 0),
      (3L, v(-9.0f, 0.0f), 0), // planted outlier
      (10L, v(0.0f, 2.0f), 1),
      (11L, v(0.0f, 2.1f), 1),
      (12L, v(0.0f, 1.9f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = VectorOps.centroidOutliersOf(emb, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 4, "two labels x k=2")
    val lab0 = out.filter(_._1 == 0)
    assert(lab0.head._3 == 3L, s"planted outlier must rank 1, got $lab0")
    // ranks are 1..k and dist2 is non-increasing within a label
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.sameElements(Array(1L, 2L)))
      assert(rs.sortBy(_._2).sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }

  test("centroidOutliers: dist2 equals a driver-side recomputation on sf0.001") {
    val emb = graft.Tables.embeddings(spark, sfSmall)
    val vecs = emb.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))
    }
    // driver reference: double-precision mean per component (the
    // decimal-sum mean equals it on this data to 1e-9 — the assert
    // below is tolerance-based for the mean, exact for ranking)
    val byLabel = vecs.groupBy(_._3)
    val cents = byLabel.view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(i =>
        vs.map(v => BigDecimal(v._2(i).toDouble.toString)).sum.toDouble / vs.size)
    }.toMap
    val expected = vecs.map { case (id, v, l) =>
      val c = cents(l)
      var acc = 0.0
      var i = 0
      while (i < v.length) { val d = v(i).toDouble - c(i); acc += d * d; i += 1 }
      (l, id) -> acc
    }.toMap
    val got = VectorOps.centroidOutliersOf(emb, k = 10).collect()
      .map(r => ((r.getInt(0), r.getLong(2)), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (key, d2) =>
      val e = expected(key)
      assert(math.abs(d2 - e) <= 1e-9 * math.max(1.0, e), s"$key: $d2 vs $e")
    }
    // and the top-1 per label matches the reference argmax
    val topGot = VectorOps.centroidOutliersOf(emb, k = 1).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    byLabel.keys.foreach { l =>
      val ref = expected.filter(_._1._1 == l).maxBy { case ((_, id), d) => (d, -id) }
      assert(topGot(l) == ref._1._2, s"label $l top-1")
    }
  }
}
