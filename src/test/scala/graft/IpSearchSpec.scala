package graft

import org.apache.spark.sql.functions._
import graft.operators.{IndexAudits, IpSearch, IvfIndex}
import graft.functions.nearest_list_ip

/** Contracts for the METRIC_INNER_PRODUCT family (FAISS IndexFlatIP /
  * IVFFlat-IP; see IpSearch): exact MIPS ordering, IP coarse
  * assignment (first-max tie-break), nprobe = nlist ≡ exact, and the
  * pruned audit's flags. */
class IpSearchSpec extends SparkSpec {

  private lazy val corpus: Array[(Long, Array[Float])] =
    Tables.embeddings(spark, sfSmall)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private lazy val (qid, q) = (corpus(0)._1, corpus(0)._2)

  private def exactIp(k: Int): Seq[Long] =
    corpus.filter(_._1 != qid)
      .map { case (id, v) => (id, dot(q, v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1).toSeq

  test("knnExactIp returns the brute-force MIPS top-k with (ip DESC, id ASC) order") {
    val got = IpSearch.knnExactIp(spark, sfSmall, qid, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == exactIp(10))
    // scores recompute exactly and arrive non-increasing
    got.foreach { case (id, s) =>
      assert(s == dot(q, corpus.find(_._1 == id).get._2))
    }
    assert(got.map(_._2).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("IP coarse assignment files every vector under its max-dot centroid (first-max ties)") {
    val idx = IpSearch.forEmbeddingsIp(spark, sfSmall, nlist = 4)
    val cents = idx.centroidArrays.sortBy(_._1).map(_._2)
    val assigned = idx.postings.select("id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    corpus.foreach { case (id, v) =>
      val scores = cents.map(dot(v, _))
      var best = 0; var bestS = Double.MinValue
      var j = 0
      while (j < scores.length) {
        if (scores(j) > bestS) { bestS = scores(j); best = j }; j += 1
      }
      assert(assigned(id) == best, s"vector $id filed under ${assigned(id)}, expected $best")
    }
  }

  test("nearest_list_ip (codegen path) matches the driver-side argmax") {
    val idx = IvfIndex.forEmbeddings(spark, sfSmall, nlist = 4)
    val cents = idx.centroidArrays.sortBy(_._1).map(_._2)
    val viaExpr = Tables.embeddings(spark, sfSmall)
      .select(col("vec_id"), nearest_list_ip(col("embedding"), cents).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    corpus.foreach { case (id, v) =>
      val expect = cents.map(dot(v, _)).zipWithIndex
        .foldLeft((Double.MinValue, 0)) { case ((bs, bj), (s, j)) =>
          if (s > bs) (s, j) else (bs, bj) }._2
      assert(viaExpr(id) == expect)
    }
  }

  test("searchIp at nprobe = nlist equals the exact MIPS scan bit-for-bit") {
    val idx = IpSearch.forEmbeddingsIp(spark, sfSmall, nlist = 4)
    val got = IpSearch.searchIp(idx, q, k = 10, nprobe = 4, excludeId = Some(qid))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = IpSearch.knnExactIp(spark, sfSmall, qid, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("probeListsIp orders centroids by dot descending with first-max ties") {
    val idx = IpSearch.forEmbeddingsIp(spark, sfSmall, nlist = 4)
    val byScore = idx.centroidArrays
      .map { case (lid, c) => (lid, dot(q, c)) }
      .sortBy { case (lid, s) => (-s, lid) }.map(_._1).toSeq
    assert(IpSearch.probeListsIp(idx, q, 2) == byScore.take(2))
    assert(IpSearch.probeListsIp(idx, q, 4) == byScore)
  }

  test("ipPrunedAudit flags are green at test scale") {
    val row = IndexAudits.ipPrunedAudit(spark, sfSmall).collect().head
    assert(row.getLong(0) == 10L)       // n_hits
    assert(row.getBoolean(1))           // ips_match_ok
    assert(row.getBoolean(2))           // topk_tight_ok
    assert(row.getBoolean(3))           // recall_ok
  }

  // ---- cosine IVF ----------------------------------------------------

  test("CosineIvf at nprobe = nlist equals the exact cosine scan bit-for-bit") {
    val idx = graft.operators.CosineIvf.forEmbeddings(spark, sfSmall, nlist = 4)
    val got = graft.operators.CosineIvf.search(idx, q, k = 10, nprobe = 4,
        excludeId = Some(qid))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = graft.operators.VectorSearchOps.knnExactCosine(spark, sfSmall, qid, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("CosineIvf postings store RAW vectors and partition the corpus") {
    val idx = graft.operators.CosineIvf.forEmbeddings(spark, sfSmall, nlist = 4)
    assert(idx.postings.count() == corpus.length.toLong)
    val raw = corpus.toMap
    idx.postings.select("id", "embedding").collect().foreach { r =>
      assert(r.getSeq[Float](1).toArray.sameElements(raw(r.getLong(0))))
    }
  }

  // ---- search_and_reconstruct ----------------------------------------

  test("searchAndReconstruct returns the search top-k with bit-exact stored vectors") {
    val idx = IvfIndex.forEmbeddings(spark, sfSmall, nlist = 4)
    val got = IvfIndex.searchAndReconstruct(idx, q, k = 10, nprobe = 4,
        excludeId = Some(qid)).collect()
    val plain = IvfIndex.search(idx, q, k = 10, nprobe = 4, excludeId = Some(qid))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq == plain)
    val raw = corpus.toMap
    got.foreach { r =>
      assert(r.getSeq[Float](2).toArray.sameElements(raw(r.getLong(0))))
    }
  }
}
