package graft

import graft.operators.Pq
import graft.functions.{pq_adc, pq_encode}
import org.apache.spark.sql.functions._

/** Product quantization: kernel semantics (encode argmin, ADC table
  * lookup), training determinism, the IVF-PQ ≡ flat-PQ pin, and the
  * recall quality bar vs exact search. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // Hand-built codebooks: 2 subspaces × 2 centroids × 2 dims.
  private val books: Array[Array[Array[Float]]] = Array(
    Array(Array(0f, 0f), Array(10f, 10f)),
    Array(Array(-5f, -5f), Array(5f, 5f)))

  test("pq_encode picks the per-subspace argmin; first minimum wins ties") {
    val rows = Seq(
      (0L, Array(9f, 9f, -4f, -4f)),   // sub0 -> centroid 1, sub1 -> centroid 0
      (1L, Array(1f, 1f, 4f, 4f)),     // sub0 -> centroid 0, sub1 -> centroid 1
      (2L, Array(5f, 5f, 0f, 0f)))     // sub0 equidistant -> first (0); sub1 equidistant -> first (0)
      .toDF("id", "v")
      .select(col("id"), pq_encode(col("v"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toSeq).toMap
    assert(rows(0L) == Seq[Byte](1, 0))
    assert(rows(1L) == Seq[Byte](0, 1))
    assert(rows(2L) == Seq[Byte](0, 0))
  }

  test("pq_encode rejects a dimension mismatch loudly") {
    val ex = intercept[Exception] {
      Seq((0L, Array(1f, 2f, 3f))).toDF("id", "v")
        .select(pq_encode(col("v"), books)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("pq_adc sums lut[subspace][code] in subspace order") {
    val lut = Array(Array(1.5, 2.5), Array(10.0, 20.0))
    val got = Seq((0L, Array[Byte](1, 0)), (1L, Array[Byte](0, 1)))
      .toDF("id", "codes")
      .select(col("id"), pq_adc(col("codes"), lut).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 2.5 + 10.0)
    assert(got(1L) == 1.5 + 20.0)
  }

  test("ADC score equals the driver-computed LUT sum bit-exactly") {
    val model = Pq.forEmbeddings(spark, sfSmall)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val lut = Pq.adcTable(model, q)
    val rows = Pq.encode(emb, "vec_id", "embedding", model)
      .withColumn("adc", pq_adc(col("codes"), lut))
      .orderBy(col("vec_id")).limit(20).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1)
      var expect = 0.0
      var s = 0
      while (s < codes.length) { expect += lut(s)(codes(s) & 0xff); s += 1 }
      assert(r.getDouble(2) == expect, s"vec ${r.getLong(0)}")
    }
  }

  test("codes cover every vector: length m, range [0, k)") {
    val model = Pq.forEmbeddings(spark, sfSmall)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val bad = Pq.encode(emb, "vec_id", "embedding", model)
      .select(col("vec_id"), col("codes"))
      .collect()
      .filter { r =>
        val c = r.getSeq[Byte](1)
        c.length != model.m || c.exists(b => b < 0 || b >= model.k)
      }
    assert(bad.isEmpty, s"${bad.length} vectors with out-of-range codes")
  }

  test("training is deterministic: two fresh trains give identical codebooks") {
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val a = Pq.train(emb, "embedding", m = 4, k = 8)
    val b = Pq.train(emb, "embedding", m = 4, k = 8)
    assert(a.books.length == b.books.length)
    a.books.zip(b.books).foreach { case (ba, bb) =>
      assert(ba.map(_.toSeq).toSeq == bb.map(_.toSeq).toSeq)
    }
  }

  test("IVF-PQ with nprobe = nlist equals flat PQ exactly") {
    val flat = Pq.searchPq(spark, sfSmall, queryId = 3L, kNeighbors = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Pq.ivfSearchPq(spark, sfSmall, queryId = 3L, kNeighbors = 10,
      nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(flat == ivf)
  }

  test("PQ recall@10 vs exact L2: ADC floor, and the refine pattern restores it") {
    // These embeddings are (near-)uniform random in 64 dims — PQ's
    // worst case: no low-dim structure to quantize (measured ADC-only
    // recall: 0.34 at m=8/k=16, 0.44 at m=16, 0.60 at m=32 — more
    // centroids do NOT help, distance concentration does not care).
    // The ADC assertion pins 'far above chance' (chance = 10/499 ≈
    // 0.02); the production-quality bar is the FAISS refine pattern,
    // where ADC only builds a 100-candidate shortlist and exact L2
    // re-ranks it.
    val adc = (0L to 4L).map(q => Pq.pqRecall(spark, sfSmall, q, 10)).sum / 5
    assert(adc >= 0.2, s"mean ADC recall@10 over 5 queries = $adc")
    val refined = (0L to 4L).map(q =>
      Pq.pqRecall(spark, sfSmall, q, 10, rerank = 100)).sum / 5
    assert(refined >= 0.7, s"mean refined recall@10 over 5 queries = $refined")
    assert(refined >= adc, "re-ranking must not lose recall")
  }

  test("persisted binary-code search ≡ in-memory IVF-PQ; scan is partition-pruned") {
    val mem = Pq.ivfSearchPq(spark, sfSmall, queryId = 7L, kNeighbors = 10,
      nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = Pq.persistedSearchPq(spark, sfSmall, queryId = 7L, kNeighbors = 10,
      nlist = 4, nprobe = 2)
    val diskRows = disk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mem == diskRows)
    // the probed lists must reach the scan as PartitionFilters — the
    // directory layout IS the inverted file
    val plan = disk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected a partition-pruned postings scan, got:\n$plan")
  }

  test("binary and array-typed codes ADC-score identically") {
    val model = Pq.forEmbeddings(spark, sfSmall)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val lut = Pq.adcTable(model, q)
    val both = emb.limit(25)
      .select(col("vec_id"),
        pq_adc(pq_encode(col("embedding"), model.books), lut).as("a"),
        pq_adc(pq_encode(col("embedding"), model.books, asBinary = true), lut).as("b"))
      .collect()
    both.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"vec ${r.getLong(0)}"))
  }

  test("pq_stats: histogram covers the corpus exactly once per subspace") {
    val model = Pq.forEmbeddings(spark, sfSmall)
    val n = spark.read.parquet(s"$sfSmall/embeddings.parquet").count()
    val stats = Pq.pqStats(spark, sfSmall).collect()
    val bySub = stats.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until model.m).toSet)
    bySub.foreach { case (s, rows) =>
      assert(rows.map(_.getLong(2)).sum == n, s"subspace $s histogram mass")
      rows.foreach(r => assert(r.getByte(1) >= 0 && r.getByte(1) < model.k))
    }
  }
}
