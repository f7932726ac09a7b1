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

  test("IVF-PQ (raw codes) with nprobe = nlist equals flat PQ exactly") {
    val flat = Pq.searchPq(spark, sfSmall, queryId = 3L, kNeighbors = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Pq.ivfSearchPq(spark, sfSmall, queryId = 3L, kNeighbors = 10,
      nlist = 4, nprobe = 4, residual = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(flat == ivf)
  }

  test("in-memory IVF-PQ scans cached codes — the plan never reads a float embedding") {
    val df = Pq.ivfSearchPq(spark, sfSmall, queryId = 5L, kNeighbors = 10,
      nlist = 4, nprobe = 2)
    assert(df.collect().length == 10)
    // structural check: every LEAF the query executes is the cached
    // coded-postings relation, and none of their outputs carries the
    // float embedding column (the cache-BUILD lineage inside
    // InMemoryRelation reads it once; the query does not)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      val out = leaf.output.map(_.name)
      assert(!out.contains("embedding"),
        s"IVF-PQ search must score pre-encoded codes, not floats: $leaf")
      assert(leaf.nodeName.contains("InMemoryTableScan"),
        s"expected the memoized coded-postings cache, got: ${leaf.nodeName}")
    }
  }

  test("pq_adc_by_list scores each probed list against its own residual LUT, bit-exactly") {
    val nlist = 4
    val index = graft.operators.IvfIndex.forEmbeddings(spark, sfSmall, nlist)
    val model = Pq.residualModelFor(spark, sfSmall, nlist)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 2L)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val probed = Seq(0, 1, 2, 3)
    val luts = Pq.residualLuts(model, index, q, probed)
    val rows = Pq.codedPostings(spark, sfSmall, nlist, 8, 16, residual = true)
      .withColumn("adc",
        graft.functions.pq_adc_by_list(col("list_id"), col("codes"), luts))
      .orderBy(col("id")).limit(30).collect()
    rows.foreach { r =>
      val lid = r.getInt(0)
      val codes = r.getSeq[Byte](2)
      var expect = 0.0
      var s = 0
      while (s < codes.length) { expect += luts(lid)(s)(codes(s) & 0xff); s += 1 }
      assert(r.getDouble(3) == expect, s"vec ${r.getLong(1)} (list $lid)")
    }
    // semantics: the LUT sum IS the distance to the list-centered
    // reconstruction c_list + decode(codes)
    val cents = index.centroidArrays.toMap
    rows.take(10).foreach { r =>
      val lid = r.getInt(0); val codes = r.getSeq[Byte](2)
      val c = cents(lid)
      val recon = Array.tabulate(q.length) { i =>
        val s = i / model.dsub
        c(i) + model.books(s)(codes(s) & 0xff)(i - s * model.dsub)
      }
      var dist = 0.0
      var i = 0
      while (i < q.length) {
        val d = q(i).toDouble - recon(i); dist += d * d; i += 1
      }
      assert(math.abs(r.getDouble(3) - dist) < 1e-6,
        s"vec ${r.getLong(1)}: ADC ${r.getDouble(3)} vs reconstruction $dist")
    }
  }

  test("residual codes beat raw codes where the coarse quantizer captures real structure") {
    // The sf embeddings are uniform random — PQ's pathological case,
    // where residual encoding has nothing to gain (measured: 0.24 vs
    // 0.26 at nprobe=2). Real embedding corpora cluster; build one:
    // 4 well-separated clusters, small within-cluster noise. The
    // coarse quantizer absorbs the between-cluster variance, so
    // residual codebooks spend all 8×16 centroids on the noise scale
    // while raw codebooks must span the whole space.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 20f - 10f))
    val vecs = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      (i, Array.tabulate(dim)(d => c(d) + rnd.nextFloat() * 0.8f - 0.4f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val index = graft.operators.IvfIndex.build(df, "vec_id", "embedding", nlist = 4)
    val rawModel = Pq.train(df, "embedding", m = 4, k = 8)
    val resModel = Pq.train(Pq.residualFrame(index), "resid", m = 4, k = 8)
    val corpus = vecs.toMap
    def exactTop(qid: Long, k: Int): Set[Long] = {
      val q = corpus(qid)
      corpus.iterator.filter(_._1 != qid).map { case (id, v) =>
        var acc = 0.0; var i = 0
        while (i < dim) { val d = q(i).toDouble - v(i); acc += d * d; i += 1 }
        (id, acc)
      }.toSeq.sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
    }
    def recall(qid: Long, residual: Boolean): Double = {
      val q = corpus(qid)
      val probed = graft.operators.IvfIndex.probeLists(index, q, nprobe = 2)
      val base = (if (residual) Pq.residualFrame(index).select(col("list_id"),
          col("id"), graft.functions.pq_encode(col("resid"), resModel.books).as("codes"))
        else index.postings.select(col("list_id"), col("id"),
          graft.functions.pq_encode(col("embedding"), rawModel.books).as("codes")))
        .filter(col("list_id").isin(probed: _*))
        .filter(col("id") =!= qid)
      val scored =
        if (residual) base.select(col("id"),
          graft.functions.pq_adc_by_list(col("list_id"), col("codes"),
            Pq.residualLuts(resModel, index, q, probed)).as("d"))
        else base.select(col("id"),
          graft.functions.pq_adc(col("codes"), Pq.adcTable(rawModel, q)).as("d"))
      val got = scored.orderBy(col("d").asc, col("id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      exactTop(qid, 10).intersect(got).size / 10.0
    }
    val qids = (0L until 20L)
    val raw = qids.map(recall(_, residual = false)).sum / qids.size
    val res = qids.map(recall(_, residual = true)).sum / qids.size
    info(f"clustered-data recall@10: raw=$raw%.3f residual=$res%.3f")
    // measured: raw 0.225, residual 0.470 — residual doubles recall
    // once the coarse quantizer absorbs the between-cluster variance
    assert(res > raw + 0.1,
      f"residual ($res%.3f) must measurably beat raw ($raw%.3f) on clustered data")
    assert(res >= 0.4, f"residual recall on clustered data too low: $res%.3f")
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

  test("nbits=8 (k=256) codebooks lift ADC recall at equal code bytes") {
    // Same 8 bytes per vector either way: k=16 uses only 4 of each
    // byte's 8 bits, k=256 (the FAISS nbits=8 default) uses all of
    // them — 16× more centroids per subspace for FREE at this storage
    // budget, possible because every ADC kernel decodes codes unsigned.
    import graft.operators.VectorSearchOps
    def recall(k: Int): Double = (0L to 4L).map { qid =>
      val exact = VectorSearchOps.knnExactL2(spark, sfSmall, qid, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Pq.searchPq(spark, sfSmall, qid, kNeighbors = 10, m = 8, k = k)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }.sum / 5
    val r16 = recall(16)
    val r256 = recall(256)
    info(f"ADC recall@10 at 8 code bytes: k=16 $r16%.3f vs k=256 $r256%.3f")
    assert(r256 > r16 + 0.1,
      f"k=256 ($r256%.3f) must measurably beat k=16 ($r16%.3f) at equal bytes")
    // the upper half of the byte range must actually be exercised —
    // otherwise the unsigned decode path is untested
    val m256 = Pq.forEmbeddings(spark, sfSmall, 8, 256)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    val maxCode = Pq.encode(emb, "vec_id", "embedding", m256)
      .select(col("codes")).collect()
      .flatMap(_.getSeq[Byte](0)).map(_ & 0xff).max
    assert(maxCode > 127, s"max unsigned code $maxCode — byte range unused")
  }

  test("OPQ-lite: seeded orthogonal rotation is distance-preserving and lifts ADC recall on anisotropic data") {
    import spark.implicits._
    val dim = 16
    val rot = Pq.rotationMatrix(dim, seed = 7)
    // orthonormality: R·Rᵀ = I within float tolerance
    for (r <- 0 until dim; p <- 0 until dim) {
      val dot = (0 until dim).map(i => rot(r)(i).toDouble * rot(p)(i)).sum
      assert(math.abs(dot - (if (r == p) 1.0 else 0.0)) < 1e-5, s"R row ${r} x ${p} = $dot")
    }
    // anisotropic corpus: dims 0-1 carry variance ~100, the rest
    // ~0.003 — blocked PQ puts ALL the signal in subspace 0 (its k
    // centroids quantize a 2-D spread of ±10 coarsely) while the other
    // 7 subspaces' codes quantize noise; the rotation spreads signal
    // energy across every subspace, so the same m×k budget cuts
    // quantization error where it matters
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 400L).map { i =>
      (i, Array.tabulate(dim)(d =>
        if (d < 2) rnd.nextFloat() * 20f - 10f
        else (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val rotated = Pq.rotate(df, "embedding", rot)
    // distance preservation: exact L2 between rotated pairs equals the
    // unrotated distance within float tolerance
    val two = rotated.filter(col("vec_id") < 2).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val origTwo = vecs.take(2).map(_._2)
    assert(math.abs(l2(two(0), two(1)) - l2(origTwo(0), origTwo(1))) < 1e-3)
    // recall comparison at the same m×k code budget
    val corpus = vecs.toMap
    def exactTop(qid: Long): Set[Long] =
      corpus.iterator.filter(_._1 != qid)
        .map { case (id, v) => (id, l2(corpus(qid), v)) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    def recall(frame: org.apache.spark.sql.DataFrame,
               qxf: Array[Float] => Array[Float]): Double = {
      val model = Pq.train(frame, "embedding", m = 8, k = 8)
      val coded = Pq.encode(frame, "vec_id", "embedding", model)
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
      (0L until 20L).map { qid =>
        val lut = Pq.adcTable(model, qxf(corpus(qid)))
        val top = coded.iterator.filter(_._1 != qid)
          .map { case (id, cs) =>
            var acc = 0.0; var s = 0
            while (s < cs.length) { acc += lut(s)(cs(s) & 0xff); s += 1 }
            (id, acc)
          }.toSeq.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        exactTop(qid).intersect(top).size / 10.0
      }.sum / 20
    }
    val blocked = recall(df, identity)
    val opq = recall(rotated, q => Pq.rotateVector(rot, q))
    info(f"ADC recall@10 m=8 k=8: blocked=$blocked%.3f rotated=$opq%.3f")
    assert(opq > blocked + 0.1,
      f"rotation ($opq%.3f) must measurably beat blocked PQ ($blocked%.3f) on anisotropic data")
  }

  test("IVF-PQ refine (IndexIVFPQR shape): exact re-rank within probed lists lifts recall") {
    // refine repairs ADC ordering error; coarse-pruning misses stay
    // missed, so compare at nprobe = nlist where the probed set is the
    // whole corpus — there refine + big-enough shortlist must equal
    // the exact search, and at partial probe it must never hurt
    val qids = 0L to 4L
    def mean(rerank: Int, nprobe: Int): Double =
      qids.map(Pq.ivfPqRecall(spark, sfSmall, _, 10, nlist = 4,
        nprobe = nprobe, rerank = rerank)).sum / qids.size
    val plainPartial = mean(0, 2)
    val refinedPartial = mean(100, 2)
    info(f"IVF-PQ recall@10 nprobe=2: adc=$plainPartial%.3f refined=$refinedPartial%.3f")
    assert(refinedPartial >= plainPartial, "refine must never lose recall")
    // full probe + corpus-sized shortlist ≡ exact kNN (the re-rank is
    // exact L2 over everything the ADC pass saw)
    val full = Pq.ivfSearchPq(spark, sfSmall, queryId = 3L, kNeighbors = 10,
      nlist = 4, nprobe = 4, rerank = 1000)
      .collect().map(_.getLong(0)).toSeq
    val exact = graft.operators.VectorSearchOps.knnExactL2(spark, sfSmall, 3L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, s"full-probe refined IVF-PQ must equal exact kNN")
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
      // codes surface UNSIGNED (int) so k > 128 models audit correctly
      rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) < model.k))
    }
  }
}
