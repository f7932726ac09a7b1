package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHash
import graft.operators.Dedup
import org.apache.spark.unsafe.types.UTF8String

/** Dedup family semantics on corpora with planted duplicates — the
  * verification layer for the non-SQL-expressible paths (simhash,
  * IVF-bucketed doc dedup) plus unit coverage of the kernels. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 0≡1 exact dup, 2 near-dup of 0 (one word changed),
  // 3/4/5 unrelated, 6 exact dup of 3.
  private val planted = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (3L, "completely different subject matter about database query optimization"),
    (4L, "spark catalyst optimizer rewrites logical plans into physical plans"),
    (5L, "vector search with inverted file indexes scales to large corpora"),
    (6L, "completely different subject matter about database query optimization"))
  private lazy val corpus = planted.toDF("id", "sentence")

  test("dedupExactCorpus: identical texts share min-id canonical; others kept") {
    val got = Dedup.dedupExactCorpus(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (0L, 0L, true), (1L, 0L, false), (2L, 2L, true), (3L, 3L, true),
      (4L, 4L, true), (5L, 5L, true), (6L, 3L, false)))
  }

  test("dedupMinhashCorpus: exact and near dups found, unrelated pairs absent") {
    val pairs = Dedup.dedupMinhashCorpus(corpus, minJaccard = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair must survive LSH + verify")
    assert(pairs.contains((3L, 6L)), "second exact dup pair must survive")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "near-dup (1-token edit, jaccard 13/15) must be found")
    val unrelated = Set((3L, 4L), (3L, 5L), (4L, 5L))
    assert(pairs.intersect(unrelated).isEmpty, "unrelated docs must not pair")
  }

  test("dedupNgramCorpus: shingle-set Jaccard is stricter than token-set Jaccard") {
    val got = Dedup.dedupNgramCorpus(corpus, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 1L)) == 1.0, "exact dup: shingle sets identical")
    assert(got((3L, 6L)) == 1.0)
    // one token edited out of 14 → 3 of 12 distinct shingles differ per
    // side; jaccard3 = 9/15 = 0.6 — found, but well below the token-set
    // jaccard (13/15 ≈ 0.87) for the same pair
    val j3 = got((0L, 2L))
    assert(j3 > 0.5 && j3 < 0.7, s"jaccard3 = $j3")
    val tokJ = Dedup.dedupMinhashCorpus(corpus, minJaccard = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j3 < tokJ((0L, 2L)), "shingle jaccard must be stricter on word edits")
  }

  test("dedupSimhashCorpus: exact dups at Hamming 0; near-dup within bound") {
    val got = Dedup.dedupSimhashCorpus(corpus, maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((0L, 1L)) == 0)
    assert(got((3L, 6L)) == 0)
    assert(got.get((0L, 2L)).forall(_ <= 10))
  }

  test("simhash64 kernel: deterministic, order-sensitive token weighting") {
    def sh(s: String): Long = SimHash.simhash64(UTF8String.fromString(s))
    assert(sh("alpha beta gamma") == sh("alpha beta gamma"))
    // bag-of-words fingerprint: token multiset determines the hash
    assert(sh("beta alpha gamma") == sh("alpha beta gamma"))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = hamming(sh(planted(0)._2), sh(planted(2)._2))
    val far = hamming(sh(planted(0)._2), sh(planted(4)._2))
    assert(near < far, s"near=$near far=$far")
  }

  test("docDedup (embed -> IVF -> CC): planted dups share canonicals, unrelated are singletons") {
    val got = Dedup.docDedup(corpus, eps = 0.3, k = 5, nlist = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      .sortBy(_._1)
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(0L) == byId(1L), "exact dup must share canonical")
    assert(byId(3L) == byId(6L), "exact dup must share canonical")
    assert(byId(0L) == byId(2L), "near dup (1-token edit) within eps=0.3")
    assert(byId(4L) != byId(0L) && byId(5L) != byId(0L) && byId(4L) != byId(5L))
    // kept = is canonical
    got.foreach { case (id, canon, kept) => assert(kept == (id == canon)) }
  }

  test("docDedup excludes zero-token docs from the graph (own singleton)") {
    val weird = (planted :+ (7L, "!!! ???") :+ (8L, "!!! ???")).toDF("id", "sentence")
    val got = Dedup.docDedup(weird, eps = 0.3, k = 5, nlist = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // identical zero-token docs must NOT merge (distance over zero
    // vectors is meaningless); each stays its own canonical
    assert(got(7L) == 7L && got(8L) == 8L)
  }

  test("LSH band-bucket cap: degenerate buckets excluded, honest pairs survive") {
    // 5,000 identical boilerplate docs put 5,000 rows in each of their
    // 4 band buckets — 12.5M candidate pairs per band without a cap,
    // quadratic in bucket size (the one dedup-family 100 TB
    // scale-killer named in round 3). With the cap those buckets are
    // excluded wholesale: no boilerplate pair reaches the verify join
    // (exact duplicates are dedup_exact's job), while the planted
    // near-dups' small honest buckets are untouched.
    val boiler = (100L until 5100L).map(
      (_, "all work and no play makes jack a dull boy every single day"))
    val mixed = (planted ++ boiler).toDF("id", "sentence")
    val pairs = Dedup.dedupMinhashCorpus(mixed, minJaccard = 0.7, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((3L, 6L)) &&
      pairs.contains((0L, 2L)), "small honest buckets must still pair")
    assert(!pairs.exists { case (a, b) => a >= 100L && b >= 100L },
      "capped degenerate bucket must produce no candidates")
    val ngramPairs = Dedup.dedupNgramCorpus(mixed, minJaccard = 0.5, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngramPairs.contains((0L, 1L)))
    assert(!ngramPairs.exists { case (a, b) => a >= 100L && b >= 100L })
    val shPairs = Dedup.dedupSimhashCorpus(mixed, maxHamming = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shPairs.contains((0L, 1L)), "identical sigs share all 4 small bands")
    assert(!shPairs.exists { case (a, b) => a >= 100L && b >= 100L })
  }

  test("hyperplane sketch matches driver-side sign bits; LSH near-dup finds planted pairs") {
    import spark.implicits._
    // planted unit-ish vectors: 0≈1 (tiny perturbation, cos ≈ 0.9998),
    // 2≈3, and 4/5 unrelated directions
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def base(): Array[Float] = unit(Array.fill(64)(rnd.nextGaussian().toFloat))
    def wiggle(v: Array[Float]): Array[Float] =
      unit(v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    val b0 = base(); val b2 = base()
    val rows = Seq(
      (0L, b0), (1L, wiggle(b0)), (2L, b2), (3L, wiggle(b2)),
      (4L, base()), (5L, base()))
    val emb = rows.toDF("id", "embedding")
    // kernel: expression bits == driver-side sign bits on the same planes
    val planes = Dedup.hyperplanes(64)
    val got = emb.select(col("id"),
        graft.functions.hyperplane_sketch(col("embedding"), planes).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      var exp = 0L
      planes.zipWithIndex.foreach { case (p, j) =>
        val dot = p.indices.map(i => v(i).toDouble * p(i)).sum
        if (dot > 0.0) exp |= (1L << j)
      }
      assert(got(id) == exp, s"id=$id")
    }
    // operator: planted near-identical pairs are found with exact cosines
    val pairs = Dedup.neardupCosineLshCorpus(emb, minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((2L, 3L)),
      s"planted near-dups must be found, got $pairs")
    assert(!pairs.contains((4L, 5L)), "unrelated directions must not pair")
    // empty corpus: empty pair set with the right shape (exact-mode
    // parity), not an error
    val empty = Dedup.neardupCosineLshCorpus(
      Seq.empty[(Long, Array[Float])].toDF("id", "embedding"))
    assert(empty.columns.toSeq == Seq("a_id", "b_id", "cos"))
    assert(empty.count() == 0)
  }

  test("LSH cosine near-dup recall vs the exact O(n^2) mode on sf0.001") {
    // exact mode at a threshold low enough to produce pairs on the
    // driver embeddings; every high-cosine pair must be recovered by
    // the banded sketch (8x8-bit bands: P[miss] < 2% at cos 0.9,
    // vanishing as cos -> 1) — allow one straggler, require the rest.
    val minCos = 0.9
    val exact = Dedup.neardupCosine(spark, sfSmall, minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.neardupCosineLsh(spark, sfSmall, minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must have exact precision (verified pairs)")
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      assert(recall >= 0.9, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
    }
  }

  test("neardupCosine and dedupEmbedExact run on sf0.001 with consistent shapes") {
    val cos = Dedup.neardupCosine(spark, sfSmall, minCos = 0.9)
    assert(cos.columns.toSeq == Seq("a_id", "b_id", "cos"))
    cos.collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1)); assert(r.getDouble(2) > 0.9)
    }
    val ded = Dedup.dedupEmbedExact(spark, sfSmall, eps = 0.9)
    val rows = ded.collect()
    assert(rows.length == 500)
    rows.foreach { r => assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1))) }
    // canonical must be <= member id (min of component)
    rows.foreach { r => assert(r.getLong(1) <= r.getLong(0)) }
  }

  test("minhash clusters equal driver-side union-find over the emitted LSH pairs") {
    val pairs = Dedup.dedupMinhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.minhashClusters(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // reference: union-find over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = clusters.map(_._1).map(id => id -> find(id)).toMap
    // min-id canonical per component
    val canon = roots.groupBy(_._2).flatMap { case (_, m) =>
      val c = m.keys.min; m.keys.map(_ -> c)
    }
    clusters.foreach { case (id, canonical, kept) =>
      assert(canonical == canon(id), s"id $id")
      assert(kept == (id == canonical))
    }
    // every signature-bearing doc appears exactly once
    assert(clusters.map(_._1).distinct.length == clusters.length)
    // transitivity: any two docs joined through a chain share a canonical
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b))
    }
  }
}
