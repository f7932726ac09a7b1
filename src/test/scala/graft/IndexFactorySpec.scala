package graft

import graft.operators.IndexFactory
import graft.operators.IndexFactory._
import graft.operators.{IvfIndex, VectorSearchOps}

/** Contracts for the FAISS index_factory string surface: grammar
  * coverage, parse errors that name the offending token, dispatch
  * equivalences against the constructor-form families, and the
  * IndexShards merge. */
class IndexFactorySpec extends SparkSpec {

  // ---- grammar ----------------------------------------------------------

  test("parse covers the supported grammar") {
    assert(parse("Flat") == Plan(false, None, None, Flat))
    assert(parse("IVF256,Flat") == Plan(false, None, Some(Ivf(256)), Flat))
    assert(parse("PQ8") == Plan(false, None, None, PqEnc(8, 8)))  // FAISS default nbits=8
    assert(parse("PQ8x4") == Plan(false, None, None, PqEnc(8, 4)))
    assert(parse("PQ8x8") == Plan(false, None, None, PqEnc(8, 8)))
    assert(parse("IVF64,PQ8") == Plan(false, None, Some(Ivf(64)), PqEnc(8, 8)))
    assert(parse("PCA24,IVF4,PQ8") ==
      Plan(false, Some(PcaPre(24)), Some(Ivf(4)), PqEnc(8, 8)))
    assert(parse("OPQ8,IVF64,PQ8") ==
      Plan(false, Some(OpqPre(8)), Some(Ivf(64)), PqEnc(8, 8)))
    assert(parse("SQ8") == Plan(false, None, None, Sq8))
    assert(parse("LSH") == Plan(false, None, None, Lsh))
    assert(parse("HNSW32") == Plan(false, None, None, HnswEnc(32)))
    assert(parse("IDMap,IVF16,Flat") == Plan(true, None, Some(Ivf(16)), Flat))
    assert(parse(" IVF4 , Flat ") == Plan(false, None, Some(Ivf(4)), Flat))
  }

  test("parse errors name the offending token (FAISS could-not-parse parity)") {
    val e1 = intercept[IllegalArgumentException](parse("IVF4,Banana"))
    assert(e1.getMessage.contains("Banana"))
    val e2 = intercept[IllegalArgumentException](parse("IVF4,Flat,Extra"))
    assert(e2.getMessage.contains("Extra"))
    val e3 = intercept[IllegalArgumentException](parse("IDMap"))
    assert(e3.getMessage.contains("missing encoding"))
    val e4 = intercept[IllegalArgumentException](parse("PQ8x3"))
    assert(e4.getMessage.contains("nbits"))
    val e5 = intercept[IllegalArgumentException](parse("PQ0"))
    assert(e5.getMessage.contains("PQ m must be positive"))
    val e6 = intercept[IllegalArgumentException](parse("HNSW0"))
    assert(e6.getMessage.contains("HNSW m must be positive"))
    intercept[IllegalArgumentException](parse("IVF4,,Flat"))
  }

  test("grammatical-but-unmapped specs fail at dispatch with the supported set") {
    val e = intercept[IllegalArgumentException](
      IndexFactory.search(spark, sfSmall, "OPQ8,IVF4,PQ8"))
    assert(e.getMessage.contains("supported"))
  }

  // ---- dispatch equivalence ----------------------------------------------

  test("factory 'Flat' ≡ the exact scan") {
    val f = IndexFactory.search(spark, sfSmall, "Flat").collect().toSeq
    val e = VectorSearchOps.knnExactL2(spark, sfSmall).collect().toSeq
    assert(f == e)
  }

  test("factory 'IVF4,Flat' at nprobe = nlist ≡ the exact scan") {
    val f = IndexFactory.search(spark, sfSmall, "IVF4,Flat", nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val e = VectorSearchOps.knnExactL2(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(f == e)
  }

  test("factory 'HNSW10' dispatches to the graph-ANN beam search") {
    import graft.operators.GraphAnn
    val f = IndexFactory.search(spark, sfSmall, "HNSW10")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val emb = Tables.embeddings(spark, sfSmall)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).toArray
    val g = GraphAnn.searchBeam(spark, GraphAnn.forEmbeddings(spark, sfSmall, k = 10),
        emb, q, 10, ef = 32,
        seeds = GraphAnn.seedsForEmbeddings(spark, sfSmall, k = 10),
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(f == g && f.size == 10)
  }

  test("factory 'IDMap,SQ8' dispatches through the IDMap no-op to int8 search") {
    val a = IndexFactory.search(spark, sfSmall, "IDMap,SQ8").collect().toSeq
    val b = IndexFactory.search(spark, sfSmall, "SQ8").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("parseToDf emits the registered deterministic component rows") {
    val rows = IndexFactory.parseToDf(spark, "IDMap,PCA24,IVF4,PQ8")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((0, "IDMap", 0), (1, "PCA", 24), (2, "IVF", 4), (3, "PQ", 8)))
  }

  // ---- IndexShards ---------------------------------------------------------

  test("sharded search at nprobe = nlist over a partitioned corpus ≡ the exact global scan") {
    val q = Tables.embeddings(spark, sfSmall)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).toArray
    val shards = IvfIndex.shardsForEmbeddings(spark, sfSmall, nShards = 2, nlist = 2)
    assert(shards.length == 2)
    val merged = IvfIndex.searchShards(shards, q, k = 10, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = VectorSearchOps.knnExactL2(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(merged == exact)
  }

  test("shards partition the corpus: every vector in exactly one shard") {
    val shards = IvfIndex.shardsForEmbeddings(spark, sfSmall, nShards = 2, nlist = 2)
    val counts = shards.map(_.postings.count()).sum
    val total = Tables.embeddings(spark, sfSmall).count()
    assert(counts == total)
    val ids = shards.flatMap(_.postings.select("id").collect().map(_.getLong(0)))
    assert(ids.distinct.length == ids.length)
  }
}
