package graft

import graft.operators.{Dedup, GraphRank}

/** Exact-integer PageRank over the near-dup graph: pinned against an
  * independent driver-side reference implementation of the same
  * fixed-point recurrence, plus the structural invariants. */
class GraphRankSpec extends SparkSpec {

  /** Driver-side reference: the identical integer recurrence computed
    * with plain Scala Maps — same Scale/Base/damping-split/iterations,
    * independent of every Spark operator under test. */
  private def referenceRanks(nodes: Seq[Long],
                             pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> GraphRank.Scale).toMap
    for (_ <- 1 to GraphRank.Iterations) {
      val s = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst) => s(dst) += rank(src) / deg(src) }
      rank = nodes.map { n =>
        val in = s(n)
        n -> (GraphRank.Base + (in / 100) * GraphRank.Damping +
          ((in % 100) * GraphRank.Damping) / 100)
      }.toMap
    }
    rank
  }

  test("pagerankDocs equals the driver-side integer reference on sf0.001") {
    val nodes = Dedup.minhashSignatures(spark, sfSmall)
      .select("id").collect().map(_.getLong(0)).toSeq
    val pairs = Dedup.dedupMinhash(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture must contain near-dup edges")
    val expected = referenceRanks(nodes, pairs)
    val got = GraphRank.pagerankDocs(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    val diffs = got.collect { case (id, r) if expected(id) != r =>
      (id, r, expected(id)) }
    assert(diffs.isEmpty, s"rank mismatches (first 5): ${diffs.take(5)}")
  }

  test("structural invariants: teleport floor, isolated nodes, hub dominance") {
    val rows = GraphRank.pagerankDocs(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val rank = rows.toMap
    // every rank carries at least the teleport term
    assert(rows.forall(_._2 >= GraphRank.Base))
    val pairs = Dedup.dedupMinhash(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val connected = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // isolated nodes converge to exactly the teleport term
    rows.filterNot(r => connected(r._1)).foreach { case (id, r) =>
      assert(r == GraphRank.Base, s"isolated $id has rank $r")
    }
    // connected nodes strictly dominate isolated ones (they receive
    // at least one neighbor's share on top of the teleport term)
    val connRanks = rows.filter(r => connected(r._1)).map(_._2)
    assert(connRanks.nonEmpty && connRanks.min > GraphRank.Base)
    // ranks are deterministic across runs (integer sums are
    // order-independent — no float summation caveat to tolerate)
    val again = GraphRank.pagerankDocs(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == rank)
  }

  test("checkpoint cadence never changes a rank (16 iterations, fires at 8)") {
    val checked = GraphRank.pagerankDocs(spark, sfSmall, iterations = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = GraphRank.pagerankDocsNoCheckpoint(spark, sfSmall, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(checked == plain)
  }

  test("persisted edge log: base + appended wave == fresh mine, replay no-op") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("graph-log-")
    GraphRank.saveWithEdges(corpus.filter(col("id") % 2 === 0), dir)
    val n1 = GraphRank.appendEdgesBatch(spark, dir,
      corpus.filter(col("id") % 2 === 1), 1L)
    assert(n1 > 0L, "fixture must contribute wave-1 edges")
    // edge-for-edge: the log's symmetrized multiset equals the fresh
    // mine's (dedup via Set — both sides emit distinct pairs)
    val logged = spark.read.parquet(s"$dir/edges")
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Dedup.dedupMinhash(spark, sfSmall)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    assert(logged == fresh)
    // therefore the ranks are bit-identical
    val fromLog = GraphRank.pagerankFromLog(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = GraphRank.pagerankDocs(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromLog == direct)
    // and the CC twin matches the fresh transitive collapse
    val ccLog = GraphRank.ccFromLog(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val ccFresh = Dedup.minhashClusters(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(ccLog == ccFresh)
    // committed-wave replay appends nothing
    assert(GraphRank.appendEdgesBatch(spark, dir,
      corpus.filter(col("id") % 2 === 1), 1L) == 0L)
  }

  test("crash window: index committed, edges not — replay emits no self-pairs") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("graph-crash-")
    GraphRank.saveWithEdges(corpus.filter(col("id") % 2 === 0), dir)
    val wave = corpus.filter(col("id") % 2 === 1)
    // simulate the crash order: the MinHash admission committed first,
    // the edge append never ran (its marker is absent)
    graft.operators.MinhashIndex.appendBatch(spark, dir, wave, 1L)
    val n = GraphRank.appendEdgesBatch(spark, dir, wave, 1L)
    assert(n > 0L)
    val logged = spark.read.parquet(s"$dir/edges")
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Dedup.dedupMinhash(spark, sfSmall)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    assert(logged == fresh, "anti-join must exclude the admitted wave's self-matches")
  }

  test("graphStream: streamed waves reproduce the fresh mine; restart appends nothing") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("graph-stream-")
    val landing = tmpDir("graph-stream-landing-")
    val ckpt = tmpDir("graph-stream-ckpt-")
    GraphRank.saveWithEdges(corpus.filter(col("id") % 2 === 0), dir)
    val schema = corpus.schema
    def stage(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = tmpDir("graph-stream-stage-")
      corpus.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.move(p,
          java.nio.file.Paths.get(s"$landing/$name.parquet")))
    }
    def run(): Unit =
      graft.streaming.IndexMaintenance.graphStream(
        spark.readStream.schema(schema).parquet(landing), dir,
        checkpointDir = Some(ckpt)).awaitTermination()
    stage(col("id") % 2 === 1 && col("id") < 250, "part0"); run()
    stage(col("id") % 2 === 1 && col("id") >= 250, "part1"); run()
    run() // nothing new — restart must append nothing
    val logged = spark.read.parquet(s"$dir/edges")
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(logged.length == logged.toSet.size, "no edge may land twice")
    val fresh = Dedup.dedupMinhash(spark, sfSmall)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    assert(logged.toSet == fresh)
    val fromLog = GraphRank.pagerankFromLog(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = GraphRank.pagerankDocs(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromLog == direct)
  }

  test("damping split (s div 100)*85 + ((s mod 100)*85) div 100 == (85*s) div 100") {
    val rnd = new scala.util.Random(7)
    (0 until 10000).foreach { _ =>
      // s up to ~1e17 — the regime where 85*s would still be exact;
      // the split must agree there (and never overflows beyond it)
      val s = math.abs(rnd.nextLong()) % 100000000000000000L
      val split = (s / 100) * 85 + ((s % 100) * 85) / 100
      assert(split == (85 * BigInt(s) / 100).toLong, s"s=$s")
    }
  }
}
