package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{cosine_sim, l2sq}
import graft.operators._

/** Dev diagnostic: measures the seed-/codebook-dependent quantities
  * (recalls, cluster agreement, list stats) the audit projections
  * assert bounds on, so the bounds in SparkEntry's audit queries are
  * set from data, not guessed. Not part of the driver contract; run
  * via `sbt "runMain graft.AuditProbe /root/testdata/sf0.01"`. */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def p(name: String, v: Any): Unit = println(f"[audit] $name%-34s $v")

    val emb = Tables.embeddings(spark, sfDir)
    val nEmb = emb.count()
    p("n_embeddings", nEmb)

    // --- IVF build/append stats -------------------------------------
    val idx = IvfIndex.forEmbeddings(spark, sfDir, 4)
    val counts = idx.postings.groupBy("list_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    p("ivf_build n_lists / min / total", (counts.size, counts.values.min, counts.values.sum))
    val app = IvfIndex.appendHalfStats(spark, sfDir).collect()
    p("append n_lists / total", (app.length, app.map(_.getLong(1)).sum))

    // --- pruned search recall ---------------------------------------
    def ids(df: DataFrame, c: String = "vec_id"): Set[Long] =
      df.select(c).collect().map(_.getLong(0)).toSet
    val exact10 = ids(VectorSearchOps.knnExactL2(spark, sfDir, 0L, 10))
    val q0 = emb.filter(col("vec_id") === 0L).select("embedding").head.getSeq[Float](0).toArray
    val pruned = IvfIndex.search(idx, q0, 10, 2, Some(0L)).withColumnRenamed("id", "vec_id")
    p("ivf_search_pruned recall@10", ids(pruned).intersect(exact10).size / 10.0)
    val persIdx = IvfIndex.persistedForEmbeddings(spark, sfDir, 4)
    val persPruned = IvfIndex.search(persIdx, q0, 10, 2, Some(0L)).withColumnRenamed("id", "vec_id")
    p("persisted_pruned == pruned",
      persPruned.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        pruned.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)

    // --- batch IVF recall -------------------------------------------
    val ivfAll = IvfIndex.searchAll(idx, emb, "vec_id", "embedding", 5, 2)
    val wB = Window.partitionBy(col("src_id")).orderBy(col("dist").asc, col("dst_id").asc)
    val exactAll = emb.select(col("vec_id").as("src_id"), col("embedding").as("src_emb"))
      .join(emb.select(col("vec_id").as("dst_id"), col("embedding").as("dst_emb")),
        col("src_id") =!= col("dst_id"))
      .withColumn("dist", l2sq(col("src_emb"), col("dst_emb")))
      .withColumn("rank", row_number().over(wB))
      .filter(col("rank") <= 5)
      .select("src_id", "dst_id")
    val perQ = ivfAll.select("src_id", "dst_id")
      .join(exactAll, Seq("src_id", "dst_id"), "inner")
      .groupBy("src_id").agg(count(lit(1)).as("hits"))
    val rec = perQ.agg(avg(col("hits") / 5.0).as("mean"), min(col("hits") / 5.0).as("min")).head
    // queries with 0 hits drop out of perQ — account for them
    val covered = perQ.count()
    p("knn_batch_ivf mean recall (covered q)", rec.getDouble(0))
    p("knn_batch_ivf min recall / covered", (rec.getDouble(1), covered, nEmb))
    val hitsPerQ = ivfAll.groupBy("src_id").agg(count(lit(1)).as("n")).agg(min("n"), max("n")).head
    p("knn_batch_ivf rows per query min/max", (hitsPerQ.getLong(0), hitsPerQ.getLong(1)))

    // --- cluster agreement ------------------------------------------
    def canon(df: DataFrame): DataFrame = {
      val minPer = df.filter(col("cluster_id") =!= -1L)
        .groupBy("cluster_id").agg(min(col("vec_id")).as("canon"))
      df.join(broadcast(minPer), Seq("cluster_id"), "left")
        .select(col("vec_id"), coalesce(col("canon"), col("vec_id")).as("canon"))
    }
    val ivfC = canon(Clustering.clusterIvf(spark, sfDir))
    val exC = canon(Clustering.clusterExact(spark, sfDir, 0.75))
    val agree = ivfC.as("a").join(exC.as("b"), col("a.vec_id") === col("b.vec_id"))
      .agg(avg(when(col("a.canon") === col("b.canon"), 1.0).otherwise(0.0))).head.getDouble(0)
    p("cluster_ivf agreement vs exact(0.75)", agree)
    // refinement: each ivf cluster maps into exactly one exact cluster
    val refine = Clustering.clusterIvf(spark, sfDir).as("i")
      .join(exC.as("e"), col("i.vec_id") === col("e.vec_id"))
      .filter(col("i.cluster_id") =!= -1L)
      .groupBy(col("i.cluster_id")).agg(countDistinct(col("e.canon")).as("nx"))
      .agg(coalesce(max("nx"), lit(0L))).head.getLong(0)
    p("cluster_ivf refinement max-exact-per-ivf", refine)
    p("cluster_ivf non-singleton vecs",
      Clustering.clusterIvf(spark, sfDir).filter(col("cluster_id") =!= -1L).count())

    // --- hard negatives LSH recall ----------------------------------
    val lsh = VectorSearchOps.hardNegativesLsh(spark, sfDir)
    val wH = Window.partitionBy(col("anchor_id")).orderBy(col("sim").desc, col("neg_id").asc)
    val exactHn = emb.select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb"), col("label").as("a_label"))
      .join(emb.select(col("vec_id").as("neg_id"), col("embedding").as("n_emb"), col("label").as("n_label")),
        col("a_label") =!= col("n_label"))
      .withColumn("sim", cosine_sim(col("a_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(wH))
      .filter(col("rank") <= 5)
      .select("anchor_id", "neg_id")
    val hnHits = lsh.select("anchor_id", "neg_id")
      .join(exactHn, Seq("anchor_id", "neg_id"), "inner")
      .groupBy("anchor_id").agg(count(lit(1)).as("hits"))
    val hnCovered = hnHits.count()
    val hnSum = if (hnCovered == 0) 0.0 else hnHits.agg(sum("hits")).head.getLong(0).toDouble
    p("hard_negatives_lsh mean recall(all anchors)", hnSum / (5.0 * nEmb))
    p("hard_negatives_lsh anchors covered", (hnCovered, nEmb))

    // --- PQ recalls ----------------------------------------------------
    p("knn_pq rerank=100 recall@10", Pq.pqRecall(spark, sfDir, rerank = 100))
    p("ivf_search_pq recall@10", Pq.ivfPqRecall(spark, sfDir))
    val persistedPq = Pq.persistedSearchPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val memPq = Pq.ivfSearchPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    p("pq_persisted == ivf_search_pq", persistedPq == memPq)

    // --- quantized IVF recall vs flat quantized ---------------------
    val flatQ = ids(Quantization.knnQuantized(spark, sfDir))
    val ivfQ = ids(Quantization.ivfSearchQuantized(spark, sfDir))
    p("ivf_search_quantized recall vs flat", ivfQ.intersect(flatQ).size / 10.0)

    // --- doc_dedup invariants ----------------------------------------
    val dd = Dedup.docDedupFor(spark, sfDir)
    val corpus = graft.sources.Ingest.corpusFromDocuments(spark, sfDir)
    p("doc_dedup rows / corpus", (dd.count(), corpus.count()))
    val ddS = dd.join(corpus.select(col("id").as("doc_id"), col("sentence")), Seq("doc_id"))
    val viol = ddS.select(col("doc_id").as("ida"), col("canonical_id").as("ca"), col("sentence").as("sa"))
      .join(ddS.select(col("doc_id").as("idb"), col("canonical_id").as("cb"), col("sentence").as("sb")),
        col("ida") < col("idb") && col("sa") === col("sb"))
      .filter(col("ca") =!= col("cb"))
      .count()
    p("doc_dedup identical-text split pairs", viol)

    // --- PCA pre-transform recall -----------------------------------
    for (d <- Seq(8, 16, 24); r <- Seq(50, 100, 200))
      p(s"knn_pca_rerank recall@10 (r=$r,d=$d)",
        Pca.pcaRecall(spark, sfDir, rerank = r, dOut = d))
    val m = Pca.train(spark, sfDir, 16)
    p("pca explained ratio (d=16)", m.eigvals.sum / m.trace)

    // --- MMR determinism smoke --------------------------------------
    val mmr1 = Mmr.mmrRerank(spark, sfDir).collect().map(r => (r.getLong(1), r.getDouble(2)))
    val mmr2 = Mmr.mmrRerank(spark, sfDir).collect().map(r => (r.getLong(1), r.getDouble(2)))
    p("mmr_rerank deterministic", mmr1.sameElements(mmr2))
    p("mmr_rerank head", mmr1.take(3).mkString(", "))

    // --- chained PCA->IVF-PQ + index-backed MMR ----------------------
    for (np <- Seq(2, 3); rr <- Seq(50, 100, 200))
      p(s"ivf_pq_pca recall@10 (nprobe=$np,rerank=$rr)",
        ChainedIndex.recall(spark, sfDir, nprobe = np, rerank = rr))
    val exactSel = mmr1.map(_._1).toSet
    for (np <- Seq(2, 3)) {
      val ivfSel = Mmr.mmrIvf(spark, sfDir, nprobe = np).collect().map(_.getLong(1)).toSet
      p(s"mmr_ivf overlap with exact MMR (nprobe=$np)", ivfSel.intersect(exactSel).size)
    }

    spark.stop()
  }
}
