package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.l2sq

/** Dev diagnostic: phase-level timing of the clustering pipeline
  * (edge generation vs CC loop vs assignment) at a given sf. Not part
  * of the driver contract; run via
  * `sbt "runMain graft.DevProbe /root/testdata/sf0.1"`. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    if (args.length > 1 && args(1) == "sessdiff") {
      import graft.streaming.EventsStreaming
      val streamed = EventsStreaming.runToCompletion(
        EventsStreaming.userSessions(EventsStreaming.readEvents(spark, sfDir),
          watermarkDelay = "0 seconds"), "probe_sessions")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val events = Tables.events(spark, sfDir)
        .select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      val maxTs = events.map(_._2).max
      val gapMs = 30L * 60 * 1000
      val all = events.groupBy(_._1).iterator.flatMap { case (uid, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) =>
            if (t - cur.head >= gapMs) List(t) :: cur :: done else (t :: cur) :: done
        }
        sessions.map(s => (uid, s.min, s.max))
      }.toSeq
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val closed = all.filter { case (_, _, last) => last + gapMs < maxTs }
        .map(s => (s._1, fmt.format(new java.util.Date(s._2)))).toSet
      println(s"[probe] maxTs=$maxTs streamed=${streamed.size} closed=${closed.size}")
      println(s"[probe] extra = ${(streamed -- closed).toSeq.sorted}")
      (streamed -- closed).foreach { case (uid, start) =>
        all.filter(_._1 == uid).sortBy(_._2).foreach { s =>
          if (fmt.format(new java.util.Date(s._2)) == start)
            println(s"[probe] extra session detail: uid=$uid start=${s._2} last=${s._3} last+gap=${s._3 + gapMs} maxTs=$maxTs")
        }
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "sessions") {
      graft.operators.RelationalOps.userSessions(spark, sfDir)
        .filter(col("user_id") === 6).show(8, false)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "minhash") {
      // phase splits of the signature build (mirrors
      // Dedup.minhashSignaturesCorpus stage by stage)
      import graft.operators.TextAnalytics
      val corpus = graft.sources.Ingest.corpusFromDocuments(spark, sfDir)
      val tok = corpus.withColumn("toks", TextAnalytics.tokens(col("sentence")))
        .filter(size(col("toks")) > 0)
      t("tokenize")(tok.count())
      val shingleRows = tok
        .withColumn("shingles",
          when(size(col("toks")) >= 3,
            transform(sequence(lit(1), size(col("toks")) - 2),
              i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
            .otherwise(array(concat_ws(" ", col("toks")))))
        .select(col("id"), explode(col("shingles")).as("s"))
      val nSh = t("shingle explode")(shingleRows.count())
      println(s"[probe] shingle rows = $nSh")
      // candidate relational formulation: posexplode + window leads
      // (codegen'd) instead of the interpreted transform HOF
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("pos"))
      val tokRows = tok.select(col("id"),
        posexplode(col("toks")).as(Seq("pos", "tk")))
      val shWin = tokRows
        .withColumn("t1", lead(col("tk"), 1).over(wPos))
        .withColumn("t2", lead(col("tk"), 2).over(wPos))
        .filter(col("t2").isNotNull)
        .select(col("id"), concat_ws(" ", col("tk"), col("t1"), col("t2")).as("s"))
        .unionByName(tok.filter(size(col("toks")) < 3)
          .select(col("id"), concat_ws(" ", col("toks")).as("s")))
      val nSh2 = t("shingle window (alt)")(shWin.count())
      println(s"[probe] window shingle rows = $nSh2")
      val hashed = shingleRows
        .select(col("id"), col("s"),
          explode(typedlit((0 until 8).toArray)).as("h"))
        .withColumn("mh", md5(concat(col("h").cast("string"), lit(" "), col("s"))))
      t("x8 salts + md5")(hashed.count())
      t("groupBy(id,h).min")(hashed.groupBy("id", "h").agg(min("mh")).count())
      val sigs = t("cachedSigs full build")(
        graft.operators.Dedup.minhashSignatures(spark, sfDir))
      t("sig re-agg (cached)")(
        sigs.select(sum(length(concat_ws("|", col("sig"))))).head)
      val q = graft.operators.Dedup.dedupMinhash(spark, sfDir)
      t("dedup_minhash count")(q.count())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bm25") {
      import graft.operators.TextSearch
      import graft.sources.Ingest
      val corpus = Ingest.corpusFromDocuments(spark, sfDir)
      t("bm25 ad-hoc search")(
        TextSearch.bm25Corpus(corpus, TextSearch.DefaultQuery).collect())
      val idx = t("term index build+save+load")(
        TextSearch.persistedTermIndexFor(spark, sfDir))
      t("bm25 pruned index search")(
        TextSearch.bm25Index(spark, idx, TextSearch.DefaultQuery).collect())
      t("bm25 pruned search (2nd)")(
        TextSearch.bm25Index(spark, idx, TextSearch.DefaultQuery).collect())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "quant") {
      import graft.operators.Quantization
      t("quantize_stats")(Quantization.quantizeStats(spark, sfDir).count())
      t("knn_quantized")(Quantization.knnQuantized(spark, sfDir).collect())
      t("ivf_search_quantized")(
        Quantization.ivfSearchQuantized(spark, sfDir).collect())
      println(f"[probe] recall@10 = ${Quantization.quantizedRecall(spark, sfDir)}%.2f")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "pq") {
      import graft.operators.Pq
      val model = t("pq codebook train (m=8,k=16)")(
        Pq.train(Tables.embeddings(spark, sfDir), "embedding"))
      Pq.modelCache.put((sfDir, 8, 16), model)
      t("encode corpus")(Pq.encode(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", model).count())
      t("knn_pq ADC-only")(Pq.searchPq(spark, sfDir).collect())
      t("knn_pq refine=100")(Pq.searchPq(spark, sfDir, rerank = 100).collect())
      t("ivf_search_pq nprobe=2")(Pq.ivfSearchPq(spark, sfDir).collect())
      t("pq_persisted first touch")(Pq.persistedSearchPq(spark, sfDir).collect())
      t("pq_persisted warm")(Pq.persistedSearchPq(spark, sfDir).collect())
      println(f"[probe] ADC recall@10   = ${Pq.pqRecall(spark, sfDir)}%.2f")
      println(f"[probe] refine recall@10 = ${Pq.pqRecall(spark, sfDir, rerank = 100)}%.2f")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "pqres") {
      import graft.operators.Pq
      for (nprobe <- Seq(2, 4)) {
        val qs = 0L to 9L
        val raw = qs.map(q => Pq.ivfPqRecall(spark, sfDir, q, 10,
          nlist = 4, nprobe = nprobe, residual = false)).sum / qs.size
        val res = qs.map(q => Pq.ivfPqRecall(spark, sfDir, q, 10,
          nlist = 4, nprobe = nprobe, residual = true)).sum / qs.size
        println(f"[probe] nprobe=$nprobe raw=$raw%.3f residual=$res%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "docdedup") {
      import graft.sources.Ingest
      val corpus = Ingest.corpusFromDocuments(spark, sfDir)
      val emb0 = corpus
        .withColumn("embedding", graft.functions.embed_text(col("sentence"), 64))
        .filter(graft.functions.vec_norm(col("embedding")) > 0)
        .select(col("id"), col("embedding"))
      t("embed + count")(emb0.count())
      val index = t("IvfIndex.build")(graft.operators.IvfIndex.build(emb0, "id", "embedding", 4))
      index.postings.groupBy("list_id").count().show()
      val knn = graft.operators.IvfIndex.searchAll(index, emb0, "id", "embedding", 10, 2)
      val edges = knn.filter(col("dist") < 0.3)
        .select(col("src_id").as("src"), col("dst_id").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ne = t("searchAll + edges materialize")(edges.count())
      println(s"[probe] edges = $ne")
      t("CC on materialized edges")(graft.operators.Clustering.connectedComponents(
        corpus.select(col("id")), edges).count())
      spark.stop(); return
    }
    val eps = 1.2
    val emb = Tables.embeddings(spark, sfDir)
    t("warm: embeddings count")(emb.count())
    val a = emb.select(col("vec_id").as("src"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("dst"), col("embedding").as("b_emb"))
    val edges = a.join(b, col("src") < col("dst"))
      .filter(l2sq(col("a_emb"), col("b_emb")) < eps)
      .select(col("src"), col("dst"))
    val nEdges = t("edge generation + count")(edges.count())
    println(s"[probe] edges = $nEdges")
    val nodes = emb.select(col("vec_id").as("id"))
    val comp = t("connectedComponents")(
      { val c = graft.operators.Clustering.connectedComponents(nodes, edges); c.count(); c })
    t("assign (full)")(graft.operators.Clustering.assign(nodes, edges).count())
    t("clusterExact e2e")(graft.operators.Clustering.clusterExact(spark, sfDir, eps).count())
    spark.stop()
  }
}
