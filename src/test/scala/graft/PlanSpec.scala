package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, RelationalOps}

/** Plan-shape assertions — the scale guarantees the design claims
  * (SURVEY §4): predicate pushdown, column pruning, broadcast of small
  * dims, TakeOrdered for global top-k, and no cartesian products in
  * the bucketed candidate joins. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter_project pushes predicates and prunes columns at the scan") {
    val p = plan(RelationalOps.filterProject(spark, sfSmall))
    // PushedFilters renders truncated in toString; IsNotNull entries
    // prove the pushdown channel, the Filter node shows the full
    // comparison predicates sitting directly on the scan
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert("l_discount#\\d+ > 0.08".r.findFirstIn(p).nonEmpty, p)
    // scan must read only the 5 needed columns of 16-column lineitem
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("l_orderkey") && !scanLine.contains("l_comment") &&
      !scanLine.contains("l_extendedprice"), s"column pruning failed: $scanLine")
  }

  test("global_topk plans TakeOrderedAndProject, not a full sort") {
    val p = plan(RelationalOps.globalTopK(spark, sfSmall))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("revenue_by_nation broadcasts the small dimension tables") {
    val p = plan(RelationalOps.revenueByNation(spark, sfSmall))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("IVF batch searchAll is an equi-join on list_id — no cartesian/BNLJ on the big side") {
    val index = IvfIndex.forEmbeddings(spark, sfSmall, nlist = 4)
    val p = plan(IvfIndex.searchAll(index, Tables.embeddings(spark, sfSmall),
      "vec_id", "embedding", k = 5, nprobe = 2))
    // the only nested-loop join allowed is the tiny query×centroid one
    // (broadcast, <= nlist rows); the postings join must be hash-based
    val postingsJoin = p.linesIterator.filter(_.contains("list_id")).mkString("\n")
    assert(p.contains("BroadcastHashJoin [list_id") || p.contains("SortMergeJoin [list_id") ||
      postingsJoin.contains("HashJoin"),
      s"postings join must be an equi-join on list_id:\n$p")
  }

  test("LSH dedup family plans contain no cartesian product or BNLJ anywhere") {
    // the dedup design claim (SURVEY §2.11): candidates come from band
    // equi-joins, never all-pairs — for EVERY LSH family member,
    // including the new cosine-sketch path
    val plans = Seq(
      "dedup_minhash" -> plan(graft.operators.Dedup.dedupMinhash(spark, sfSmall)),
      "dedup_ngram" -> plan(graft.operators.Dedup.dedupNgram(spark, sfSmall)),
      "dedup_simhash" -> plan(graft.operators.Dedup.dedupSimhash(spark, sfSmall)),
      "neardup_cosine_lsh" -> plan(graft.operators.Dedup.neardupCosineLsh(spark, sfSmall)))
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ:\n$p")
    }
  }

  test("asof join matches a driver-side nested-loop oracle on sf0.001") {
    def ms(x: Any): Long = x match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val events = Tables.events(spark, sfSmall)
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), ms(r.get(2))))
    val orders = Tables.orders(spark, sfSmall)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), ms(r.get(2))))
    val expected = events.map { case (eid, uid, ts) =>
      val cand = orders.filter(o => o._2 == uid && o._3 <= ts)
      eid -> (if (cand.isEmpty) null
              else cand.maxBy(o => (o._3, o._1))._1.asInstanceOf[Any])
    }.toMap
    val got = RelationalOps.asofJoin(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getLong(2).asInstanceOf[Any]))
      .toMap
    assert(got == expected)
  }

  test("approx_count_distinct within 5% of exact on document tokens (HLL scale path)") {
    val toks = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .select(explode(graft.operators.TextAnalytics.tokens(col("sentence"))).as("t"))
    val exact = toks.select(countDistinct(col("t"))).head.getLong(0)
    val approx = toks.select(approx_count_distinct(col("t"), 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("distance kernel stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, sfSmall)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("q"))
    val df = emb.join(broadcast(q))
      .select(graft.functions.l2sq(col("embedding"), col("q")).as("d"))
    df.collect() // finalize the adaptive plan so codegen spans appear
    val p = plan(df)
    // '*(n)' prefixes mark WholeStageCodegen stages in the final plan;
    // the l2sq projection must carry one (no CodegenFallback fallback)
    val l2sqLine = p.linesIterator
      .find(l => l.contains("l2sq") && l.contains("Project")).getOrElse("")
    assert(l2sqLine.trim.matches("""^\+?-?\s*\*\(\d+\).*"""),
      s"l2sq Project not inside a codegen stage:\n$p")
  }

  test("int8 quantization kernels stay inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, sfSmall)
    val df = emb.select(
      graft.functions.dot_i8(
        graft.functions.quantize_i8(col("embedding")),
        graft.functions.quantize_i8(col("embedding"))).as("d"))
    df.collect()
    val p = plan(df)
    val line = p.linesIterator
      .find(l => l.contains("dot_i8") && l.contains("Project")).getOrElse("")
    assert(line.trim.matches("""^\+?-?\s*\*\(\d+\).*"""),
      s"dot_i8/quantize_i8 Project not inside a codegen stage:\n$p")
  }

  test("approx percentiles land within the value spread of the exact ones") {
    val exact = RelationalOps.valuePercentiles(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = RelationalOps.valuePercentilesApprox(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet == exact.keySet)
    // GK guarantees RANK error (≤ n/accuracy), not value error — a
    // heavy tail makes value-distance meaningless at p99. Assert the
    // returned element's rank is within a few positions of the target.
    val byType = Tables.events(spark, sfSmall)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (et, (a50, a90, a99)) =>
      val vs = byType(et); val n = vs.length
      def rankOf(x: Double): Int = vs.count(_ <= x)
      Seq(0.5 -> a50, 0.9 -> a90, 0.99 -> a99).foreach { case (p, a) =>
        val target = p * n
        assert((rankOf(a) - target).abs <= math.max(3.0, n / 100.0),
          s"$et p$p: approx $a has rank ${rankOf(a)} of $n, target $target")
      }
    }
  }

  test("interval join is a bucketed equi-join — never a nested loop") {
    val df = graft.operators.RelationalOps.intervalJoinCounts(spark, sfSmall)
    df.collect()
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"),
      s"inequality must ride on the bucket equi-join, not a nested loop:\n$p")
  }

  test("PQ encode+ADC kernels stay inside whole-stage codegen") {
    val model = graft.operators.Pq.forEmbeddings(spark, sfSmall)
    val emb = Tables.embeddings(spark, sfSmall)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val df = emb.select(graft.functions.pq_adc(
      graft.functions.pq_encode(col("embedding"), model.books),
      graft.operators.Pq.adcTable(model, q)).as("adc"))
    df.collect()
    val p = plan(df)
    val line = p.linesIterator
      .find(l => l.contains("pq_adc") && l.contains("Project")).getOrElse("")
    assert(line.trim.matches("""^\+?-?\s*\*\(\d+\).*"""),
      s"pq_adc/pq_encode Project not inside a codegen stage:\n$p")
  }

  test("shipping_priority broadcasts the filtered customer dim; big_orders takes ordered") {
    val p1 = plan(RelationalOps.shippingPriority(spark, sfSmall))
    assert(p1.contains("BroadcastHashJoin"), s"customer dim must broadcast:\n$p1")
    assert(p1.contains("TakeOrderedAndProject"), s"top-N must not full-sort:\n$p1")
    val p2 = plan(RelationalOps.bigOrders(spark, sfSmall))
    assert(p2.contains("TakeOrderedAndProject"), s"top-N must not full-sort:\n$p2")
  }

  test("late_sole_suppliers: unhinted orders/supplier still broadcast while they fit") {
    // r7 removed the unconditional broadcast() hints (the orders slice
    // grows with SF — a hard-coded broadcast is the 100 TB scale-killer
    // the r6 verdict flagged); the OPTIMIZER must still choose
    // broadcast at a scale where the sides fit, and the top-N must
    // stay a TakeOrderedAndProject
    val df = RelationalOps.lateSoleSuppliers(spark, sfSmall)
    df.collect() // finalize the adaptive plan
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"orders/supplier should broadcast at sf0.001 without hints:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-N must not full-sort:\n$p")
  }

  test("bm25 joins are broadcasts — no shuffle join, no big-side cartesian") {
    val df = graft.operators.TextSearch.bm25Search(spark, sfSmall)
    df.collect()
    val p = plan(df)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"df/stats must ride in as broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian product:\n$p")
  }

  test("corpus source is unordered: derived queries range-exchange once, at the output edge") {
    // r8 moved the global sort OUT of Ingest.corpusFromDocuments (it
    // cost a range exchange in every derivation Catalyst couldn't
    // strip it from — dedup_minhash's audit count was 26 range-
    // exchange prints before, 2 after). This pins the shape: the only
    // range partitioning in a per-row corpus query is its own
    // terminal orderBy.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    def rangeExchanges(p: SparkPlan): Int = {
      val self = p match {
        case s: ShuffleExchangeLike
          if s.outputPartitioning.isInstanceOf[RangePartitioning] => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      self + kids.map(rangeExchanges).sum
    }
    for (q <- Seq("text_stats", "lang_id", "pii_redact", "token_counts")) {
      val df = SparkEntry.queries(q)(spark, sfSmall)
      df.collect()
      val n = rangeExchanges(df.queryExecution.executedPlan)
      assert(n <= 1, s"$q: $n range exchanges — a non-terminal sort crept back in")
    }
  }

  test("hybrid RRF fuses exactly the union of the two hit lists with the rank formula") {
    import graft.operators.{HybridSearch, TextSearch, VectorSearchOps}
    val lexIds = TextSearch.bm25Search(spark, sfSmall)
      .collect().map(_.getLong(0))
    val semIds = VectorSearchOps.knnExactCosine(spark, sfSmall)
      .collect().map(_.getLong(0))
    val fused = HybridSearch.hybridSearchRrf(spark, sfSmall).collect()
    assert(fused.map(_.getLong(0)).toSet == (lexIds ++ semIds).toSet)
    // recompute rrf from the emitted ranks
    fused.foreach { r =>
      val expect =
        (if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getLong(1))) +
          (if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getLong(2)))
      assert(r.getDouble(3) == expect, s"id ${r.getLong(0)}")
    }
    // descending by fused score
    val scores = fused.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-_)))
    // ranks are 1..k within each source list
    val lexRanks = fused.filter(!_.isNullAt(1)).map(_.getLong(1)).sorted.toSeq
    assert(lexRanks == (1L to lexIds.length.toLong).toSeq)
  }

  test("retention cohorts: offset-0 diagonal equals cohort size, later offsets never exceed it") {
    val rows = graft.operators.RelationalOps.retentionCohorts(spark, sfSmall)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cw, rs) =>
      val offsets = rs.map(_._2).toSet
      assert(offsets.contains(0L), s"cohort $cw missing its offset-0 diagonal")
      val base = rs.find(_._2 == 0L).get._3
      rs.foreach { case (_, off, n) =>
        assert(n <= base, s"cohort $cw offset $off: $n users > cohort size $base")
        assert(off >= 0L)
      }
    }
    // every user lands in exactly one cohort: diagonal sums to the user count
    val users = graft.Tables.events(spark, sfSmall)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }

  test("perplexity terciles carry no unpartitioned window (r8 verdict item 1)") {
    // the r8 global-NTILE scale-killer: an unpartitioned Window
    // funnels every scored document through ONE task. The ExactRank
    // cut-point rewrite must keep every Window in these plans above a
    // hash partitioning — no Window may sit on a SinglePartition
    // exchange (the corpus-wide span-dedup and exact-dup windows are
    // per-sentence/per-id partitioned and stay).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    def singleTaskWindows(p: SparkPlan): Int = {
      def kids(x: SparkPlan) = x match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      def hasSingleExchange(x: SparkPlan): Boolean = x match {
        case s: ShuffleExchangeLike => s.outputPartitioning == SinglePartition
        case other => kids(other).exists(hasSingleExchange)
      }
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty || hasSingleExchange(w) => 1
        case _ => 0
      }
      self + kids(p).map(singleTaskWindows).sum
    }
    for (q <- Seq("lm_ppl_buckets", "lm_ppl_buckets_t", "curation_scorecard",
      "scorecard_wave", "scorecard_incoming")) {
      val df = SparkEntry.queries(q)(spark, sfSmall)
      df.collect()
      val n = singleTaskWindows(df.queryExecution.executedPlan)
      assert(n == 0, s"$q: $n single-task window(s) — the global NTILE crept back")
    }
  }

  test("pack_chunks keeps the blocked prefix sum; quality_hist's window sits above the bin aggregate") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    // descend through AQE wrappers AND materialized query stages —
    // a post-collect adaptive plan hides most operators inside
    // QueryStageExec nodes whose subtree is `plan`, not `children`
    def kids(x: SparkPlan): Seq[SparkPlan] = x match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def collectNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: kids(p).flatMap(collectNodes)
    // the packing offsets ride pack_sequences' blocked prefix sum —
    // every window in the chunk view must stay block-partitioned
    // (never the single-task global cumulative the oracle restates)
    val pack = SparkEntry.queries("pack_chunks")(spark, sfSmall)
    pack.collect()
    val badPack = collectNodes(pack.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(badPack.isEmpty,
      "pack_chunks: an unpartitioned window crept into the offset chain")
    // quality_hist's cumulative IS a global window, but legal only
    // because it runs over the <= NBins-row aggregate: every WindowExec
    // must have an aggregate strictly below it
    val hist = SparkEntry.queries("quality_hist")(spark, sfSmall)
    hist.collect()
    val histPlan = hist.queryExecution.executedPlan
    val histWindows = collectNodes(histPlan).collect { case w: WindowExec => w }
    assert(histWindows.nonEmpty, "quality_hist is expected to carry its bounded window")
    histWindows.foreach { w =>
      val below = kids(w).flatMap(collectNodes)
      assert(below.exists(_.isInstanceOf[BaseAggregateExec]),
        "quality_hist: a window runs over pre-aggregate (corpus-sized) rows")
    }
  }
}
