package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape inventory over every registered query: counts of the
  * physical-plan nodes that decide 100 TB behavior (shuffle exchanges,
  * join strategies, cartesian products, codegen spans), one JSON
  * record per query plus a summary line. This is the machine-checked
  * form of SURVEY §2.11's shuffle inventory — the per-family plan
  * assertions live in ScalaTest (PlanSpec etc.); this main sweeps the
  * WHOLE registered surface so a regression in any query's plan shape
  * (a new cartesian, a lost broadcast, an extra exchange) shows up in
  * the committed artifact's diff.
  *
  * Notes on reading the numbers:
  *  - `bnlj` > 0 is legitimate ONLY for (a) the broadcast single-row
  *    pattern — a 1-row totals frame or query vector riding alongside
  *    a scan (knn_exact_*, corpus_datacard, bm25 stats) — and (b) the
  *    deliberately-O(n²) exact twins that exist as oracles for their
  *    LSH scale paths (neardup_cosine, similarity_join_exact);
  *    anything else is a review flag. r7 audit: all 18 bnlj hits are
  *    class (a) or (b);
  *  - `cartesian` must be 0 everywhere;
  *  - every query is EXECUTED (collect) before its plan is read, so
  *    the counts describe the FINAL adaptive plan — codegen stages
  *    materialized, AQE broadcast downgrades applied — not the
  *    pre-execution initial plan;
  *  - the counters OVER-report on persisted/cached subtrees: a plan
  *    that references a persisted frame reprints that frame's full
  *    subtree at every reference (iterative loops over a persisted
  *    edge table multiply it by the iteration count — pagerank_docs
  *    prints 2,344 exchanges this way), but execution reuses the one
  *    InMemoryRelation, so those exchanges never re-run. Treat large
  *    counts on loop-shaped queries as textual artifacts; diff-stable
  *    round over round, which is what the artifact is for (r14 verdict
  *    note).
  */
object PlanAudit {

  private val markers: Seq[(String, String)] = Seq(
    "exchange" -> "Exchange hashpartitioning",
    // the global-ORDER-BY and single-partition shuffles count too — a
    // TakeOrderedAndProject regressing to a full range-partitioned
    // sort must move a number in this artifact
    "exchange_range" -> "Exchange rangepartitioning",
    "exchange_single" -> "Exchange SinglePartition",
    "broadcast_exchange" -> "BroadcastExchange",
    "smj" -> "SortMergeJoin",
    "shj" -> "ShuffledHashJoin",
    "bhj" -> "BroadcastHashJoin",
    "bnlj" -> "BroadcastNestedLoopJoin",
    "cartesian" -> "CartesianProduct",
    "take_ordered" -> "TakeOrderedAndProject")

  // executedPlan.toString renders whole-stage-codegen stages as "*(n)"
  // operator prefixes, never the class name — counting the literal
  // "WholeStageCodegen" would pin this column to zero and a kernel
  // falling out of codegen could never move the artifact. Count
  // DISTINCT stage ids: the number of codegen spans.
  private val codegenStage = """\*\((\d+)\)""".r
  private def codegenSpans(plan: String): Int =
    codegenStage.findAllMatchIn(plan).map(_.group(1)).toSet.size

  private def countOccurrences(hay: String, needle: String): Int = {
    var n = 0
    var i = hay.indexOf(needle)
    while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "PLAN_AUDIT.json"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val records = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val counts =
        try {
          val df = fn(spark, sfDir)
          // EXECUTE the query (collect on this exact DataFrame): under
          // AQE the pre-execution string is the initial plan — no
          // codegen stars, and exchanges not yet downgraded to the
          // broadcasts the runtime actually picks. The audit records
          // the FINAL plan, the one a cluster would run.
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
          markers.map { case (key, needle) =>
            key -> countOccurrences(plan, needle)
          } ++ Seq("codegen" -> codegenSpans(plan), "err" -> 0)
        } catch {
          case e: Throwable =>
            System.err.println(s"PLAN ERR $name: ${e.getMessage}")
            markers.map { case (k, _) => k -> 0 } ++
              Seq("codegen" -> 0, "err" -> 1)
        }
      name -> counts.toMap
    }
    val json = records.map { case (name, c) =>
      val fields = (markers.map(_._1) ++ Seq("codegen", "err"))
        .map(k => s""""$k":${c(k)}""").mkString(",")
      s"""  "$name": {$fields}"""
    }.mkString("{\n", ",\n", "\n}")
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    val cart = records.filter(_._2("cartesian") > 0).map(_._1)
    val bnlj = records.filter(_._2("bnlj") > 0).map(_._1)
    val errs = records.filter(_._2("err") > 0).map(_._1)
    println(s"""{"metric":"plan_audit","queries":${records.size},"cartesian":${cart.size},"bnlj":[${bnlj.map("\"" + _ + "\"").mkString(",")}],"errors":[${errs.map("\"" + _ + "\"").mkString(",")}],"out":"$outPath"}""")
    spark.stop()
  }
}
