package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failed queries are
  * reported in an "errors" map (never silently timed — a broken query
  * must not look like a fast one).
  *
  * Measurement protocol (round-5 redesign — the round-3 verdict flagged
  * both host-noise swamping and cache-distorted attribution):
  *
  *  - shared memoized artifacts (MinHash signature cache, IVF indexes,
  *    clustering assignments, doc_dedup output) are built FIRST as
  *    named, individually-timed "warm" entries — previously the
  *    alphabetically-first family member silently absorbed the shared
  *    build cost, making per-query numbers incomparable across rounds;
  *  - each registered query then runs GRAFT_BENCH_REPS times (default
  *    3) and reports the MEDIAN — a single external-load spike (this
  *    host has documented 50× swings, BASELINE.md) no longer decides
  *    the recorded number;
  *  - "value" (the official total) = Σ warm + Σ per-query medians, so
  *    every cost is still counted exactly once and totals stay
  *    comparable to prior rounds' single-pass sums.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: load parquet footers for every table at the
    // bench scale and run one tiny end-to-end query per operator
    // family at the smallest scale, so timings measure steady-state
    // execution, not first-touch JIT/codegen/footer cost.
    val warmSf = "/root/testdata/sf0.001"
    try {
      Tables.all.foreach { t =>
        try {
          (if (t == "events") Tables.events(spark, sfDir)
           else Tables.load(spark, sfDir, t)).count()
        } catch { case _: Throwable => () }
      }
      SparkEntry.entry(spark).count()
      graft.operators.VectorSearchOps.knnExactL2(spark, warmSf).count()
      graft.operators.RelationalOps.windowTopN(spark, warmSf).count()
    } catch { case _: Throwable => () }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case '\r' => "\\r"; case '\t' => "\\t"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Timed warm phase: one entry per JVM-lifetime memoized artifact
    // the registered queries share. Order matters only in that later
    // entries reuse earlier ones (cluster_ivf and doc_dedup both sit
    // on an IVF index; the persisted index wraps the in-memory one).
    import graft.operators._
    val warmups: Seq[(String, () => Unit)] = Seq(
      "minhash_sig_cache" -> (() => { Dedup.minhashSignatures(spark, sfDir).count(); () }),
      "ivf_index_nlist4" -> (() => { IvfIndex.forEmbeddings(spark, sfDir, 4).postings.count(); () }),
      "ivf_index_persisted" -> (() => { IvfIndex.persistedForEmbeddings(spark, sfDir, 4).postings.count(); () }),
      "cluster_exact_assign" -> (() => { Clustering.clusterExact(spark, sfDir, eps = 1.2).count(); () }),
      "cluster_ivf_assign" -> (() => { Clustering.clusterIvf(spark, sfDir).count(); () }),
      "doc_dedup_pipeline" -> (() => { Dedup.docDedupFor(spark, sfDir).count(); () }),
      "ivf_append_lifecycle" -> (() => { IvfIndex.appendHalfStats(spark, sfDir).count(); () }),
      "term_index_persisted" -> (() => { TextSearch.persistedTermIndexFor(spark, sfDir).postings.count(); () }),
      "pq_codebooks_m8k16" -> (() => { Pq.forEmbeddings(spark, sfDir); () }),
    )
    val warm = warmups.map { case (name, fn) => name -> timed(s"warm:$name")(fn()) }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).iterator
        .map(_ => timed(name)(fn(spark, sfDir).count()))
        .takeWhile(_ => !errors.contains(name)) // a failed rep stops the query
        .toSeq
      val median =
        if (times.isEmpty) 0.0 else times.sorted.apply(times.size / 2)
      name -> median
    }
    val ok = results.filterNot { case (n, _) => errors.contains(n) }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ws = warm.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum + warm.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warm":$ws,"reps":$reps,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
