package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failed queries are
  * reported in an "errors" map (never silently timed — a broken query
  * must not look like a fast one). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: load parquet footers for every table at the
    // bench scale and run one tiny end-to-end query per operator
    // family at the smallest scale, so per-query timings measure
    // steady-state execution, not first-touch JIT/codegen/footer cost.
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val ok = results.filterNot { case (n, _) => errors.contains(n) }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
