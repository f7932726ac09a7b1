package graft

import org.apache.spark.sql.DataFrame

/** Dev-only forwarding shim: exposes package-private operator kernels
  * to ad-hoc spark-shell probes (the DevProbe pattern without a JVM
  * restart per experiment). Never referenced by any query path. */
object ProbeShim {
  def initFor(base: DataFrame, n: Long, mode: String, seed: Long): DataFrame =
    operators.GraphAnn.initFor(base, n, mode, seed)
  def descend(base: DataFrame, init: DataFrame, kb: Int, iters: Int,
              rho: Double, seed: Long): DataFrame =
    operators.GraphAnn.descend(base, init, kb, iters, rho, seed)
  def descendLegacy(base: DataFrame, init: DataFrame, kb: Int, iters: Int,
                    rho: Double, seed: Long): DataFrame =
    operators.GraphAnn.descendLegacy(base, init, kb, iters, rho, seed)
  def exactGraphTwin(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String): DataFrame =
    operators.GraphAnn.exactGraphTwin(spark, sfDir)
}
