package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation utilities (SURVEY §4.2 / 100 TB posture): when one
  * join key carries a disproportionate share of rows, a plain shuffled
  * join lands the whole hot key in one task. Salting fans the hot
  * key's rows across `salt` sub-keys: the large side derives a
  * deterministic salt from its row content, the small side is
  * replicated once per salt value, and the join key becomes
  * (key, salt) — same result, bounded per-task skew, at the cost of
  * replicating the small side `salt`×.
  *
  * (AQE's skew-join handling covers sort-merge cases automatically;
  * this explicit form also works for broadcast-ineligible dimension
  * joins and is deterministic for testing.)
  */
object SkewTools {

  /** Salted inner equi-join of `large` with `small` on `key`.
    * Result rows equal `large.join(small, key)` exactly. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic content-derived salt: any stable spread works, it
    // only has to decorrelate rows within one hot key
    val l = large.withColumn("_salt",
      pmod(hash(large.columns.map(col): _*), lit(salt)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** The skew surface as a registered, oracled query: events carry a
    * derived segment key where ~90% of rows land on segment 0 (the
    * canonical one-hot-key distribution), joined to the 25-row nation
    * dim on that key and aggregated per nation. The dim is
    * `merge`-hinted to DENY the broadcast AQE would otherwise pick —
    * this models the broadcast-INELIGIBLE dimension join salting
    * exists for (at 100 TB the "dim" is often another fact slice): a
    * plain sort-merge join lands the entire hot key in ONE task, while
    * [[saltedJoin]] fans it across `salt` sub-keys, replicating each
    * dim row `salt`× — per-task skew bounded at 1/salt of the hot key.
    * Values are identical to the plain join (the DuckDB oracle states
    * the join unsalted); the plan shape (salt-replication explode
    * feeding a SortMergeJoin on (key, _salt)) is test-asserted. */
  def saltedEventsJoin(spark: SparkSession, sfDir: String,
                       salt: Int = 8): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(
        when(col("user_id") % 100 < 90, lit(0L))
          .otherwise(col("user_id") % 25).as("seg"),
        col("value"))
    val dim = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("seg"), col("n_name"))
      .hint("merge")
    saltedJoin(ev, dim, "seg", salt)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("n_name").asc)
  }
}
