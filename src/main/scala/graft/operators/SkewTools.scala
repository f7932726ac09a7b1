package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
