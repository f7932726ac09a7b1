package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{bloom_might_contain, BloomBits}

/** Bloom-filter semi-join — the middle ground between a broadcast hash
  * join and a full shuffle join that LLM-scale fact/dim joins need:
  * when the dim side's KEY SET is too large for a broadcast hash
  * relation but its Bloom filter is not (1.2 bytes/key at ≈ 1% fpp vs
  * 8+ bytes/key plus object overhead for a hash set), probe the filter
  * as a codegen'd NARROW predicate on the fact scan and shuffle only
  * the survivors into the exact join.
  *
  * Exactness contract: the Bloom probe has no false negatives (build
  * and probe share [[BloomBits]]'s double hashing), so
  * `bloomSemiJoin(fact, dim) ≡ fact ⋉ dim` row-for-row — the residual
  * left-semi join removes the ≈ fpp false positives. The filter only
  * changes WHERE rows are dropped: before the exchange instead of
  * after it.
  *
  * 100 TB posture: the build is one narrow pass over the dim keys
  * (tree-aggregated bit words, no shuffle); the probe eliminates
  * (1 − selectivity)(1 − fpp) of the fact table before its shuffle.
  * This is the manual, composable form of what Spark's runtime-filter
  * rule (spark.sql.optimizer.runtime.bloomFilter.enabled) injects for
  * eligible shapes — stated as an operator so pipelines can apply it
  * where the optimizer's heuristics do not reach (pre-aggregated
  * sides, reused filters across queries, persisted filter artifacts).
  */
object BloomJoin {

  /** `fact ⋉ dim` on `factKey = dimKey`, Bloom-accelerated and exact.
    * `bitsPerKey`/`k` default to the ≈ 1% fpp operating point. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    bitsPerKey: Int = 16, k: Int = 5): DataFrame = {
    val keys = dim.select(col(dimKey)).distinct()
    val nKeys = keys.count()
    val words = BloomBits.build(keys, dimKey, BloomBits.sizeBits(nKeys, bitsPerKey), k)
    fact
      .filter(bloom_might_contain(col(factKey).cast("long"), words, k))
      .join(keys.withColumnRenamed(dimKey, factKey), Seq(factKey), "left_semi")
  }

  /** Registered-query surface: lineitems of URGENT orders (the
    * orders-side key set Bloom-filtered into the lineitem scan),
    * aggregated per return flag. The oracle states the plain semi-join
    * — the Bloom path must reproduce it exactly. */
  def urgentLineitemRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val matched = bloomSemiJoin(
      Tables.lineitem(spark, sfDir), "l_orderkey", urgent, "o_orderkey")
    matched.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("l_returnflag").asc)
  }
}
