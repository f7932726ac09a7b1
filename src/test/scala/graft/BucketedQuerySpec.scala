package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** The registered bucketed co-located join (`bucketed_customer_orders`):
  * values match the plain join, and the executed plan contains NO hash
  * Exchange — the bucket layout carries both the join and the
  * follow-on aggregation. (ScaleToolsSpec pins the raw bucketed-join
  * mechanics; this pins the driver-visible query.) */
class BucketedQuerySpec extends SparkSpec {

  test("bucketed_customer_orders: no hash Exchange anywhere in the executed plan") {
    val df = RelationalOps.bucketedCustomerOrders(spark, sfSmall)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed query must not shuffle on the join/group key:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan not bucket-aware:\n$plan")
  }

  test("bucketed_customer_orders equals the plain join+agg") {
    val got = RelationalOps.bucketedCustomerOrders(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))).toSeq
    val want = Tables.customer(spark, sfSmall)
      .join(Tables.orders(spark, sfSmall),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
      .orderBy(col("c_custkey").asc)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
