package graft

import graft.operators.Profiling

/** One-pass table profiling audit. */
class ProfilingSpec extends SparkSpec {

  test("profileLineitem: counts and ranges match direct queries on sf0.001") {
    val li = Tables.lineitem(spark, sfSmall)
    val n = li.count()
    val p = Profiling.profileLineitem(spark, sfSmall).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(p.keySet == Set("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate", "l_returnflag"))
    // no nulls in the generated data; distincts bounded by row count
    assert(p.values.forall { case (nulls, nd, _, _) => nulls == 0L && nd <= n })
    val qty = li.select("l_quantity").collect().map(_.getDouble(0))
    assert(p("l_quantity")._3.get.asInstanceOf[Double] == qty.min)
    assert(p("l_quantity")._4.get.asInstanceOf[Double] == qty.max)
    assert(p("l_quantity")._2 == qty.distinct.length)
    // string column carries null numeric range by design
    assert(p("l_returnflag")._3.isEmpty && p("l_returnflag")._4.isEmpty)
    assert(p("l_returnflag")._2 == 3L, "R/A/N return flags")
  }

  test("profileLineitemApprox: HLL distincts within 5% of exact; no Expand in the plan") {
    val exact = Profiling.profileLineitem(spark, sfSmall).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approxDf = Profiling.profileLineitemApprox(spark, sfSmall)
    val approx = approxDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(approx.map(_._1).toSet == exact.keySet)
    approx.foreach { case (col, nulls, nd, _, _) =>
      assert(nulls == 0L)
      val e = exact(col)
      assert(math.abs(nd - e) <= math.max(1L, (0.05 * e).toLong),
        s"$col: approx $nd vs exact $e beyond 5%")
    }
    // the scale claim itself: sketches aggregate in ONE pass with no
    // Expand (the exact profile's countDistincts share one)
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"HLL profile must not Expand the table:\n$plan")
  }
}
