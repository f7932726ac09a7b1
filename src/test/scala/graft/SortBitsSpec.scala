package graft

import org.apache.spark.sql.functions._
import graft.functions.{double_sort_bits, DoubleSortBits}

/** Order-preservation contract of the sortable-bits key (the
  * hash-aggregable-argmin building block behind the distributed
  * coarse assignment). */
class SortBitsSpec extends SparkSpec {

  private def bits(x: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(x)
    b ^ ((b >> 63) & java.lang.Long.MAX_VALUE)
  }

  test("sortBits preserves total order over finite doubles, signed zeros, infinities") {
    val xs = Seq(Double.NegativeInfinity, -1e308, -2.5, -1.0, -1e-300,
      -0.0, 0.0, Double.MinPositiveValue, 1e-300, 0.5, 1.0, 1.0000000000000002,
      2.5, 1e308, Double.PositiveInfinity)
    val keyed = xs.map(bits)
    assert(keyed == keyed.sorted, "key order drifted from value order")
    // strictness: distinct values get distinct keys (-0.0 < +0.0 by bits)
    assert(keyed.distinct.size == keyed.size)
    assert(bits(Double.NaN) > bits(Double.PositiveInfinity), "NaN must sort last")
  }

  test("expression matches the driver kernel on both eval paths") {
    import spark.implicits._
    // no -0.0 here: Spark normalizes -0.0 to 0.0 on UnsafeRow write
    // (SPARK-26021), so a negative zero never reaches the expression
    // from a materialized column; the kernel test above covers it
    val xs = Seq(-3.75, 0.0, 1.5, 1e12, Double.PositiveInfinity)
    val got = xs.toDF("x")
      .select(col("x"), double_sort_bits(col("x")).as("k"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) == bits(x), s"codegen drift at $x"))
    // interpreted path
    val e = DoubleSortBits(org.apache.spark.sql.catalyst.expressions.Literal(2.25))
    assert(e.eval(null) == bits(2.25))
  }

  test("the packed decimal key orders (dist, list_id) lexicographically") {
    // the assignListsJoin encoding: sortBits(dist)·2^32 + list_id
    def pack(d: Double, lid: Int): BigInt = BigInt(bits(d)) * BigInt(4294967296L) + lid
    assert(pack(1.0, 5) < pack(2.0, 0), "smaller dist must win regardless of list id")
    assert(pack(1.0, 2) < pack(1.0, 3), "ties break on the smaller list id")
    assert(pack(0.0, 4294967295L.toInt & 0x7fffffff) < pack(1e-300, 0))
  }
}
