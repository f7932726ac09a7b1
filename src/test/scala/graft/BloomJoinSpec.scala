package graft

import org.apache.spark.sql.functions._
import graft.functions.{bloom_might_contain, BloomBits}
import graft.operators.BloomJoin

/** Bloom semi-join contract: the kernel has no false negatives and an
  * honest false-positive rate, the probe stays a narrow codegen'd
  * predicate on the fact side, and the full operator reproduces the
  * plain semi-join exactly. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: every added key is found (no false negatives)") {
    val keys = (0L until 5000L).map(_ * 2654435761L + 17L)
    val words = new Array[Long]((BloomBits.sizeBits(keys.size, 16) >>> 6).toInt)
    keys.foreach(BloomBits.add(words, 5, _))
    assert(keys.forall(BloomBits.mightContain(words, 5, _)))
  }

  test("kernel: false-positive rate near the 1% design point") {
    val n = 10000
    val words = new Array[Long]((BloomBits.sizeBits(n, 16) >>> 6).toInt)
    (0L until n.toLong).foreach(k => BloomBits.add(words, 5, k * 7919L))
    // probe keys disjoint from the inserted set
    val fp = (1L to 20000L).count(k => BloomBits.mightContain(words, 5, -k))
    assert(fp < 20000 * 0.03, s"fp rate too high: $fp / 20000")
  }

  test("kernel: sizing is power-of-two with a floor") {
    assert(BloomBits.sizeBits(0, 16) == 1024)
    assert(BloomBits.sizeBits(1000, 16) == 16384)
    val bits = BloomBits.sizeBits(123456, 16)
    assert((bits & (bits - 1)) == 0 && bits >= 123456L * 16)
  }

  test("distributed build equals a driver-side build") {
    val keys = (0L until 2000L).map(_ * 31L + 5L)
    val df = keys.toDF("k")
    val bits = BloomBits.sizeBits(keys.size, 16)
    val dist = BloomBits.build(df, "k", bits, 5)
    val local = new Array[Long]((bits >>> 6).toInt)
    keys.foreach(BloomBits.add(local, 5, _))
    assert(dist.sameElements(local))
  }

  test("expression probe agrees with the kernel, codegen and interpreted") {
    val keys = (0L until 500L).map(_ * 13L)
    val words = new Array[Long]((BloomBits.sizeBits(keys.size, 16) >>> 6).toInt)
    keys.foreach(BloomBits.add(words, 5, _))
    val probes = ((0L until 500L).map(_ * 13L) ++ (1L to 500L).map(-_)).toDF("k")
    val got = probes.select(col("k"), bloom_might_contain(col("k"), words, 5).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.collect().map(_.getLong(0)).foreach { k =>
      assert(got(k) == BloomBits.mightContain(words, 5, k))
    }
    assert(keys.forall(got(_)))
  }

  test("bloomSemiJoin reproduces the plain semi-join exactly") {
    val urgent = Tables.orders(spark, sfSmall)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val fact = Tables.lineitem(spark, sfSmall)
    def keySet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBloom = keySet(
      BloomJoin.bloomSemiJoin(fact, "l_orderkey", urgent, "o_orderkey"))
    val plain = keySet(
      fact.join(urgent, fact("l_orderkey") === urgent("o_orderkey"), "left_semi"))
    assert(viaBloom == plain && plain.nonEmpty)
  }

  test("the bloom probe is a pre-shuffle filter on the fact scan") {
    val urgent = Tables.orders(spark, sfSmall)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = BloomJoin.bloomSemiJoin(
        Tables.lineitem(spark, sfSmall), "l_orderkey", urgent, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n$plan")
    // the probe must sit under a Filter feeding the join, not after it
    val probeIdx = plan.indexOf("bloom_might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe should appear below (after, in toString order) the join operator")
  }
}
