package graft

import org.apache.spark.sql.functions._
import graft.functions.{F16, dequantize_f16, quantize_f16}
import graft.operators.{IndexAudits, Quantization, VectorSearchOps}

/** Contracts for the binary16 (fp16) scalar quantizer: bit-exact
  * conversion semantics (RNE, subnormals, specials), codegen ≡ driver,
  * and the coded search's agreement with the exact path. */
class F16Spec extends SparkSpec {

  test("fromHalf(toHalf) is identity on every representable half value") {
    var h = 0
    while (h < 0x10000) {
      val s = h.toShort
      val f = F16.fromHalf(s)
      if (!f.isNaN) {
        assert(F16.toHalf(f) == s,
          f"half bits 0x$h%04x -> $f -> 0x${F16.toHalf(f) & 0xffff}%04x")
      } else {
        assert((F16.toHalf(f) & 0x7c00) == 0x7c00 && (F16.toHalf(f) & 0x3ff) != 0)
      }
      h += 1
    }
  }

  test("toHalf rounds to nearest even and handles specials") {
    assert(F16.toHalf(0.0f) == 0x0000.toShort)
    assert(F16.toHalf(-0.0f) == 0x8000.toShort)
    assert(F16.toHalf(1.0f) == 0x3c00.toShort)
    assert(F16.toHalf(-2.0f) == 0xc000.toShort)
    assert(F16.toHalf(65504.0f) == 0x7bff.toShort) // half max
    assert(F16.toHalf(65520.0f) == 0x7c00.toShort) // rounds to +Inf
    assert(F16.toHalf(1e9f) == 0x7c00.toShort)     // overflow -> Inf
    assert(F16.toHalf(Float.PositiveInfinity) == 0x7c00.toShort)
    assert(F16.toHalf(Float.NegativeInfinity) == 0xfc00.toShort)
    assert((F16.toHalf(Float.NaN) & 0x7c00) == 0x7c00 &&
      (F16.toHalf(Float.NaN) & 0x3ff) != 0)
    // RNE ties: 1 + 2^-11 is exactly halfway between 1.0 and the next
    // half (1 + 2^-10); even mantissa (1.0) wins. 1 + 3*2^-11 is
    // halfway between 1+2^-10 (odd) and 1+2^-9 (even): rounds UP.
    assert(F16.toHalf(1.0f + math.pow(2, -11).toFloat) == 0x3c00.toShort)
    assert(F16.toHalf(1.0f + 3 * math.pow(2, -11).toFloat) == 0x3c02.toShort)
    // subnormal range: smallest positive half is 2^-24
    assert(F16.toHalf(math.pow(2, -24).toFloat) == 0x0001.toShort)
    assert(F16.fromHalf(0x0001.toShort) == math.pow(2, -24).toFloat)
    assert(F16.toHalf(math.pow(2, -26).toFloat) == 0x0000.toShort) // underflow
    assert(F16.fromHalf(0x3c00.toShort) == 1.0f)
    assert(F16.fromHalf(0x7bff.toShort) == 65504.0f)
  }

  test("quantize_f16/dequantize_f16 expressions match the driver kernels (codegen path)") {
    val rows = Tables.embeddings(spark, sfSmall)
      .select(col("vec_id"), col("embedding"),
        dequantize_f16(quantize_f16(col("embedding"))).as("rt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = r.getSeq[Float](1).toArray
      val rt = r.getSeq[Float](2).toArray
      val expect = orig.map(x => F16.fromHalf(F16.toHalf(x)))
      assert(rt.sameElements(expect), s"vec ${r.getLong(0)} roundtrip drift")
    }
  }

  test("knnF16 ranks by dequantized distance and agrees closely with the exact path") {
    val coded = Quantization.knnF16(spark, sfSmall, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(coded.length == 10)
    val exact = VectorSearchOps.knnExactL2(spark, sfSmall, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val overlap = coded.count { case (id, _) => exact.contains(id) }
    assert(overlap >= 8, s"fp16 recall only $overlap/10")
  }

  test("f16RoundtripBad excludes out-of-range and NaN components (finite-range precondition)") {
    import spark.implicits._
    // 1e6f saturates to +Inf, -1e9f to -Inf, NaN roundtrips to NaN —
    // all specified behavior, none may count as a roundtrip error;
    // the genuinely-representable components must still be checked.
    val df = Seq(
      (0L, Array(1.0f, 1e6f, Float.NaN, -1e9f, 65504.0f)),
      (1L, Array(0.25f, -3.5f)))
      .toDF("vec_id", "embedding")
    val bad = df.select(col("vec_id"),
        IndexAudits.f16RoundtripBad(col("embedding")).as("bad"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bad == Map(0L -> 0, 1L -> 0))
  }

  test("f16Audit flags are green at test scale") {
    val row = IndexAudits.f16Audit(spark, sfSmall).collect().head
    assert(row.getLong(0) == 10L)
    assert(row.getBoolean(1), "roundtrip bound violated")
    assert(row.getBoolean(2), "coded distance drifted >1% from exact")
    assert(row.getBoolean(3), "recall floor missed")
  }

  test("persisted IP index search equals the in-memory IP search") {
    import graft.operators.IpSearch
    val q = Tables.embeddings(spark, sfSmall)
      .filter(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).toArray
    val p = IpSearch.searchIp(
        IpSearch.persistedForEmbeddingsIp(spark, sfSmall, 4), q, 10, 4, Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val m = IpSearch.searchIp(
        IpSearch.forEmbeddingsIp(spark, sfSmall, 4), q, 10, 4, Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(p == m)
  }
}
