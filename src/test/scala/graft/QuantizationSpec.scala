package graft

import graft.operators.Quantization
import graft.functions.{dot_i8, quant_scale, quantize_i8}
import org.apache.spark.sql.functions._

/** Int8 quantization kernels and the quantized-search quality bar. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("quantize roundtrip error is bounded by scale/2 per component") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)))
    val rows = vecs.toDF("id", "v")
      .select(col("id"), col("v"), quantize_i8(col("v")).as("q"),
        quant_scale(col("v")).as("scale"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1); val q = r.getSeq[Byte](2); val s = r.getDouble(3)
      assert(q.length == v.length)
      assert(q.forall(b => b >= -127 && b <= 127), "symmetric range")
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(x.toDouble - b * s) <= s / 2 + 1e-12,
          s"component $x reconstructs to ${b * s} with scale $s")
      }
    }
  }

  test("rounding is half AWAY FROM ZERO (not Math.round's half-up)") {
    // scale = 127/127 = 1.0 exactly, so -0.5 hits the half-step exactly:
    // away-from-zero gives -1; Java Math.round would give 0
    val q = Seq((0L, Array(127.0f, -0.5f, 0.5f, -1.5f))).toDF("id", "v")
      .select(quantize_i8(col("v"))).collect().head.getSeq[Byte](0)
    assert(q.toSeq == Seq[Byte](127, -1, 1, -2))
  }

  test("all-zero vector quantizes to zeros with scale 0") {
    val r = Seq((0L, Array(0f, 0f, 0f))).toDF("id", "v")
      .select(quantize_i8(col("v")).as("q"), quant_scale(col("v")).as("s"))
      .collect().head
    assert(r.getSeq[Byte](0).toSeq == Seq[Byte](0, 0, 0))
    assert(r.getDouble(1) == 0.0)
  }

  test("dot_i8 matches a driver-side integer loop") {
    val a = Array[Byte](1, -2, 3, 127)
    val b = Array[Byte](-1, 2, 3, 127)
    val expected = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    val got = Seq((a, b)).toDF("a", "b")
      .select(dot_i8(col("a"), col("b"))).collect().head.getLong(0)
    assert(got == expected)
    // mixed binary × array<tinyint> also works (wire query vs stored postings)
    val mixed = Seq((a, Array(1.0f, -2.0f, 3.0f, 127.0f))).toDF("a", "v")
      .select(dot_i8(col("a"), quantize_i8(col("v"))))
      .collect().head.getLong(0)
    // scale = 1.0 exactly -> quantized = (1, -2, 3, 127) = a, so this is a·a
    assert(mixed == a.map(x => x.toLong * x.toLong).sum)
    // dimension mismatch fails loudly, like the float kernels
    intercept[Exception] {
      Seq((Array[Byte](1, 2), Array[Byte](1))).toDF("a", "b")
        .select(dot_i8(col("a"), col("b"))).collect()
    }
  }

  test("quantized cosine kNN recalls the exact top-10 on sf0.001") {
    val recall = Quantization.quantizedRecall(spark, sfSmall, queryId = 0L, k = 10)
    assert(recall >= 0.7, s"recall@10 = $recall — int8 error should cost little")
  }

  test("IVF-quantized search with nprobe = nlist equals the flat quantized scan") {
    val full = Quantization.ivfSearchQuantized(spark, sfSmall,
      queryId = 0L, k = 10, nlist = 4, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val flat = Quantization.knnQuantized(spark, sfSmall, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == flat,
      "probing every list must reproduce the flat quantized ranking exactly")
    // pruned probing returns k rows from the probed subset only
    val pruned = Quantization.ivfSearchQuantized(spark, sfSmall,
      queryId = 0L, k = 10, nlist = 4, nprobe = 2).collect()
    assert(pruned.length == 10)
  }

  test("binary signatures match a driver-side sign-bit reference; Hamming ranking is exact") {
    // driver reference over the raw embeddings
    val emb = graft.Tables.embeddings(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sigOf(v: Array[Float]): Long = {
      var s = 0L
      var b = 0
      while (b < v.length) { if (v(b) > 0f) s |= (1L << b); b += 1 }
      s
    }
    val q = sigOf(emb(0L))
    val expect = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, java.lang.Long.bitCount(sigOf(v) ^ q)) }
      .sortBy { case (id, h) => (h, id) }
      .take(10)
    val got = Quantization.knnBinary(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("binary rerank equals exact L2 restricted to the Hamming shortlist; recall never drops") {
    val short = Quantization.knnBinary(spark, sfSmall, 0L, 50).collect()
      .map(_.getLong(0)).toSet
    val exactAll = graft.operators.VectorSearchOps
      .knnExactL2(spark, sfSmall, 0L, 500).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expect = exactAll.filter(p => short.contains(p._1)).take(10).toSeq
    val got = Quantization.knnBinaryRerank(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    // the refine exists because raw Hamming is weak here: re-ranked
    // recall must be at least the raw binary recall
    val raw = Quantization.binaryRecall(spark, sfSmall)
    val refined = Quantization.binaryRecall(spark, sfSmall, rerank = 50)
    assert(refined >= raw, s"refine degraded recall: $raw -> $refined")
    assert(refined >= 0.3, s"shortlist-50 re-rank recall floor: $refined")
  }

  test("IVF-binary with nprobe = nlist equals the flat Hamming scan; audit flags hold") {
    val flat = Quantization.knnBinary(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val full = Quantization.ivfSearchBinary(spark, sfSmall, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(full == flat, "full-probe IVF-binary must equal the flat scan exactly")
    val audit = graft.operators.IndexAudits.ivfBinaryAudit(spark, sfSmall).collect().head
    assert(audit.getLong(0) == 10L)
    assert(audit.getBoolean(1) && audit.getBoolean(2) && audit.getBoolean(3),
      s"audit flags: $audit")
  }

  test("quant functions register for SQL") {
    graft.functions.registerVectorFunctions(spark)
    val r = spark.sql(
      "SELECT dot_i8(quantize_i8(array(127.0F, -0.5F)), quantize_i8(array(127.0F, -0.5F))) AS d")
      .collect().head.getLong(0)
    // scale = 1.0 exactly -> (127, -1) . (127, -1) = 16129 + 1
    assert(r == 16130L)
  }
}
