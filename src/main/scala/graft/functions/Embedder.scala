package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing text embedder — the engine's stand-in for the
  * reference's neural sentence encoder (`SentenceTransformer(...).encode`,
  * /root/reference/app.py:18-20,35-43). The *capability* preserved is
  * `embed(text): Array[Float]` with a fixed dimension, batched and
  * deterministic; the values differ from MiniLM by construction (the
  * model is unavailable in a zero-egress JVM — SURVEY.md §7.3.5).
  *
  * Algorithm (feature hashing / "hashing trick", standard in published
  * text-classification literature): lowercase, tokenize on
  * non-alphanumeric runs, FNV-1a hash each token, bucket = hash mod dim
  * with a sign bit from the hash (reduces collision bias), accumulate
  * term frequency, L2-normalize. Deterministic, locale-independent,
  * embarrassingly parallel — at 100 TB this is a pure narrow map.
  */
object Embedder {
  val DefaultDim = 64

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a over the token's bytes within [from, until). */
  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Core kernel, shared by interpreted eval and generated code.
    * Primitive-array result — no per-element boxing. */
  def embed(text: UTF8String, dim: Int): ArrayData = {
    val out = embedToFloats(if (text == null) "" else text.toString, dim)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def embedToFloats(text: String, dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val bytes = lower.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // token = maximal run of [a-z0-9] bytes (multi-byte UTF-8 chars
      // act as separators — adequate for the latin-ish test corpora,
      // and deterministic for everything else)
      while (i < n && !isTokenByte(bytes(i))) i += 1
      val start = i
      while (i < n && isTokenByte(bytes(i))) i += 1
      if (i > start) {
        val h = fnv1a(bytes, start, i)
        val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
        val sign = if (((h >>> 62) & 1L) == 0L) 1.0 else -1.0
        acc(bucket) += sign
      }
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    out
  }

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}

/** `embed_text(text, dim)` as a native expression: interpreted eval and
  * generated code both call the static kernel, so the embed stage stays
  * inside whole-stage codegen (no UDF ser/de boundary). */
case class EmbedText(child: Expression, dim: Int) extends UnaryExpression {
  override def prettyName: String = "embed_text"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"embed_text requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Embedder.embed(input.asInstanceOf[UTF8String], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Embedder.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
