package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar's similarity-preserving fingerprint,
  * standard in published near-dup literature): tokenize exactly like
  * [[Embedder]] (lowercase, [a-z0-9]+ runs), FNV-1a hash each token,
  * accumulate ±1 bit votes across tokens, emit the sign bit vector.
  * Near-identical documents land within a small Hamming distance, so
  * LSH banding over the 64 bits (4×16-bit bands ⇒ any pair within
  * Hamming 3 shares a band) turns near-dup detection into an equi-join.
  *
  * Engine role: the text-side counterpart of the embedding near-dup
  * path (dedup over token distributions rather than hashed tf vectors).
  * Pure narrow map, codegen'd, no UDF boundary.
  */
object SimHash {

  /** Kernel shared by interpreted eval and generated code. */
  def simhash64(text: UTF8String): Long = {
    val s = if (text == null) "" else text.toString
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val bytes = lower.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isTokenByte(bytes(i))) i += 1
      val start = i
      while (i < n && isTokenByte(bytes(i))) i += 1
      if (i > start) {
        var h = 0xcbf29ce484222325L
        var j = start
        while (j < i) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}

/** `simhash64(text)` as a native codegen'd expression. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
