package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (the FAISS IVF-PQ code path the
  * reference would reach for past IVF-Flat, app.py:47-56 — PQ is the
  * standard next compression step after SQ8: Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * A D-dim float vector is split into `m` contiguous subvectors of
  * D/m dims; each subvector is replaced by the index of its nearest
  * centroid in a per-subspace codebook of `k` entries. 64 floats
  * (256 B) become 8 byte codes — 32× smaller postings, which at 100 TB
  * is the difference between lists that fit in memory and lists that
  * do not.
  *
  * Both kernels follow the [[NearestList]] pattern: the codebook/LUT
  * is driver-tiny (m·k rows), rides into generated code as a
  * reference object, and the expression is a NARROW map — encode and
  * score never join, broadcast, or shuffle.
  */

/** Encode a float vector into `books.length` byte codes: code m is the
  * argmin (squared-L2, first-minimum tie-break — same as MLlib
  * `findClosest` and [[NearestList]]) over `books(m)` of the m-th
  * contiguous subvector. `books(m)(j)` is centroid j of subspace m;
  * all subspaces share one sublength and k ≤ 256 — codes occupy one
  * byte each and every ADC kernel decodes them UNSIGNED (& 0xff), so
  * the full byte range is addressable (FAISS nbits=8). */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]],
                    asBinary: Boolean = false)
    extends UnaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    if (asBinary) BinaryType else ArrayType(ByteType, containsNull = false)

  private def m: Int = books.length
  private def dsub: Int = books(0)(0).length
  private def dim: Int = m * dsub

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if books.nonEmpty && books.forall(b => b.nonEmpty && b.length <= 256) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "pq_encode: codebooks must be non-empty with at most 256 centroids per subspace")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"pq_encode: vector dimension mismatch (${a.numElements()} vs $dim)")
    }
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var acc = 0.0; var i = 0
        while (i < dsub) {
          val d = a.getFloat(off + i).toDouble - c(i); acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    if (asBinary) codes else new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("books", books, "float[][][]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
      val book = ctx.freshName("book")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector dimension mismatch (" + $a.numElements() + " vs $dim)");
         |}
         |byte[] $codes = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  float[][] $book = $mat[$s];
         |  int $off = $s * $dsub;
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $book.length; $j++) {
         |    float[] $c = $book[$j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $d = (double)$a.getFloat($off + $i) - (double)$c[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $j; }
         |  }
         |  $codes[$s] = (byte)$best;
         |}
         |${ev.value} = ${if (asBinary) codes
            else s"new org.apache.spark.sql.catalyst.util.GenericArrayData($codes)"};
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-LIST asymmetric distance — the residual-PQ scoring kernel
  * (FAISS `IndexIVFPQ`): codes encode r = x − centroid(list), so each
  * probed list needs its own lookup table built from the QUERY's
  * residual against that list's centroid:
  * `luts(list)(s)(j) = ||(q − c_list)_s − book(s)(j)||²`, and
  * ||q − (c_list + decode(codes))||² = Σ_s luts(list)(s)(codes(s)).
  *
  * `luts` is indexed by list_id (nlist × m × k doubles, driver-tiny
  * at any real nlist×k since only PROBED lists are populated — the
  * rest are empty arrays, and evaluating one loudly errors rather
  * than silently scoring 0). One scan with this expression scores a
  * multi-list candidate frame in place — no per-list union, no
  * re-reading floats. */
case class PqAdcByList(left: Expression, right: Expression,
                       luts: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def prettyName: String = "pq_adc_by_list"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(ByteType, _) | BinaryType)
          if luts.exists(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case (IntegerType, ArrayType(ByteType, _) | BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_adc_by_list: no populated lookup tables")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc_by_list requires (int, array<tinyint>|binary), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(listId: Any, input: Any): Any = {
    val lid = listId.asInstanceOf[Int]
    if (lid < 0 || lid >= luts.length || luts(lid).isEmpty) {
      throw new IllegalArgumentException(
        s"pq_adc_by_list: list $lid has no lookup table (not probed?)")
    }
    val lut = luts(lid)
    val (n, at: (Int => Byte)) = input match {
      case b: Array[Byte] => (b.length, (i: Int) => b(i))
      case a: ArrayData   => (a.numElements(), (i: Int) => a.getByte(i))
    }
    if (n != lut.length) {
      throw new IllegalArgumentException(
        s"pq_adc_by_list: code length mismatch ($n vs ${lut.length})")
    }
    var acc = 0.0
    var s = 0
    while (s < n) { acc += lut(s)(at(s) & 0xff); s += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lid, a) => {
      val isBin = right.dataType == BinaryType
      val len = if (isBin) s"$a.length" else s"$a.numElements()"
      def at(i: String) = if (isBin) s"$a[$i]" else s"$a.getByte($i)"
      val tabs = ctx.addReferenceObj("luts", luts, "double[][][]")
      val lut = ctx.freshName("lut")
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      s"""
         |if ($lid < 0 || $lid >= ${luts.length} || $tabs[$lid].length == 0) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_by_list: list " + $lid + " has no lookup table (not probed?)");
         |}
         |double[][] $lut = $tabs[$lid];
         |if ($len != $lut.length) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_by_list: code length mismatch (" + $len + " vs " + $lut.length + ")");
         |}
         |double $acc = 0.0;
         |for (int $s = 0; $s < $lut.length; $s++) {
         |  $acc += $lut[$s][${at(s)} & 0xff];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric distance computation (ADC): given a per-query lookup
  * table `lut(m)(j)` = squared-L2 distance from the query's m-th
  * subvector to centroid j of subspace m (computed driver-side — m·k
  * doubles), the approximate distance of a candidate with codes
  * `c(0..m)` is Σ_m lut(m)(c(m)). Summation order is fixed (subspace
  * 0..m-1) in both the interpreted and generated paths, so scores are
  * bit-reproducible. Codes may be `array<tinyint>` ([[PqEncode]]'s
  * output) or `binary` (the compact form PQ codes persist as — one
  * byte per subspace with no array header, the same dual-type contract
  * as [[DotI8]]). */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  private def m: Int = lut.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) | BinaryType if lut.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(ByteType, _) | BinaryType =>
      TypeCheckResult.TypeCheckFailure("pq_adc: empty lookup table")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires array<tinyint> or binary codes, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val (n, at: (Int => Byte)) = input match {
      case b: Array[Byte] => (b.length, (i: Int) => b(i))
      case a: ArrayData   => (a.numElements(), (i: Int) => a.getByte(i))
    }
    if (n != m) {
      throw new IllegalArgumentException(
        s"pq_adc: code length mismatch ($n vs $m)")
    }
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut(s)(at(s) & 0xff); s += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val isBin = child.dataType == BinaryType
      val len = if (isBin) s"$a.length" else s"$a.numElements()"
      def at(i: String) = if (isBin) s"$a[$i]" else s"$a.getByte($i)"
      val tab = ctx.addReferenceObj("lut", lut, "double[][]")
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      s"""
         |if ($len != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: code length mismatch (" + $len + " vs $m)");
         |}
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $tab[$s][${at(s)} & 0xff];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
