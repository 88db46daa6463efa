package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions over an `array<bigint>` of element hashes.
  *
  * The SQL-combinator formulation (`transform(sequence(0,127), i ->
  * array_min(transform(hs, x -> xxhash64(x, i))))`) makes P passes over
  * the input and allocates P intermediate arrays per row — measured ~20 s
  * for MinHash at sf0.1. These expressions compute the same sketches in
  * ONE tight loop per row, no intermediate allocation (~100× less work
  * per row); permutation family is `XXH64.hashLong(x, seed=i)`.
  */
object Sketches {
  /** 128-perm MinHash signature of an array of element hashes. */
  def minhash_sig(hashes: Column, numPerms: Int = 128): Column =
    Shim.column(MinHashSigExpr(Shim.expression(hashes), numPerms))

  /** Word-`width`-gram shingle hashes of a whitespace-normalized string,
    * in ONE native pass: split on ' ', XXH64 each token span in place,
    * chain-hash each `width`-token window; optional in-pass dedup.
    * `width = 1, distinct = false` yields one deterministic hash per token
    * — note each window (even width 1) is chain-rehashed
    * (`XXH64.hashLong(tokenHash, 2039)`), so the values are NOT the raw
    * `xxhash64(token)` hashes.
    *
    * Exists because the combinator chain (split → transform(xxhash64) →
    * transform(window)) re-evaluates its non-attribute children per
    * lambda iteration once CollapseProject/pushdown inlines them — a
    * measured 6× blowup on d02 — and hashing token spans in place also
    * skips materializing any token/shingle strings.
    */
  def shingle_hashes(text: Column, width: Int, distinct: Boolean): Column =
    Shim.column(TokenShingleHashExpr(Shim.expression(text), width, distinct))

  /** 64-bit SimHash assembled from ±1 per-bit votes of element hashes. */
  def simhash64(hashes: Column): Column =
    Shim.column(SimHash64Expr(Shim.expression(hashes)))

  /** Referenced from generated code. Empty input → empty signature (so
    * `size(sig) > 0` filters sub-width docs).
    */
  def minhashEval(hs: ArrayData, numPerms: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](numPerms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = hs.getLong(j)
      var i = 0
      while (i < numPerms) {
        val h = XXH64.hashLong(x, i)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Referenced from generated code. Tokens are byte spans between 0x20
    * bytes (UTF-8 multibyte sequences never contain 0x20, so byte-split
    * ≡ char-split); input is expected whitespace-normalized (single
    * spaces, trimmed). An empty string yields no tokens.
    */
  def tokenShingleEval(s: UTF8String, width: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // pass 1: token count
    var nTok = if (n == 0) 0 else 1
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val nSh = nTok - width + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    // pass 2: hash token spans, chain-hash sliding windows
    val window = new Array[Long](width)
    val out = new Array[Long](nSh)
    var tok = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        window(tok % width) = XXH64.hashUnsafeBytes(bytes,
          Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        if (tok >= width - 1) {
          var h = 2039L // arbitrary chain seed
          var w = tok - width + 1
          while (w <= tok) { h = XXH64.hashLong(window(w % width), h); w += 1 }
          out(tok - width + 1) = h
        }
        tok += 1
        start = i + 1
      }
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var m = 0
    var j = 0
    while (j < nSh) {
      if (j == 0 || out(j) != out(j - 1)) { out(m) = out(j); m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Ordered-accumulation dot product of two numeric arrays (float or
    * double elements) — bit-identical to the `aggregate(zip_with(...))`
    * sequential fold and to DuckDB's list functions on equal-length
    * non-null-element inputs, but one native pass instead of an
    * interpreted lambda per element. Unlike the zip_with formulation
    * (which null-pads), mismatched lengths or null elements THROW — a
    * malformed embedding should fail loudly, not truncate silently.
    */
  def dot(a: Column, b: Column): Column =
    Shim.column(DotProductExpr(Shim.expression(a), Shim.expression(b)))

  /** Random-hyperplane LSH bucket codes: `tables` entries of `planes`
    * sign bits each, weights ±1 from XXH64(dim + 10007·(t·planes+p))
    * (bit-identical to the combinator formulation it replaces, which made
    * tables×planes interpreted passes per row).
    */
  def hyperplane_lsh(emb: Column, tables: Int, planes: Int): Column =
    Shim.column(HyperplaneLshExpr(Shim.expression(emb), tables, planes))

  /** Referenced from generated code. */
  def dotEval(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch (${n} vs ${b.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) {
        throw new IllegalArgumentException(s"vec_dot: null element at index $i")
      }
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Referenced from generated code. Mirrors pmod(xxhash64(dim+k), 2)*2-1
    * weights and ordered accumulation of the combinator formulation.
    */
  def hyperplaneEval(emb: ArrayData, isFloat: Boolean, tables: Int, planes: Int): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bits = 0
      var p = 0
      while (p < planes) {
        val k = 10007 * (t * planes + p)
        var s = 0.0
        var i = 0
        while (i < n) {
          val h = XXH64.hashInt(i + k, 42L)
          val sign = (((h % 2) + 2) % 2) * 2 - 1
          val v = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
          s += v * sign
          i += 1
        }
        if (s > 0) bits |= (1 << p)
        p += 1
      }
      out(t) = bits
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Referenced from generated code. */
  def simhashEval(hs: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val x = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((x >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}

case class MinHashSigExpr(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Sketches.minhashEval(input.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.minhashEval($c, $numPerms)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class TokenShingleHashExpr(child: Expression, width: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Sketches.tokenShingleEval(input.asInstanceOf[UTF8String], width, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.tokenShingleEval($c, $width, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashExpr =
    copy(child = newChild)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.dotEval(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Sketches.dotEval($a, $lf, $b, $rf)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneLshExpr(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(input: Any): Any =
    Sketches.hyperplaneEval(input.asInstanceOf[ArrayData], isFloat, tables, planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.hyperplaneEval($c, $isFloat, $tables, $planes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhashEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
