package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All n-token span fingerprints of a token array in one pass: element i of
  * the result is [[RollingHash]] of the space-joined decimal (or string)
  * rendering of tokens [i, i+n) — bit-identical to hashing each span's
  * joined string separately, but computed in O(total chars) per row via
  * prefix hashes instead of O(spans × span chars).
  *
  * The identity: with P(k) the rolling hash of the joined string's first k
  * codepoints, hash(span [l, r)) = (P(r) − P(l)·31^(r−l)) mod 2^61−1 —
  * polynomial hashes are linear, so every span drops out of one prefix
  * scan. The higher-order formulation this replaces
  * (`transform(sequence(...), i -> rolling_hash(array_join(slice(...))))`)
  * is CodegenFallback: Catalyst evaluates the loop-invariant string-cast
  * array once per OUTER index, making it O(spans × doc len) interpreted —
  * measured 6× slower at sf0.1 and growing with document length.
  *
  * A native `UnaryExpression` with whole-stage codegen; n is fixed at plan
  * time. Accepts `array<int>`, `array<long>`, or `array<string>` (elements
  * rendered exactly as Spark's string cast renders them, so swapping this
  * in changes no query results). Arrays shorter than n yield an empty
  * result; null arrays yield null; elements must be non-null.
  */
case class SpanHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "span length n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType | StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects array<int|bigint|string>, got $t")
  }

  private lazy val kind: Int = child.dataType match {
    case ArrayType(IntegerType, _) => SpanHashes.KindInt
    case ArrayType(LongType, _) => SpanHashes.KindLong
    case _ => SpanHashes.KindString
  }

  override protected def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[ArrayData], kind, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanHashes$$.MODULE$$.compute($c, $kind, $n)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  final val KindInt = 0
  final val KindLong = 1
  final val KindString = 2

  private final val Mod: Long = (1L << 61) - 1

  /** (a*b) mod 2^61-1 for a, b in [0, 2^61): 128-bit product via
    * multiplyHigh, then two Mersenne folds (2^61 ≡ 1 mod M).
    */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^58 for a, b < 2^61
    val lo = a * b // low 64 bits, as unsigned
    val q = (hi << 3) | (lo >>> 61) // product >> 61, < 2^61
    var y = q + (lo & Mod)
    y = (y >>> 61) + (y & Mod)
    if (y >= Mod) y - Mod else y
  }

  private def addmod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= Mod) s - Mod else s
  }

  /** 31^k mod M, shared across rows and threads: the powers are
    * row-independent, so recomputing an O(chars) array per row (measured:
    * 2.4× on 2k-token docs) is pure waste. Grow-only table; readers take a
    * volatile snapshot, growth is synchronized and idempotent.
    */
  @volatile private var powTable: Array[Long] = {
    val a = new Array[Long](4096)
    a(0) = 1L
    var i = 1
    while (i < a.length) { a(i) = mulmod(a(i - 1), 31L); i += 1 }
    a
  }

  private def powsFor(maxExp: Int): Array[Long] = {
    var t = powTable
    if (t.length <= maxExp) synchronized {
      t = powTable
      if (t.length <= maxExp) {
        var cap = t.length
        while (cap <= maxExp) cap *= 2
        val m = java.util.Arrays.copyOf(t, cap)
        var i = t.length
        while (i < cap) { m(i) = mulmod(m(i - 1), 31L); i += 1 }
        powTable = m
        t = m
      }
    }
    t
  }

  def compute(arr: ArrayData, kind: Int, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n)
      return ArrayData.toArrayData(Array.emptyLongArray)
    val strs = new Array[String](len)
    var i = 0
    while (i < len) {
      strs(i) = kind match {
        case KindInt => java.lang.Integer.toString(arr.getInt(i))
        case KindLong => java.lang.Long.toString(arr.getLong(i))
        case _ => arr.getUTF8String(i).toString
      }
      i += 1
    }
    // one prefix scan over the joined string's codepoints: P(k) after k cps,
    // recorded at every token boundary, plus 31^k for the span identity
    val startHash = new Array[Long](len) // P(start of token i)
    val endHash = new Array[Long](len) // P(end of token i)
    val startOff = new Array[Int](len)
    val endOff = new Array[Int](len)
    var h = 0L
    var pos = 0
    i = 0
    while (i < len) {
      if (i > 0) { h = addmod(mulmod(h, 31L), 32L); pos += 1 } // ' '
      startHash(i) = h
      startOff(i) = pos
      val s = strs(i)
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = addmod(mulmod(h, 31L), cp.toLong)
        pos += 1
        j += Character.charCount(cp)
      }
      endHash(i) = h
      endOff(i) = pos
      i += 1
    }
    val pow = powsFor(pos)
    val m = len - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      val j = i + n - 1
      var d = endHash(j) - mulmod(startHash(i), pow(endOff(j) - startOff(i)))
      if (d < 0) d += Mod
      out(i) = d
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def span_hashes(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(SpanHashes(graftshim.toExpression(c), n))
  }
}
