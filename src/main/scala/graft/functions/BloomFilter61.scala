package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter probe over a bitmap literal: `might_contain_61(bitmap,
  * value)` tests k [[Mix61]]-derived bit positions of a 61-bit hash against
  * a byte-array bitmap. A native codegen `BinaryExpression`, so the probe
  * runs inside the scan stage — the pre-filter pattern for membership
  * against a set too large to broadcast as a join hash table: the bitmap is
  * ~10× smaller than a hash map of the same set (1 bit/slot at ~10
  * bits/item vs ≥16 bytes/entry), and rows that fail the probe never reach
  * a shuffle. False positives (rate ≈ (1−e^(−kn/m))^k) must be removed by
  * an exact verify downstream — see `Dedup.containmentBloom`, where the
  * surviving minority joins the real set, keeping end-to-end results exact.
  *
  * Bit layout: global bit p lives in byte p>>3, bit p&7 — matching the
  * little-endian word serialization of [[BloomFilter61.build]].
  */
case class BloomProbe61(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1 && k <= 16, "probe count k must be in [1, 16]")
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain_61 expects (binary bitmap, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(bitmap: Any, value: Any): Any =
    BloomFilter61.mightContain(bitmap.asInstanceOf[Array[Byte]],
      value.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.BloomFilter61$$.MODULE$$.mightContain($b, $v, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe61 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "might_contain_61"
}

object BloomFilter61 {
  /** Seed base for the k probe hashes; probe j uses mix(value, Seed0 + j). */
  final val Seed0: Long = 0x5eedb100L

  def probePosition(value: Long, j: Int, mBits: Long): Long = {
    val h = Mix61.mix(value, Seed0 + j)
    java.lang.Long.remainderUnsigned(h, mBits)
  }

  def mightContain(bitmap: Array[Byte], value: Long, k: Int): Boolean = {
    val mBits = bitmap.length.toLong * 8L
    if (mBits == 0L) return false
    var j = 0
    while (j < k) {
      val p = probePosition(value, j, mBits)
      if ((bitmap((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }

  /** Distributed build: the k probe positions of every value are exploded,
    * folded into 64-bit words with a map-side-combinable `bit_or`
    * aggregate, and only the ≤ mBits/64 nonzero words reach the driver —
    * collect size is bounded by the BITMAP, never by the input set. The
    * result is a planning-time scalar like the IVF centroid list: build
    * once, embed as a literal, probe map-side.
    */
  def build(df: DataFrame, hashCol: String, mBits: Long, k: Int): Array[Byte] = {
    require(mBits > 0 && mBits % 64 == 0 && mBits / 8 <= Int.MaxValue,
      "mBits must be a positive multiple of 64 and the bitmap must fit in one array")
    val positions = df.select(explode(array((0 until k).map { j =>
      pmod(Mix61.mix61(col(hashCol), lit(Seed0 + j)), lit(mBits))
    }: _*)).as("__p"))
    val words = positions
      .selectExpr("__p DIV 64 AS __w",
        "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT)) AS __b")
      .groupBy(col("__w")).agg(bit_or(col("__b")).as("__word"))
      .collect()
    val bytes = new Array[Byte]((mBits / 8).toInt)
    words.foreach { r =>
      val w = r.getLong(0)
      val word = r.getLong(1)
      var b = 0
      while (b < 8) {
        bytes(w.toInt * 8 + b) = ((word >>> (8 * b)) & 0xFF).toByte // LE
        b += 1
      }
    }
    bytes
  }

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def might_contain_61(bitmap: Column, value: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(BloomProbe61(graftshim.toExpression(bitmap),
      graftshim.toExpression(value), k))
  }
}
