package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint: h = (h*31 + codepoint)
  * mod 2^61-1 over the string's unicode codepoints. A native Catalyst
  * expression with whole-stage codegen (doGenCode) — no Scala UDF in the hot
  * path — so a 100 TB fingerprint pass stays inside one codegen'd scan stage.
  * The recurrence is reproducible in any engine (it's plain modular
  * arithmetic), which is what makes it a portable dedup fingerprint.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects STRING, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash$$.MODULE$$.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod: Long = (1L << 61) - 1

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = mulMod31(h) + cp
      if (h >= Mod) h -= Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** (h*31) mod 2^61-1 without 64-bit overflow, via the Mersenne identity
    * 2^61 ≡ 1: h*32 = (h>>>56)*2^61 + (h & (2^56-1))*2^5 ≡ (h>>>56) +
    * ((h & mask)<<5), all terms < 2^61; then h*31 = h*32 - h.
    */
  private def mulMod31(h: Long): Long = {
    var t = (h >>> 56) + ((h & ((1L << 56) - 1)) << 5) // ≡ h*32, < 2^61+31
    if (t >= Mod) t -= Mod
    val r = t - h
    if (r < 0) r + Mod else r
  }

  def hashUtf8(s: UTF8String): Long = hash(s.toString)

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(RollingHash(graftshim.toExpression(c)))
  }
}
