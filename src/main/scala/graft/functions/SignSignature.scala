package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-LSH signature of a float vector as one native pass: bit b of the
  * result is set iff Σ_i v[i]·plane(b, i) > 0, where plane(b, i) ∈ {−1, +1}
  * is derived from the engine-portable [[Mix61]] mix (seed 101+b over the
  * dimension index) — bit-identical to the `aggregate(zip_with(vec,
  * sequence(...)))` per-bit formulation it replaces (double accumulation in
  * index order; multiplying by ±1.0 is exact), which was CodegenFallback
  * and materialized an index array per bit per row: numBits × dim
  * interpreted evaluations each signature. The DuckDB oracles replay the
  * same mix61 arithmetic, so gate results are unchanged.
  */
case class SignSignature(child: Expression, numBits: Int, firstBit: Int)
    extends UnaryExpression {
  require(numBits >= 1 && numBits <= 60, "numBits must be in [1, 60]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_signature expects array<float>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SignSignature.compute(input.asInstanceOf[ArrayData], numBits, firstBit)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignSignature$$.MODULE$$.compute($c, $numBits, $firstBit)")

  override protected def withNewChildInternal(newChild: Expression): SignSignature =
    copy(child = newChild)
  override def prettyName: String = "sign_signature"
}

object SignSignature {
  def compute(vec: ArrayData, numBits: Int, firstBit: Int): Long = {
    val d = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < numBits) {
      val seed = 101L + firstBit + b
      var acc = 0.0
      var i = 0
      while (i < d) {
        val sign = if ((Mix61.mix(i.toLong, seed) & 1L) == 1L) 1.0 else -1.0
        acc += vec.getFloat(i).toDouble * sign
        i += 1
      }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def sign_signature(vec: Column, numBits: Int, firstBit: Int = 0): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(SignSignature(graftshim.toExpression(vec), numBits, firstBit))
  }
}
