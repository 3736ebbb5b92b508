package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Replace the tokens at a sorted list of 1-based positions with a mask
  * token, in one merge scan: O(n_tok + positions) per row. The columnar
  * alternative (`transform` + `array_contains`) is a higher-order function —
  * CodegenFallback, with an O(positions) probe per token, so a long
  * document with dense duplicated coverage costs O(n_tok²) interpreted
  * evaluations; this kernel keeps the mask-apply step linear and inside
  * whole-stage codegen.
  *
  * `positions` MUST be sorted ascending (duplicates tolerated) — the
  * producer in `Dedup.maskDuplicatedSpans` builds it with `sort_array`.
  * Null tokens array yields null; elements must be non-null.
  */
case class MaskCovered(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"mask_covered expects (array<int>, array<int>, int), got ($a, $b, $c)")
    }

  override protected def nullSafeEval(toks: Any, pos: Any, mask: Any): Any =
    MaskCovered.apply0(toks.asInstanceOf[ArrayData], pos.asInstanceOf[ArrayData],
      mask.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, m) =>
      s"graft.functions.MaskCovered$$.MODULE$$.apply0($t, $p, $m)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MaskCovered =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "mask_covered"
}

object MaskCovered {
  def apply0(toks: ArrayData, positions: ArrayData, mask: Int): ArrayData = {
    val n = toks.numElements()
    val m = positions.numElements()
    val out = new Array[Int](n)
    var i = 0
    var p = 0
    while (i < n) {
      val here = i + 1 // positions are 1-based
      while (p < m && positions.getInt(p) < here) p += 1
      out(i) = if (p < m && positions.getInt(p) == here) mask else toks.getInt(i)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Column API (Spark 4: Column↔Expression via the sql-package shim). */
  def mask_covered(toks: Column, positions: Column, mask: Int): Column = {
    import org.apache.spark.sql.{functions => F, graftshim}
    graftshim.toColumn(MaskCovered(graftshim.toExpression(toks),
      graftshim.toExpression(positions), graftshim.toExpression(F.lit(mask))))
  }
}
