package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (Z-order) bit interleave of two long columns' low 16
  * bits — the DATA-LAYOUT primitive: sorting / range-partitioning a table
  * by `morton(x, y)` clusters rows so that a 2-D range predicate maps to
  * ONE contiguous z-range, which min/max file statistics can prune, where
  * either single-column sort order would scatter the other dimension
  * across every file. The property that makes it work (and that the x12
  * gate pins): for a power-of-two ALIGNED square, the z-interval
  * [morton(lo,lo), morton(hi,hi)] contains EXACTLY the square's points;
  * for unaligned rectangles it is a superset (pruning stays correct,
  * merely less tight).
  *
  * Bits above 15 are ignored (callers bucket coordinates first); the
  * result is ≤ 32 bits, so it never goes negative and round-trips every
  * engine's BIGINT. Interleaving uses the classical mask-spread (4 shift
  * rounds), identical in eval and codegen via one static helper — pure
  * integer ops, bit-reproducible everywhere; the oracle replays the
  * per-bit definition, pinning the spread against the definition too.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_interleave requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonInterleave.interleave16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(newLeft, newRight)
}

object MortonInterleave {
  /** Spread the low 16 bits of v to even bit positions (0,2,…,30). */
  private def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** z-value: x's bits at even positions, y's at odd. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Morton z-value of two long columns' low 16 bits (codegen'd). */
  def morton_interleave(x: Column, y: Column): Column =
    GraftColumnBridge.column(MortonInterleave(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))
}
