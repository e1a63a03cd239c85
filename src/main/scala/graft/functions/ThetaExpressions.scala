package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Theta-sketch plumbing shared by the aggregates and the codegen'd
  * estimate expressions. Static-forwarder methods so generated code can
  * call them as plain Java statics. */
object ThetaOps {
  def emptyUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  /** Distinct-count estimate of a serialized compact sketch. */
  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** Estimate of |A ∩ B| from two serialized compact sketches — the
    * operation HLL cannot do (HLL unions only; theta's retained-hash-set
    * representation intersects directly, Dasgupta et al. 2016). */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(wrap(a))
    ix.intersect(wrap(b))
    ix.getResult.getEstimate
  }
}

/** Base for the two theta aggregates: the buffer is a DataSketches
  * `Union` (bounded at ~2^lgK retained hashes regardless of input size),
  * the wire form is the canonical ordered `CompactSketch` bytes. Partial
  * buffers merge by sketch union — associative and commutative, so the
  * aggregate is mergeable in any order and the map-side partial phase
  * ships one ≤ 2^(lgK+3)-byte blob per (group, task) instead of the
  * group's member stream — the same 100 TB property as [[TopKByCount]],
  * for distinct sets. */
abstract class ThetaAggBase
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {
  // validated in ThetaFunctions, NOT here: a constructor-body require
  // re-runs during executor-side Java deserialization before the field
  // is restored (lgK reads 0) and kills the task
  def lgK: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaOps.emptyUnion(lgK)

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaOps.emptyUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }
}

/** Build a theta sketch of a long key column (one per group). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg needs a bigint key, got ${child.dataType.simpleString}")
  override def prettyName: String = "theta_sketch_agg"

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union already-built theta sketches (serialized compact form) — the
  * shard-merge half of the sharded distinct pipeline. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg needs serialized sketch bytes, got ${child.dataType.simpleString}")
  override def prettyName: String = "theta_union_agg"

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Distinct-count estimate of a serialized theta sketch, codegen'd as a
  * static call. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate needs serialized sketch bytes, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(a: Any): Any =
    ThetaOps.estimate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ThetaOps.estimate($a);")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** |A ∩ B| estimate over two serialized theta sketches, codegen'd as a
  * static call so a pair-join of sketch tables stays inside
  * WholeStageCodegen. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_intersect_estimate needs two serialized sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaOps.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaFunctions {
  private def checkLgK(lgK: Int): Unit =
    require(lgK >= 4 && lgK <= 26, s"theta lgK out of range: $lgK")

  /** Theta sketch of a long column per group (serialized compact form). */
  def theta_sketch_agg(key: Column, lgK: Int = 12): Column = {
    checkLgK(lgK)
    GraftColumnBridge.column(
      ThetaSketchAgg(GraftColumnBridge.expression(key), lgK).toAggregateExpression())
  }

  /** Union of serialized theta sketches per group. */
  def theta_union_agg(sketch: Column, lgK: Int = 12): Column = {
    checkLgK(lgK)
    GraftColumnBridge.column(
      ThetaUnionAgg(GraftColumnBridge.expression(sketch), lgK).toAggregateExpression())
  }

  /** Distinct estimate of a serialized sketch (codegen'd). */
  def theta_estimate(sketch: Column): Column =
    GraftColumnBridge.column(ThetaEstimate(GraftColumnBridge.expression(sketch)))

  /** |A ∩ B| estimate from two serialized sketches (codegen'd). */
  def theta_intersect_estimate(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaIntersectEstimate(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
