package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, AtomicType, DataType, LongType, StructType}

/** Bounded per-group top-k as a REAL aggregate — the scalable form of the
  * `row_number() OVER (PARTITION BY g ORDER BY cnt DESC, key ASC) <= k`
  * window (reference semantics: `SortedCounterMap.top(k)`,
  * `samples/TopCustomerArtists.java:93-130`).
  *
  * The window formulation shuffles EVERY (group, member) row to the
  * group's reducer and sorts it there; this aggregate keeps at most
  * `max(2k, 64)` candidates per group in each partial buffer, so the
  * shuffle carries ≤ that many rows per group PER MAP TASK and the reducer
  * merges pre-trimmed buffers — at 100 TB the difference between moving
  * the full member distribution and moving k·tasks rows. Partial buffers
  * merge by concatenate-and-trim, so the aggregate is mergeable in any
  * order (the commutativity the window never needed but distribution
  * does).
  *
  * Input: `struct<cnt: long, key: any orderable atomic>`. Output:
  * `array<struct>` of the top k inputs under (cnt DESC, key ASC) — the
  * same deterministic tie-break every windowed top-K in this repo pins.
  * Null structs and null fields are skipped (a count can't be null in any
  * producing plan; defensive for the public SQL surface).
  *
  * Serialization follows the `Collect` aggregate's pattern (Spark's own
  * TypedImperativeAggregate family): each buffered row is projected to
  * UnsafeRow bytes with a length prefix.
  */
case class TopKByCount(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  private def keyType: DataType = structType.fields(1).dataType

  // partial buffers trim lazily at this bound: enough slack that trims are
  // rare, small enough that a partial buffer never outgrows O(k)
  private def trimAt: Int = math.max(2 * k, 64)

  @transient private lazy val keyOrd =
    TypeUtils.getInterpretedOrdering(keyType)
  // one projection per operator instance, not per serialize() call — the
  // generated-class cache makes repeat creates cheap, not free
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](structType))
  @transient private lazy val cmp: Ordering[InternalRow] =
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val c = java.lang.Long.compare(b.getLong(0), a.getLong(0)) // cnt DESC
        if (c != 0) c
        else keyOrd.compare(a.get(1, keyType), b.get(1, keyType)) // key ASC
      }
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(fields) if fields.length == 2 &&
      fields(0).dataType == LongType &&
      !(fields(1).dataType.isInstanceOf[ArrayType] ||
        fields(1).dataType.isInstanceOf[StructType] ||
        fields(1).dataType.isInstanceOf[org.apache.spark.sql.types.MapType]) &&
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        fields(1).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_by_count needs struct<cnt: bigint, key: atomic>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_count"

  override def createAggregationBuffer(): mutable.ArrayBuffer[InternalRow] =
    mutable.ArrayBuffer.empty

  private def trim(buf: mutable.ArrayBuffer[InternalRow],
      to: Int): mutable.ArrayBuffer[InternalRow] =
    if (buf.length <= to) buf
    else {
      val kept = buf.sorted(cmp).take(to)
      buf.clear()
      buf ++= kept
      buf
    }

  override def update(
      buf: mutable.ArrayBuffer[InternalRow],
      input: InternalRow): mutable.ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buf += row.copy()
        if (buf.length > trimAt) trim(buf, k)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[InternalRow],
      other: mutable.ArrayBuffer[InternalRow]): mutable.ArrayBuffer[InternalRow] = {
    buf ++= other
    if (buf.length > trimAt) trim(buf, k)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(cmp).take(k).toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val data = new java.io.DataOutputStream(out)
    trim(buf, k).foreach { row =>
      val unsafe = serProj(InternalRow(row))
      val bytes = unsafe.getBytes
      data.writeInt(bytes.length)
      data.write(bytes)
    }
    data.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[InternalRow] = {
    val buf = mutable.ArrayBuffer.empty[InternalRow]
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    while (in.available() > 0) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf += row.getStruct(0, 2).copy()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKByCount =
    copy(child = newChild)
}

object AggregateFunctions {
  /** Top-k `struct<cnt: long, key>` values per group under
    * (cnt DESC, key ASC), as a mergeable bounded aggregate. */
  def top_k_by_count(cntKey: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByCount(GraftColumnBridge.expression(cntKey), k).toAggregateExpression())
}
