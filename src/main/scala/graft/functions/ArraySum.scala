package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `array_sum_long(arr)` — element-wise SUM of equal-length
  * `array<bigint>` rows, as a mergeable Catalyst aggregate.
  *
  * The missing primitive for fused per-row counting passes (r13): a
  * [[TokenTermCounts]] scan emits one fixed-width count vector per row,
  * and reducing it to corpus/group totals with `sum(element_at(c, i))`
  * per element works for a handful of terms but generates one aggregate
  * expression per slot — for a wide candidate list (hundreds of slots,
  * the q114 union-recount shape) this aggregates the whole vector in one
  * buffer: O(width) longs per partition shipped map-side-combined, no
  * explode, no shuffle by key.
  *
  * Null rows are skipped (SUM semantics); zero non-null rows yields
  * NULL. Rows must agree on length — a mismatch raises (it means the
  * caller's per-row vector wasn't fixed-width, a plan bug, never data).
  * Null ELEMENTS are rejected the same way: the input contract is a
  * count vector, which is never null-valued.
  */
case class ArraySumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArraySumLong.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum_long expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "array_sum_long"

  override def createAggregationBuffer(): ArraySumLong.Buf =
    new ArraySumLong.Buf(null)

  override def update(buf: ArraySumLong.Buf, input: InternalRow): ArraySumLong.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](m)
      else if (buf.sums.length != m) throw new IllegalStateException(
        s"array_sum_long: row width $m != accumulated width ${buf.sums.length}")
      var i = 0
      while (i < m) {
        if (arr.isNullAt(i)) throw new IllegalStateException(
          "array_sum_long: null element in count vector")
        buf.sums(i) += arr.getLong(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: ArraySumLong.Buf, other: ArraySumLong.Buf): ArraySumLong.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = other.sums.clone()
      else {
        if (buf.sums.length != other.sums.length) throw new IllegalStateException(
          s"array_sum_long: merge width ${other.sums.length} != ${buf.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: ArraySumLong.Buf): Any =
    if (buf.sums == null) null
    else new GenericArrayData(buf.sums.clone())

  // Leading presence byte: a WIDTH-ZERO accumulated state (rows seen, all
  // empty arrays) must round-trip distinctly from the no-rows-seen state —
  // an empty payload alone can't tell them apart, and conflating them
  // would flip a [] result to NULL whenever a partial aggregate crossed a
  // serialization boundary.
  override def serialize(buf: ArraySumLong.Buf): Array[Byte] = {
    if (buf.sums == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(1 + 8 * buf.sums.length)
      bb.put(1: Byte)
      buf.sums.foreach(bb.putLong)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): ArraySumLong.Buf =
    if (bytes.isEmpty) new ArraySumLong.Buf(null)
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.get() // presence byte
      val sums = new Array[Long]((bytes.length - 1) / 8)
      var i = 0
      while (i < sums.length) { sums(i) = bb.getLong(); i += 1 }
      new ArraySumLong.Buf(sums)
    }

  override def withNewMutableAggBufferOffset(offset: Int): ArraySumLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArraySumLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ArraySumLong =
    copy(child = newChildren(0))
}

object ArraySumLong {
  /** Mutable holder so a width-unknown empty state is representable. */
  final class Buf(var sums: Array[Long]) extends Serializable
}
