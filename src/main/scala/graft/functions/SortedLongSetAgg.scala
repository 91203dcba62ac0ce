package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** A group's long values as one ASCENDING sorted array — the unboxed
  * twin of `sort_array(collect_list(h))` for the minhash verify's
  * per-doc hash-set operand ([[SortedIntersectCount]]'s contract).
  *
  * Why not collect_list: its buffer appends BOXED values through the
  * generic object-aggregation path, and the sf10 falsifier measured
  * hundreds of GC-seconds per run in exactly that aggregate stage (a
  * corpus of docs × ~10³ hashes each). This buffer is a growable raw
  * `long[]` (amortized doubling, no per-element allocation) sorted once
  * at eval — allocation is O(groups), not O(rows).
  *
  * Inputs are assumed DISTINCT per group (the shingle index's
  * generator dedupes each document's shingle STRINGS before hashing —
  * r12; a duplicate hash can only arise from two distinct shingles of
  * one document colliding in 64 bits, inside the hashed space's
  * documented n²/2⁶⁴ tolerance); duplicates would be emitted, not
  * collapsed — same as collect_list.
  */
case class SortedLongSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SortedLongSetAgg.Buf] {

  import SortedLongSetAgg.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf(new Array[Long](8), 0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < b2.n) { b1.append(b2.a(i)); i += 1 }
    b1
  }

  override def eval(buf: Buf): Any = {
    val out = java.util.Arrays.copyOf(buf.a, buf.n)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.n * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeLong(buf.a(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val a = new Array[Long](math.max(8, n))
    var i = 0
    while (i < n) { a(i) = in.readLong(); i += 1 }
    new Buf(a, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedLongSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedLongSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SortedLongSetAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "sorted_long_set"
}

object SortedLongSetAgg {
  /** Growable raw long buffer — package-visible for the aggregate. */
  final class Buf(var a: Array[Long], var n: Int) {
    def append(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = v
      n += 1
    }
  }

  /** The aggregate as a Column — direct construction, no session
    * registry (same pattern as the other graft kernels).
    */
  def column(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SortedLongSetAgg(ColumnBridge.expression(h)).toAggregateExpression())
  }
}
