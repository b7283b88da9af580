package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded TOP-K aggregate: the k SMALLEST values of an orderable struct
  * per group, returned as an ascending array — the distributed top-k
  * primitive Spark's built-ins lack (`row_number` windows sort and
  * shuffle EVERY candidate; this keeps a k-bounded heap per group and,
  * because [[TypedImperativeAggregate]] participates in partial
  * aggregation, the map side collapses each partition's candidates to
  * ≤k rows per group BEFORE the exchange — the group-keyed shuffle then
  * moves k·groups rows instead of the whole candidate set, which at
  * corpus scale is the difference between shuffling millions of scored
  * candidates and shuffling the answer).
  *
  * Ordering: the struct type's own interpreted ordering (field-by-field,
  * nulls first, ascending) — bit-identical to a `row_number` window
  * ordered by the same fields ASC, so operators can swap window → topk
  * without moving a byte of output. Put the ranking keys first in the
  * struct and any carried payload after a unique tiebreak field; the
  * lexicographic compare never reaches the payload.
  *
  * SQL surface: `graft_topk(struct(...), k)` with literal k (register
  * via [[GraftFunctions.register]]). Result: `array<struct<...>>`,
  * ascending, size ≤ k. */
case class TopKMin(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"graft_topk k must be >= 1: $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType)
  // max-heap: head is the WORST of the kept k — O(log k) replacement
  @transient private lazy val cmp = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int =
      ordering.compare(b, a)
  }
  @transient private lazy val ser = UnsafeProjection.create(structType)
  // Fast-reject machinery: once the heap is full, a row whose FIRST
  // struct field is strictly worse than the kept worst's first field can
  // be rejected after evaluating that one field — no struct allocation,
  // no compare past field 0. Callers exploit this by making field 0 a
  // cheap monotone proxy of the ranking key (e.g. the DOUBLE cast of an
  // exact DECIMAL distance): the common case on a warmed heap is one
  // primitive compare per candidate.
  @transient private lazy val field0: Option[Expression] = child match {
    case ns: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
      ns.valExprs.headOption
    case _ => None
  }
  @transient private lazy val ord0 =
    TypeUtils.getInterpretedOrdering(structType.fields(0).dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType =>
        TypeUtils.checkForOrderingExpr(s, "graft_topk")
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"graft_topk needs a struct input, got $other")
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.min(k, 1024), cmp)

  override def update(buf: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    if (buf.size >= k && field0.isDefined) {
      val k0 = field0.get.eval(input)
      val w0 = buf.peek().get(0, structType.fields(0).dataType)
      // the per-field interpreted ordering does not accept null operands,
      // and a null field 0 sorts FIRST (it can never be strictly worse) —
      // fall through to the full struct compare when either side is null
      if (k0 != null && w0 != null &&
          ord0.compare(k0.asInstanceOf[AnyRef], w0.asInstanceOf[AnyRef]) > 0)
        return buf // strictly worse on field 0 ⇒ worse lexicographically
    }
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null) {
      if (buf.size < k) buf.add(v.copy())
      else if (ordering.compare(v, buf.peek()) < 0) { buf.poll(); buf.add(v.copy()) }
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
                     other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val v = it.next()
      if (buf.size < k) buf.add(v)
      else if (ordering.compare(v, buf.peek()) < 0) { buf.poll(); buf.add(v) }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 } // heap pops worst-first
    // heap order is only heap-shaped below the head — sort ascending
    java.util.Arrays.sort(arr, (a: InternalRow, b: InternalRow) => ordering.compare(a, b))
    arr.foreach(buf.add) // restore: eval must not destroy the buffer
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val u = ser(it.next())
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMin =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_topk"
}
