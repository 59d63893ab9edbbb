package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `topk_list(value, k)` — mergeable bounded top-k AGGREGATE (the
  * custom-aggregate tier of the extension ladder, complementing the
  * whole-operator [[graft.plans.GroupTopK]]): per group, the k LARGEST
  * values as a descending array, computed with a k-bounded heap in each
  * partial buffer and an O(k) merge — constant state per group no matter
  * how many rows stream through, the property that makes it safe as a
  * 100 TB per-group summary (same contract as approx_percentile's
  * sketch, but exact for top-k).
  *
  * Output is the value MULTISET's top-k, so it is deterministic under
  * ties and partition order even though row-level top-k isn't — which is
  * what makes it hash-oracle-able (DuckDB: `(list(v ORDER BY v DESC,
  * v))[1:k]`).
  *
  * Orderable atomic input types only (long/double/string/timestamp...);
  * nulls are ignored (SQL aggregate convention).
  */
case class TopKListAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      "topk_list: k must be an integer literal")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType,
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!TypeUtils.typeWithProperEquals(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_list does not support ${child.dataType.sql} values")
    } else if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topk_list: k must be foldable")
    } else if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(s"topk_list: k must be > 0, got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  /** Min-heap of the k largest seen: head = smallest kept = eviction
    * candidate. */
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ordering.reverse)

  private def copyVal(v: Any): Any = v match {
    case s: UTF8String => s.copy() // scan buffers are reused
    case other => other
  }

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.enqueue(copyVal(v))
    else if (ordering.compare(v, buf.head) > 0) {
      buf.dequeue()
      buf.enqueue(copyVal(v))
    }
  }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  // serialize via the engine's own unsafe array format: one-column row
  // holding ARRAY<childType> — no hand-rolled per-type codec to drift
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      insert(buf, arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): TopKListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): TopKListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKListAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "topk_list"
}
