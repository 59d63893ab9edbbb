package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}

/** `kmv_sketch(hash, k)` — K-MINIMUM-VALUES distinct sketch aggregate
  * (Bar-Yossef et al., RANDOM 2002; the bottom-k sample the Apache
  * DataSketches theta family intersects): per group, the k smallest
  * DISTINCT non-negative 64-bit hash values as an ascending array.
  * Below k distinct hashes the sketch IS the hash set (exact); at k it
  * is a uniform bottom-k sample with threshold θ = kth-min / 2⁶³,
  * supporting the set-algebra estimator HLL cannot express —
  * INTERSECTION: |A∩B| ≈ |{h ∈ sk(A) ∩ sk(B) : h < θ}| / θ with
  * θ = min(θ_A, θ_B), whose error scales with the intersection SAMPLE
  * count rather than the set sizes — exactly the tiny-intersection
  * regime where HLL inclusion–exclusion (error ∝ set sizes) degrades.
  * `events_sketch_theta` gates it on that regime; the estimator math
  * lives in [[graft.operators.EventsOps.sketchTheta]] as plain array
  * expressions over the sketch columns.
  *
  * Bounded state: a k-capped TreeSet per partial buffer (dedup +
  * eviction of the current maximum), O(k log k) merge — map-side
  * combinable with constant memory at any fan-in, the same contract as
  * [[TopKListAgg]]. Input must be LONG (callers hash with
  * `xxhash64(x) & Long.MaxValue`, uniform non-negative); nulls are
  * ignored (SQL aggregate convention).
  */
case class KmvSketchAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  // eval(), not a Literal pattern-match: a foldable-but-non-literal k
  // (e.g. `2 + 2`) is legal per checkInputDataTypes and must resolve
  // here rather than escape analysis as an IllegalArgumentException
  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"kmv_sketch: k must be an INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a LONG hash input, got ${child.dataType.sql}")
    } else if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("kmv_sketch: k must be foldable")
    } else if (kExpr.dataType != IntegerType) {
      // an analysis-time failure, not a runtime throw: `kmv_sketch(h,
      // 4096L)` should read as a type error, same as a wrong hash type
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch: k must be an INT literal, got ${kExpr.dataType.sql}")
    } else if (kExpr.eval() == null) {
      TypeCheckResult.TypeCheckFailure("kmv_sketch: k must not be null")
    } else if (k <= 0) {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch: k must be > 0, got $k")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (!buf.contains(v)) {
      if (buf.size < k) buf.add(v): Unit
      else if (v < buf.last) {
        buf.remove(buf.last)
        buf.add(v): Unit
      }
    }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  /** Ascending hash array — element k (if saturated) is the θ
    * threshold; unsaturated arrays are the exact hash set.
    */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.hasRemaining) insert(buf, bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "kmv_sketch"
}
