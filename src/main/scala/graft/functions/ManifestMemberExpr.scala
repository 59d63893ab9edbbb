package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native codegen membership probe over [[graft.operators.AnnIndex]]'s
  * manifest entries — the custom-`Expression` tier (SURVEY.md §7.3)
  * replacing the r12 Scala `udf` the verdict flagged: the udf was
  * broadcast-backed and cheap, but a ScalaUDF node blocks whole-stage
  * codegen on the membership filter and boxes every id through a
  * closure. This expression emits a plain `references[i]` method call
  * inside the generated code — the filter stays inside the codegen
  * span (AnnIndexSpec pins "no ScalaUDF" on the plan).
  *
  * Semantics (identical to the udf it replaces): entries are the
  * candidate manifest rows (min_id, max_id, bloom bytes), broadcast
  * once; an id MIGHT be a member iff some entry's [min, max] covers it
  * AND that entry's own bloom says maybe. Entries are tested
  * SEPARATELY (range gate, then that row's bloom — merging
  * potentially-saturated blooms would OR the degraded bit arrays back
  * together); the probe binary-searches the sorted min_ids and walks
  * back only while the prefix-max of max_id still covers the id, so
  * per-id work is O(log entries + overlap), with an early exit for the
  * monotonic-id ingest common case. NULL ids are not members.
  */
case class ManifestMember(child: Expression,
    entries: Broadcast[Array[(Long, Long, Array[Byte])]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"manifest_member expects BIGINT, got ${child.dataType.sql}")

  // decoded ONCE per executor (and per driver for the interpreted
  // path): sorted ranges, prefix-max of max_id for the walk-back early
  // exit, and the deserialized blooms. The broadcast ships bytes, not
  // live filter objects.
  @transient private lazy val decoded: (Array[Long], Array[Long],
      Array[Long],
      Array[org.apache.spark.util.sketch.BloomFilter]) = {
    val sorted = entries.value.sortBy(_._1)
    val los = sorted.map(_._1)
    val his = sorted.map(_._2)
    val prefHi = his.scanLeft(Long.MinValue)(math.max).tail
    val blooms = sorted.map(e =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(e._3)))
    (los, his, prefHi, blooms)
  }

  /** The per-id probe the generated code calls. */
  def probe(id: Long): Boolean = {
    val (los, his, prefHi, blooms) = decoded
    // last entry with min_id <= id
    var j = java.util.Arrays.binarySearch(los, id) match {
      case found if found >= 0 =>
        // step past equal min_ids (binarySearch picks any duplicate)
        var k = found
        while (k + 1 < los.length && los(k + 1) <= id) k += 1
        k
      case ins => -ins - 2
    }
    var found = false
    // walk back only while SOME not-yet-tested entry can still cover
    // the id (prefix-max of max_id)
    while (j >= 0 && !found && prefHi(j) >= id) {
      if (his(j) >= id && blooms(j).mightContainLong(id)) found = true
      j -= 1
    }
    found
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false else probe(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("manifestProbe", this,
      classOf[ManifestMember].getName)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = ${c.isNull} ? false : $ref.probe(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ManifestMember = copy(child = newChild)
}

object ManifestMember {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Wrap a probe over `idColName` as a [[Column]] through a
    * uniquely-named session function (all PUBLIC API — the classic
    * Column constructor from a raw Catalyst expression is
    * private[sql]): the builder closure captures the broadcast, the
    * returned cleanup drops the registry entry once the caller has
    * materialized its frame (the analyzed plan embeds the expression;
    * the name is only needed during analysis).
    */
  def columnFor(spark: SparkSession,
      bc: Broadcast[Array[(Long, Long, Array[Byte])]],
      idColName: String): (Column, () => Unit) = {
    val name = s"graft_manifest_member_${counter.incrementAndGet()}"
    val id = FunctionIdentifier(name)
    spark.sessionState.functionRegistry.registerFunction(id,
      new ExpressionInfo(classOf[ManifestMember].getName, name),
      children => {
        require(children.length == 1,
          s"$name expects exactly 1 argument, got ${children.length}")
        ManifestMember(children.head, bc)
      })
    (expr(s"$name(`$idColName`)"),
      () => { spark.sessionState.functionRegistry.dropFunction(id): Unit })
  }
}
