package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, Decimal, IntegerType, LongType, NumericType, ShortType, StructType}
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** `topk_by(payload, ord, tie, k)` — top-k rows per group as a custom
  * TypedImperativeAggregate keeping a bounded k-entry heap per key.
  *
  * Why not `row_number() OVER (...) <= k`? The window formulation sorts
  * EVERY row of every key (full shuffle + per-partition sort); this
  * aggregate is a hash aggregation whose partial (map-side) state is at
  * most k rows per key per partition — at 100 TB the shuffle carries
  * ≈ k·keys·partitions rows instead of the whole table, and no sort ever
  * happens. Best = highest `ord`, ties broken by lowest `tie` (pass a
  * unique id for deterministic output). Returns array<payload> best-first.
  */
object TopK {
  def topk_by(payload: Column, ord: Column, tie: Column, k: Int): Column =
    Shim.column(TopKByAgg(Shim.expression(payload), Shim.expression(ord),
      Shim.expression(tie), k).toAggregateExpression())
}

/** Heap entry; `worseThan` defines the eviction order. */
private[functions] final case class TopKEntry(ord: Double, tie: Long, row: InternalRow)

private[functions] object TopKEntry {
  /** Max of this ordering = WORST entry (lowest ord, then highest tie). */
  val worstFirst: Ordering[TopKEntry] =
    Ordering.by[TopKEntry, (Double, Long)](e => (-e.ord, e.tie))
}

case class TopKByAgg(
    payload: Expression,
    ord: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[TopKEntry]] {

  require(k > 0, "topk_by requires k > 0")

  private def payloadSchema: StructType = payload.dataType.asInstanceOf[StructType]

  /** Analysis-time contract: struct payload, numeric ord (Decimal included,
    * converted via [[toDouble]]), integral tie. Without this, a bad input
    * type (e.g. string ord) would surface as a runtime ClassCastException
    * inside the aggregation instead of an AnalysisException.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"topk_by payload must be a struct, got ${payload.dataType.catalogString}")
    else if (!ord.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"topk_by ord must be numeric, got ${ord.dataType.catalogString}")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(tie.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by tie must be an integral type, got ${tie.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Decimal-aware: Spark's Decimal is not a java.lang.Number. */
  private def toDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def children: Seq[Expression] = Seq(payload, ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[TopKEntry] =
    scala.collection.mutable.PriorityQueue.empty(TopKEntry.worstFirst)

  private def offer(buf: scala.collection.mutable.PriorityQueue[TopKEntry],
      e: TopKEntry): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else {
      val w = buf.head
      if (e.ord > w.ord || (e.ord == w.ord && e.tie < w.tie)) {
        buf.dequeue()
        buf.enqueue(e)
      }
    }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[TopKEntry],
      input: InternalRow): scala.collection.mutable.PriorityQueue[TopKEntry] = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    val p = payload.eval(input)
    if (o != null && t != null && p != null) {
      val d = toDouble(o)
      // NaN ord would compare false against every heap entry (silently
      // dropped when the heap is full, kept when not) — skip it like null
      // for consistent semantics.
      if (!java.lang.Double.isNaN(d)) {
        offer(buf, TopKEntry(d, t.asInstanceOf[Number].longValue(),
          p.asInstanceOf[InternalRow].copy()))
      }
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[TopKEntry],
      other: scala.collection.mutable.PriorityQueue[TopKEntry]): scala.collection.mutable.PriorityQueue[TopKEntry] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[TopKEntry]): Any = {
    // dequeue yields worst→best; reverse for best-first output
    val entries: Seq[TopKEntry] = buf.clone().dequeueAll.reverse
    new GenericArrayData(entries.map(_.row).toArray[Any])
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[TopKEntry]): Array[Byte] = {
    val proj = UnsafeProjection.create(payloadSchema)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      out.writeDouble(e.ord)
      out.writeLong(e.tie)
      val u = proj(e.row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[TopKEntry] = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val o = in.getDouble
      val t = in.getLong
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val u = new UnsafeRow(payloadSchema.length)
      u.pointTo(rowBytes, len)
      buf.enqueue(TopKEntry(o, t, u))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(payload = newChildren(0), ord = newChildren(1), tie = newChildren(2))
  override def prettyName: String = "topk_by"
}
