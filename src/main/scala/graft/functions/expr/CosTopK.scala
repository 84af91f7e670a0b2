package graft.functions.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k aggregate for the ANN re-rank.
  *
  * Semantics: within each group keep the k (score, id) pairs that rank
  * highest under (score DESC, id ASC) — exactly the total order of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id)` — and emit
  * them as `array<struct<rnk int, vec_id bigint, cos double>>` in rank
  * order.
  *
  * Why not the window form: `row_number().over(partitionBy(q_id))` shuffles
  * EVERY scored candidate row to one reducer per query before any of them
  * is discarded — for brute-force ANN that is the whole corpus per query at
  * 100 TB. As a `TypedImperativeAggregate` this reduces map-side: each input
  * partition keeps at most k pairs per group in a bounded heap
  * (ObjectHashAggregate partial), and only those k-row heaps cross the
  * exchange, so shuffled bytes drop from O(corpus) to O(groups × k) no
  * matter the corpus size. The heap is size-capped at k, so update is
  * O(log k) and memory is O(k) per group.
  *
  * Determinism: eviction uses the same (score DESC, id ASC) order as the
  * ranking, so the surviving set and its ranks are independent of input
  * partitioning/arrival order — required for the bit-exact DuckDB oracle
  * (the oracle keeps the row_number window form; both engines see identical
  * doubles thanks to the exact-integer cosine construction).
  */
case class CosTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "cos_top_k"

  // update() unboxes Double/Long directly — reject anything else at
  // analysis time instead of a ClassCastException mid-task (SQL callers
  // can hand a DECIMAL literal; GraftExtensions' builder casts for them).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cos_top_k expects (DOUBLE score, BIGINT id), got " +
          s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rnk", IntegerType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  // Scala's PriorityQueue dequeues the max per its ordering; rank the WORST
  // candidate (lowest score, then highest id) greatest so the heap head is
  // always the eviction victim.
  private def worstFirst: Ordering[(Double, Long)] = CosTopK.WorstFirst

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)], c: Double, i: Long): Unit = {
    if (buf.size < k) {
      buf.enqueue((c, i))
    } else if (worstFirst.compare((c, i), buf.head) < 0) {
      // Strictly better than the current worst → replace it.
      buf.dequeue()
      buf.enqueue((c, i))
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val c = score.eval(input)
    val i = id.eval(input)
    if (c != null && i != null) {
      insert(buf, c.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (c, i) => insert(buf, c, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // dequeueAll drains worst-first; reverse → rank order (best first).
    val ranked = buf.clone().dequeueAll.reverse
    new GenericArrayData(ranked.zipWithIndex.map { case ((c, i), idx) =>
      new GenericInternalRow(Array[Any](idx + 1, i, c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (c, i) => bb.putDouble(c); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      buf.enqueue((bb.getDouble, bb.getLong))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CosTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CosTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CosTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

object CosTopK {
  private object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score ⇒ greater ⇒ evicted first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id ⇒ greater
    }
  }

  /** Column-API entry point: `array<struct<rnk, vec_id, cos>>` per group. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftExpressionBridge.column(
      CosTopK(
        GraftExpressionBridge.expression(score),
        GraftExpressionBridge.expression(id),
        k).toAggregateExpression())
}
