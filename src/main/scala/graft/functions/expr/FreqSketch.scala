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
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a per-group aggregate — the 100 TB
  * answer to "what are the heavy tokens/domains/n-grams in this corpus":
  * exact `GROUP BY item` shuffles one row per DISTINCT item (unbounded on
  * text corpora); this aggregate keeps at most k counters per group, so
  * partials reduce map-side and only O(groups × k) entries ever cross the
  * exchange.
  *
  * Guarantees (the classic MG bounds, preserved under merge — Agarwal,
  * Cormode et al., "Mergeable Summaries", PODS 2012): for a stream of n
  * items, every item with true count > n/(k+1) is present in the summary,
  * and every reported estimate satisfies `true - n/(k+1) ≤ est ≤ true`.
  * When a group's distinct-item count never exceeds k the sketch never
  * decrements and the estimates are EXACT counts — which also makes the
  * output deterministic and bit-exact-oracle-checkable at that operating
  * point; with more distinct items than k, the surviving set depends on
  * arrival order (inherent to MG) and correctness is the bounds above
  * (FreqSketchSpec pins both regimes).
  *
  * Output: `array<struct<item string, est bigint>>` ordered by
  * (est DESC, item ASC).
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, s"freq_sketch needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects a STRING item, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k =>
          // clone: the UTF8String points into a reused row buffer.
          buf.update(item.clone(), 1L)
        case None =>
          // Classic MG step: a full summary and an unseen item decrement
          // every counter; zeros drop out.
          decrementAll(buf, 1L)
      }
    }
    buf
  }

  /** Subtract `d` from every counter, dropping non-positive entries. */
  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], d: Long): Unit = {
    val dead = buf.iterator.filter(_._2 <= d).map(_._1).toArray
    dead.foreach(buf.remove)
    buf.keysIterator.toArray.foreach { key =>
      buf.update(key, buf(key) - d)
    }
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buf.get(item) match {
        case Some(c0) => buf.update(item, c0 + c)
        case None => buf.update(item, c)
      }
    }
    if (buf.size > k) {
      // Mergeable-summaries compression: subtract the (k+1)-th largest
      // count from everything; at most k strictly-positive entries remain
      // and the additive error bound telescopes.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      decrementAll(buf, d)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val ranked = buf.toArray.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(ranked.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map(_._1.getBytes)
    val bb = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0))
}

object FreqSketch {
  /** Column-API entry point: `array<struct<item, est>>` per group. */
  def sketch(item: Column, k: Int): Column =
    GraftExpressionBridge.column(
      FreqSketch(GraftExpressionBridge.expression(item), k).toAggregateExpression())
}
