package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types._

/** K-Minimum-Values (theta) sketch as a per-group aggregate — the 100 TB
  * answer to SET-EXPRESSION cardinalities that HLL cannot give: HLL unions,
  * but it cannot INTERSECT, and "how much does snapshot B overlap snapshot
  * A" (train/test contamination, crawl-over-crawl novelty) is an
  * intersection question. A KMV sketch keeps the k smallest hash values
  * seen; because a uniform hash's k-th order statistic estimates density,
  * the retained set is simultaneously a cardinality estimator and a
  * BOTTOM-K SAMPLE of the distinct universe — and bottom-k samples of two
  * sets can be intersected (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007; the
  * DataSketches theta-sketch family implements the same algebra).
  *
  * Contract (hashes are NON-NEGATIVE longs, i.e. uniform on [0, 2^63);
  * callers mask: `xxhash64(x) & Long.MaxValue`):
  *  - |distinct| < k  → the sketch IS the distinct hash set (exact regime);
  *  - |distinct| ≥ k  → estimate (k-1)/θ where θ = kthMin/2^63, with
  *    relative standard error ≈ 1/√(k-2);
  *  - merge keeps the k smallest of the union — commutative, associative,
  *    duplicate-free, so partials reduce map-side and only O(groups × k)
  *    longs cross the exchange (the mergeable-summaries shape shared with
  *    [[FreqSketch]] and Spark's HLL buffers);
  *  - union/intersection estimators are pure array arithmetic over two
  *    sketches' outputs (see the `sketch_kmv_overlap` query): both are
  *    evaluated at threshold θ = min(θ_a, θ_b), under which each sketch's
  *    retained values below θ are an unbiased distinct sample.
  *
  * Output: `array<bigint>` of the retained hashes, ascending. The output
  * is a pure function of the input VALUE SET — dedup + min-k are
  * order-free — so it is deterministic under any partitioning, and every
  * estimate derived from it is reproducible run to run (what lets the
  * overlap query gate measured error bounds as hashed booleans).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"kmv_sketch needs k > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a BIGINT hash, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Insert one hash, keeping the k smallest distinct values. TreeSet
    * gives dedup + max eviction in O(log k) with k bounded (≤ a few K
    * longs per group buffer). */
  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0, s"kmv_sketch input hash must be non-negative, got $h " +
        "(mask with & Long.MaxValue)")
      insert(buf, h)
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var more = true
    while (more && it.hasNext) {
      val h = it.next().longValue()
      // `other` iterates ascending: once a value fails the bound every
      // later one does too.
      if (buf.size == k && h >= buf.last()) more = false
      else insert(buf, h)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => { bb.putLong(h.longValue()); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}

object KmvSketch {
  /** Hash-space size as a double: thresholds normalize by 2^63 because
    * inputs are masked non-negative. */
  val HashSpace: Double = math.pow(2.0, 63)

  /** Column-API entry point over a PRE-MASKED non-negative hash column:
    * `array<bigint>` of the k minimum distinct hashes, ascending. */
  def sketch(hash: Column, k: Int): Column =
    GraftExpressionBridge.column(
      KmvSketch(GraftExpressionBridge.expression(hash), k).toAggregateExpression())
}
