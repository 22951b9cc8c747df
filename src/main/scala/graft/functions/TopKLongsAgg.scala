package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native bounded top-k aggregate (k largest long values per group,
  * emitted descending): a Catalyst TypedImperativeAggregate whose
  * buffer is a k-bounded min-heap serialized to bytes between partial
  * and final aggregation — O(k) state per group regardless of group
  * size, which is the whole point: grouped top-k WITHOUT the sort or
  * the per-group row buffering a window rank pays.  Completes the
  * engine's UDAF taxonomy (SURVEY §2.10): declarative aggs, typed
  * Aggregator (RankMetricsAgg, VectorMomentsAgg), and now the
  * catalyst-level imperative form Spark's own approx_percentile /
  * collect_list use.
  *
  * Plans into ObjectHashAggregate with map-side partials: each
  * partition reduces to k values before the shuffle, so the exchange
  * carries n_groups * k longs — the same two-phase shape the
  * WindowGroupLimit audit pins for window top-k, as a reusable
  * aggregate function.
  */
case class TopKLongsAgg(
    child: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k > 0 && k <= 1024, s"k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_longs requires a bigint column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_longs"

  /** survivors kept behind a boundary heap: min-heap when hunting the
    * largest k, max-heap when hunting the smallest k */
  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    if (largest) new java.util.PriorityQueue[java.lang.Long]()
    else new java.util.PriorityQueue[java.lang.Long](11,
      java.util.Collections.reverseOrder[java.lang.Long]())

  override def update(
      heap: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) push(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      heap: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) push(heap, it.next())
    heap
  }

  private def push(heap: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (heap.size < k) heap.add(v)
    else if ((largest && heap.peek() < v) || (!largest && heap.peek() > v)) {
      heap.poll(); heap.add(v)
    }

  override def eval(heap: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending when hunting largest (sort desc + slice head), ascending
    // when hunting smallest (sort asc + slice head)
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) {
      out(i) = if (largest) arr(arr.length - 1 - i) else arr(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(bb.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKLongsAgg {
  /** Column wrapper: top-k largest values of a bigint column. */
  def topkLongs(c: Column, k: Int): Column =
    Bridge.column(TopKLongsAgg(Bridge.expression(c), k)
      .toAggregateExpression())

  /** Column wrapper: k SMALLEST values of a bigint column, ascending —
    * the KMV-sketch building block (curation57.scala): each partition
    * reduces to at most k mins before the shuffle, so a per-group
    * k-minimum-values sketch costs n_groups * k longs of exchange no
    * matter how many rows feed it. */
  def minkLongs(c: Column, k: Int): Column =
    Bridge.column(TopKLongsAgg(Bridge.expression(c), k, largest = false)
      .toAggregateExpression())
}
