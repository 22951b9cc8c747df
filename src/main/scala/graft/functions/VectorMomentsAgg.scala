package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF accumulating per-dimension fixed-point moments of an
  * `array<float>` embedding column in ONE pass over the vectors — the
  * 100 TB form of `embedding_dim_stats`'s posexplode pipeline, which
  * multiplies shuffle rows by the dimensionality (64x here) before
  * aggregating. This buffer is a single (n, s1[dim], s2[dim], min[dim],
  * max[dim]) record per partition; merge is element-wise addition, so
  * the aggregate is order-independent under any partitioning — the same
  * exact-integer-moments argument as the SQL twin (see Det).
  *
  * Quantization matches the SQL twin bit-for-bit:
  * q = floor(double(x) * 1000), so VectorMomentsSpec can assert exact
  * equality of the derived mean/variance against the oracle-checked
  * query at any scale.
  */
final case class VecMomentsBuf(
    n: Long, s1: Array[Long], s2: Array[Long],
    minq: Array[Long], maxq: Array[Long])

final case class DimStats(
    dim: Long, n: Long, mean: Double, variance: Double,
    min_e3: Long, max_e3: Long)

class VectorMomentsAgg(dim: Int)
    extends Aggregator[Array[Float], VecMomentsBuf, Array[DimStats]] {

  override def zero: VecMomentsBuf = VecMomentsBuf(
    0L, new Array[Long](dim), new Array[Long](dim),
    Array.fill(dim)(Long.MaxValue), Array.fill(dim)(Long.MinValue))

  override def reduce(b: VecMomentsBuf, v: Array[Float]): VecMomentsBuf = {
    require(v.length == dim, s"expected dim $dim, got ${v.length}")
    var i = 0
    while (i < dim) {
      val q = math.floor(v(i).toDouble * 1000).toLong
      b.s1(i) += q
      b.s2(i) += q * q
      if (q < b.minq(i)) b.minq(i) = q
      if (q > b.maxq(i)) b.maxq(i) = q
      i += 1
    }
    b.copy(n = b.n + 1)
  }

  override def merge(a: VecMomentsBuf, b: VecMomentsBuf): VecMomentsBuf = {
    val s1 = new Array[Long](dim); val s2 = new Array[Long](dim)
    val mn = new Array[Long](dim); val mx = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      s1(i) = a.s1(i) + b.s1(i)
      s2(i) = a.s2(i) + b.s2(i)
      mn(i) = math.min(a.minq(i), b.minq(i))
      mx(i) = math.max(a.maxq(i), b.maxq(i))
      i += 1
    }
    VecMomentsBuf(a.n + b.n, s1, s2, mn, mx)
  }

  /** Same floating-point op order as the SQL twin: bigint operands cast
    * to double at each division, one op at a time. */
  override def finish(b: VecMomentsBuf): Array[DimStats] =
    Array.tabulate(dim) { i =>
      val n = b.n.toDouble
      val mean = b.s1(i).toDouble / n / 1000.0
      val variance =
        (b.s2(i).toDouble - (b.s1(i) * b.s1(i)).toDouble / n) / n / 1000000.0
      DimStats(i.toLong, b.n, mean, variance, b.minq(i), b.maxq(i))
    }

  override def bufferEncoder: Encoder[VecMomentsBuf] =
    Encoders.product[VecMomentsBuf]
  override def outputEncoder: Encoder[Array[DimStats]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[DimStats]]()
}
