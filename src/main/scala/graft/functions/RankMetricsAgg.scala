package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for the reference's retrieval rank metrics
  * (rag_evaluation/RAG-eval-test_model.py:119-154): one pass over
  * (rank, relevant) pairs accumulating the sum/count of relevant ranks
  * and the first (minimum) relevant rank, with the zone sentinel on miss
  * (:145-147).
  *
  * Demonstrates the Aggregator[IN, BUF, OUT] surface (SURVEY §2.10); the
  * production queries use the equivalent built-in agg pipeline (see
  * VectorQueries avg_search_rank / avg_first_hit_rank) since built-ins
  * get partial aggregation codegen for free — this typed version exists
  * for per-group reuse in Dataset pipelines and as the tested example of
  * a custom merge-able aggregate (order-independent buffer merge, safe
  * under any partitioning).
  */
final case class RankHit(rank: Long, relevant: Boolean)
final case class RankBuf(sum: Long, n: Long, first: Long)
final case class RankMetrics(avgRank: Double, firstHit: Long, nRelevant: Long)

class RankMetricsAgg(zone: Long) extends Aggregator[RankHit, RankBuf, RankMetrics] {
  override def zero: RankBuf = RankBuf(0L, 0L, Long.MaxValue)

  override def reduce(b: RankBuf, h: RankHit): RankBuf =
    if (h.relevant) RankBuf(b.sum + h.rank, b.n + 1, math.min(b.first, h.rank))
    else b

  override def merge(a: RankBuf, b: RankBuf): RankBuf =
    RankBuf(a.sum + b.sum, a.n + b.n, math.min(a.first, b.first))

  override def finish(b: RankBuf): RankMetrics =
    if (b.n == 0) RankMetrics(zone.toDouble, zone, 0L)
    else RankMetrics(b.sum.toDouble / b.n, b.first, b.n)

  override def bufferEncoder: Encoder[RankBuf] = Encoders.product[RankBuf]
  override def outputEncoder: Encoder[RankMetrics] = Encoders.product[RankMetrics]
}
