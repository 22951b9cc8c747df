package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.LongType

/** Distributed running totals — the 100 TB form of
  * `sum(x).over(Window.orderBy(key))`, whose unpartitioned WindowExec
  * funnels the ENTIRE input through one task (the named scale-killer in
  * the order-statistic query family).
  *
  * Shape: range-partition by the total-order key(s) so partition i holds
  * strictly smaller keys than partition i+1, and sort within partitions —
  * the same single range exchange the window's global sort would have
  * needed anyway, but WITHOUT the collapse to one partition. Then two
  * narrow passes over the shuffled data:
  *
  *   pass 1:  per-partition totals of each sum column — numParts rows to
  *            the driver, prefix-summed there (numParts is plan-time
  *            bounded, independent of data volume);
  *   pass 2:  re-reads the SAME shuffle output (Spark reuses the shuffle
  *            files across jobs on one lineage, so the map stage does not
  *            re-run — the identical mechanism RDD.zipWithIndex uses) and
  *            emits every row with its INCLUSIVE running sums
  *            = partition offset + within-partition prefix.
  *
  * No task ever holds more than its own range partition; the driver holds
  * numParts longs, not data. Callers needing the exclusive form subtract
  * the row's own value.
  *
  * Contract: `orderCols` must be a TOTAL order over the rows (append a
  * unique tiebreaker), else the prefix within a tie run is placement-
  * dependent; each name in `sumCols` must be a non-null LongType column
  * (integer sums are reduce-order-independent, which is what keeps the
  * result bit-identical to the single-partition window and to DuckDB).
  */
object ScalablePrefix {

  /** Inclusive running sums — see [[withRunningAggs]]. */
  def withRunningSums(df: DataFrame, orderCols: Seq[Column],
      sumCols: Seq[String], numParts: Int,
      prefix: String = "cum_"): DataFrame =
    withRunningAggs(df, orderCols, sumCols.map(_ -> "sum"), numParts,
      exclusive = false, prefix)

  /** Running aggregates over a total order without an unpartitioned
    * window. Each `(col, op)` with op in {"sum", "max", "min"} yields a
    * `prefix+col` column holding the running value in `orderCols`
    * order; `exclusive = true` aggregates strictly-preceding rows only
    * (the `rowsBetween(unboundedPreceding, -1)` frame), yielding NULL
    * on the first row — exactly the windowed semantics.
    */
  def withRunningAggs(df: DataFrame, orderCols: Seq[Column],
      aggs: Seq[(String, String)], numParts: Int,
      exclusive: Boolean = false, prefix: String = "cum_"): DataFrame = {
    val sorted = df
      .repartitionByRange(numParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val idxs = aggs.map { case (c, _) => sorted.schema.fieldIndex(c) }.toArray
    val ops: Array[(Long, Long) => Long] = aggs.map {
      case (_, "sum") => (a: Long, b: Long) => a + b
      case (_, "max") => (a: Long, b: Long) => math.max(a, b)
      case (_, "min") => (a: Long, b: Long) => math.min(a, b)
      case (_, op) => throw new IllegalArgumentException(s"op $op")
    }.toArray
    val nA = idxs.length
    // accumulator = (rows merged so far, values); n == 0 emits NULL
    final case class Acc(n: Long, vs: Array[Long])
    def empty = Acc(0L, new Array[Long](nA))
    def mergeRow(a: Acc, r: InternalRow): Acc = {
      val vs =
        if (a.n == 0L) Array.tabulate(nA)(j => r.getLong(idxs(j)))
        else Array.tabulate(nA)(j => ops(j)(a.vs(j), r.getLong(idxs(j))))
      Acc(a.n + 1, vs)
    }
    def mergeAcc(a: Acc, b: Acc): Acc =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else Acc(a.n + b.n, Array.tabulate(nA)(j => ops(j)(a.vs(j), b.vs(j))))
    // internal representation throughout: pass 1 only reads long fields
    // (no conversion at all), pass 2 emits one UnsafeRow buffer copy
    // joined to the running values — both jobs share the lazy toRdd, so
    // the range shuffle is written once and re-read
    val rdd = sorted.queryExecution.toRdd
    val perPart = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(pid -> it.foldLeft(empty)(mergeRow))
    }.collect()
    val offsets = new Array[Acc](rdd.getNumPartitions)
    var run = empty
    perPart.sortBy(_._1).foreach { case (pid, tot) =>
      offsets(pid) = run
      run = mergeAcc(run, tot)
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = aggs.foldLeft(sorted.schema) { case (s, (c, _)) =>
      s.add(prefix + c, LongType, nullable = exclusive)
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val pre = acc
        acc = mergeRow(acc, r)
        val emit = if (exclusive) pre else acc
        val tail = new Array[Any](nA)
        if (emit.n != 0L) {
          var j = 0
          while (j < nA) { tail(j) = emit.vs(j); j += 1 }
        }
        new JoinedRow(r.copy(), new GenericInternalRow(tail)): InternalRow
      }
    }
    Bridge.internalDataFrame(df.sparkSession, out, outSchema)
  }
}
