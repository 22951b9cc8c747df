package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  def withRunningSums(df: DataFrame, orderCols: Seq[Column],
      sumCols: Seq[String], numParts: Int,
      prefix: String = "cum_"): DataFrame = {
    val sorted = df
      .repartitionByRange(numParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val idxs = sumCols.map(sorted.schema.fieldIndex).toArray
    val rdd = sorted.rdd
    // pass 1: per-partition column totals -> driver prefix sums
    val perPart = rdd.mapPartitionsWithIndex { (pid, it) =>
      val tot = new Array[Long](idxs.length)
      it.foreach { r =>
        var j = 0
        while (j < idxs.length) { tot(j) += r.getLong(idxs(j)); j += 1 }
      }
      Iterator.single(pid -> tot)
    }.collect()
    val offsets = Array.fill(rdd.getNumPartitions)(new Array[Long](idxs.length))
    val run = new Array[Long](idxs.length)
    perPart.sortBy(_._1).foreach { case (pid, tot) =>
      offsets(pid) = run.clone()
      var j = 0
      while (j < idxs.length) { run(j) += tot(j); j += 1 }
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = sumCols.foldLeft(sorted.schema) { (s, n) =>
      s.add(prefix + n, LongType, nullable = false)
    }
    // pass 2: shuffle-file re-read; emit offset + within-partition prefix
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < idxs.length) { acc(j) += r.getLong(idxs(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ acc.clone())
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }
}
