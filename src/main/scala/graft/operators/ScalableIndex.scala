package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.LongType

/** Dense global 0-based indexing WITHOUT a single-partition sort — the
  * 100 TB form of the `zip_with_index` query (whose global row_number
  * window funnels everything through one task, fine for ~1e3 outputs,
  * fatal for 1e11).
  *
  * Shape: range-partition by the (unique) order key so partition i holds
  * strictly smaller keys than partition i+1, sort within partitions, then
  * add per-partition offsets (RDD.zipWithIndex: one count job over the
  * partitions + one map with the prefix-sum offsets). Total order is the
  * key order, indices are dense, and no task ever holds more than its
  * partition — the same technique Spark itself uses for
  * `DataFrame.withSequenceColumn`/monotonically-increasing ids, but dense.
  *
  * The append pass runs on the INTERNAL row representation
  * (queryExecution.toRdd + Bridge.internalDataFrame): no external-Row
  * allocation and no CatalystTypeConverters field pass in either
  * direction — each output row is one UnsafeRow buffer copy joined to
  * the index. ScalableIndexSpec proves exact parity with the windowed
  * query on the fixture.
  */
object ScalableIndex {

  def withDenseIndex(df: DataFrame, orderCol: String, numParts: Int,
      idxCol: String = "idx"): DataFrame =
    withDenseIndex(df, Seq(col(orderCol)), numParts, idxCol)

  /** Multi-column form: `orderCols` may mix ascending and `.desc` sort
    * directions (both `repartitionByRange` and `sortWithinPartitions`
    * honor them, so partition i still strictly precedes partition i+1
    * in the requested order). The column set must be a TOTAL order
    * (append a unique tiebreaker) or the index assignment within ties
    * is partition-placement-dependent.
    */
  def withDenseIndex(df: DataFrame, orderCols: Seq[Column], numParts: Int,
      idxCol: String): DataFrame = {
    val sorted = df
      .repartitionByRange(numParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    val rdd = sorted.queryExecution.toRdd.zipWithIndex().map { case (r, i) =>
      // toRdd rows are buffer-reused per partition: snapshot before the
      // downstream operator buffers them
      new JoinedRow(r.copy(), InternalRow(i)): InternalRow
    }
    Bridge.internalDataFrame(df.sparkSession, rdd, schema)
  }
}
