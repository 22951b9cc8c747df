package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` doorway graft's DSv1 streaming sink needs —
  * the same package-shim technique Delta and other external
  * connectors use.  `Sink.addBatch` hands the micro-batch behind a
  * STREAMING logical plan; any new query over it (the upsert's joins)
  * trips the batch-query checker, so it must be rebased onto a batch
  * `LogicalRDD` built from the ALREADY-PLANNED incremental execution —
  * exactly the conversion `ForeachBatchSink` applies before invoking
  * user code.  Nothing else in this repository lives outside the
  * `graft` namespace. */
object GraftShims {
  def streamingBatchToBatchDF(data: DataFrame): DataFrame = {
    val classic = data.asInstanceOf[ClassicDataset[Row]]
    ClassicDataset.ofRows(classic.sparkSession,
      LogicalRDD.fromDataset(classic.queryExecution.toRdd, classic,
        isStreaming = false))
  }
}
