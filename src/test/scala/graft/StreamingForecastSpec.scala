package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DailyCount, Streams}

/** Streaming Holt refresh: cross-batch state must land on exactly the
  * batch query's model regardless of how the day stream is chunked. */
class StreamingForecastSpec extends SparkSpec {

  test("holtRefresh converges to the batch holt_linear_forecast state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // day-level counts recomputed from the fixture (dense from di 0)
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
    val d0 = rows.map(_._2).min
    val nd = (rows.map(_._2).max - d0 + 1).toInt
    val types = rows.map(_._1).distinct
    val counts = rows.groupBy(r => (r._1, r._2 - d0))
      .map { case (k, v) => k -> v.length.toLong }
    val days = for {
      t <- types; i <- 0 until nd
    } yield DailyCount(t, i.toLong, counts.getOrElse((t, i.toLong), 0L))

    // feed in three uneven chunks to force cross-batch state
    val mem = MemoryStream[DailyCount]
    val sorted = days.sortBy(dc => (dc.di, dc.event_type))
    mem.addData(sorted.take(7): _*)
    mem.addData(sorted.slice(7, 80): _*)
    mem.addData(sorted.drop(80): _*)
    val q = Streams.holtRefresh(mem.toDS().repartition(8))
      .writeStream.format("memory").queryName("holt")
      .outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()

    // last emitted state per series == batch query state
    val got = spark.table("holt")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.maxBy(_._2) }
    val batch = SparkEntry.registry.find(_.name == "holt_linear_forecast")
      .get.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === batch.keySet)
    got.foreach { case (t, (_, thru, l, b, fc1)) =>
      assert(thru === (nd - 1).toLong, s"$t did not consume all days")
      assert((l, b, fc1) === batch(t), s"$t stream/batch state diverged")
    }
  }
}
