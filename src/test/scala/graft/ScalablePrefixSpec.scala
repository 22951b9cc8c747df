package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{ScalableIndex, ScalablePrefix}

/** The partition-offset running sums must agree exactly with the
  * single-partition `sum().over(Window.orderBy(...))` form — inclusive
  * prefix, same total order — while never funneling the input through
  * one task, for any partition count.
  */
class ScalablePrefixSpec extends SparkSpec {

  test("withRunningSums matches the unpartitioned window form exactly") {
    // histogram of document lengths: distinct keys, two count columns
    val hist = Tables.documents(spark, sfDir)
      .groupBy(col("n_chars").as("v"))
      .agg(count(when(col("lang") === "en", 1)).as("ce"),
        count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = hist
      .withColumn("cum_ce", sum(col("ce")).over(w))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .select("v", "cum_ce", "cum_cnt")
    for (p <- Seq(1, 3, 8)) {
      val scalable = ScalablePrefix
        .withRunningSums(hist, Seq(col("v")), Seq("ce", "cnt"), p)
        .select("v", "cum_ce", "cum_cnt")
      assert(scalable.exceptAll(windowed).count() === 0, s"parts=$p")
      assert(windowed.exceptAll(scalable).count() === 0, s"parts=$p")
    }
  }

  test("descending order keys and row-level totals also agree") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), lit(1L).as("one"))
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = rows.withColumn("cum_one", sum(col("one")).over(w))
      .select("doc_id", "cum_one")
    val scalable = ScalablePrefix.withRunningSums(rows,
      Seq(col("n_chars").desc, col("doc_id")), Seq("one"), 5)
      .select("doc_id", "cum_one")
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
  }

  test("exclusive running max/min match the strictly-preceding window " +
    "frame, including the leading NULL") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
    val frame = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val windowed = rows
      .withColumn("pmax", max(col("n_chars")).over(frame))
      .withColumn("pmin", min(col("n_chars")).over(frame))
      .select("doc_id", "pmax", "pmin")
    for (p <- Seq(1, 4)) {
      val scalable = graft.operators.ScalablePrefix.withRunningAggs(rows,
        Seq(col("n_chars").desc, col("doc_id")),
        Seq("n_chars" -> "max", "n_chars" -> "min"), p, exclusive = true)
      // duplicate source column: second output name collides, so rename
      // via position — schema is [doc_id, n_chars, cum_n_chars, cum_n_chars]
      val cols = scalable.columns
      val out = scalable.toDF(cols.dropRight(2) ++ Seq("pmax", "pmin"): _*)
        .select("doc_id", "pmax", "pmin")
      assert(out.exceptAll(windowed).count() === 0, s"parts=$p")
      assert(windowed.exceptAll(out).count() === 0, s"parts=$p")
    }
  }

  test("multi-column dense index matches windowed row_number with desc keys") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
    val windowed = docs.withColumn("rn",
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id")))
        .cast("long") - 1)
      .select("doc_id", "rn")
    val scalable = ScalableIndex.withDenseIndex(docs,
      Seq(col("n_chars").desc, col("doc_id")), 6, "idx")
      .select(col("doc_id"), col("idx").as("rn"))
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
  }
}
