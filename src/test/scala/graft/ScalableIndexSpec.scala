package graft

import org.apache.spark.sql.functions._
import graft.operators.ScalableIndex

/** The partition-offset dense index must agree exactly with the
  * single-partition window form (`zip_with_index`) — same total order,
  * same dense 0-based indices — while never materializing a global sort
  * in one task.
  */
class ScalableIndexSpec extends SparkSpec {

  test("withDenseIndex matches the windowed row_number form exactly") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val scalable = ScalableIndex.withDenseIndex(docs, "doc_id", numParts = 7)
      .select(col("doc_id"), col("idx"))
    val windowed = SparkEntry.registry.find(_.name == "zip_with_index").get
      .fn(spark, sfDir).select(col("doc_id"), col("idx"))
    assert(scalable.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(scalable).count() === 0)
  }

  test("indices are dense from 0 regardless of partition count") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    for (p <- Seq(1, 3, 16)) {
      val idx = ScalableIndex.withDenseIndex(docs, "doc_id", p)
      val n = idx.count()
      val stats = idx.agg(min("idx"), max("idx"),
        countDistinct("idx")).head
      assert(stats.getLong(0) === 0L)
      assert(stats.getLong(1) === n - 1)
      assert(stats.getLong(2) === n)
    }
  }
}
