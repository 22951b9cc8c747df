package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/** V2–V4 vector math invariants on the embeddings fixture. */
class VectorOpsSpec extends SparkSpec {

  test("l2Normalize yields unit norm") {
    val bad = Tables.embeddings(spark, sfDir)
      .select(norm2(transform(l2Normalize(col("embedding")),
        _.cast("float"))).as("n2"))
      .filter(abs(col("n2") - 1.0) > 1e-4)
      .count()
    assert(bad === 0)
  }

  test("cosine is 1 on self, symmetric, and in [-1, 1]") {
    val self = Tables.embeddings(spark, sfDir)
      .select(cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(self === 0)

    val e = Tables.embeddings(spark, sfDir).limit(30)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
    val asym = pairs.select(
      (cosine(col("ea"), col("eb")) - cosine(col("eb"), col("ea"))).as("d"))
      .filter(abs(col("d")) > 1e-12).count()
    assert(asym === 0)
    val range = pairs.select(cosine(col("ea"), col("eb")).as("c"))
      .filter(col("c") > 1.0000001 || col("c") < -1.0000001).count()
    assert(range === 0)
  }

  test("meanPool equals arithmetic mean") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 6.0f))).toDF("id", "v")
    val m = df.select(meanPool(col("v"))).as[Double].head()
    assert(m === 3.0)
  }
}
