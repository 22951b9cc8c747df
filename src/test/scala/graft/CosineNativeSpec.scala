package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** The native codegen cosine kernel must be bit-identical to the HOF
  * formulation (same sequential fold) — this is what carries the DuckDB
  * oracle parity over to the fast path. */
class CosineNativeSpec extends SparkSpec {

  test("native kernel is bit-identical to the HOF fold on all pairs") {
    val e = Tables.embeddings(spark, sfDir).limit(60)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
    val diff = pairs.select(
      VectorOps.cosine(col("ea"), col("eb")).as("native"),
      VectorOps.cosineHof(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
      .count()
    assert(diff === 0)
  }

  test("interpreted eval path agrees too") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val Row = df.select(
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")).head()
    assert(Row.getDouble(0) === Row.getDouble(1))
    assert(math.abs(Row.getDouble(0) - 10.0 / 14.0) < 1e-12)
  }

  test("length mismatch yields NULL, matching the HOF null-padding") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f)))
      .toDF("a", "b")
    val row = df.select(
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    // codegen and interpreted paths agree on the mismatch too
    val interp = graft.functions.CosineSimilarity(
      org.apache.spark.sql.graftx.Bridge.expression(col("a")),
      org.apache.spark.sql.graftx.Bridge.expression(col("b")))
    assert(interp.nullable)
  }

  test("zero vector yields NULL from both native and HOF paths") {
    // Cosine is undefined on a zero-norm vector: the native kernel
    // null-guards the norms and the HOF formulation nullif-guards the
    // denominator, so both agree on NULL across the full input domain
    // (no ANSI DIVIDE_BY_ZERO, no NaN leaking into score thresholds).
    import spark.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero left
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f)), // zero right
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f))  // both zero
    ).toDF("a", "b")
    val rows = df.select(
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")).collect()
    rows.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }
}
