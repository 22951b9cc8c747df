package graft

import org.apache.spark.sql.functions._
import graft.functions.{DimStats, VectorMomentsAgg}

/** The one-pass typed vector-moments aggregate must reproduce the
  * oracle-checked posexplode pipeline (`embedding_dim_stats`) exactly —
  * same fixed-point grid, same integer moments, same final IEEE op
  * order — at 1/64th the shuffle rows. This is the documented 100 TB
  * swap-in for that query.
  */
class VectorMomentsSpec extends SparkSpec {

  test("VectorMomentsAgg matches embedding_dim_stats bit-for-bit") {
    import spark.implicits._
    val agg = new VectorMomentsAgg(64)
    val typed: Map[Long, DimStats] = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).as[Array[Float]]
      .select(agg.toColumn)
      .head()
      .map(s => s.dim -> s).toMap

    val sql = SparkEntry.registry.find(_.name == "embedding_dim_stats").get
      .fn(spark, sfDir).collect()
    assert(sql.length === 64)
    sql.foreach { r =>
      val d = typed(r.getAs[Long]("dim"))
      assert(d.n === r.getAs[Long]("n"))
      assert(d.mean === r.getAs[Double]("mean"), s"mean dim ${d.dim}")
      assert(d.variance === r.getAs[Double]("variance"), s"var dim ${d.dim}")
      assert(d.min_e3 === r.getAs[Long]("min_e3"))
      assert(d.max_e3 === r.getAs[Long]("max_e3"))
    }
  }

  test("buffer merge is order-independent: repartitioned input agrees") {
    import spark.implicits._
    val agg = new VectorMomentsAgg(64)
    val base = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).as[Array[Float]]
    val a = base.coalesce(1).select(agg.toColumn).head()
    val b = base.repartition(13).select(agg.toColumn).head()
    assert(a.map(_.toString).mkString("|") === b.map(_.toString).mkString("|"))
  }
}
