package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 11b: embedding whitening — applying the
  * per-dimension statistics (embedding_dim_stats' substrate) back onto
  * every vector, the standardization pass retrieval stacks run before
  * indexing when raw encoder outputs have anisotropic dimensions.
  */
object Curation17Queries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "embedding_whiten",
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          floor(element_at(col("embedding"), 1).cast("double") * 1000)
            .cast("long").as("x0"),
          floor(element_at(col("embedding"), 2).cast("double") * 1000)
            .cast("long").as("x1"))
        val m = e.agg(count(lit(1)).as("n"),
          sum(col("x0")).as("s0"), sum(col("x0") * col("x0")).as("ss0"),
          sum(col("x1")).as("s1"), sum(col("x1") * col("x1")).as("ss1"))
        e.crossJoin(broadcast(m))
          .select(col("vec_id"),
            floor((col("n") * col("x0") - col("s0")).cast("double") *
              1000 / sqrt((col("n") * col("ss0") - col("s0") * col("s0"))
                .cast("double"))).cast("bigint").as("z0_e3"),
            floor((col("n") * col("x1") - col("s1")).cast("double") *
              1000 / sqrt((col("n") * col("ss1") - col("s1") * col("s1"))
                .cast("double"))).cast("bigint").as("z1_e3"))
      },
      Some("""WITH e AS (
        |  SELECT vec_id,
        |    floor(embedding[1]::DOUBLE * 1000)::BIGINT AS x0,
        |    floor(embedding[2]::DOUBLE * 1000)::BIGINT AS x1
        |  FROM embeddings),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(x0)::BIGINT AS s0, sum(x0*x0)::BIGINT AS ss0,
        |    sum(x1)::BIGINT AS s1, sum(x1*x1)::BIGINT AS ss1
        |  FROM e)
        |SELECT vec_id,
        |  floor((n*x0 - s0)::BIGINT::DOUBLE * 1000
        |        / sqrt((n*ss0 - s0*s0)::BIGINT::DOUBLE))::BIGINT AS z0_e3,
        |  floor((n*x1 - s1)::BIGINT::DOUBLE * 1000
        |        / sqrt((n*ss1 - s1*s1)::BIGINT::DOUBLE))::BIGINT AS z1_e3
        |FROM e, m""".stripMargin),
      "Per-dimension whitening of the first two embedding components: " +
        "z = (n*x - sx) / sqrt(n*sxx - sx^2) from exact fixed-point " +
        "integer moments (the scale-free form of (x-mean)/sd, no " +
        "mean float ever materialized), floored at e3 — " +
        "standardization applied corpus-wide as one broadcast of a " +
        "1-row moment table onto a narrow scan. Extending to all 64 " +
        "dims is the same plan with 64 moment columns; diagonal " +
        "whitening only (full ZCA needs the covariance eigenbasis — " +
        "pca_power_iteration's territory)."),
  )
}
