package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipelines.CurationPipeline

/** The composed curation pipeline: monotone stage counts, exact-dup
  * elimination, split integrity of the written output, and observe()
  * metrics agreeing with the files on disk. */
class CurationPipelineSpec extends SparkSpec {

  private lazy val out =
    Files.createTempDirectory("graft_pipeline").toString + "/curated"
  private lazy val result = CurationPipeline.run(spark, sfDir, out)

  test("stage counts are monotone and dedup removes the injected copies") {
    assert(result.ingested > result.afterDedup)
    assert(result.afterDedup >= result.afterNearDup)
    assert(result.afterNearDup >= result.afterQuality)
    assert(result.afterQuality >= result.afterKAnon)
    assert(result.afterKAnon >= result.written)
    // every injected exact duplicate (doc_id + 2000000) must be gone
    val back = spark.read.parquet(out)
    assert(back.filter(col("doc_id") >= 2000000L).count() === 0)
    // the winnowing stage must also kill the 90%-prefix near-dups
    // (+1000000 ids): containment from the short side is ~100%
    assert(back.filter(col("doc_id") >= 1000000L).count() === 0)
    assert(result.afterDedup > result.afterNearDup)
    // and no two rows share text
    assert(back.select(col("text")).distinct().count() === back.count())
  }

  test("k-anonymity: every released quasi-identifier class has >= 3 rows") {
    val back = spark.read.parquet(out)
    val small = back
      .groupBy(col("lang"), expr("(n_chars div 100)").as("kbucket"))
      .agg(count(lit(1)).as("kn"))
      .filter(col("kn") < 3)
    assert(small.count() === 0)
  }

  test("observe metrics match the files written") {
    val back = spark.read.parquet(out)
    assert(back.count() === result.written)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("split=")).map(_.getName).sorted
    assert(dirs.toSeq === Seq("split=test", "split=train", "split=val"))
    // split is the md5 bucket, recomputable from the stable id
    val bad = back.withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100L)))
      .filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
          (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
          (col("bucket") >= 90 && col("split") =!= "test"))
    assert(bad.count() === 0)
  }

  test("quality gates hold on every surviving row") {
    val back = spark.read.parquet(out)
      .withColumn("ntok", size(split(col("text"), " ")))
    assert(back.filter(col("ntok") < 10 || col("ntok") > 2048).count() === 0)
    assert(back.filter(col("n_chars") < col("ntok") * 3 ||
      col("n_chars") > col("ntok") * 13).count() === 0)
  }
}
