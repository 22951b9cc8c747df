package graft

import org.apache.spark.sql.functions._

/** Spark 4 SQL-surface pins: declarative features a SQL-first user of
  * the engine reaches for — SQL-defined scalar functions (CREATE
  * FUNCTION ... RETURN), the |> pipe syntax, and parameterized
  * spark.sql — each checked for result parity against the equivalent
  * DataFrame formulation over the fixtures. */
class Spark4SqlSpec extends SparkSpec {

  private def docs() = {
    Tables.documents(spark, sfDir).createOrReplaceTempView("s4_docs")
  }

  test("SQL-defined scalar function (CREATE FUNCTION ... RETURN) " +
    "matches the Column formulation") {
    docs()
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION s4_density(
      |  n_chars BIGINT, toks BIGINT) RETURNS BIGINT
      |  RETURN (n_chars * 1000) DIV greatest(toks, 1)""".stripMargin)
    val viaSql = spark.sql(
      """SELECT doc_id, s4_density(n_chars,
        |  size(split(text, ' '))) AS d FROM s4_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCols = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("(n_chars * 1000) div greatest(size(split(text, ' ')), 1)")
          .cast("long").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaCols)
    assert(viaSql.nonEmpty)
  }

  test("SQL pipe syntax (|>) matches the nested formulation") {
    docs()
    val piped = spark.sql(
      """FROM s4_docs
        ||> WHERE lang = 'en'
        ||> AGGREGATE count(*) AS n, sum(n_chars) AS chars GROUP BY source
        ||> WHERE n >= 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val nested = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(piped === nested)
    assert(piped.nonEmpty)
  }

  test("SQL session variables (DECLARE / SET VAR) parameterize a query") {
    docs()
    spark.sql("DECLARE OR REPLACE VARIABLE s4_minchars BIGINT DEFAULT 0")
    spark.sql("SET VAR s4_minchars = 120")
    val got = spark.sql(
      "SELECT count(*) FROM s4_docs WHERE n_chars >= s4_minchars")
      .collect().head.getLong(0)
    val expected = Tables.documents(spark, sfDir)
      .filter(col("n_chars") >= 120).count()
    assert(got === expected)
    assert(got > 0L)
  }

  test("collated comparison (UTF8_LCASE) matches lower()-normalized " +
    "equality and grouping") {
    val mixed = spark.createDataFrame(Seq(
      ("EN", 1L), ("en", 2L), ("En", 3L), ("de", 4L), ("DE", 5L)))
      .toDF("lang", "v")
    // case-insensitive grouping via collation — no lower() rewrite
    val collated = mixed
      .groupBy(expr("collate(lang, 'UTF8_LCASE')").as("lang"))
      .agg(sum(col("v")).as("s"))
      .collect().map(r => r.getString(0).toLowerCase -> r.getLong(1)).toMap
    val viaLower = mixed.groupBy(lower(col("lang")).as("lang"))
      .agg(sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collated === viaLower)
    assert(collated.keySet === Set("en", "de"))
    // and collated equality in a filter
    val n = mixed.filter(
      expr("collate(lang, 'UTF8_LCASE') = collate('eN', 'UTF8_LCASE')"))
      .count()
    assert(n === 3L)
  }

  test("parameterized spark.sql binds named parameters safely") {
    docs()
    val got = spark.sql(
      "SELECT count(*) AS n FROM s4_docs WHERE lang = :l AND n_chars >= :m",
      Map("l" -> "en", "m" -> 100))
      .collect().head.getLong(0)
    val expected = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en" && col("n_chars") >= 100).count()
    assert(got === expected)
    assert(got > 0L)
  }
}
