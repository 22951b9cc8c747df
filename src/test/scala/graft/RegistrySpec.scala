package graft

/** Smoke: every registered query runs on sf0.001 and yields rows with the
  * declared column names; names are unique; every oracle references only
  * fixture tables or inline VALUES. */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and nonempty") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size, "duplicate query names")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows on sf0.001") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        val n = q.fn(spark, sfDir).count()
        if (n > 0) None else Some(s"${q.name}: 0 rows")
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL contains no null interpolations") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("null)null"), s"$name oracle corrupt")
      assert(!sql.toLowerCase.contains("with null"), s"$name oracle corrupt")
    }
  }
}
