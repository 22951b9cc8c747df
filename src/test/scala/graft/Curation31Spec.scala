package graft

import org.apache.spark.sql.functions._

/** Batch-25 invariants: every monitor recomputed from collected rows. */
class Curation31Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("schema_drift_detect: exact per-snapshot profiles and flag law") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3).toString))
    def profile(vs: Seq[String]) = {
      val counts = vs.groupBy(identity).view.mapValues(_.length.toLong)
      val tot = vs.length.toLong
      (counts.size.toLong, counts.values.map(c => 1000L * c / tot).max,
        tot, 1000L * vs.map(_.length.toLong).sum / tot)
    }
    val cols = Map[String, Long => Seq[String]](
      "lang" -> (p => docs.filter(_._1 % 2 == p).map(_._2).toSeq),
      "source" -> (p => docs.filter(_._1 % 2 == p).map(_._3).toSeq),
      "n_chars" -> (p => docs.filter(_._1 % 2 == p).map(_._4).toSeq))
    val got = byName("schema_drift_detect").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === cols.keySet)
    cols.foreach { case (name, f) =>
      val (da, ta, na, la) = profile(f(0))
      val (db, tb, nb, lb) = profile(f(1))
      val r = got(name)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((da, ta, na, la)), s"$name snapshot A profile")
      assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ===
        ((db, tb, nb, lb)), s"$name snapshot B profile")
      val drift =
        if (math.abs(da - db) * 10 > da || math.abs(ta - tb) > 100) 1L
        else 0L
      assert(r.getLong(9) === drift, s"$name drift flag")
    }
  }

  test("expectation_suite_eval: recompute all five expectations") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    val n = docs.length.toLong
    val expected = Map(
      "n_chars_range" ->
        docs.count(d => d._4 < 80 || d._4 > 2000).toLong,
      "lang_domain" ->
        docs.count(d => !Set("en", "de", "fr", "es", "zh")(d._2)).toLong,
      "text_nonblank" -> docs.count(_._5.trim.isEmpty).toLong,
      "doc_id_unique" -> (n - docs.map(_._1).distinct.length),
      "source_cardinality" ->
        math.max(0L, docs.map(_._3).distinct.length.toLong - 25))
    val got = byName("expectation_suite_eval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (e, fails) =>
      assert(got(e) === ((n, fails, if (fails == 0) 1L else 0L)),
        s"expectation $e")
    }
  }

  test("event_disorder_metric: exact footrule per user") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = byName("event_disorder_metric").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    ev.groupBy(_._1).foreach { case (u, es) =>
      val byArr = es.sortBy(_._2).map(_._2).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      val byTs = es.sortBy(e => (e._3, e._2)).map(_._2).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      val foot = es.map(e => math.abs(byArr(e._2) - byTs(e._2))).sum
      val maxd = es.map(e => math.abs(byArr(e._2) - byTs(e._2))).max
      val nE = es.length.toLong
      val pm = 1000L * foot / math.max(nE * nE / 2, 1L)
      assert(got(u) === ((nE, foot, maxd, pm)), s"user $u disorder")
    }
  }

  test("freshness_lag_audit: exact lags and staleness flags") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val horizon = ev.map(_._2).max
    val got = byName("freshness_lag_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toMap
    ev.groupBy(_._1).foreach { case (t, es) =>
      val last = es.map(_._2).max
      val first = es.map(_._2).min
      val lag = (horizon - last) / 60000000L
      val nLastDay = es.count(_._2 >= horizon - 86400000000L).toLong
      assert(got(t) === ((es.length.toLong, nLastDay, lag,
        if (lag > 120) 1L else 0L)), s"type $t freshness")
    }
  }
}
