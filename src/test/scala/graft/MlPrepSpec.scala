package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the training-set preparation operators:
  * partition laws (counts conserve), exact-subset properties, and
  * driver-side recomputation of the encodings. */
class MlPrepSpec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("kfold_assign: 5 folds partition each stratum") {
    val rows = byName("kfold_assign").collect()
    assert(rows.map(_.getLong(1)).forall(f => f >= 0 && f < 5))
    val perLang = rows.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    val expect = Tables.documents(spark, sfDir).groupBy(col("lang"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == expect)
  }

  test("class_balance_downsample: exactly min-class-count rows per label, " +
    "drawn from the original table") {
    val kept = byName("class_balance_downsample")
    val counts = Tables.embeddings(spark, sfDir).groupBy(col("label"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val keptCounts = kept.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(keptCounts.keySet == counts.keySet)
    keptCounts.values.foreach(n => assert(n == nMin))
    // membership: every kept (vec_id, label) exists in the source
    val bad = kept.join(Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")), Seq("vec_id", "label"),
      "left_anti").count()
    assert(bad == 0)
  }

  test("feature_hash_vec: bin counts conserve token mass, bins in [0,64)") {
    val fh = byName("feature_hash_vec")
    assert(fh.filter(col("bin") < 0 || col("bin") >= 64).count() == 0)
    val perDoc = fh.groupBy(col("doc_id")).agg(sum(col("cnt")).as("m"))
    val expect = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("m"))
    assert(perDoc.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(perDoc).count() == 0)
  }

  test("target_encode_loo matches driver-side recompute") {
    val got = byName("target_encode_loo").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sums = docs.groupBy(_._2).map { case (l, rs) =>
      l -> (rs.map(_._3).sum, rs.length.toLong)
    }
    docs.foreach { case (id, l, x) =>
      val (slang, n) = sums(l)
      if (n > 1) {
        val expect = (1000L * (slang - x)) / (n - 1)
        assert(got(id) == (l, expect), s"doc $id")
      }
    }
  }

  test("ewma_halflife: bounded by window extremes and matches recompute") {
    val got = byName("ewma_halflife").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("v100"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    events.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3.getTime, e._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 15), i + 1).map(_._4)
        val num = frame.zipWithIndex.map { case (x, j) => x * (1L << j) }.sum
        val den = (1L << frame.length) - 1
        val expect = num / den
        assert(got(ordered(i)._1) == expect,
          s"event ${ordered(i)._1}: got ${got(ordered(i)._1)}, want $expect")
        assert(expect >= frame.min - 1 && expect <= frame.max)
      }
    }
  }

  test("flesch_reading_grade matches a scala recompute per document") {
    val got = byName("flesch_reading_grade").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().foreach { r =>
        val words = r.getString(1).split(" ").length.toLong
        val syll = "[aeiouy]+".r.findAllIn(r.getString(1)).length.toLong
        val grade = 390 * words + (11800 * syll) / words - 15590
        assert(got(r.getLong(0)) == ((words, syll, grade)))
      }
  }
}
