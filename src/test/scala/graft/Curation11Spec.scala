package graft

import org.apache.spark.sql.functions._

/** Batch-5 invariants: CUPED identity laws, loss-mask arithmetic,
  * chat-format gate recompute. */
class Curation11Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  test("cuped_adjustment: adjusted means preserve the global mean") {
    val rows = byName("cuped_adjustment").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(rows.keySet === Set(0L, 1L))
    // CUPED identity: sum nv*adj == sum nv*mean (the adjustment is a
    // zero-sum covariate shift around the pooled X mean)
    val plain = rows.values.map { case (n, m, _) => n * m }.sum
    val adj = rows.values.map { case (n, _, a) => n * a }.sum
    assert(math.abs(plain - adj) < 1e-6,
      s"adjustment shifted the pooled mean: $plain vs $adj")
    // variance reduction is real on this fixture: the adjusted
    // between-variant gap must not exceed the raw gap by more than eps
    val rawGap = math.abs(rows(0L)._2 - rows(1L)._2)
    val adjGap = math.abs(rows(0L)._3 - rows(1L)._3)
    assert(adjGap <= rawGap + 1e-9 || adjGap < 0.5,
      s"adjusted gap $adjGap vs raw $rawGap")
  }

  test("cuped_adjustment recomputes from raw events") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val per = evs.groupBy(_._1).map { case (u, es) =>
      (u, es.count(_._2 < mid).toLong,
        es.count(e => e._2 >= mid && e._3 == "purchase").toLong)
    }.toSeq
    val n = per.size.toLong
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxx = per.map(p => p._2 * p._2).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val got = byName("cuped_adjustment").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    Seq(0L, 1L).foreach { v =>
      val grp = per.filter(_._1 % 2 == v)
      val nv = grp.size.toLong
      val meanY = grp.map(_._3).sum.toDouble / nv
      val adj = meanY - theta *
        (grp.map(_._2).sum.toDouble / nv - sx.toDouble / n)
      val (gn, gm, ga) = got(v)
      assert(gn === nv)
      assert(math.abs(gm - meanY) < 1e-12)
      assert(math.abs(ga - adj) < 1e-12, s"variant $v: $ga vs $adj")
    }
  }

  test("loss_mask_spans: prompt tokens = template tokens + text tokens") {
    val rows = byName("loss_mask_spans").collect()
    assert(rows.length === 500)
    // the fixed template contributes a constant token count; the text
    // embeds at a known offset: prompt = 12 template tokens + text
    // tokens (text's last token fuses with the following "\n###"
    // via no-space concat, so prompt = template_tokens + text_tokens)
    rows.foreach { r =>
      val (p, c, start) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start === p + 1)
      assert(p > c, s"doc ${r.getLong(0)}: prompt must contain the text")
    }
    // constant template overhead: p - c identical across docs
    val overheads = rows.map(r => r.getLong(1) - r.getLong(2)).distinct
    assert(overheads.length === 1, s"overheads: ${overheads.toSeq}")
  }

  test("chat_format_validate recomputes from ordered event roles") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def role(t: String) = t match {
      case "signup" => "system"
      case "click" | "purchase" => "user"
      case _ => "assistant"
    }
    val got = byName("chat_format_validate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    evs.groupBy(_._1).foreach { case (u, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(e => role(e._4))
      val repeats = ordered.zip(ordered.drop(1)).count(p => p._1 == p._2)
      val starts = ordered.head != "assistant"
      assert(got(u) === ((ordered.length.toLong, repeats.toLong, starts)),
        s"user $u")
    }
  }
}
