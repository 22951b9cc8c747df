package graft

import org.apache.spark.sql.functions._

/** Batch-48 invariants: ExactSubstr span replay and IVF-PQ ADC replay —
  * both recomputed independently on the driver from the raw fixtures. */
class Curation48Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  // ---- driver-side replica of the exact_substring_spans pipeline ----
  private lazy val spanExpected: Set[(Long, Long, Long, Long)] = {
    val k = 5
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.filter(_._1 % 20 == 0).map { case (id, t) =>
      val toks = t.split(" ", -1)
      (id + 10000L, toks.slice(3, 43).mkString(" "))
    }
    val grams = corpus.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      if (toks.length < k) Seq.empty
      else (0 to toks.length - k).map(i =>
        (id, i.toLong, toks.slice(i, i + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .keySet
    val hits = grams.filter(g => dup(g._3)).map(g => (g._1, g._2))
    hits.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      // gaps-and-islands: split where the gap between consecutive
      // duplicated gram starts exceeds k
      val islands = sorted.foldLeft(List.empty[List[Long]]) {
        case (Nil, p) => List(List(p))
        case (cur :: rest, p) =>
          if (p - cur.head <= k) (p :: cur) :: rest
          else List(p) :: cur :: rest
      }.map(_.reverse).reverse
      islands.map(is =>
        (id, is.min, is.max + (k - 1), is.size.toLong))
    }.toSet
  }

  test("exact_substring_spans: exact driver replay") {
    val got = byName("exact_substring_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === spanExpected)
  }

  test("exact_substring_spans: every injected quotation is localized " +
    "on both sides") {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // quote docs with at least k tokens exist for these base ids
    val quoted = base.filter { case (id, t) =>
      id % 20 == 0 && t.split(" ", -1).slice(3, 43).length >= 5
    }.map(_._1)
    val gotDocs = spanExpected.map(_._1)
    quoted.foreach { id =>
      assert(gotDocs.contains(id), s"base doc $id has no span")
      assert(gotDocs.contains(id + 10000L), s"quote of $id has no span")
    }
    // the base doc's span must cover the quoted token range start (pos 3)
    quoted.foreach { id =>
      val spans = spanExpected.filter(_._1 == id)
      assert(spans.exists(s => s._2 <= 3 && s._3 >= 7),
        s"doc $id: no span covering the quoted prefix grams")
    }
  }

  // ------------- driver-side replica of the IVF-PQ search path -------
  private lazy val ivfPqExpected: Seq[(Long, Long, Long, Long)] = {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)
          .toArray))
      .sortBy(_._1)
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = vecs.filter(_._1 % 31 == 7)
    def nearestList(qe: Array[Long]): Long =
      cents.map { case (cid, cv) => (sq(qe, cv), cid) }.min._2
    val assign = vecs.map { case (id, qe) => (id, nearestList(qe)) }.toMap
    val cb = vecs.filter(_._1 < 8).map { case (cid, qe) =>
      (cid, (0 until 4).map(m => qe.slice(m * 16, m * 16 + 16)))
    }
    def codesOf(qe: Array[Long]): Array[Long] =
      (0 until 4).map { m =>
        val sv = qe.slice(m * 16, m * 16 + 16)
        cb.map { case (cid, subs) => (sq(sv, subs(m)), cid) }.min._2
      }.toArray
    val codes = vecs.map { case (id, qe) => (id, codesOf(qe)) }.toMap
    val queries = vecs.filter(_._1 < 6)
    queries.flatMap { case (qid, qe) =>
      val probed = cents.map { case (cid, cv) => (sq(qe, cv), cid) }
        .sorted.take(2).map(_._2).toSet
      val dt = (0 until 4).map { m =>
        val sv = qe.slice(m * 16, m * 16 + 16)
        cb.map { case (cid, subs) => cid -> sq(sv, subs(m)) }.toMap
      }
      val cand = vecs.map(_._1)
        .filter(id => id != qid && probed(assign(id)))
      cand.map { id =>
        val adc = (0 until 4).map(m => dt(m)(codes(id)(m))).sum
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }.take(5).zipWithIndex
        .map { case ((id, adc), i) => (qid, id, (i + 1).toLong, adc) }
    }.toSeq
  }

  test("ivf_pq_topk: exact driver replay") {
    val got = byName("ivf_pq_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq === ivfPqExpected.sortBy(t => (t._1, t._3)))
  }

  test("ivf_pq_topk: ranks dense from 1, distances nondecreasing") {
    val byQ = ivfPqExpected.groupBy(_._1)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to sorted.size.toLong))
      assert(sorted.map(_._4) === sorted.map(_._4).sorted)
    }
  }
}
