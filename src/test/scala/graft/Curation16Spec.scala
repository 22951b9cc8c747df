package graft

import org.apache.spark.sql.functions._

/** Batch-10 invariants: the BPE training loop against a sequential
  * driver-side reference implementation. */
class Curation16Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  /** Sequential BPE reference: same charify, same padded left-to-right
    * non-overlapping merge application. */
  private def bpeRef(texts: Seq[String], rounds: Int): Seq[(String, Long)] = {
    var seqs = texts.map(t =>
      " " + t.replace(" ", "_").flatMap(c => s"$c "))
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[String, Long]()
      seqs.foreach { s =>
        val t = s.trim.split(" ", -1)
        t.zip(t.drop(1)).foreach { case (a, b) =>
          val p = s"$a $b"
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      }
      val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      out += ((pair, cnt))
      seqs = seqs.map(_.replace(s" $pair ", " " + pair.replace(" ", "") + " "))
    }
    out.toSeq
  }

  test("bpe_train_merges equals the sequential reference loop") {
    val texts = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 100).orderBy(col("doc_id"))
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val want = bpeRef(texts, 5)
    val got = byName("bpe_train_merges").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.length === 5)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"merge ${i + 1}")
    }
    // structural laws: merged pairs are two nonempty symbols; later
    // merges may reference earlier merged symbols (that's the point)
    got.foreach { case (pair, cnt) =>
      val parts = pair.split(" ")
      assert(parts.length === 2 && parts.forall(_.nonEmpty))
      assert(cnt > 1, s"a singleton pair should never win: $pair")
    }
  }
}
