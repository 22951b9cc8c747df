package graft

import org.apache.spark.sql.functions._

/** Batch-51 invariants: binaryFile round-trip byte fidelity against a
  * driver-side digest, and the batch-perceptron epochs replayed
  * exactly. */
class Curation51Spec extends SparkSpec {

  private def byName(name: String) =
    SparkEntry.registry.find(_.name == name).get.fn(spark, sfDir)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  test("scan_binary_roundtrip: every record's bytes survive the file " +
    "fan-out + binaryFile re-ingest") {
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().map { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      (r.getLong(0), md5hex(bytes), bytes.length.toLong)
    }.toSet
    val got = byName("scan_binary_roundtrip").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("perceptron_quality_epochs: exact two-epoch replay") {
    val feats = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect().toSeq
      .map { r =>
        val t = r.getString(2); val toks = t.split(" ", -1)
        val y = if (r.getString(1) == "en") 1L else -1L
        val x = Array(1L, math.min(t.length.toLong, 400L),
          toks.distinct.length.toLong * 1000L / toks.length,
          math.min(toks.length.toLong, 200L))
        (y, x)
      }
    // epoch 1 from w = 0: yhat = +1 everywhere, miss iff y = -1
    val w1 = (0 until 4).map(j =>
      feats.filter(_._1 == -1L).map(f => f._1 * f._2(j)).sum).toArray
    val err1 = feats.count(_._1 == -1L).toLong
    // epoch 2 under w1
    val missed = feats.filter { case (y, x) =>
      val dot = (0 until 4).map(j => w1(j) * x(j)).sum
      (if (dot >= 0) 1L else -1L) != y
    }
    val w2 = (0 until 4).map(j =>
      w1(j) + missed.map(f => f._1 * f._2(j)).sum)
    val err2 = missed.size.toLong
    val r = byName("perceptron_quality_epochs").collect().head
    assert((0 until 4).map(r.getLong) === w2)
    assert(r.getLong(4) === err1 && r.getLong(5) === err2)
    // the second epoch must not be degenerate: some weight moved
    assert(w2.zip(w1).exists { case (a, b) => a != b } || err2 == 0)
  }
}
