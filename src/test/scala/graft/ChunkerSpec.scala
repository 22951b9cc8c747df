package graft

import org.apache.spark.sql.functions._
import graft.queries.VectorQueries

/** V1 chunker contract (RAG-eval-test_model.py:239-240 semantics as
  * documented in SURVEY §7): chunks <= 256 chars, stride 156 (overlap
  * 100), chunks cover the doc, short docs produce exactly one chunk. */
class ChunkerSpec extends SparkSpec {

  test("every chunk is <= 256 chars and nonempty") {
    val bad = VectorQueries.chunks(spark, sfDir)
      .filter(length(col("chunk")) > 256 || length(col("chunk")) === 0)
      .count()
    assert(bad === 0)
  }

  test("chunk count matches closed form and chunks cover the doc") {
    val rows = VectorQueries.chunks(spark, sfDir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(length(col("chunk"))).as("maxlen"),
        sum(length(col("chunk"))).as("sumlen"))
      .join(Tables.documents(spark, sfDir), "doc_id")
      .select(col("doc_id"), col("n"), col("sumlen"),
        length(col("text")).as("len"))
      .collect()
    rows.foreach { r =>
      val len = r.getAs[Int]("len")
      val n = r.getAs[Long]("n")
      val expected = 1L + math.max(0L, math.ceil((len - 256) / 156.0).toLong)
      assert(n === expected, s"doc ${r.get(0)}: n=$n len=$len")
      // coverage: last chunk starts at 1+(n-1)*156 and reaches the end
      assert(1 + (n - 1) * 156 + 255 >= len, s"doc ${r.get(0)} uncovered tail")
    }
  }

  test("ChunkSpans generator is row-identical to the declarative chunker") {
    import graft.functions.ChunkSpans.chunkSpans
    val declarative = VectorQueries.chunks(spark, sfDir)
    val generated = Tables.documents(spark, sfDir)
      .select(col("doc_id"), chunkSpans(col("text"), 256, 156))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
    assert(declarative.exceptAll(generated).count() === 0)
    assert(generated.exceptAll(declarative).count() === 0)
  }

  test("property: reassembling stride-156 chunks reproduces the text") {
    import spark.implicits._
    // edge lengths: tiny, exact chunk size, +/-1 around boundaries, exact
    // multiples of the stride, and a spread of arbitrary lengths
    val lengths = Seq(1, 2, 3, 100, 255, 256, 257, 411, 412, 413, 567, 568,
      569, 900) ++ (5 to 890 by 37)
    val docs = lengths.zipWithIndex.map { case (len, i) =>
      val text = LazyList.continually(s"w${i}x").flatten.take(len).mkString
      (i.toLong, text)
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = df
      .withColumn("n_chunks",
        lit(1) + greatest(lit(0),
          ceil((length(col("text")) - 256) / 156.0).cast("int")))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .join(df, "doc_id")
      .select(col("doc_id"),
        expr("substring(text, 1 + chunk_idx * 156, 256)").as("chunk"),
        col("chunk_idx"))
      .as[(Long, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    docs.foreach { case (id, text) =>
      val cs = chunks(id)
      // stitch: first chunk whole, then drop the 100-char overlap
      val rebuilt = cs.head + cs.tail.map(_.drop(100)).mkString
      assert(rebuilt === text, s"doc $id len ${text.length}")
      assert(cs.forall(c => c.nonEmpty && c.length <= 256))
    }
  }
}
