package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-4 continuation batch 10: the BPE merge-training loop — five
  * unrolled rounds of count-adjacent-pairs -> pick-top -> apply-merge,
  * the algorithm (Sennrich et al. 2016) behind every modern tokenizer
  * vocabulary, run engine-exact on both sides.
  */
object Curation16Queries {

  private val Rounds = 5

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "bpe_train_merges",
      (s, d) => {
        // char-tokenized corpus slice: spaces -> '_' word marker, one
        // space between every symbol, padded so every pair is ' a b '
        val base = Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"),
            concat(lit(" "), regexp_replace(
              regexp_replace(col("text"), " ", "_"), "(.)", "$1 "))
              .as("seq"))
        def topPair(seqs: DataFrame): DataFrame = {
          val toks = split(trim(col("seq")), " ")
          val n = size(toks)
          seqs.filter(n >= 2)
            .select(explode(zip_with(
              slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
              (a, b) => concat(a, lit(" "), b))).as("pair"))
            .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("pair"))
            .limit(1)
        }
        var seqs = base
        var out: DataFrame = null
        for (r <- 1 to Rounds) {
          val top = topPair(seqs)
          val row = top.select(lit(r.toLong).as("merge_rank"),
            col("pair"), col("cnt").as("n_occurrences"))
          out = if (out == null) row else out.unionByName(row)
          val tb = broadcast(top)
          seqs = seqs.crossJoin(tb)
            .select(col("doc_id"),
              expr("replace(seq, ' ' || pair || ' ', " +
                "' ' || replace(pair, ' ', '') || ' ')").as("seq"))
        }
        out
      },
      Some {
        val rounds = (1 to Rounds).map { r =>
          s"""p$r AS (SELECT pair, count(*)::BIGINT AS cnt
             |  FROM (SELECT t[i.i+1] || ' ' || t[i.i+2] AS pair
             |        FROM (SELECT string_split(trim(seq), ' ') AS t
             |              FROM s${r - 1}),
             |             (SELECT range AS i FROM range(0, 8192)) i
             |        WHERE len(t) >= 2 AND i.i < len(t) - 1)
             |  GROUP BY pair),
             |t$r AS (SELECT pair, cnt FROM p$r
             |        ORDER BY cnt DESC, pair LIMIT 1),
             |s$r AS (SELECT doc_id,
             |    replace(seq, ' ' || t$r.pair || ' ',
             |            ' ' || replace(t$r.pair, ' ', '') || ' ') AS seq
             |  FROM s${r - 1}, t$r)""".stripMargin
        }.mkString(",\n")
        val selects = (1 to Rounds).map(r =>
          s"SELECT $r::BIGINT AS merge_rank, pair, cnt AS n_occurrences FROM t$r")
          .mkString("\nUNION ALL ")
        s"""WITH s0 AS (
           |  SELECT doc_id,
           |    ' ' || regexp_replace(replace(text, ' ', '_'),
           |                          '(.)', '\\1 ', 'g') AS seq
           |  FROM documents WHERE doc_id < 100),
           |$rounds
           |$selects""".stripMargin
      },
      "BPE vocabulary training (Sennrich et al. 2016), five merges " +
        "unrolled: each round counts adjacent symbol pairs across the " +
        "corpus slice, picks the most frequent (ties by pair string), " +
        "and applies the merge as a left-to-right non-overlapping " +
        "replace — the exact merge-application order real BPE uses. " +
        "Word boundaries survive as '_' symbols. Each round is one " +
        "pair-count shuffle plus a broadcast of the 1-row winner; at " +
        "100 TB the identical loop runs with the pair table cached and " +
        "the sequence column checkpointed per round (the standard " +
        "distributed-BPE layout). 8192-symbol oracle cap asserted by " +
        "FixtureBoundsSpec."),
  )
}
