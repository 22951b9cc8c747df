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

  /** Char-tokenized corpus slice: spaces -> '_' word marker, one space
    * between every symbol, padded so every pair is ' a b '. */
  private def charified(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        concat(lit(" "), regexp_replace(
          regexp_replace(col("text"), " ", "_"), "(.)", "$1 "))
          .as("seq"))

  private def topPair(seqs: DataFrame): DataFrame = {
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

  /** Run the merge loop; returns (per-round winners, final sequences).
    *
    * Each round is CHECKPOINTED (eager localCheckpoint, the CC-fixpoint
    * idiom): round r references round r-1 twice (pair census + merge
    * application) and `top` twice (winner row + the merge join), so the
    * inlined loop re-expanded ~2^Rounds copies of the base scan — the
    * unoptimized bpe_train_merges plan carried 31 exchanges and 52
    * broadcast-nested-loop joins for five rounds.  Materializing each
    * round makes plan and execution linear in Rounds (what the oracle's
    * AS MATERIALIZED round CTEs already express); merges and counts are
    * unchanged. */
  private def train(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    var seqs = charified(s, d).localCheckpoint(true)
    var out: DataFrame = null
    for (r <- 1 to Rounds) {
      val top = topPair(seqs).localCheckpoint(true)
      val row = top.select(lit(r.toLong).as("merge_rank"),
        col("pair"), col("cnt").as("n_occurrences"))
      out = if (out == null) row else out.unionByName(row)
      seqs = seqs.crossJoin(broadcast(top))
        .select(col("doc_id"),
          expr("replace(seq, ' ' || pair || ' ', " +
            "' ' || replace(pair, ' ', '') || ' ')").as("seq"))
        .localCheckpoint(true)
    }
    (out, seqs)
  }

  /** The unrolled-round CTE chain s0..s5 / t1..t5, shared by both
    * oracles. */
  private val roundsSql: String = {
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
    s"""s0 AS (
       |  SELECT doc_id,
       |    ' ' || regexp_replace(replace(text, ' ', '_'),
       |                          '(.)', '\\1 ', 'g') AS seq
       |  FROM documents WHERE doc_id < 100),
       |$rounds""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "bpe_train_merges",
      (s, d) => train(s, d)._1,
      Some {
        val selects = (1 to Rounds).map(r =>
          s"SELECT $r::BIGINT AS merge_rank, pair, cnt AS n_occurrences FROM t$r")
          .mkString("\nUNION ALL ")
        s"WITH $roundsSql\n$selects"
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

    // -------------------------------------------- compression readout
    QueryDef(
      "bpe_compression_ratio",
      (s, d) => {
        val before = charified(s, d).select(col("doc_id"),
          size(split(trim(col("seq")), " ")).cast("bigint").as("n_before"))
        val after = train(s, d)._2.select(col("doc_id"),
          size(split(trim(col("seq")), " ")).cast("bigint").as("n_after"))
        before.join(after, Seq("doc_id"))
          .select(col("doc_id"), col("n_before"), col("n_after"),
            expr("(n_after * 1000) div n_before").as("ratio_permille"))
      },
      Some(s"""WITH $roundsSql
        |SELECT s0.doc_id,
        |  len(string_split(trim(s0.seq), ' '))::BIGINT AS n_before,
        |  len(string_split(trim(s5.seq), ' '))::BIGINT AS n_after,
        |  (len(string_split(trim(s5.seq), ' ')) * 1000)
        |    // len(string_split(trim(s0.seq), ' ')) AS ratio_permille
        |FROM s0 JOIN s5 ON s0.doc_id = s5.doc_id""".stripMargin),
      "Per-document token compression from the 5 trained merges: " +
        "symbols before vs after, ratio at permille — the fertility " +
        "readout that decides whether a vocabulary is worth its size " +
        "(pairs with tokenizer_fertility's whitespace view). Shares " +
        "the exact unrolled-round construction with bpe_train_merges " +
        "on both engines, so the merge table and its application are " +
        "one source of truth."),
  )
}
