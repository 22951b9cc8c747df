package graft.queries

import org.apache.spark.sql.functions._
import graft.{Corpus, QueryDef, Tables}

/** Dataset-integrity audits: cross-source vocabulary overlap, document
  * internal redundancy, and train/test leakage — the checks that run
  * between curation and training, where a silent failure poisons every
  * downstream eval (the reference's splits are file-level and never
  * audited for content overlap; train_adapters/RAG-eval-create_model.py:60-74
  * slices one list into train/test by index).
  */
object AuditQueries {

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------- cross-source vocab overlap
    QueryDef(
      "source_overlap_matrix",
      (s, d) => {
        val st = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
        st.as("a").join(st.as("b"),
            col("a.tok") === col("b.tok") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
          .join(sizes.select(col("source").as("src_a"), col("nv").as("na")),
            "src_a")
          .join(sizes.select(col("source").as("src_b"), col("nv").as("nb")),
            "src_b")
          .select(col("src_a"), col("src_b"), col("n_shared"),
            expr("(1000 * n_shared) div (na + nb - n_shared)")
              .as("vocab_jaccard_permille"))
      },
      Some("""WITH st AS (SELECT DISTINCT source, t.tok FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t),
        |sizes AS (SELECT source, count(*)::BIGINT AS nv
        |          FROM st GROUP BY source),
        |shared AS (SELECT a.source AS src_a, b.source AS src_b,
        |       count(*)::BIGINT AS n_shared
        |  FROM st a JOIN st b
        |    ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s.src_a, s.src_b, s.n_shared,
        |  ((1000 * s.n_shared) // (sa.nv + sb.nv - s.n_shared))::BIGINT
        |    AS vocab_jaccard_permille
        |FROM shared s
        |JOIN sizes sa ON sa.source = s.src_a
        |JOIN sizes sb ON sb.source = s.src_b""".stripMargin),
      "Pairwise vocabulary Jaccard between sources — the dataset " +
        "relationship map that groups sources into families before " +
        "mixture design (two sources sharing 95% vocabulary are one " +
        "domain for weighting purposes). The join is on the token key " +
        "after per-source distinct, so fan-out is bounded by how many " +
        "sources share each term — vocabulary-scale, never corpus-" +
        "scale; per-source vocab sets at 100 TB are the already-tiny " +
        "output of the inverted-index df pass."),

    // ---------------------------------- document self-similarity
    QueryDef(
      "doc_self_similarity_halves",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 4)
        t.select(col("doc_id"),
            array_distinct(expr("slice(toks, 1, size(toks) div 2)")).as("h1"),
            array_distinct(expr(
              "slice(toks, size(toks) div 2 + 1, size(toks))")).as("h2"))
          .select(col("doc_id"),
            size(array_intersect(col("h1"), col("h2"))).cast("long").as("ni"),
            size(col("h1")).cast("long").as("n1"),
            size(col("h2")).cast("long").as("n2"))
          .select(col("doc_id"),
            expr("(1000 * ni) div (n1 + n2 - ni)")
              .as("self_jaccard_permille"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE len(string_split(text, ' ')) >= 4),
        |h AS (SELECT doc_id,
        |    list_distinct(toks[1 : len(toks) // 2]) AS h1,
        |    list_distinct(toks[len(toks) // 2 + 1 : len(toks)]) AS h2
        |  FROM t),
        |m AS (SELECT doc_id,
        |    len(list_intersect(h1, h2))::BIGINT AS ni,
        |    len(h1)::BIGINT AS n1, len(h2)::BIGINT AS n2
        |  FROM h)
        |SELECT doc_id,
        |  ((1000 * ni) // (n1 + n2 - ni))::BIGINT AS self_jaccard_permille
        |FROM m""".stripMargin),
      "Internal redundancy: vocabulary Jaccard between a document's " +
        "two halves — near-1000 means the text repeats itself " +
        "(templated or looping generation; the set-based cousin of " +
        "text_repetition_ratio's n-gram rate). Pure row-local array " +
        "ops, no shuffle; the halves trick needs no window because " +
        "the split point is a function of the row itself."),

    // ------------------------------------ decile boundary table
    QueryDef(
      "quantile_bin_boundaries",
      (s, d) => {
        val ps = (1 to 9).map(i =>
          expr(s"percentile(n_chars, 0.$i)").as(s"p$i"))
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(ps.head, ps.tail: _*)
          .select(col("lang") +: (1 to 9).map(i => col(s"p$i")): _*)
      },
      Some(s"""SELECT lang,
        |  ${(1 to 9).map(i =>
          s"quantile_cont(n_chars, 0.$i) AS p$i").mkString(",\n        |  ")}
        |FROM documents GROUP BY lang""".stripMargin),
      "Equal-frequency bin boundaries (deciles) per language — the " +
        "lookup table that discretizes a continuous feature into " +
        "rank-stable buckets for monotone models and drift monitors. " +
        "Exact interpolated order statistics over integers " +
        "(bit-identical doubles, as quantile_values proved); consumers " +
        "join this 5-row table broadcast and bucket with a CASE — at " +
        "100 TB the boundaries come from approx_percentile and the " +
        "consumer side is unchanged."),

    // ------------------------------------ hash collision audit
    QueryDef(
      "shingle_collision_audit",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
        val sh = t.select(explode(expr(
            "transform(sequence(1, size(toks) - 2), i -> " +
              "concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), " +
              "element_at(toks, i + 2)))")).as("shingle"))
          .distinct()
        sh.select(
            count(lit(1)).as("n_distinct_strings"),
            countDistinct(pmod(
              conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long"),
              lit(2147483647L))).as("n_distinct_hashes"))
          .select(col("n_distinct_strings"), col("n_distinct_hashes"),
            (col("n_distinct_strings") - col("n_distinct_hashes"))
              .as("n_collisions"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT
        |    toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS shingle
        |  FROM t, (SELECT range AS i FROM range(1, 4096)) i
        |  WHERE i.i <= len(toks) - 2)
        |SELECT count(*)::BIGINT AS n_distinct_strings,
        |  count(DISTINCT (('0x' || substr(md5(shingle), 1, 8))::BIGINT
        |                  % 2147483647))::BIGINT AS n_distinct_hashes,
        |  (count(*) - count(DISTINCT (('0x' || substr(md5(shingle), 1, 8))
        |                  ::BIGINT % 2147483647)))::BIGINT AS n_collisions
        |FROM sh""".stripMargin),
      "Collision audit of the 31-bit hashed-shingle space the dedup " +
        "family runs in (DedupQueries reduces every shingle to " +
        "md5-prefix mod 2^31-1): distinct strings vs distinct hashes, " +
        "difference = collisions. Both engines hash identically, so " +
        "parity holds by construction — but the RATE is what bounds " +
        "false near-dup merges, and birthday math says it grows with " +
        "the square of vocabulary: this query is the periodic check " +
        "that the hash width still fits the corpus (widen to 62-bit " +
        "before ~2^15 shingles if zero collisions are required)."),

    // ---------------------------- join cardinality prediction
    QueryDef(
      "join_cardinality_estimate",
      (s, d) => {
        val ha = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("ca"))
        val hb = Tables.customer(s, d).groupBy(col("c_custkey").as("k"))
          .agg(count(lit(1)).as("cb"))
        val predicted = ha.join(hb, "k")
          .agg(sum(col("ca") * col("cb")).as("predicted_rows"),
            count(lit(1)).as("n_shared_keys"),
            max(col("ca") * col("cb")).as("max_key_fanout"))
        val actual = Tables.orders(s, d).join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("actual_rows"))
        predicted.crossJoin(broadcast(actual))
      },
      Some("""WITH ha AS (SELECT o_custkey AS k, count(*)::BIGINT AS ca
        |        FROM orders GROUP BY o_custkey),
        |hb AS (SELECT c_custkey AS k, count(*)::BIGINT AS cb
        |       FROM customer GROUP BY c_custkey),
        |p AS (SELECT sum(ca * cb)::BIGINT AS predicted_rows,
        |        count(*)::BIGINT AS n_shared_keys,
        |        max(ca * cb)::BIGINT AS max_key_fanout
        |      FROM ha JOIN hb USING (k)),
        |a AS (SELECT count(*)::BIGINT AS actual_rows
        |      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT p.predicted_rows, p.n_shared_keys, p.max_key_fanout,
        |       a.actual_rows
        |FROM p CROSS JOIN a""".stripMargin),
      "Join cardinality predicted from per-key histograms — " +
        "sum(cnt_a * cnt_b) over shared keys IS the equi-join's exact " +
        "output size, computed from two cheap aggs before paying for " +
        "the join itself (the query also runs the join to show " +
        "predicted == actual). max_key_fanout is the skew headline: " +
        "one key owning a large product predicts the straggler task " +
        "that shuffle_skew_profile would then localize. This is the " +
        "pre-flight a 100 TB pipeline runs before an unfamiliar join; " +
        "at scale the histograms come from sampled or sketched counts " +
        "with the same algebra."),

    // --------------------------------------- split leakage gate
    QueryDef(
      "split_leakage_check",
      (s, d) => {
        val bucket = pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(100L))
        val tagged = Corpus.withDups(s, d)
          .select(md5(col("text")).as("h"), col("doc_id"),
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"))
        tagged.groupBy(col("h"))
          .agg(countDistinct(col("split")).as("n_splits"),
            count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("example_doc"))
          .filter(col("n_splits") >= 2)
      },
      Some(s"""WITH corpus AS (${Corpus.cte}),
        |tagged AS (SELECT md5(text) AS h, doc_id,
        |    CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |               % 100) < 80 THEN 'train'
        |         WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |               % 100) < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM corpus)
        |SELECT h, count(DISTINCT split)::BIGINT AS n_splits,
        |  count(*)::BIGINT AS n_docs, min(doc_id) AS example_doc
        |FROM tagged GROUP BY h HAVING count(DISTINCT split) >= 2""".stripMargin),
      "Train/test leakage gate: identical content (by hash) appearing " +
        "in more than one split — the audit that must return zero rows " +
        "before any eval is trusted, run here on the dup-injected " +
        "corpus where it correctly fires (id-keyed splits leak exactly " +
        "when content is duplicated under different ids; the fix is " +
        "splitting on the CONTENT hash, or deduping first as " +
        "CurationPipeline does). One groupBy on the content hash — " +
        "the same shuffle dedup_exact already pays."),
  )
}
