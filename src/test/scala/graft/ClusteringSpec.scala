package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Laws of per-file column statistics and 1-D re-clustering
  * (`optimizeClusterBy`): stats are recorded on every write, pruning
  * through them never changes an answer (only the scanned file set),
  * clustering makes non-key pruning strict, and both compose with
  * deletion vectors and schema evolution. */
class ClusteringSpec extends SparkSpec {

  private def freshRoot(kind: String): String =
    Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_cluspec_${kind}_" +
        s"${spark.sparkContext.applicationId}")

  /** score is DELIBERATELY anti-correlated with the key so the initial
    * key-ranged layout gives score-pruning nothing to skip. */
  private def scored(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", (n - 1 - i).toLong))
      .toDF("doc_id", "text", "score")
  }

  test("every write records per-file min/max for non-key long columns") {
    val root = freshRoot("stats")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, 1)
    assert(snap.files.size === 4)
    snap.files.foreach { f =>
      assert(f.stats.contains("score"), s"missing score stats in $f")
      val (mn, mx) = f.stats("score")
      assert(mn <= mx)
    }
    // bounds are exact: union of per-file ranges covers 0..99 and the
    // per-file spans are disjoint in doc_id but each file's score span
    // mirrors its key span (anti-correlated fixture)
    assert(snap.files.map(_.stats("score")._1).min === 0L)
    assert(snap.files.map(_.stats("score")._2).max === 99L)
  }

  test("stats pruning keeps the answer and only shrinks the file set; " +
    "un-statsed history is conservatively kept") {
    val root = freshRoot("prune")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val full = VersionedTable.read(spark, root)
      .filter(col("score") < 10L)
    val pruned = VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") < 10L)
    assert(pruned.exceptAll(full).count() === 0 &&
      full.exceptAll(pruned).count() === 0)
    // anti-correlated layout: score 0..9 lives in the TOP key file —
    // pruning on score keeps exactly the files whose span intersects
    val snap = VersionedTable.snapshot(spark, root, 1)
    val kept = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(kept.size < snap.files.size)
    // a column with no stats anywhere keeps everything (conservative)
    assert(VersionedTable.statsPrunedFiles(snap.files,
      Map("nosuch" -> (0L, 1L))).size === snap.files.size)
  }

  test("optimizeClusterBy re-partitions on the cluster column: " +
    "row-preserving, and a narrow non-key range then scans a strict " +
    "file subset") {
    val root = freshRoot("cluster")
    VersionedTable.append(spark, root, scored(100), "doc_id", 4)
    val v = VersionedTable.optimizeClusterBy(spark, root, "score",
      "doc_id", 4)
    assert(v === 2)
    val snap = VersionedTable.snapshot(spark, root, 2)
    assert(snap.op === "cluster")
    // row-preserving
    assert(VersionedTable.read(spark, root).count() === 100)
    // clustered: per-file score spans are narrow and pruning is strict
    val kept = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(kept.size === 1,
      s"score 0..9 must live in one clustered file, kept ${kept.size}")
    val got = VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") <= 9L)
    assert(got.count() === 10)
    // key-range pruning still CORRECT after clustering (spans widen,
    // pruning degrades, answers don't change)
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 9L)))
      .filter(col("doc_id") <= 9L).count() === 10)
  }

  test("clustering materializes deletion vectors and keeps live rows") {
    val root = freshRoot("clusdv")
    VersionedTable.append(spark, root, scored(60), "doc_id", 3)
    VersionedTable.deleteMoR(spark, root,
      pmod(col("doc_id"), lit(6)) === 0, "doc_id")
    VersionedTable.optimizeClusterBy(spark, root, "score", "doc_id", 3)
    val snap = VersionedTable.snapshot(spark, root, 3)
    assert(snap.files.forall(_.dv.isEmpty))
    assert(snap.rows === 50)
    assert(VersionedTable.read(spark, root).count() === 50)
    assert(VersionedTable.read(spark, root)
      .filter(pmod(col("doc_id"), lit(6)) === 0).count() === 0)
  }

  test("optimizeZOrder: a narrow range on EITHER dimension alone " +
    "prunes to a strict file subset; rows and answers preserved") {
    import spark.implicits._
    val root = freshRoot("zorder")
    // de-correlated 2-D spread (score = i*37 mod 100): 1-D clustering
    // on either column would leave the other unprunable
    val df = (0 until 100).map(i =>
      (i.toLong, s"t$i", ((i * 37) % 100).toLong))
      .toDF("doc_id", "text", "score")
    VersionedTable.append(spark, root, df, "doc_id", 4)
    val v = VersionedTable.optimizeZOrder(spark, root, "doc_id", "score",
      "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, v)
    assert(snap.op === "zorder")
    assert(VersionedTable.read(spark, root).count() === 100)
    // dimension 1 (the key, via per-file minId/maxId): doc_id < 10
    // maps to grid cells x < 7 — only quadrant files with x-span
    // below 32 can intersect
    val keptId = snap.files.filter(f => f.maxId >= 0L && f.minId <= 9L)
    assert(keptId.size < snap.files.size,
      s"id-range prune must be strict, kept ${keptId.size}")
    // dimension 2 (column stats): score 0..9
    val keptScore = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 9L)))
    assert(keptScore.size < snap.files.size,
      s"score-range prune must be strict, kept ${keptScore.size}")
    // answers through both pruned paths match the plain filters
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 9L)))
      .filter(col("doc_id") <= 9L).count() === 10)
    assert(VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 9L)))
      .filter(col("score") <= 9L).count() === 10)
  }

  test("every write records truncated per-file STRING min/max: sound " +
    "bounds (Iceberg truncate-and-bump), manifest-bounded size") {
    import spark.implicits._
    val root = freshRoot("sstats")
    // lang-like short strings plus one column of LONG text (> the
    // 64-unit stat cut) to exercise the upper-bound bump
    val langs = IndexedSeq("ar", "de", "en", "fr", "zh")
    val df = (0 until 100).map { i =>
      (i.toLong, langs(i % 5), ("x" * 100) + f"tail$i%03d")
    }.toDF("doc_id", "lang", "text")
    VersionedTable.append(spark, root, df, "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, 1)
    snap.files.foreach { f =>
      // lang is short: exact bounds, within the dictionary
      val (lmn, lmx) = f.sstats("lang")
      assert(lmn <= lmx && langs.contains(lmn) && langs.contains(lmx))
      // text was truncated: recorded bounds are <= 65 units, and the
      // UPPER bound was bumped so it still dominates every value
      val (tmn, tmx) = f.sstats("text")
      assert(tmn.length <= 64 && tmx.length <= 64)
      assert(tmx > "x" * 100,
        s"bumped upper bound '$tmx' must dominate the 100-x values")
    }
    // string pruning: an impossible lang range prunes every file;
    // a real one keeps files and the answer matches the plain filter
    assert(VersionedTable.statsPrunedFiles(snap.files, Map.empty,
      Map("lang" -> ("zz", "zz"))).isEmpty)
    val got = VersionedTable.read(spark, root,
      strRanges = Map("lang" -> ("fr", "fr")))
      .filter(col("lang") === "fr")
    assert(got.count() === 20)
  }

  test("optimizeClusterBy on a STRING column makes lang-predicate " +
    "pruning strict, with provably sound skips") {
    import spark.implicits._
    val root = freshRoot("strclus")
    val langs = IndexedSeq("ar", "de", "en", "fr", "zh")
    val df = (0 until 200).map(i => (i.toLong, langs(i % 5), s"t$i"))
      .toDF("doc_id", "lang", "text")
    VersionedTable.append(spark, root, df, "doc_id", 4)
    // key-ranged layout: lang is uniform across files — nothing prunes
    val before = VersionedTable.statsPrunedFiles(
      VersionedTable.snapshot(spark, root, 1).files, Map.empty,
      Map("lang" -> ("fr", "fr")))
    assert(before.size === 4, "pre-clustering, lang pruning is useless")
    VersionedTable.optimizeClusterBy(spark, root, "lang", "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, 2)
    val kept = VersionedTable.statsPrunedFiles(snap.files, Map.empty,
      Map("lang" -> ("fr", "fr")))
    assert(kept.size < snap.files.size,
      s"clustered lang pruning must be strict, kept ${kept.size}")
    // soundness: every skipped file provably cannot hold 'fr'
    snap.files.diff(kept).foreach { f =>
      val (mn, mx) = f.sstats("lang")
      assert(mn > "fr" || mx < "fr", s"unsound skip: [$mn,$mx]")
    }
    val got = VersionedTable.read(spark, root,
      strRanges = Map("lang" -> ("fr", "fr")))
      .filter(col("lang") === "fr")
    assert(got.count() === 40)
  }

  test("optimizeZOrderBy over THREE columns (long, long, string): a " +
    "narrow predicate on ANY one dimension prunes strictly") {
    import spark.implicits._
    val root = freshRoot("zorder3")
    val langs = IndexedSeq("ar", "de", "en", "fr", "zh")
    // three mutually de-correlated dimensions
    val df = (0 until 512).map { i =>
      (i.toLong, ((i * 37) % 512).toLong, langs((i * 11) % 5), s"t$i")
    }.toDF("doc_id", "score", "lang", "text")
    VersionedTable.append(spark, root, df, "doc_id", 8)
    // 16 files: N-dim Z-order constrains ~log2(numFiles) interleave
    // bits TOTAL across the dims, so 8 files over 3 dims leaves the
    // least-significant dimension unconstrained — the same
    // files-per-dimension sizing rule Delta's ZORDER docs state
    val v = VersionedTable.optimizeZOrderBy(spark, root,
      Seq("doc_id", "score", "lang"), "doc_id", 16)
    val snap = VersionedTable.snapshot(spark, root, v)
    assert(snap.op === "zorder")
    assert(VersionedTable.read(spark, root).count() === 512)
    val keptId = snap.files.filter(f => f.maxId >= 0L && f.minId <= 63L)
    assert(keptId.size < snap.files.size, s"id prune kept ${keptId.size}")
    val keptScore = VersionedTable.statsPrunedFiles(snap.files,
      Map("score" -> (0L, 63L)))
    assert(keptScore.size < snap.files.size,
      s"score prune kept ${keptScore.size}")
    val keptLang = VersionedTable.statsPrunedFiles(snap.files, Map.empty,
      Map("lang" -> ("ar", "ar")))
    assert(keptLang.size < snap.files.size,
      s"lang prune kept ${keptLang.size}")
    // answers through all three pruned paths match the plain filters
    assert(VersionedTable.read(spark, root, idRange = Some((0L, 63L)))
      .filter(col("doc_id") <= 63L).count() === 64)
    assert(VersionedTable.read(spark, root,
      ranges = Map("score" -> (0L, 63L)))
      .filter(col("score") <= 63L).count() === 64)
    assert(VersionedTable.read(spark, root,
      strRanges = Map("lang" -> ("ar", "ar")))
      .filter(col("lang") === "ar").count() ===
      (0 until 512).count(i => (i * 11) % 5 == 0))
  }

  test("a column range wider than Long.MaxValue/64 quantizes without " +
    "overflow: Z-order cells stay ordered, layout stays clustered") {
    import spark.implicits._
    val root = freshRoot("zoverflow")
    // values spanning nearly the whole long range: the old
    // (c - lo) * 64 quantizer overflowed here and scrambled the cells
    val wide = (0 until 64).map { i =>
      (i.toLong, Long.MinValue / 2 + (Long.MaxValue / 64) * i.toLong)
    }.toDF("doc_id", "big")
    VersionedTable.append(spark, root, wide, "doc_id", 2)
    val v = VersionedTable.optimizeZOrderBy(spark, root, Seq("big"),
      "doc_id", 4)
    val snap = VersionedTable.snapshot(spark, root, v)
    assert(VersionedTable.read(spark, root).count() === 64)
    // clustered on `big`: the four files' big-ranges must be disjoint
    // (overflowed cells would interleave them)
    val spans = snap.files.map(_.stats("big")).sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file spans overlap: $spans")
      case _ => ()
    }
    // and a narrow range on one end prunes strictly
    val kept = VersionedTable.statsPrunedFiles(snap.files,
      Map("big" -> (Long.MinValue / 2, Long.MinValue / 2 + 10L)))
    assert(kept.size === 1, s"kept ${kept.size} of ${snap.files.size}")
  }

  test("every write records TIMESTAMP min/max as epoch micros in the " +
    "long stats map; time-clustering makes a time-slice prune strict " +
    "with provably sound skips") {
    import spark.implicits._
    val root = freshRoot("tsstats")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 30 days of events, hour-grained, de-correlated with the key so
    // the key-ranged initial layout gives time-pruning nothing
    val df = (0 until 240).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        t0.plusSeconds(((i * 97) % 240).toLong * 3 * 3600L)))
    }.toDF("event_id", "ts")
    VersionedTable.append(spark, root, df, "event_id", 4)
    val snap1 = VersionedTable.snapshot(spark, root, 1)
    // stats recorded, in MICROS, covering the full 30-day span
    val micros0 = t0.toEpochMilli * 1000L
    snap1.files.foreach { f =>
      val (mn, mx) = f.stats("ts")
      assert(mn >= micros0 && mx <= micros0 + 240L * 3 * 3600L * 1000000L)
    }
    // key-ranged layout: every file spans most of the month — nothing
    // prunes on a 3-day slice
    val hi = micros0 + 3L * 24 * 3600 * 1000000L - 1
    val before = VersionedTable.statsPrunedFiles(snap1.files,
      Map("ts" -> (0L, hi)))
    assert(before.size === 4, "pre-clustering, time pruning is useless")
    VersionedTable.optimizeClusterBy(spark, root, "ts", "event_id", 4)
    val snap2 = VersionedTable.snapshot(spark, root, 2)
    val kept = VersionedTable.statsPrunedFiles(snap2.files,
      Map("ts" -> (0L, hi)))
    assert(kept.size < snap2.files.size,
      s"time-clustered prune must be strict, kept ${kept.size}")
    // soundness: every skipped file's recorded min lies past the cut
    snap2.files.diff(kept).foreach { f =>
      assert(f.stats("ts")._1 > hi, s"unsound skip: ${f.stats("ts")}")
    }
    // the pruned read matches the plain time filter
    val cut = java.sql.Timestamp.from(t0.plusSeconds(3L * 24 * 3600))
    val got = VersionedTable.read(spark, root,
      ranges = Map("ts" -> (0L, hi)))
      .filter(col("ts") < lit(cut))
    assert(got.count() ===
      VersionedTable.read(spark, root).filter(col("ts") < lit(cut)).count())
  }

  test("stats survive the manifest round-trip and schema evolution " +
    "adds stats for the new column on rewrite") {
    import spark.implicits._
    val root = freshRoot("evo")
    VersionedTable.append(spark, root, scored(40), "doc_id", 2)
    // evolved upsert adds a long column: rewritten + new files carry
    // its stats, and reads of old snapshots still parse
    val evolved = (0L until 10L).map(i => (i, s"e$i", 5L, i * 2))
      .toDF("doc_id", "text", "score", "quality")
    VersionedTable.merge(spark, root, evolved, "doc_id", 1)
    val snap = VersionedTable.snapshot(spark, root, 2)
    val withQ = snap.files.filter(_.stats.contains("quality"))
    assert(withQ.nonEmpty, "rewritten files must carry quality stats")
    assert(withQ.head.stats("quality") === ((0L, 18L)))
    // v1 (pre-evolution) still reads
    assert(VersionedTable.read(spark, root, Some(1)).count() === 40)
  }
}
