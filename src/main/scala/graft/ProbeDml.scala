package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** DML scale probe: time ONLY the mutation steps of the lake-DML
  * family against a FIXED-SIZE delta while the corpus grows — the
  * delta-proportionality measurement the whole-query bench can't give
  * (q157–q159's bench time is dominated by building their proof lakes
  * from the full corpus every run).
  *
  * `runMain graft.ProbeDml <corpusDir> <workDir>` builds one
  * doc_id-clustered lake from `documents` (untimed), then times:
  *  - `merge`: 1,000 clustered key updates + 100 fresh inserts
  *    (detection pruned by the delta's key envelope);
  *  - SQL `UPDATE` of a fixed 500-key range (copy-on-write ReplaceData
  *    over the stats-pruned scan);
  *  - SQL `DELETE FROM` of a fixed 100-key range (metadata path);
  *  - `appendBatch` of 1,000 rows with stats+bloom (the stream sink's
  *    per-micro-batch step).
  * All key ranges are ABSOLUTE (not corpus-relative), so the delta is
  * identical at every scale; each step's cost should track affected
  * files, not corpus size. Prints one JSON line per step.
  *
  * An optional third arg `pct=<percent>` switches every delta to a
  * CORPUS-PROPORTIONAL clustered key range (e.g. `pct=1` → each DML
  * step touches 1 % of the key space) — the r11 probe shape: at ×10
  * files with a 1 % delta, rewritten-file counts must stay ∝ matched
  * keys (~1 % of the lake's files), pinning delta-proportionality as
  * an output of the probe itself. Each step reports `rewritten` and
  * `expect_files` (the manifest's own pruning answer for the range) so
  * the proportionality claim is checkable from the JSON alone.
  */
object ProbeDml {
  def main(args: Array[String]): Unit = {
    val Array(src, work) = args.take(2)
    val pct: Double = args.drop(2).collectFirst {
      case a if a.startsWith("pct=") => a.stripPrefix("pct=").toDouble
    }.getOrElse(0.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[graft.core.GraftCatalog].getName)

    val corpus = graft.core.Tables.documents(spark, src)
      .select($"doc_id", $"source", $"n_chars")
    val nDocs = corpus.count()
    val lake = java.nio.file.Paths.get(work)
      .resolve(s"dml_lake_${java.util.UUID.randomUUID()}").toString
    // ~250 rows per file so the clustered layout has enough files for
    // pruning ratios to mean something at both scales
    ManifestLake.append(spark, lake,
      corpus.repartitionByRange(math.max(8, (nDocs / 250).toInt), $"doc_id"),
      "source", statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val files0 = ManifestLake.latestSnapshot(lake).get.files.length

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def report(step: String, sec: Double, extra: String): Unit =
      println(s"""{"probe":"dml","step":"$step","sec":${f"$sec%.3f"},"n_docs":$nDocs,"files":$files0$extra}""")
    // the manifest's own answer for "how many files hold this range" —
    // the denominator of the proportionality claim
    def expectFiles(lo: Long, hi: Long): Int =
      ManifestLake.pruneFiles(ManifestLake.latestSnapshot(lake).get,
        "doc_id", BigDecimal(lo), BigDecimal(hi - 1)).length
    // proportional mode: each step gets its own disjoint clustered
    // range covering pct% of the ROWS (quantile bounds, not key-space
    // fractions — replicated probe corpora have sparse banded ids and
    // a key-space fraction can land entirely in a gap); absolute mode
    // keeps r10's ranges
    def range(i: Int, defaultLo: Long, defaultN: Long): (Long, Long) =
      if (pct <= 0) (defaultLo, defaultLo + defaultN)
      else {
        val q0 = 0.20 + i * 2.5 * (pct / 100.0)
        val qs = corpus.stat.approxQuantile("doc_id",
          Array(q0, q0 + pct / 100.0), 0.0001)
        (qs(0).toLong, math.max(qs(0).toLong + 1, qs(1).toLong))
      }

    // merge: clustered updates + fresh inserts
    val (mLo, mHi) = range(0, 1000L, 1000L)
    val updates = corpus.filter($"doc_id" >= mLo && $"doc_id" < mHi)
        .select($"doc_id", $"source", ($"n_chars" + 1).as("n_chars"))
      .unionByName(spark.range(0, math.max(100L, (mHi - mLo) / 10))
        .select(($"id" + 900000000L).as("doc_id"),
          lit("probe").as("source"), lit(1L).as("n_chars")))
    val mExpect = expectFiles(mLo, mHi)
    val (mStats, mSec) = timed(ManifestLake.merge(spark, lake, updates, Seq("doc_id")))
    report("merge", mSec,
      s""","rewritten":${mStats.filesRewritten},"expect_files":$mExpect""")

    // SQL UPDATE: clustered range
    val t = s"graft_probe.`$lake`"
    val (uLo, uHi) = range(1, 2500L, 500L)
    val uExpect = expectFiles(uLo, uHi)
    val before = ManifestLake.latestSnapshot(lake).get.files.toSet
    val (_, uSec) = timed(spark.sql(
      s"UPDATE $t SET n_chars = n_chars + 1 WHERE doc_id >= $uLo AND doc_id < $uHi"))
    val afterU = ManifestLake.latestSnapshot(lake).get.files.toSet
    report("sql_update", uSec,
      s""","rewritten":${(before -- afterU).size},"expect_files":$uExpect""")

    // SQL MERGE INTO: clustered update range + fresh inserts, group-filtered
    val (gLo, gHi) = range(2, 4000L, 500L)
    spark.range(gLo, gHi).select($"id".as("doc_id"),
        lit("probe_m").as("source"), lit(3L).as("n_chars"))
      .union(spark.range(0, math.max(50L, (gHi - gLo) / 10))
        .select(($"id" + 920000000L).as("doc_id"),
          lit("probe_m").as("source"), lit(4L).as("n_chars")))
      .createOrReplaceTempView("probe_dml_mrg")
    val gExpect = expectFiles(gLo, gHi)
    val (_, mqSec) = timed(spark.sql(
      s"""MERGE INTO $t g USING probe_dml_mrg u ON g.doc_id = u.doc_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""))
    val afterM = ManifestLake.latestSnapshot(lake).get.files.toSet
    report("sql_merge", mqSec,
      s""","rewritten":${(afterU -- afterM).size},"expect_files":$gExpect""")

    // SQL DELETE: clustered range (metadata-translated path)
    val (dLo, dHi) = range(3, 3500L, 100L)
    val dExpect = expectFiles(dLo, dHi)
    val (_, dSec) = timed(spark.sql(
      s"DELETE FROM $t WHERE doc_id >= $dLo AND doc_id < $dHi"))
    report("sql_delete", dSec, s""","expect_files":$dExpect""")

    // stream micro-batch: 1,000 rows, stats+bloom continued
    val batch = spark.range(0, 1000).select(($"id" + 910000000L).as("doc_id"),
      lit("probe").as("source"), lit(2L).as("n_chars"))
    val (_, bSec) = timed(ManifestLake.appendBatch(spark, lake, batch, "source",
      "probe", 0L, statsCols = Seq("doc_id"), bloomCols = Seq("doc_id")))
    report("stream_batch", bSec, "")

    spark.stop()
  }
}
