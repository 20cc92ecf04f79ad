package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Manifest-log scale probe: measures what the delta-encoded manifest
  * log buys per commit, and what resolution costs at read time — the
  * numbers behind the "commit I/O is O(changed files)" claim.
  *
  * `runMain graft.ProbeManifest <corpusDir> <workDir>` builds one
  * lake from `documents` with deliberately heavy manifest lines
  * (stats + bloom on doc_id; blooms are the dominant per-line payload,
  * exactly the production configuration) and many small files, then:
  *  - times 6 FIXED 500-row appends, recording each commit's manifest
  *    bytes on disk and whether it wrote a delta or a full snapshot;
  *  - attaches a DV via a 50-row MoR delete (a changed-line commit:
  *    the delta must re-state only the DV'd files);
  *  - times `latestSnapshot` at the end of the chain (the read-side
  *    price of resolving deltas back to a checkpoint).
  * Prints one JSON line per step. The claim to check from the output
  * alone: delta commits' bytes track THEIR OWN change (~500 rows ≈ a
  * handful of lines) while the full snapshot tracks the LAKE (file
  * count × line width) — at ×10 files the full manifest is ~10×, the
  * delta commits unchanged. */
object ProbeManifest {
  def main(args: Array[String]): Unit = {
    val Array(src, work) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._

    val corpus = graft.core.Tables.documents(spark, src)
      .select($"doc_id", $"source", $"n_chars")
    val nDocs = corpus.count()
    val lake = java.nio.file.Paths.get(work)
      .resolve(s"mlog_lake_${java.util.UUID.randomUUID()}").toString
    def manifestBytes(v: Long): Long =
      java.nio.file.Files.size(java.nio.file.Paths.get(lake)
        .resolve("_manifests").resolve(f"v$v%012d"))
    def isDelta(v: Long): Boolean =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(lake)
        .resolve("_manifests").resolve(f"v$v%012d"))
        .stream().anyMatch(_.startsWith("#base:"))
    def emit(step: String, ms: Long, v: Long): Unit =
      println(s"""{"step":"$step","ms":$ms,"version":$v,""" +
        s""""manifest_bytes":${manifestBytes(v)},"delta":${isDelta(v)}}""")

    // build: ~250 rows/file, stats + bloom — heavy manifest lines
    var t0 = System.nanoTime()
    ManifestLake.append(spark, lake,
      corpus.repartitionByRange(math.max(8, (nDocs / 250).toInt), $"doc_id"),
      "source", statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val snap0 = ManifestLake.latestSnapshot(lake).get
    println(s"""{"step":"build","ms":${(System.nanoTime() - t0) / 1000000},""" +
      s""""files":${snap0.files.length},""" +
      s""""manifest_bytes":${manifestBytes(snap0.version)},"delta":${isDelta(snap0.version)}}""")

    // fixed 500-row appends: commit bytes must track the APPEND
    for (k <- 0 until 6) {
      val rows = spark.range(10000000L + k * 500, 10000000L + (k + 1) * 500)
        .select($"id".as("doc_id"), lit("s0").as("source"), ($"id" % 97).as("n_chars"))
      t0 = System.nanoTime()
      val s = ManifestLake.append(spark, lake, rows, "source",
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      emit(s"append_$k", (System.nanoTime() - t0) / 1000000, s.version)
    }

    // changed-line commit: a 50-row MoR delete re-states only DV'd files
    t0 = System.nanoTime()
    ManifestLake.deleteWhereDv(spark, lake, $"doc_id" >= 0 && $"doc_id" < 50)
    val vDv = ManifestLake.latestSnapshot(lake).get.version
    emit("dv_delete", (System.nanoTime() - t0) / 1000000, vDv)

    // MoR update: 50 matched rows -> positions + images, one commit
    t0 = System.nanoTime()
    ManifestLake.updateWhereDv(spark, lake,
      $"doc_id" >= 100 && $"doc_id" < 150,
      Seq("n_chars" -> org.apache.spark.sql.functions.lit(-1L)))
    val vUp = ManifestLake.latestSnapshot(lake).get.version
    emit("dv_update", (System.nanoTime() - t0) / 1000000, vUp)

    // change feed over the two MoR commits: cost ∝ changed rows
    t0 = System.nanoTime()
    val cdf = ManifestLake.readChangeFeed(spark, lake, vDv - 1, vUp).count()
    println(s"""{"step":"change_feed","ms":${(System.nanoTime() - t0) / 1000000},""" +
      s""""rows":$cdf}""")

    // read-side: resolve the whole chain (checkpoint + deltas)
    t0 = System.nanoTime()
    val snapN = ManifestLake.latestSnapshot(lake).get
    println(s"""{"step":"resolve","ms":${(System.nanoTime() - t0) / 1000000},""" +
      s""""version":${snapN.version},"files":${snapN.files.length},""" +
      s""""chain_manifest_bytes":${(1L to snapN.version).map(manifestBytes).sum}}""")

    spark.stop()
  }
}
