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
  */
object ProbeDml {
  def main(args: Array[String]): Unit = {
    val Array(src, work) = args.take(2)
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

    // merge: 1,000 clustered updates + 100 inserts — constant delta
    val updates = corpus.filter($"doc_id" >= 1000 && $"doc_id" < 2000)
        .select($"doc_id", $"source", ($"n_chars" + 1).as("n_chars"))
      .unionByName(spark.range(0, 100).select(($"id" + 900000000L).as("doc_id"),
        lit("probe").as("source"), lit(1L).as("n_chars")))
    val (mStats, mSec) = timed(ManifestLake.merge(spark, lake, updates, Seq("doc_id")))
    report("merge", mSec, s""","rewritten":${mStats.filesRewritten}""")

    // SQL UPDATE: fixed 500-key clustered range
    val t = s"graft_probe.`$lake`"
    val before = ManifestLake.latestSnapshot(lake).get.files.toSet
    val (_, uSec) = timed(spark.sql(
      s"UPDATE $t SET n_chars = n_chars + 1 WHERE doc_id >= 2500 AND doc_id < 3000"))
    val afterU = ManifestLake.latestSnapshot(lake).get.files.toSet
    report("sql_update", uSec, s""","rewritten":${(before -- afterU).size}""")

    // SQL MERGE INTO: fixed 500-update + 50-insert source, group-filtered
    spark.range(4000, 4500).select($"id".as("doc_id"),
        lit("probe_m").as("source"), lit(3L).as("n_chars"))
      .union(spark.range(0, 50).select(($"id" + 920000000L).as("doc_id"),
        lit("probe_m").as("source"), lit(4L).as("n_chars")))
      .createOrReplaceTempView("probe_dml_mrg")
    val (_, mqSec) = timed(spark.sql(
      s"""MERGE INTO $t g USING probe_dml_mrg u ON g.doc_id = u.doc_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""))
    val afterM = ManifestLake.latestSnapshot(lake).get.files.toSet
    report("sql_merge", mqSec, s""","rewritten":${(afterU -- afterM).size}""")

    // SQL DELETE: fixed 100-key range (metadata-translated path)
    val (_, dSec) = timed(spark.sql(
      s"DELETE FROM $t WHERE doc_id >= 3500 AND doc_id < 3600"))
    report("sql_delete", dSec, "")

    // stream micro-batch: 1,000 rows, stats+bloom continued
    val batch = spark.range(0, 1000).select(($"id" + 910000000L).as("doc_id"),
      lit("probe").as("source"), lit(2L).as("n_chars"))
    val (_, bSec) = timed(ManifestLake.appendBatch(spark, lake, batch, "source",
      "probe", 0L, statsCols = Seq("doc_id"), bloomCols = Seq("doc_id")))
    report("stream_batch", bSec, "")

    spark.stop()
  }
}
