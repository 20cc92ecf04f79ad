package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Derived-state scale probe (r12 verdict ask #1): the round-12
  * operator family — CDF sidecar write/read, scd2/scd2Increment, IVM
  * maintenance via deleteKeysDv, publish resolution — has bench rows
  * that were pin-dominated and never had a scale row. This probe runs
  * the family at ×1 and ×10 file count with BOTH mutation regimes and
  * asserts every cost term is mutation-proportional, never lake-sized:
  *
  *  - FIXED-size mutations (same absolute matched rows at both
  *    scales): sidecar bytes and feed-read rows must stay FLAT at ×10
  *    lake size — the change record scales with the change, not the
  *    corpus;
  *  - PROPORTIONAL mutations (10× matched rows at ×10): sidecar bytes
  *    must scale ~10× — the record is exact, not sampled;
  *  - scd2Increment's history join must BROADCAST when the window is
  *    small against a big history (executed-plan check), and its wall
  *    time must stay window-sized while the full rebuild grows with
  *    the history;
  *  - deleteKeysDv past the 100k driver-key cap (the envelope
  *    fallback, untested at scale before this probe): a NARROW 150k-id
  *    envelope must run far cheaper than a lake-spanning one, and both
  *    must delete exactly the ground-truth count;
  *  - publish resolution cost is a manifest parse — flat at ×10.
  *
  * Usage: runMain graft.ProbeDerived <sfDir> <workDir>
  * Prints one JSON line per measurement plus PASS/FAIL checks.
  */
object ProbeDerived {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, work) = args.take(2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .appName("graft-derived-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"source")
    def replicated(factor: Int): DataFrame =
      (0 until factor).map { k =>
        if (k == 0) base
        else base.withColumn("doc_id", $"doc_id" + lit(k * 1000000L))
          .withColumn("text", concat($"text", lit(s" r$k")))
      }.reduce(_ unionByName _)

    final case class Row(tag: String, files: Int,
                         fixedDelRows: Long, fixedUpdRows: Long,
                         fixedSidecarBytes: Long, fixedFeedRows: Long,
                         fixedFeedSec: Double,
                         propSidecarBytes: Long, propUpdRows: Long,
                         scd2FullSec: Double, scd2IncSec: Double,
                         incBroadcast: Boolean,
                         ivmSec: Double,
                         envNarrowSec: Double, envNarrowRows: Long,
                         envWideSec: Double, envWideRows: Long,
                         publishSec: Double)

    def run(tag: String, factor: Int): Row = {
      val lake = s"$work/derived_${tag}_${java.util.UUID.randomUUID()}"
      val docs = replicated(factor)
      ManifestLake.append(spark, lake, docs.repartition($"source"), "source",
        maxRecordsPerFile = 64L, statsCols = Seq("doc_id"))            // v1
      ManifestLake.setProperties(lake, Map("enableChangeDataFeed" -> "true")) // v2
      val files = ManifestLake.latestSnapshot(lake).get.files.length

      // --- FIXED-size mutations: replica-0 ids only, both scales ---
      val fixedDel = ManifestLake.deleteWhereDv(spark, lake,
        $"doc_id" % 97 === 3 && $"doc_id" < 1000000L)                  // v3
      val mid = ManifestLake.latestSnapshot(lake).get.version
      spark.conf.set("spark.sql.catalog.graft_dprobe",
        classOf[graft.core.GraftCatalog].getName)
      spark.sql(s"UPDATE graft_dprobe.`$lake` SET text = concat(text, ' zz') " +
        "WHERE doc_id % 89 = 7 AND doc_id < 1000000")                  // v4 COW
      val v4 = ManifestLake.latestSnapshot(lake).get
      val root = java.nio.file.Paths.get(lake)
      def bytesOf(rels: Vector[String]): Long =
        rels.map(f => java.nio.file.Files.size(root.resolve(f))).sum
      val fixedSidecar = bytesOf(v4.cdfFiles)
      val fixedUpd = ManifestLake.readChangeFeed(spark, lake, mid, v4.version)
        .filter($"_change_type" === "update_postimage").count()
      val (fixedFeedRows, fixedFeedSec) = time {
        ManifestLake.readChangeFeed(spark, lake, 2L, v4.version).count()
      }

      // --- scd2 full vs incremental (window = the two DML commits) ---
      val history = ManifestLake.scd2(spark, lake, 0L, mid, Seq("doc_id")).persist()
      history.count()
      val (_, scd2FullSec) = time {
        ManifestLake.scd2(spark, lake, 0L, v4.version, Seq("doc_id")).count()
      }
      val incDf = ManifestLake.scd2Increment(spark, lake, history,
        mid, v4.version, Seq("doc_id"))
      val (_, scd2IncSec) = time { incDf.count() }
      val incBroadcast = incDf.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin")
      history.unpersist()

      // --- IVM maintenance: feed window → deleteKeysDv + append ---
      val view = s"$work/derived_view_${tag}_${java.util.UUID.randomUUID()}"
      def transform(rows: DataFrame): DataFrame = rows
        .filter(length($"text") % 2 === 0)
        .select($"doc_id", $"source", length($"text").cast("long").as("n_chars"))
      ManifestLake.append(spark, view,
        transform(ManifestLake.read(spark, lake,
          ManifestLake.snapshotAt(lake, 2L))), "source",
        maxRecordsPerFile = 256L, statsCols = Seq("doc_id"),
        bloomCols = Seq("doc_id"))
      val (_, ivmSec) = time {
        val feed = ManifestLake.readChangeFeed(spark, lake, 2L, v4.version).persist()
        ManifestLake.deleteKeysDv(spark, view, feed.select($"doc_id"), Seq("doc_id"))
        val adds = transform(feed.filter($"_change_type" === "insert" ||
            $"_change_type" === "update_postimage")
          .select($"doc_id", $"text", $"source"))
        if (!adds.isEmpty)
          ManifestLake.append(spark, view, adds, "source",
            maxRecordsPerFile = 256L, statsCols = Seq("doc_id"),
            bloomCols = Seq("doc_id"))
        feed.unpersist()
      }

      // --- PROPORTIONAL mutation: all replicas (10× rows at ×10) ---
      spark.sql(s"UPDATE graft_dprobe.`$lake` SET text = concat(text, ' pp') " +
        "WHERE doc_id % 103 = 9")                                      // v5 COW
      val v5 = ManifestLake.latestSnapshot(lake).get
      val propSidecar = bytesOf(v5.cdfFiles)
      val propUpd = ManifestLake.readChangeFeed(spark, lake, v4.version, v5.version)
        .filter($"_change_type" === "update_postimage").count()

      // --- deleteKeysDv ENVELOPE fallback (>100k keys) ---
      // narrow: 150k contiguous ids inside ONE replica's id block —
      // the min/max envelope prunes to that replica's files
      val hi = factor.toLong.max(2L) - 1L
      val (envNarrowRows, envNarrowSec) = time {
        ManifestLake.deleteKeysDv(spark, lake,
          spark.range(hi * 1000000L, hi * 1000000L + 150000L)
            .select($"id".as("doc_id")), Seq("doc_id"))
      }
      // wide: 150k keys spanning the whole id space — the envelope
      // covers everything, the scan is lake-sized (the control)
      val step = (hi * 1000000L + 999999L) / 150000L + 1L
      val (envWideRows, envWideSec) = time {
        ManifestLake.deleteKeysDv(spark, lake,
          spark.range(0L, 150000L).select(($"id" * step + 1L).as("doc_id")),
          Seq("doc_id"))
      }

      // --- publish resolution: manifest parse, flat at any scale ---
      val coord = s"$work/derived_coord_${tag}_${java.util.UUID.randomUUID()}"
      val vNow = ManifestLake.latestSnapshot(lake).get.version
      graft.core.PublishLog.publish(coord, Map(lake -> vNow))
      val (_, publishSec) = time {
        graft.core.PublishLog.readPublished(spark, coord, lake)
          .select($"doc_id").limit(1).count()
      }

      Row(tag, files, fixedDel, fixedUpd, fixedSidecar, fixedFeedRows,
        fixedFeedSec, propSidecar, propUpd, scd2FullSec, scd2IncSec,
        incBroadcast, ivmSec, envNarrowSec, envNarrowRows,
        envWideSec, envWideRows, publishSec)
    }

    val r1 = run("x1", 1)
    val r10 = run("x10", 10)
    Seq(r1, r10).foreach { r =>
      println(s"""{"probe":"derived","tag":"${r.tag}","files":${r.files},""" +
        s""""fixed_del_rows":${r.fixedDelRows},"fixed_upd_rows":${r.fixedUpdRows},""" +
        s""""fixed_sidecar_bytes":${r.fixedSidecarBytes},""" +
        s""""fixed_feed_rows":${r.fixedFeedRows},"fixed_feed_sec":${f"${r.fixedFeedSec}%.2f"},""" +
        s""""prop_sidecar_bytes":${r.propSidecarBytes},"prop_upd_rows":${r.propUpdRows},""" +
        s""""scd2_full_sec":${f"${r.scd2FullSec}%.2f"},"scd2_inc_sec":${f"${r.scd2IncSec}%.2f"},""" +
        s""""inc_broadcast":${r.incBroadcast},"ivm_sec":${f"${r.ivmSec}%.2f"},""" +
        s""""env_narrow_sec":${f"${r.envNarrowSec}%.2f"},"env_narrow_rows":${r.envNarrowRows},""" +
        s""""env_wide_sec":${f"${r.envWideSec}%.2f"},"env_wide_rows":${r.envWideRows},""" +
        s""""publish_sec":${f"${r.publishSec}%.2f"}}""")
    }
    val checks = Seq(
      ("fixed_mutation_size_matches",
        r1.fixedDelRows == r10.fixedDelRows && r1.fixedUpdRows == r10.fixedUpdRows,
        s"del ${r1.fixedDelRows}/${r10.fixedDelRows} upd ${r1.fixedUpdRows}/${r10.fixedUpdRows}"),
      ("sidecar_bytes_mutation_proportional_not_lake_sized",
        r10.fixedSidecarBytes < r1.fixedSidecarBytes * 3,
        s"x1=${r1.fixedSidecarBytes}B x10=${r10.fixedSidecarBytes}B at 10x lake"),
      ("sidecar_bytes_scale_with_mutation",
        r10.propSidecarBytes > r1.propSidecarBytes * 4 &&
          r10.propUpdRows > r1.propUpdRows * 8,
        s"x1=${r1.propSidecarBytes}B/${r1.propUpdRows}rows x10=${r10.propSidecarBytes}B/${r10.propUpdRows}rows"),
      ("feed_rows_change_sized", r10.fixedFeedRows == r1.fixedFeedRows,
        s"x1=${r1.fixedFeedRows} x10=${r10.fixedFeedRows}"),
      ("scd2_increment_broadcasts_small_window",
        r10.incBroadcast, s"x1=${r1.incBroadcast} x10=${r10.incBroadcast}"),
      ("envelope_prunes_past_100k_cap",
        r10.envNarrowSec < r10.envWideSec &&
          r10.envNarrowRows > 0 && r10.envWideRows > 0,
        s"narrow ${f"${r10.envNarrowSec}%.2f"}s/${r10.envNarrowRows}rows " +
          s"wide ${f"${r10.envWideSec}%.2f"}s/${r10.envWideRows}rows"))
    checks.foreach { case (n, ok, d) =>
      println(s"""{"check":"$n","pass":$ok,"detail":"$d"}""")
    }
    println(s"""{"probe":"derived_state_scale","pass":${checks.forall(_._2)}}""")
    spark.stop()
  }
}
