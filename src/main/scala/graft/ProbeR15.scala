package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Round-15 scale probe (r14 verdict asks #3 and #6): the two families
  * this round added — min/max/avg aggregate views with group-scoped
  * rescan, and nested-leaf data skipping — measured at ×10.
  *
  *  1. AGGREGATE-VIEW GROUP CHURN at ×10 DISTINCT GROUPS: a view over
  *     G groups (×1) and 10G groups (×10), exercising all five folds
  *     (count/sum/avg/min/max). Three churn shapes per scale:
  *       - small: a FIXED set of groups mutates → drain time must be
  *         FLAT across scales (cost ∝ changed groups, never group
  *         count), and the keyed replace's appended file count must
  *         equal the touched-group count;
  *       - extinction wave: every row of HALF the groups deleted →
  *         the rescan leg fires per dead group, the drain completes,
  *         every dead group leaves the view;
  *       - high churn: EVERY group touched → drain cost ∝ groups (the
  *         honest linear case), file count ∝ touched groups.
  *     Every scenario converges against the full GROUP BY recompute
  *     before its timing counts (a no-op drain can't fake flatness).
  *
  *  2. NESTED-LEAF SKIPPING at ×10 FILE COUNT: a lake range-clustered
  *     on a struct leaf (`meta.ts`, declared in statsCols), leaf
  *     RENAMED mid-history; the same narrow range filter on the
  *     renamed leaf at ×1 and ×10 must keep a ~constant file COUNT
  *     (the range covers a fixed value span, so kept files track the
  *     span, not the lake), with the DSv2 plan's kept set identical to
  *     the Scala prune API's answer at both scales.
  *
  * Usage: runMain graft.ProbeR15 <sfDir> <workDir>
  * One JSON line per measurement plus PASS/FAIL checks.
  */
object ProbeR15 {

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
      .appName("graft-r15-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val checks = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, String)]

    // ---------------- leg 1: aggregate-view group churn ----------------
    // groups = "g000".."gNNN" (string dims — the reference's channel
    // shape); 100 rows per group; value column exercises sum/avg and
    // the extremes
    def churnLeg(tag: String, groups: Int): (Double, Double, Double, Long, Long) = {
      val lake = s"$work/churn_src_${tag}_${java.util.UUID.randomUUID()}"
      val view = s"$work/churn_view_${tag}_${java.util.UUID.randomUUID()}"
      val ckpt = s"$work/churn_ck_${tag}_${java.util.UUID.randomUUID()}"
      // g = id % groups; within-group row index = id div groups
      // (0..99); v = idx*10 so every group's max row (idx 99) and min
      // row (idx 0) are addressable deterministically at every scale
      val idx = ($"id" / lit(groups)).cast("long")
      val rows = spark.range(0, groups.toLong * 100).select(
        $"id".as("doc_id"),
        concat(lit("g"), ($"id" % groups).cast("string")).as("g"),
        (idx * 10L).as("v"))
      ManifestLake.append(spark, lake, rows.repartition(16, $"g"), "g",
        maxRecordsPerFile = 4096L, statsCols = Seq("doc_id", "v"))
      ManifestLake.setProperties(lake, Map("enableChangeDataFeed" -> "true"))
      import org.apache.spark.sql.types._
      ManifestLake.create(view, StructType(Seq(
        StructField("g", StringType), StructField("n", LongType),
        StructField("sv", LongType), StructField("av", DoubleType),
        StructField("mn", LongType), StructField("mx", LongType))), "g",
        statsCols = Seq("g"))
      val aggs = Seq(ManifestLake.AggSpec("n", "count"),
        ManifestLake.AggSpec("sv", "sum", "v"),
        ManifestLake.AggSpec("av", "avg", "v"),
        ManifestLake.AggSpec("mn", "min", "v"),
        ManifestLake.AggSpec("mx", "max", "v"))
      def drain(): Double = {
        val q = ManifestLake.maintainAggView(spark, lake, view, Seq("g"),
          aggs, "churn", ckpt, "g", statsCols = Seq("g"))
        val (_, sec) = time { require(q.awaitTermination(600000)) }
        sec
      }
      def converged(tag2: String): Unit = {
        val got = ManifestLake.readAggView(spark, view)
          .select($"g", $"n", $"sv", $"av", $"mn", $"mx")
        val want = ManifestLake.read(spark, lake).groupBy($"g")
          .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
            avg($"v".cast("double")).as("av"),
            min($"v").as("mn"), max($"v").as("mx"))
        require(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          s"$tag/$tag2: view did not converge")
      }
      val backfill = drain(); converged("backfill")
      def addedFiles(body: => Unit): Long = {
        val before = ManifestLake.latestSnapshot(view).get.files.toSet
        body
        ManifestLake.latestSnapshot(view).get.files.count(!before.contains(_))
      }
      val gidx = ($"doc_id" / lit(groups)).cast("long")
      // SMALL churn: the same 10 groups mutate at every scale — one
      // NON-extreme row deleted per group (idx 37: fold only)
      var smallSec = 0.0
      val smallFiles = addedFiles {
        ManifestLake.deleteWhereDv(spark, lake,
          ($"doc_id" % groups < 10) && (gidx === 37L))
        smallSec = drain(); converged("small")
      }
      // EXTINCTION WAVE: every row of half the groups — count reaches
      // 0, so the fold drops each group WITHOUT a source rescan
      var waveSec = 0.0
      ManifestLake.deleteWhereDv(spark, lake, $"doc_id" % groups >= groups / 2)
      waveSec = drain(); converged("wave")
      val survivors = ManifestLake.readAggView(spark, view).count()
      require(survivors == (groups / 2).toLong,
        s"$tag: extinction wave must leave ${groups / 2} groups, got $survivors")
      // MAX-KILL: delete the CURRENT MAX row (idx 99) of EVERY
      // surviving group — the rescan leg fires per group, the honest
      // linear worst case (cost ∝ touched groups' rows)
      var killSec = 0.0
      val killFiles = addedFiles {
        ManifestLake.deleteWhereDv(spark, lake, gidx === 99L)
        killSec = drain(); converged("maxkill")
      }
      val mxAfter = ManifestLake.readAggView(spark, view)
        .agg(max($"mx")).head().getLong(0)
      require(mxAfter == 980L, s"$tag: rescan must find the next max, got $mxAfter")
      println(s"""{"leg":"churn","tag":"$tag","groups":$groups,""" +
        s""""backfillSec":$backfill,"smallSec":$smallSec,""" +
        s""""waveSec":$waveSec,"killSec":$killSec,""" +
        s""""smallFiles":$smallFiles,"killFiles":$killFiles}""")
      (smallSec, waveSec, killSec, smallFiles, killFiles)
    }
    val (small1, wave1, kill1, smallF1, killF1) = churnLeg("x1", 100)
    val (small10, wave10, kill10, smallF10, killF10) = churnLeg("x10", 1000)
    checks += (("small_churn_flat_at_x10_groups",
      small10 <= math.max(3.0, small1 * 2.0),
      f"x1=$small1%.2fs x10=$small10%.2fs — fixed 10-group churn must not scale with group count"))
    checks += (("replace_files_track_touched_groups",
      smallF1 <= 12 && smallF10 <= 12,
      s"small-churn appended files x1=$smallF1 x10=$smallF10 (10 groups touched; one file per touched partition)"))
    checks += (("extinction_wave_skips_rescan",
      wave10 <= math.max(6.0, kill10 * 2.0),
      f"x10 wave=$wave10%.2fs vs mass-rescan=$kill10%.2fs — dead groups drop in the fold, no source read"))
    checks += (("mass_rescan_linear_not_worse",
      kill10 <= math.max(8.0, kill1 * 25.0),
      f"x1=$kill1%.2fs x10=$kill10%.2fs for 10x the rescanned groups (honest linear case)"))
    checks += (("rescan_files_track_touched_groups",
      killF1 >= 40 && killF10 >= 400 && killF10 >= killF1 * 5,
      s"max-kill appended files x1=$killF1 (50 groups) x10=$killF10 (500 groups)"))

    // ---------------- leg 2: nested-leaf skipping at x10 ----------------
    def nestedLeg(tag: String, factor: Int): (Int, Int, Int, Double, Boolean) = {
      val lake = s"$work/nskip_${tag}_${java.util.UUID.randomUUID()}"
      val n = 100000L * factor
      val rows = spark.range(0, n).select(
        $"id".as("doc_id"),
        struct(($"id" * 10).as("ts"), ($"id" % 7).cast("int").as("sev")).as("meta"),
        lit("all").as("source"))
      ManifestLake.append(spark, lake,
        rows.repartitionByRange(8 * factor, $"meta.ts"), "source",
        maxRecordsPerFile = 16384L, statsCols = Seq("meta.ts", "doc_id"))
      ManifestLake.alterSchema(lake, Seq(
        ManifestLake.AlterRenameNested(Seq("meta", "ts"), "when")))
      val snap = ManifestLake.latestSnapshot(lake).get
      // fixed VALUE span (same rows at both scales): the kept-file
      // count must track the span, not the lake
      val (lo, hi) = (100000L, 200000L)
      val expect = ManifestLake.pruneFiles(snap, "meta.ts",
        BigDecimal(lo), BigDecimal(hi))
      val df = spark.read.format("graft").load(lake)
        .filter($"meta.when" >= lo && $"meta.when" <= hi)
      val scan = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.collectFirst { case g: graft.core.GraftScan => g }.get
      df.count() // warm
      val (cnt, sec) = time { df.count() }
      require(cnt == (lo to hi by 10).length.toLong, s"$tag: wrong rows $cnt")
      println(s"""{"leg":"nested_skip","tag":"$tag","files":${snap.files.length},""" +
        s""""kept":${scan.keptFiles.length},"expect":${expect.length},""" +
        s""""scanSec":$sec}""")
      (snap.files.length, scan.keptFiles.length, expect.length, sec,
        scan.keptFiles == expect)
    }
    val (files1, kept1, exp1, sec1, agree1) = nestedLeg("x1", 1)
    val (files10, kept10, exp10, sec10, agree10) = nestedLeg("x10", 10)
    checks += (("nested_prune_plan_identity", agree1 && agree10 &&
      kept1 == exp1 && kept10 == exp10,
      s"DSv2 kept == Scala prune at both scales ($kept1/$files1, $kept10/$files10)"))
    checks += (("nested_kept_tracks_span_not_lake",
      kept10 <= kept1 + 2,
      s"fixed value span kept x1=$kept1 of $files1, x10=$kept10 of $files10"))
    checks += (("nested_scan_flat_at_x10",
      sec10 <= math.max(1.0, sec1 * 2.5),
      f"x1=$sec1%.3fs x10=$sec10%.3fs — pruned scan must not scale with the lake"))

    checks.foreach { case (name, ok, detail) =>
      println(s"""{"check":"$name","pass":$ok,"detail":"$detail"}""")
    }
    println(s"""{"probe":"r15_scale","pass":${checks.forall(_._2)}}""")
    spark.stop()
  }
}
