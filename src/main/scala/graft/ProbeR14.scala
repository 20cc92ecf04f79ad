package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Round-14 scale probe (r13 verdict ask #2): the round-13/14
  * families — column mapping, type widening, streaming view
  * maintenance (row-wise AND the new aggregate views) — had spec pins
  * but no ×10 scale row. Three legs:
  *
  *  1. COLUMN MAPPING boundary cost on a many-file mapped lake:
  *     planning+execution of the same pruned point read pre- and
  *     post-rename must be flat, the DSv2 plan's PushedFilters must be
  *     IDENTICAL modulo the physical spelling, and the manifest prune
  *     must keep the same file count — the mapping is a name bridge,
  *     never a plan change. Measured at ×1 and ×10 file count.
  *
  *  2. WIDENED-LAKE scan at ×10: a lake whose int column was widened
  *     to long (half its files int-era, half long-era) scanned against
  *     a natively-long control of identical data — the vectorized
  *     upcast must cost ≈ nothing (ratio bound), and the skipping
  *     index must prune the same file count on both (survival
  *     MEASURED, not just spec'd).
  *
  *  3. VIEW MAINTENANCE window-∝ at ×10: maintainView and
  *     maintainAggView backfill a ×1 and a ×10 CDF lake (corpus-sized,
  *     expected to grow), then a FIXED-size mutation drains through
  *     both — the incremental drain's wall time must stay flat at ×10
  *     lake size (cost ∝ window, never corpus).
  *
  * Usage: runMain graft.ProbeR14 <sfDir> <workDir>
  * One JSON line per measurement plus PASS/FAIL checks.
  */
object ProbeR14 {

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
      .appName("graft-r14-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"source", $"n_chars")
    def replicated(factor: Int): DataFrame =
      (0 until factor).map { k =>
        if (k == 0) base
        else base.withColumn("doc_id", $"doc_id" + lit(k * 1000000L))
      }.reduce(_ unionByName _)

    val checks = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, String)]

    // ---------------- leg 1: column mapping boundary ----------------
    def mappingLeg(tag: String, factor: Int): (Double, Double, Int, Int, Boolean) = {
      val lake = s"$work/map_${tag}_${java.util.UUID.randomUUID()}"
      ManifestLake.append(spark, lake,
        replicated(factor).repartition($"source"), "source",
        maxRecordsPerFile = 64L, statsCols = Seq("doc_id"),
        bloomCols = Seq("doc_id"))                                   // v1
    val files = ManifestLake.latestSnapshot(lake).get.files.length
      def pointRead(colName: String): (Long, Double, String) = {
        val df = spark.read.format("graft").option("path", lake).load()
          .filter(col(colName) >= 100L && col(colName) <= 4200L)
          .select(col(colName), col("source"))
        val (n, sec) = time { df.count() }
        val plan = df.queryExecution.executedPlan.toString
        (n, sec, plan)
      }
      pointRead("doc_id") // warm
      val (n1, sec1, plan1) = pointRead("doc_id")
      ManifestLake.renameColumn(lake, "doc_id", "document_id")       // v2: props only
      val (n2, sec2, plan2) = pointRead("document_id")
      def prunedOf(p: String): Int =
        "prunedFiles=(\\d+)/".r.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
      def pushedOf(p: String): String =
        "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
      val samePruned = prunedOf(plan1) == prunedOf(plan2) && prunedOf(plan1) >= 0
      val pushedSame = pushedOf(plan2) ==
        pushedOf(plan1).replace("doc_id", "document_id") ||
        pushedOf(plan1) == pushedOf(plan2) // spelling-translated equality
      println(s"""{"leg":"mapping","tag":"$tag","files":$files,""" +
        s""""preSec":$sec1,"postSec":$sec2,"rowsPre":$n1,"rowsPost":$n2,""" +
        s""""prunedPre":${prunedOf(plan1)},"prunedPost":${prunedOf(plan2)},""" +
        s""""pushedSame":$pushedSame}""")
      (sec1, sec2, prunedOf(plan1), prunedOf(plan2), pushedSame && n1 == n2)
    }
    val (m1pre, m1post, _, _, m1ok) = mappingLeg("x1", 1)
    val (m10pre, m10post, p10a, p10b, m10ok) = mappingLeg("x10", 10)
    checks += (("mapping_plan_identical", m1ok && m10ok && p10a == p10b,
      s"x10 pruned $p10a==$p10b"))
    checks += (("mapping_boundary_flat",
      m10post <= math.max(0.5, m10pre * 2.5),
      f"x10 pre=$m10pre%.2fs post=$m10post%.2fs (x1 $m1pre%.2f/$m1post%.2f)"))

    // ---------------- leg 2: widened-lake scan vs native control ----
    def widenLeg(factor: Int): (Double, Double, Int, Int) = {
      val docs = replicated(factor).select($"doc_id", $"source",
        $"n_chars".cast("long").as("nc"))
      val widened = s"$work/widen_${factor}_${java.util.UUID.randomUUID()}"
      val control = s"$work/ctrl_${factor}_${java.util.UUID.randomUUID()}"
      // widened lake: gen-1 int files, widen, gen-2 long files
      ManifestLake.append(spark, widened,
        docs.filter($"doc_id" % 2 === 0)
          .select($"doc_id", $"source", $"nc".cast("int").as("nc"))
          .repartition($"source"), "source",
        maxRecordsPerFile = 64L, statsCols = Seq("doc_id", "nc"))
      ManifestLake.widenColumn(widened, "nc",
        org.apache.spark.sql.types.LongType)
      ManifestLake.append(spark, widened,
        docs.filter($"doc_id" % 2 === 1).repartition($"source"), "source",
        maxRecordsPerFile = 64L, statsCols = Seq("doc_id", "nc"))
      // control: one generation, natively long
      ManifestLake.append(spark, control, docs.repartition($"source"),
        "source", maxRecordsPerFile = 64L, statsCols = Seq("doc_id", "nc"))
      def scan(lake: String): Double = {
        val (_, s0) = time { ManifestLake.read(spark, lake)
          .agg(sum($"nc"), count(lit(1))).head() }
        val (_, s1) = time { ManifestLake.read(spark, lake)
          .agg(sum($"nc"), count(lit(1))).head() }
        math.min(s0, s1)
      }
      val wSec = scan(widened); val cSec = scan(control)
      // skipping survival: the same narrow doc_id range must prune the
      // same share of files on both lakes
      def prunedCount(lake: String): Int = {
        val snap = ManifestLake.latestSnapshot(lake).get
        ManifestLake.pruneFiles(snap, "doc_id",
          BigDecimal(100), BigDecimal(200)).length
      }
      val (wKept, cKept) = (prunedCount(widened), prunedCount(control))
      println(s"""{"leg":"widen","factor":$factor,"widenedSec":$wSec,""" +
        s""""controlSec":$cSec,"widenedKept":$wKept,"controlKept":$cKept,""" +
        s""""files":${ManifestLake.latestSnapshot(widened).get.files.length}}""")
      (wSec, cSec, wKept, cKept)
    }
    val (w1, c1, _, _) = widenLeg(1)
    val (w10, c10, wk, ck) = widenLeg(10)
    checks += (("widened_scan_near_native",
      w10 <= c10 * 1.6 + 0.3,
      f"x10 widened=$w10%.2fs native=$c10%.2fs (x1 $w1%.2f/$c1%.2f)"))
    checks += (("widened_skipping_survives", wk > 0 && wk <= ck + 2,
      s"kept widened=$wk native=$ck"))

    // ---------------- leg 3: view maintenance window-∝ ----------------
    def viewLeg(tag: String, factor: Int): (Double, Double, Double, Double) = {
      val lake = s"$work/mv_${tag}_${java.util.UUID.randomUUID()}"
      val rview = s"$work/mvr_${tag}_${java.util.UUID.randomUUID()}"
      val aview = s"$work/mva_${tag}_${java.util.UUID.randomUUID()}"
      val ck1 = s"$work/ck1_${tag}_${java.util.UUID.randomUUID()}"
      val ck2 = s"$work/ck2_${tag}_${java.util.UUID.randomUUID()}"
      ManifestLake.append(spark, lake,
        replicated(factor).select($"doc_id", $"source", $"n_chars")
          .repartition($"source"), "source",
        maxRecordsPerFile = 256L, statsCols = Seq("doc_id"),
        bloomCols = Seq("doc_id"))                                   // v1
      ManifestLake.setProperties(lake, Map("enableChangeDataFeed" -> "true"))
      import org.apache.spark.sql.types._
      def transform(rows: DataFrame): DataFrame = rows
        .filter($"n_chars" % 2 === 0)
        .select($"doc_id", $"source", ($"n_chars" * 2).as("n2"))
      ManifestLake.create(rview, StructType(Seq(
        StructField("doc_id", LongType), StructField("source", StringType),
        StructField("n2", LongType))), "source",
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      val aggs = Seq(ManifestLake.AggSpec("n_docs", "count"),
        ManifestLake.AggSpec("sum_chars", "sum", "n_chars"))
      ManifestLake.create(aview, StructType(Seq(
        StructField("source", StringType), StructField("n_docs", LongType),
        StructField("sum_chars", LongType))), "source",
        statsCols = Seq("source"))
      def drainRow(): Double = {
        val q = ManifestLake.maintainView(spark, lake, rview, Seq("doc_id"),
          transform, "mvr", ck1, "source", statsCols = Seq("doc_id"),
          bloomCols = Seq("doc_id"))
        val (_, sec) = time { require(q.awaitTermination(600000)) }
        sec
      }
      def drainAgg(): Double = {
        val q = ManifestLake.maintainAggView(spark, lake, aview,
          Seq("source"), aggs, "mva", ck2, "source",
          statsCols = Seq("source"))
        val (_, sec) = time { require(q.awaitTermination(600000)) }
        sec
      }
      val backfillR = drainRow(); val backfillA = drainAgg()
      // FIXED-size mutation (replica-0 ids only) at both scales
      ManifestLake.deleteWhereDv(spark, lake,
        $"doc_id" % 97 === 3 && $"doc_id" < 1000000L)
      ManifestLake.updateWhereDv(spark, lake,
        $"doc_id" % 89 === 7 && $"doc_id" < 1000000L,
        Seq("n_chars" -> ($"n_chars" + 2L)))
      val incR = drainRow(); val incA = drainAgg()
      // convergence — the timings above are only meaningful if the
      // drains actually maintained the views
      val wantR = transform(ManifestLake.read(spark, lake))
        .select($"doc_id", $"source", $"n2")
      val gotR = ManifestLake.read(spark, rview)
        .select($"doc_id", $"source", $"n2")
      require(gotR.exceptAll(wantR).isEmpty && wantR.exceptAll(gotR).isEmpty,
        s"$tag: row view did not converge")
      val wantA = ManifestLake.read(spark, lake).groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum($"n_chars"), lit(0L)).as("sum_chars"))
        .select($"source", $"n_docs", $"sum_chars")
      val gotA = ManifestLake.read(spark, aview)
        .select($"source", $"n_docs", $"sum_chars")
      require(gotA.exceptAll(wantA).isEmpty && wantA.exceptAll(gotA).isEmpty,
        s"$tag: aggregate view did not converge")
      println(s"""{"leg":"views","tag":"$tag",""" +
        s""""backfillRowSec":$backfillR,"incRowSec":$incR,""" +
        s""""backfillAggSec":$backfillA,"incAggSec":$incA}""")
      (backfillR, incR, backfillA, incA)
    }
    val (_, incR1, _, incA1) = viewLeg("x1", 1)
    val (bR10, incR10, bA10, incA10) = viewLeg("x10", 10)
    checks += (("row_view_increment_flat",
      incR10 <= math.max(3.0, incR1 * 2.0),
      f"x1=$incR1%.2fs x10=$incR10%.2fs (x10 backfill $bR10%.1fs)"))
    checks += (("agg_view_increment_flat",
      incA10 <= math.max(3.0, incA1 * 2.0),
      f"x1=$incA1%.2fs x10=$incA10%.2fs (x10 backfill $bA10%.1fs)"))

    checks.foreach { case (name, ok, detail) =>
      println(s"""{"check":"$name","pass":$ok,"detail":"$detail"}""")
    }
    println(s"""{"probe":"r14_scale","pass":${checks.forall(_._2)}}""")
    spark.stop()
  }
}
