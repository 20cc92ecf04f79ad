package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Round-16 scale probe — the two families this round added, measured
  * at scale rather than asserted:
  *
  *  1. NESTED-LEAF BLOOM POINT LOOKUP at ×10 FILE COUNT: a lake whose
  *     high-cardinality string leaf (`meta.rid`) is UNCLUSTERED (range
  *     layout on a different leaf), declared in bloomCols. A point
  *     probe must keep a ~constant file count (the needle lives in
  *     ~1 file regardless of lake size; bloom fp adds at most a few),
  *     with the DSv2 pushed-equality kept set identical to the Scala
  *     prune API's answer at both scales — the 100 TB claim is that
  *     `meta.request_id = 'x'` costs file-count-independent opens.
  *
  *  2. MAINTAINER REGISTRY: (a) registerMaintainer write throughput
  *     (it runs once per drained micro-batch — must be noise against
  *     a multi-second drain); (b) vacuum wall time with 0 vs 100
  *     registered maintainers on a 120-version lake (the registry
  *     read is one directory listing — must be flat); (c) the pinning
  *     law at version scale: hw=60 pins v61.., retire count matches
  *     arithmetic, advancing hw releases exactly the difference.
  *
  * Usage: runMain graft.ProbeR16Scale <sfDir> <workDir>
  */
object ProbeR16Scale {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val Array(_, work) = args.take(2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- 1. nested-bloom point lookup at x1 / x10 file count ----
    def buildBloomLake(tag: String, rows: Long, recordsPerFile: Long): String = {
      val dir = Paths.get(work).resolve(s"bloomlake_$tag").toString
      val docs = spark.range(0, rows).select(
        $"id".as("doc_id"),
        struct(($"id" * 7).cast("long").as("ts"),
          concat(lit("req-"), $"id".cast("string")).as("rid")).as("meta"),
        ($"id" % 4).cast("string").as("source"))
      ManifestLake.append(spark, dir, docs.repartitionByRange(16, $"meta.ts"),
        "source", maxRecordsPerFile = recordsPerFile,
        statsCols = Seq("meta.ts"), bloomCols = Seq("meta.rid"))
      dir
    }
    def scanKept(dir: String, probe: String): Vector[String] = {
      val df = spark.read.format("graft").load(dir)
        .filter($"meta.rid" === probe)
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.collectFirst { case g: graft.core.GraftScan => g.keptFiles }
        .getOrElse(sys.error("no GraftScan"))
    }
    Seq(("x1", 40000L), ("x10", 400000L)).foreach { case (tag, rows) =>
      val dir = buildBloomLake(tag, rows, 640L)
      val snap = ManifestLake.latestSnapshot(dir).get
      val probe = s"req-${rows / 2}"
      val (kept, tPrune) = time(
        ManifestLake.pruneFilesPoint(snap, "meta.rid", probe))
      val dsv2 = scanKept(dir, probe)
      val (n, tRead) = time(
        ManifestLake.readPoint(spark, dir, "meta.rid", probe).count())
      println(s"""{"probe":"nested_bloom_point","scale":"$tag","files":${snap.files.length},"kept":${kept.length},"dsv2_kept":${dsv2.length},"prune_sec":$tPrune,"read_sec":$tRead,"rows":$n}""")
      assert(n == 1L, s"point probe must find exactly its row, got $n")
      assert(kept == dsv2, "Scala and DSv2 prune sets must be identical")
      assert(kept.length * 20 < snap.files.length,
        s"bloom must collapse the open set: ${kept.length} of ${snap.files.length}")
    }

    // ---- 2. maintainer registry ----
    val lake = Paths.get(work).resolve("reg_lake").toString
    ManifestLake.append(spark, lake,
      spark.range(0, 1000).select($"id".as("doc_id"),
        ($"id" % 4).cast("string").as("source")), "source",
      maxRecordsPerFile = 256L)
    // (a) registry write throughput
    val (_, tReg) = time {
      var i = 0
      while (i < 1000) {
        ManifestLake.registerMaintainer(lake, "probe-app", "/view", i.toLong)
        i += 1
      }
    }
    println(s"""{"probe":"registry_write","writes":1000,"sec":$tReg,"per_write_ms":${tReg}}""")
    // build a 120-version history of cheap metadata commits (the
    // delete-mode toggle is one of the alterable properties)
    var v = 2
    while (v <= 120) {
      ManifestLake.setProperties(lake, Map("write.delete.mode" ->
        (if (v % 2 == 0) "merge-on-read" else "copy-on-write")))
      v += 1
    }
    ManifestLake.deregisterMaintainer(lake, "probe-app")
    // (b) vacuum wall, 0 vs 100 registered maintainers (dryRun: the
    // census + pin resolution is the measured work, nothing deleted)
    val (_, t0m) = time(ManifestLake.vacuum(lake, keepVersions = 200,
      graceMillis = 0L, dryRun = true))
    (1 to 100).foreach(i =>
      ManifestLake.registerMaintainer(lake, s"app-$i", s"/view/$i", 60L + i))
    val (_, t100m) = time(ManifestLake.vacuum(lake, keepVersions = 200,
      graceMillis = 0L, dryRun = true))
    println(s"""{"probe":"vacuum_census","maintainers0_sec":$t0m,"maintainers100_sec":$t100m}""")
    // (c) pinning law at version scale: floor = min hw = 61 → v62..
    // pinned; keepVersions=1 retires everything below except the floor
    (1 to 100).foreach(i => ManifestLake.deregisterMaintainer(lake, s"app-$i"))
    ManifestLake.registerMaintainer(lake, "lagger", "/view/lag", 60L)
    ManifestLake.vacuum(lake, keepVersions = 1, graceMillis = 0L)
    val mdir = Paths.get(lake).resolve("_manifests")
    def liveVersions(): Vector[Long] = {
      val st = Files.list(mdir)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).toVector.sorted
      } finally st.close()
    }
    val afterLag = liveVersions()
    assert(afterLag.filter(_ > 60L).length == 60,
      s"every version above hw=60 must survive, got ${afterLag.filter(_ > 60L).length}")
    println(s"""{"probe":"registry_pin","hw":60,"live_after_lagging_vacuum":${afterLag.length},"min_live":${afterLag.min}}""")
    ManifestLake.registerMaintainer(lake, "lagger", "/view/lag", 120L)
    ManifestLake.vacuum(lake, keepVersions = 1, graceMillis = 0L)
    val afterDrain = liveVersions()
    println(s"""{"probe":"registry_release","live_after_drained_vacuum":${afterDrain.length}}""")
    assert(afterDrain.length < afterLag.length,
      "advancing the high-water must release retention")
    // ---- 3. join-view dim-side churn: FIXED 5-key churn at ×10 ----
    // fact corpus AND ×10 dim cardinality (rows-per-key fixed). The
    // 100 TB claim: a K-key dim change re-derives K keys' fact rows,
    // fetched through the fk-pruned file set — cost follows the
    // touched keys' rows, NOT the corpus. Kept-file census via the
    // public per-key point prune (the batch's key-set prune follows
    // the same stats layer).
    def jvProbe(tag: String, rows: Long, groups: Int): Unit = {
      val factD = Paths.get(work).resolve(s"jv_fact_$tag").toString
      val dimD = Paths.get(work).resolve(s"jv_dim_$tag").toString
      val viewD = Paths.get(work).resolve(s"jv_view_$tag").toString
      val facts = spark.range(0, rows).select(
        $"id".as("doc_id"),
        concat(lit("g"), ($"id" % groups).cast("string")).as("fk"),
        ($"id" % 4).cast("string").as("p"),
        ($"id" * 3).as("n"))
      ManifestLake.append(spark, factD,
        facts.repartitionByRange(16, $"fk"), "p",
        maxRecordsPerFile = 800L, statsCols = Seq("fk"))
      ManifestLake.setProperties(factD,
        Map("enableChangeDataFeed" -> "true"))
      ManifestLake.append(spark, dimD, spark.range(0, groups).select(
        concat(lit("g"), $"id".cast("string")).as("fk"),
        ($"id" * 100).as("v"), lit("p").as("p")), "p")
      ManifestLake.setProperties(dimD,
        Map("enableChangeDataFeed" -> "true"))
      val project: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        j => j.select(col("f.doc_id").as("doc_id"), col("f.fk").as("fk"),
          col("f.p").as("p"), col("f.n").as("n"), col("d.v").as("v"))
      val transform = ManifestLake.joinViewTransform(
        spark, dimD, "fk", "fk", project)
      import org.apache.spark.sql.types._
      ManifestLake.create(viewD, StructType(Seq(
        StructField("doc_id", LongType), StructField("fk", StringType),
        StructField("p", StringType), StructField("n", LongType),
        StructField("v", LongType))), "p", statsCols = Seq("doc_id"))
      val curF = ManifestLake.latestSnapshot(factD).get.version
      ManifestLake.maintainViewBatch(spark, viewD, Seq("doc_id"),
        transform, "jvp-fact", 0L,
        ManifestLake.readChangeFeed(spark, factD, 0L, curF), "p",
        statsCols = Seq("doc_id"), srcDir = Some(factD))
      val keys = (0 until 5).map(i => "g" + (i * (groups / 5)))
      ManifestLake.updateWhereDv(spark, dimD, col("fk").isin(keys: _*),
        Seq("v" -> (col("v") + 1L)))
      val dv = ManifestLake.latestSnapshot(dimD).get.version
      val w = ManifestLake.readChangeFeed(spark, dimD, dv - 1, dv)
      val (_, tStep) = time(ManifestLake.maintainJoinViewDimBatch(spark,
        viewD, factD, Seq("doc_id"), "fk", "fk", transform, "jvp-dim",
        0L, w, "p", statsCols = Seq("doc_id"), dimDir = dimD))
      val snapF = ManifestLake.latestSnapshot(factD).get
      val keptUnion = keys.flatMap(k =>
        ManifestLake.pruneFilesPoint(snapF, "fk", k)).distinct
      // select by NAME: the lake serves the partition column last
      // (directory-encoded), so positional exceptAll would lie
      val got = ManifestLake.read(spark, viewD)
        .select(col("doc_id"), col("fk"), col("p"), col("n"), col("v"))
      val want = project(ManifestLake.read(spark, factD).alias("f")
        .join(ManifestLake.read(spark, dimD).alias("d"),
          col("f.fk") === col("d.fk"), "inner"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"join view must equal the recompute at $tag")
      println(s"""{"probe":"joinview_dim_churn","scale":"$tag","fact_rows":$rows,"fact_files":${snapF.files.length},"kept_files":${keptUnion.length},"step_sec":$tStep}""")
    }
    jvProbe("x1", 50000L, 200)
    jvProbe("x10", 500000L, 2000)
    println("PROBE_R16_OK")
    spark.stop()
  }
}
