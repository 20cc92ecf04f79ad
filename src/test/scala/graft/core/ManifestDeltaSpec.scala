package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the delta-encoded manifest log (Delta-Lake JSON-log +
  * checkpoint shape): ordinary commits write `#base:` + `+`/`-` edits
  * — O(changed files) I/O — and every
  * [[ManifestLake.ManifestCheckpointEvery]]-th version writes a full
  * snapshot that caps resolve chains. What a delta-resolved snapshot
  * BELIEVES must be byte-for-byte what the equivalent full snapshot
  * would say, vacuum must protect a delta's base chain, and a
  * hand-crafted chain must resolve exactly (not a writer round-trip,
  * which would let matched encode/decode bugs cancel out). */
class ManifestDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def mpath(dir: String, v: Long): Path =
    Paths.get(dir).resolve("_manifests").resolve(f"v$v%012d")

  private def rawLines(dir: String, v: Long): Vector[String] =
    Files.readAllLines(mpath(dir, v)).asScala.filter(_.nonEmpty).toVector

  private def isDelta(dir: String, v: Long): Boolean =
    rawLines(dir, v).exists(_.startsWith("#base:"))

  private def docs(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      $"id".as("doc_id"),
      concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
      concat(lit("text-"), $"id".cast("string")).as("text"))

  test("appends write O(delta) manifests; every version reads back exactly") {
    val dir = Files.createTempDirectory("mdelta").resolve("lake").toString
    ManifestLake.append(spark, dir, docs(0, 100), "source",
      maxRecordsPerFile = 16L, statsCols = Seq("doc_id"))
    ManifestLake.append(spark, dir, docs(100, 110), "source",
      maxRecordsPerFile = 16L, statsCols = Seq("doc_id"))
    ManifestLake.append(spark, dir, docs(110, 120), "source",
      maxRecordsPerFile = 16L, statsCols = Seq("doc_id"))

    // v1 is the lake's first snapshot (nothing to base on); v2/v3 are
    // deltas whose bodies list ONLY their own files as '+' edits
    assert(!isDelta(dir, 1))
    for (v <- 2L to 3L) {
      assert(isDelta(dir, v), s"v$v should be a delta")
      val body = rawLines(dir, v).filterNot(_.startsWith("#"))
      assert(body.nonEmpty && body.forall(_.startsWith("+")),
        s"an append's delta body is pure additions: $body")
      val snap = ManifestLake.snapshotAt(dir, v).get
      val prev = ManifestLake.snapshotAt(dir, v - 1).get
      assert(body.length == snap.files.length - prev.files.length,
        "delta body length == files added by this commit")
    }

    // every version is a complete consistent read, and the resolved
    // snapshot carries the inherited stats planes (prune still works)
    assert(ManifestLake.read(spark, dir).count() == 120L)
    val v2 = ManifestLake.snapshotAt(dir, 2).get
    assert(v2.files.forall(f => v2.stats.contains(f) && v2.rows.contains(f)),
      "delta-resolved snapshots inherit stats and rows for base files")
    val pruned = ManifestLake.pruneFiles(v2, "doc_id", 0L, 5L)
    assert(pruned.nonEmpty && pruned.size < v2.files.size,
      s"stats pruning works on a delta-resolved snapshot: ${pruned.size}/${v2.files.size}")
  }

  test("a changed file line (DV attach) rides the delta as an edit, not a re-list") {
    val dir = Files.createTempDirectory("mdeltadv").resolve("lake").toString
    ManifestLake.append(spark, dir, docs(0, 100), "source",
      maxRecordsPerFile = 16L, statsCols = Seq("doc_id"))
    val before = ManifestLake.latestSnapshot(dir).get
    ManifestLake.deleteWhereDv(spark, dir, $"doc_id" % 10 === 3)
    val after = ManifestLake.latestSnapshot(dir).get

    assert(after.files == before.files, "MoR delete moves no data file")
    assert(isDelta(dir, after.version))
    val body = rawLines(dir, after.version).filterNot(_.startsWith("#"))
    // every body line is a '+' re-statement of a file that gained a DV
    assert(body.forall(_.startsWith("+")) &&
      body.length == after.dvs.size &&
      body.length < after.files.length,
      s"only DV'd files re-encode (${body.length} of ${after.files.length})")
    assert(ManifestLake.read(spark, dir).count() == 90L)
  }

  test("checkpoint cadence: version 16 is full, 17 bases on it, chain stays short") {
    val dir = Files.createTempDirectory("mdeltacp").resolve("lake").toString
    for (i <- 0 until 18)
      ManifestLake.append(spark, dir, docs(i * 10L, i * 10L + 10L), "source",
        maxRecordsPerFile = 64L, statsCols = Seq("doc_id"))
    assert((2L to 15L).forall(isDelta(dir, _)))
    assert(!isDelta(dir, 16L), "checkpoint versions write full snapshots")
    assert(isDelta(dir, 17L) && isDelta(dir, 18L))
    assert(ManifestLake.baseVersionOf(Paths.get(dir), 17L).contains(16L))
    // v18 resolves through exactly two hops (18 -> 17 -> 16)
    assert(ManifestLake.read(spark, dir).count() == 180L)
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.version == 18L && snap.files.forall(snap.rows.contains))
  }

  test("a rewriting commit falls back to a full snapshot when the diff is not smaller") {
    val dir = Files.createTempDirectory("mdeltafull").resolve("lake").toString
    ManifestLake.append(spark, dir, docs(0, 200), "source",
      maxRecordsPerFile = 8L, statsCols = Seq("doc_id"))
    // compact rewrites every fragmented partition: the diff would
    // re-state every file (+N new, -M old > N full lines) — the commit
    // must notice and write the smaller full form
    ManifestLake.compact(spark, dir, "source", targetRecordsPerFile = 1024L)
    val v2 = ManifestLake.latestSnapshot(dir).get
    assert(v2.version == 2L && !isDelta(dir, 2L),
      "whole-lake rewrite writes full, not a 2x-sized delta")
    assert(ManifestLake.read(spark, dir).count() == 200L)
  }

  test("vacuum keeps a protected delta's base chain and retires the rest") {
    val dir = Files.createTempDirectory("mdeltavac").resolve("lake").toString
    for (i <- 0 until 6)
      ManifestLake.append(spark, dir, docs(i * 10L, i * 10L + 10L), "source",
        maxRecordsPerFile = 64L)
    // protect only v6 (a delta): its chain v1..v5 must survive for
    // resolution even though v1..v4 fell out of the retention window
    ManifestLake.vacuum(dir, keepVersions = 1, graceMillis = 0L)
    assert(ManifestLake.versions(dir) == Vector(1L, 2L, 3L, 4L, 5L, 6L),
      "every base in the protected chain stays on disk")
    assert(ManifestLake.read(spark, dir).count() == 60L)

    // after a checkpoint the chain is cut: older manifests CAN retire.
    // 11 more appends drive the log past v16 (checkpoint) to v17
    for (i <- 6 until 17)
      ManifestLake.append(spark, dir, docs(i * 10L, i * 10L + 10L), "source",
        maxRecordsPerFile = 64L)
    ManifestLake.vacuum(dir, keepVersions = 1, graceMillis = 0L)
    assert(ManifestLake.versions(dir) == Vector(16L, 17L),
      "post-checkpoint, only the protected version and its checkpoint remain")
    assert(ManifestLake.read(spark, dir).count() == 170L)
    // vacuum never deleted live data along the way
    assert(ManifestLake.latestSnapshot(dir).get.files.forall(f =>
      Files.exists(Paths.get(dir).resolve(f))))
  }

  test("vacuum dry run reports exactly what the real run then reclaims, touching nothing") {
    val dir = Files.createTempDirectory("mdeltadry").resolve("lake").toString
    ManifestLake.append(spark, dir, docs(0, 100), "source", maxRecordsPerFile = 16L)
    ManifestLake.compact(spark, dir, "source", targetRecordsPerFile = 1024L)
    val filesBefore = Files.walk(Paths.get(dir)).count()
    val wouldReclaim = ManifestLake.vacuum(dir, keepVersions = 1,
      graceMillis = 0L, dryRun = true)
    assert(wouldReclaim > 0L, "the compacted-away fragments are reclaimable")
    assert(Files.walk(Paths.get(dir)).count() == filesBefore,
      "dry run must not delete anything")
    assert(ManifestLake.versions(dir) == Vector(1L, 2L),
      "dry run must not retire manifests either")
    val reclaimed = ManifestLake.vacuum(dir, keepVersions = 1, graceMillis = 0L)
    assert(reclaimed == wouldReclaim,
      s"real run ($reclaimed) must reclaim what the dry run reported ($wouldReclaim)")
    assert(ManifestLake.read(spark, dir).count() == 100L)

    // the SQL face: CALL vacuum(dry_run => true)
    spark.conf.set("spark.sql.catalog.graft_dry", classOf[GraftCatalog].getName)
    ManifestLake.append(spark, dir, docs(100, 120), "source", maxRecordsPerFile = 16L)
    ManifestLake.compact(spark, dir, "source", targetRecordsPerFile = 2048L)
    val viaSql = spark.sql(s"CALL graft_dry.vacuum(path => '$dir', " +
      "keep_versions => 1, grace_millis => 0, dry_run => true)").head().getLong(0)
    assert(viaSql > 0L)
    assert(ManifestLake.vacuum(dir, keepVersions = 1, graceMillis = 0L) == viaSql)
  }

  test("hand-crafted chain resolves exactly: add, replace, remove, re-sort") {
    val root = Files.createTempDirectory("mdeltahand")
    val mdir = root.resolve("_manifests")
    Files.createDirectories(mdir)
    // v1: full snapshot, two files with stats
    Files.write(mdir.resolve("v000000000001"), Seq(
      "#op:append", "#ts:1000",
      "source=a/f1.parquet\trows:10\tdoc_id:1:9",
      "source=a/f2.parquet\trows:5\tdoc_id:10:20").asJava)
    // v2: delta — removes f1, re-states f2 with a DV, adds f3
    Files.write(mdir.resolve("v000000000002"), Seq(
      "#op:delete", "#ts:2000", "#base:1",
      "-source=a/f1.parquet",
      "+source=a/f2.parquet\trows:5\tdv:2:_dv/x.dv\tdoc_id:10:20",
      "+source=a/f0.parquet\trows:7\tdoc_id:21:30").asJava)
    val snap = ManifestLake.snapshotAt(root.toString, 2).get
    assert(snap.files == Vector("source=a/f0.parquet", "source=a/f2.parquet"),
      "resolution removes, adds, and re-sorts by path")
    assert(snap.op == "delete" && snap.tsMillis.contains(2000L),
      "headers come from the TOP manifest only")
    assert(snap.dvs.get("source=a/f2.parquet").exists(d =>
      d.count == 2L && d.path == "_dv/x.dv"))
    assert(snap.rows == Map("source=a/f0.parquet" -> 7L, "source=a/f2.parquet" -> 5L))
    assert(snap.netRows("source=a/f2.parquet").contains(3L))
    // v1 is untouched by v2's existence
    val v1 = ManifestLake.snapshotAt(root.toString, 1).get
    assert(v1.files == Vector("source=a/f1.parquet", "source=a/f2.parquet")
      && v1.dvs.isEmpty)
  }
}
