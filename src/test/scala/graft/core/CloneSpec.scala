package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zero-copy clone ([[ManifestLake.clone]]): the invariants that make
  * a hard-link clone trustworthy are INDEPENDENCE in both directions —
  * mutation and reclamation on either side must be invisible to the
  * other — plus verbatim metadata carry (the skipping index and MoR
  * state survive) and fresh history (txns and CDF references do not).
  */
class CloneSpec extends SparkSpec {

  private def mkLake(dir: String, n: Long = 200L): Unit = {
    import spark.implicits._
    val df = spark.range(0, n)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        ($"id" * 10).as("n_chars"))
    ManifestLake.append(spark, dir, df, "source",
      maxRecordsPerFile = 32L, statsCols = Seq("doc_id"),
      bloomCols = Seq("doc_id"))
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  test("clone equals the source snapshot, rows and metadata, without copying bytes") {
    import spark.implicits._
    val src = tmp("clone_basic_src")
    val dst = tmp("clone_basic_dst")
    mkLake(src)
    ManifestLake.deleteWhereDv(spark, src, $"doc_id" % 10 === 3) // v2, MoR
    val snap = ManifestLake.clone(src, dst)
    assert(snap.version == 1L && snap.op == "clone")
    // rows identical, DV-deleted rows stay invisible through the clone
    val a = ManifestLake.read(spark, src).orderBy("doc_id").collect()
    val b = ManifestLake.read(spark, dst).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(ManifestLake.read(spark, dst).filter($"doc_id" % 10 === 3).count() == 0L)
    // zero-copy: every cloned data file shares its inode with the source
    val srcSnap = ManifestLake.latestSnapshot(src).get
    val shared = srcSnap.files.forall { f =>
      val sk = Files.readAttributes(Paths.get(src).resolve(f),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      val dk = Files.readAttributes(Paths.get(dst).resolve(f),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      sk == dk
    }
    assert(shared, "clone must hard-link, not copy, on one filesystem")
    // metadata carries verbatim; history does not
    assert(snap.stats == srcSnap.stats && snap.blooms == srcSnap.blooms &&
      snap.rows == srcSnap.rows && snap.dvs == srcSnap.dvs &&
      snap.schema == srcSnap.schema && snap.props == srcSnap.props)
    assert(snap.txns.isEmpty && snap.cdfFiles.isEmpty)
    // the carried skipping index actually skips in the clone
    assert(ManifestLake.readWhere(spark, dst, "doc_id",
      BigDecimal(4), BigDecimal(4)).count() == 1L)
  }

  test("time-travel clone: versionAsOf pins the clone below later source commits") {
    import spark.implicits._
    val src = tmp("clone_asof_src")
    val dst = tmp("clone_asof_dst")
    mkLake(src)                                                  // v1
    ManifestLake.deleteWhereDv(spark, src, $"doc_id" < 100)      // v2
    val snap = ManifestLake.clone(src, dst, versionAsOf = Some(1L))
    assert(snap.version == 1L)
    assert(ManifestLake.read(spark, dst).count() == 200L,
      "a v1 clone must predate the delete")
    assert(ManifestLake.read(spark, src).count() == 100L)
  }

  test("timestamp-addressed clone resolves by the TIMESTAMP AS OF rule; both forms refuse") {
    import spark.implicits._
    val src = tmp("clone_ts_src")
    mkLake(src)                                                  // v1
    val ts1 = ManifestLake.latestSnapshot(src).get.tsMillis.get
    Thread.sleep(5)
    ManifestLake.deleteWhereDv(spark, src, $"doc_id" < 100)      // v2
    val snap = ManifestLake.clone(src, tmp("clone_ts_dst"),
      timestampAsOf = Some(ts1))
    assert(snap.rows.values.sum == 200L && snap.dvs.isEmpty,
      "the ts1 instant must resolve to v1, before the delete")
    val e1 = intercept[IllegalArgumentException](ManifestLake.clone(
      src, tmp("clone_ts_dst2"), versionAsOf = Some(1L),
      timestampAsOf = Some(ts1)))
    assert(e1.getMessage.contains("at most one"))
    val e2 = intercept[IllegalStateException](ManifestLake.clone(
      src, tmp("clone_ts_dst3"), timestampAsOf = Some(ts1 - 100000)))
    assert(e2.getMessage.contains("every retained"))
  }

  test("independence: source mutation + vacuum cannot touch the clone, and vice versa") {
    import spark.implicits._
    val src = tmp("clone_indep_src")
    val dst = tmp("clone_indep_dst")
    mkLake(src)
    ManifestLake.clone(src, dst)
    val cloneBefore = ManifestLake.read(spark, dst).orderBy("doc_id").collect()
    // source: compact rewrites every file, then vacuum unlinks the originals
    ManifestLake.compact(spark, src, "source", targetRecordsPerFile = 1024L * 1024)
    ManifestLake.vacuum(src, keepVersions = 1, graceMillis = 0L)
    assert(ManifestLake.read(spark, dst).orderBy("doc_id").collect()
      .sameElements(cloneBefore),
      "vacuumed source originals must survive as the clone's links")
    // clone: DML + compact + vacuum; the source keeps its content
    val srcBefore = ManifestLake.read(spark, src).orderBy("doc_id").collect()
    ManifestLake.deleteWhereDv(spark, dst, $"doc_id" % 2 === 0)
    ManifestLake.compact(spark, dst, "source", targetRecordsPerFile = 1024L * 1024)
    ManifestLake.vacuum(dst, keepVersions = 1, graceMillis = 0L)
    assert(ManifestLake.read(spark, dst).count() == 100L)
    assert(ManifestLake.read(spark, src).orderBy("doc_id").collect()
      .sameElements(srcBefore),
      "clone-side delete/compact/vacuum must be invisible to the source")
  }

  test("exactly-once tracking does NOT carry: a writer redirected at the clone re-delivers") {
    import spark.implicits._
    val src = tmp("clone_txn_src")
    val dst = tmp("clone_txn_dst")
    val df = spark.range(0, 10)
      .select($"id".as("doc_id"), lit("s0").as("source"))
    ManifestLake.appendBatch(spark, src, df, "source", appId = "w1", batchId = 7L)
    assert(ManifestLake.latestSnapshot(src).get.txns == Map("w1" -> 7L))
    ManifestLake.clone(src, dst)
    assert(ManifestLake.latestSnapshot(dst).get.txns.isEmpty)
    // batch 7 was never delivered to the CLONE; it must land, not skip
    ManifestLake.appendBatch(spark, dst, df, "source", appId = "w1", batchId = 7L)
    assert(ManifestLake.read(spark, dst).count() == 20L)
    // ... and exactly-once then holds at the clone
    ManifestLake.appendBatch(spark, dst, df, "source", appId = "w1", batchId = 7L)
    assert(ManifestLake.read(spark, dst).count() == 20L)
  }

  test("refusals: occupied destination, self-clone, vacuumed version — all loud") {
    import spark.implicits._
    val src = tmp("clone_refuse_src")
    val dst = tmp("clone_refuse_dst")
    mkLake(src)
    mkLake(dst)
    val e1 = intercept[IllegalArgumentException](ManifestLake.clone(src, dst))
    assert(e1.getMessage.contains("never merges"))
    val e2 = intercept[IllegalArgumentException](ManifestLake.clone(src, src))
    assert(e2.getMessage.contains("same directory"))
    // retire v1, then ask for it
    ManifestLake.deleteWhereDv(spark, src, $"doc_id" < 5)  // v2
    ManifestLake.compact(spark, src, "source", targetRecordsPerFile = 1024L * 1024) // v3
    ManifestLake.vacuum(src, keepVersions = 1, graceMillis = 0L)
    val e3 = intercept[IllegalStateException](
      ManifestLake.clone(src, tmp("clone_refuse_dst2"), versionAsOf = Some(1L)))
    assert(e3.getMessage.contains("vacuum"))
  }

  test("a clone is a first-class lake: append, SQL, restore, and re-clone all work") {
    import spark.implicits._
    val src = tmp("clone_lake_src")
    val dst = tmp("clone_lake_dst")
    mkLake(src, n = 60L)
    ManifestLake.clone(src, dst)
    val more = spark.range(1000, 1020)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        ($"id" * 10).as("n_chars"))
    ManifestLake.append(spark, dst, more, "source", statsCols = Seq("doc_id"))
    assert(ManifestLake.read(spark, dst).count() == 80L)
    ManifestLake.restore(dst, 1L)                              // back to clone point
    assert(ManifestLake.read(spark, dst).count() == 60L)
    val dst2 = tmp("clone_lake_dst2")
    ManifestLake.clone(dst, dst2)                              // clone-of-clone
    assert(ManifestLake.read(spark, dst2).count() == 60L)
  }
}
