package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-lake atomic publish ([[PublishLog]]): the invariants that
  * make a version vector trustworthy — atomicity under racing
  * publishers, snapshot consistency across member lakes while both
  * mutate, and loud failure (never a silently different snapshot)
  * when a published version left retention or the vector. */
class PublishSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  private def mkLake(dir: String, n: Long, tag: String): Unit = {
    import spark.implicits._
    val df = spark.range(0, n)
      .select($"id".as("doc_id"), lit(tag).as("source"), ($"id" * 10).as("v"))
    ManifestLake.append(spark, dir, df, "source", statsCols = Seq("doc_id"))
  }

  test("consistent pair: a consumer pinned to one publish never sees a half-updated vector") {
    import spark.implicits._
    val coord = Files.createTempDirectory("pub_pair").toString
    val docs = tmp("pub_docs"); val stats = tmp("pub_stats")
    mkLake(docs, 100, "d")                                      // docs v1
    mkLake(stats, 10, "s")                                      // stats v1
    val seq1 = PublishLog.publish(coord,
      Map(docs -> 1L, stats -> 1L))
    assert(seq1 == 1L)
    // both lakes move on — docs gets a delete, stats a full new generation
    ManifestLake.deleteWhereDv(spark, docs, $"doc_id" < 50)     // docs v2
    mkLake(stats, 5, "s2")                                      // stats v2
    // a consumer that resolved publish 1 reads BOTH lakes pre-mutation
    assert(PublishLog.readPublishedAt(spark, coord, seq1, docs).count() == 100L)
    assert(PublishLog.readPublishedAt(spark, coord, seq1, stats).count() == 10L)
    // current == still the old vector until someone publishes anew
    assert(PublishLog.readPublished(spark, coord, docs).count() == 100L)
    val seq2 = PublishLog.publish(coord, Map(docs -> 2L, stats -> 2L))
    assert(seq2 == 2L)
    assert(PublishLog.readPublished(spark, coord, docs).count() == 50L)
    assert(PublishLog.readPublished(spark, coord, stats).count() == 15L)
    // the old vector remains readable (auditable history)
    assert(PublishLog.readPublishedAt(spark, coord, seq1, docs).count() == 100L)
  }

  /** Carries q178's law outside its benched path: a derived lake
    * published alongside its source must equal the recompute from the
    * source AT THE SAME publish sequence (exceptAll both ways, every
    * sequence) — even though both lakes mutate between publishes. */
  test("derived lake coheres with its source at every publish sequence") {
    import spark.implicits._
    val coord = Files.createTempDirectory("pub_cohere").toString
    val docs = tmp("pub_co_docs"); val stats = tmp("pub_co_stats")
    mkLake(docs, 200, "d")                                       // docs v1
    def derive(from: org.apache.spark.sql.DataFrame) = from
      .groupBy($"source").agg(count(lit(1)).as("n_docs"),
        sum($"v").as("sum_v"))
    ManifestLake.append(spark, stats,
      derive(ManifestLake.read(spark, docs)), "source")          // stats v1
    val seq1 = PublishLog.publish(coord, Map(docs -> 1L, stats -> 1L))
    // both lakes mutate after the publish; stats regenerates by merge
    ManifestLake.deleteWhereDv(spark, docs, $"doc_id" % 17 === 0) // docs v2
    ManifestLake.merge(spark, stats,
      derive(ManifestLake.read(spark, docs)), Seq("source"))     // stats v2
    val seq2 = PublishLog.publish(coord, Map(docs -> 2L, stats -> 2L))
    Seq(seq1, seq2).foreach { q =>
      val want = derive(PublishLog.readPublishedAt(spark, coord, q, docs))
      val got = PublishLog.readPublishedAt(spark, coord, q, stats)
        .select($"source", $"n_docs", $"sum_v")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"publish seq $q must serve stats ≡ derive(docs) at that sequence")
    }
    // and the law is NOT vacuous: the two sequences' stats differ
    val s1 = PublishLog.readPublishedAt(spark, coord, seq1, stats)
    val s2 = PublishLog.readPublishedAt(spark, coord, seq2, stats)
    assert(!s1.exceptAll(s2).isEmpty, "the mutation must be visible at seq2")
  }

  test("racing publishers: every publish lands exactly once, sequence contiguous") {
    val coord = Files.createTempDirectory("pub_race").toString
    val l = tmp("pub_race_lake")
    mkLake(l, 10, "r")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val seqs = try Await.result(
      Future.sequence((1 to 16).map(_ => Future(
        PublishLog.publish(coord, Map(l -> 1L))))),
      Duration.Inf) finally pool.shutdown()
    assert(seqs.toSet == (1L to 16L).toSet,
      s"16 racing publishes must claim 16 distinct contiguous seqs: $seqs")
    assert(PublishLog.versions(coord) == (1L to 16L).toVector)
  }

  test("SQL face: CALL publish commits the vector, publish_current serves it as rows") {
    val coord = Files.createTempDirectory("pub_sql").toString
    val a = tmp("pub_sql_a"); val b = tmp("pub_sql_b")
    mkLake(a, 30, "a"); mkLake(b, 40, "b")
    spark.conf.set("spark.sql.catalog.graft_pub",
      classOf[GraftCatalog].getName)
    val out = spark.sql(s"CALL graft_pub.publish(coordinator => '$coord', " +
      s"versions => '$a=1,$b=1')").collect().head
    assert(out.getAs[Long]("publish_seq") == 1L &&
      out.getAs[Int]("n_lakes") == 2)
    val rows = spark.sql(
      s"CALL graft_pub.publish_current(coordinator => '$coord')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, a, 1L), (1L, b, 1L)), rows.mkString(","))
    val e = intercept[Exception](spark.sql(
      s"CALL graft_pub.publish(coordinator => '$coord', versions => 'junk')")
      .collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("malformed"))))
  }

  test("publish-aware vacuum: publish.coord pins published versions; opted-out lakes keep the loud-failure trade") {
    import spark.implicits._
    def build(prefix: String): String = {
      val d = tmp(prefix)
      mkLake(d, 100, "a")                                        // v1
      ManifestLake.append(spark, d, spark.range(100, 150)
        .select($"id".as("doc_id"), lit("a").as("source"),
          ($"id" * 10).as("v")), "source")                       // v2
      d
    }
    // OPTED-IN lake: declares its coordinator; aggressive vacuum must
    // keep the published version whole (manifest AND files)
    val coord = Files.createTempDirectory("pub_vac").toString
    val pinned = build("pub_vac_pin")
    ManifestLake.setProperties(pinned,
      Map("publish.coord" -> coord, "publish.retain" -> "1"))    // v3
    val seq = PublishLog.publish(coord, Map(pinned -> 2L))
    ManifestLake.compact(spark, pinned, "source",
      targetRecordsPerFile = 1024L * 1024)                       // v4: old files unreferenced
    val reclaimedPinned =
      ManifestLake.vacuum(pinned, keepVersions = 1, graceMillis = 0L)
    // the published read survives the vacuum, exact to the row
    assert(PublishLog.readPublishedAt(spark, coord, seq, pinned)
      .count() == 150L)
    assert(ManifestLake.snapshotAt(pinned, 2L).isDefined,
      "the published manifest must survive")
    // OPTED-OUT control: same shape, no property — the same vacuum
    // retires the published version and the read fails LOUDLY
    val coord2 = Files.createTempDirectory("pub_vac2").toString
    val loose = build("pub_vac_loose")
    val seq2 = PublishLog.publish(coord2, Map(loose -> 2L))
    ManifestLake.compact(spark, loose, "source",
      targetRecordsPerFile = 1024L * 1024)                       // v3
    ManifestLake.vacuum(loose, keepVersions = 1, graceMillis = 0L)
    val e = intercept[IllegalStateException](
      PublishLog.readPublishedAt(spark, coord2, seq2, loose))
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // the pin is WINDOWED: after publish.retain newer publishes, the
    // old version unpins and a later vacuum may retire it
    val seqB = PublishLog.publish(coord, Map(pinned -> 4L))
    assert(seqB > seq)
    ManifestLake.vacuum(pinned, keepVersions = 1, graceMillis = 0L)
    assert(ManifestLake.snapshotAt(pinned, 2L).isEmpty,
      "retain=1 must unpin v2 once a newer publish supersedes it")
    assert(PublishLog.readPublishedAt(spark, coord, seqB, pinned)
      .count() == 150L)
    assert(reclaimedPinned >= 0L)
  }

  test("refusals are loud: unknown member, uncommitted version, vacuumed version") {
    import spark.implicits._
    val coord = Files.createTempDirectory("pub_refuse").toString
    val l = tmp("pub_refuse_lake"); val other = tmp("pub_refuse_other")
    mkLake(l, 20, "x")
    // publishing a version that does not exist refuses up front
    val e1 = intercept[IllegalArgumentException](
      PublishLog.publish(coord, Map(l -> 9L)))
    assert(e1.getMessage.contains("never committed"), e1.getMessage)
    PublishLog.publish(coord, Map(l -> 1L))
    // reading a lake outside the vector names the members
    mkLake(other, 5, "y")
    val e2 = intercept[IllegalArgumentException](
      PublishLog.readPublished(spark, coord, other))
    assert(e2.getMessage.contains("not in publish"), e2.getMessage)
    // vacuum retires the published version -> loud failure, not a
    // silently newer snapshot
    ManifestLake.deleteWhereDv(spark, l, $"doc_id" < 5)         // v2
    ManifestLake.compact(spark, l, "source", targetRecordsPerFile = 1024L * 1024) // v3
    ManifestLake.vacuum(l, keepVersions = 1, graceMillis = 0L)
    val e3 = intercept[IllegalStateException](
      PublishLog.readPublished(spark, coord, l))
    assert(e3.getMessage.contains("retired by vacuum"), e3.getMessage)
  }

  test("publish TOCTOU: a member retired mid-flight RETRACTS the vector — no consumer can ever pin it") {
    import spark.implicits._
    val coord = Files.createTempDirectory("pub_toctou").toString
    // the lake deliberately OPTS OUT of publish pinning (no
    // publish.coord property) so the seam's vacuum genuinely retires
    // the version the in-flight publish names — the exact interleaving
    // the post-CAS re-verify exists for
    val l = tmp("pub_toctou_lake")
    mkLake(l, 40, "x")                                             // v1
    ManifestLake.deleteWhereDv(spark, l, $"doc_id" < 5)            // v2
    ManifestLake.compact(spark, l, "source",
      targetRecordsPerFile = 1024L * 1024)                         // v3
    PublishLog.publish(coord, Map(l -> 3L))                        // seq 1
    val before = PublishLog.versions(coord)
    PublishLog.beforePublishVerify = () =>
      ManifestLake.vacuum(l, keepVersions = 1, graceMillis = 0L)
    try {
      // publish the HISTORICAL v1: pre-check passes (v1 still live),
      // the CAS lands, then the seam's vacuum retires v1 before the
      // re-verify — the vector must be tombstoned and the publish
      // must throw, never return success
      val e = intercept[IllegalStateException](
        PublishLog.publish(coord, Map(l -> 1L)))
      assert(e.getMessage.contains("RETRACTED"), e.getMessage)
    } finally PublishLog.beforePublishVerify = () => ()
    val seqs = PublishLog.versions(coord)
    val retracted = seqs.filterNot(before.contains)
    assert(retracted.size == 1, s"exactly one new (retracted) record: $seqs")
    val dead = retracted.head
    // the tombstone is consumer-proof on every face:
    assert(PublishLog.isRetracted(coord, dead))
    assert(!PublishLog.liveVersions(coord).contains(dead))
    // current() skips it back to the last good vector
    assert(PublishLog.current(coord).map(_._1).contains(1L))
    assert(PublishLog.readPublished(spark, coord, l).count() == 35L)
    // pinning it explicitly refuses loudly
    val e2 = intercept[IllegalStateException](
      PublishLog.readPublishedAt(spark, coord, dead, l))
    assert(e2.getMessage.contains("RETRACTED"), e2.getMessage)
    // sequence numbers are never reused: the next publish lands ABOVE
    // the tombstoned record
    val seq3 = PublishLog.publish(coord, Map(l -> 3L))
    assert(seq3 > dead, s"seq $seq3 must not reuse the tombstoned $dead")
    assert(PublishLog.current(coord).map(_._1).contains(seq3))
  }

  /** A fresh `_vacuum.intent` marker that outlasts the verify deadline
    * must FAIL the publish (tombstoned), never verify under it: a
    * vacuum running longer than the publisher is willing to wait may
    * be mid-delete with a pin read that predates this CAS — returning
    * success and letting the vacuum's sweep retract later would break
    * "a publish that RETURNS SUCCESS stays serveable forever". */
  test("publish under a long-lived fresh vacuum marker FAILS loudly instead of verifying under it") {
    val coord = Files.createTempDirectory("pub_deadline").toString
    val l = tmp("pub_deadline_lake")
    mkLake(l, 20, "x")                                             // v1
    val marker = java.nio.file.Paths.get(l)
      .resolve(ManifestLake.VacuumIntentMarker)
    Files.createFile(marker) // a live vacuum's fresh lease
    val before = PublishLog.versions(coord)
    val old = PublishLog.AwaitIntentDeadlineMillis
    PublishLog.AwaitIntentDeadlineMillis = 250L
    try {
      val e = intercept[IllegalStateException](
        PublishLog.publish(coord, Map(l -> 1L)))
      assert(e.getMessage.contains("RETRACTED") &&
        e.getMessage.contains("marker"), e.getMessage)
      // the CASed record is tombstoned — no consumer can pin it
      val newSeqs = PublishLog.versions(coord).filterNot(before.contains)
      assert(newSeqs.size == 1 && PublishLog.isRetracted(coord, newSeqs.head))
      assert(PublishLog.current(coord).isEmpty)
      // marker cleared (vacuum done) → the re-publish goes through
      Files.delete(marker)
      val seq = PublishLog.publish(coord, Map(l -> 1L))
      assert(PublishLog.current(coord).map(_._1).contains(seq))
    } finally {
      PublishLog.AwaitIntentDeadlineMillis = old
      Files.deleteIfExists(marker); ()
    }
  }

  /** TWO-SIDED LEASE: a vacuum SUSPENDED past
    * [[PublishLog.VacuumIntentStaleMillis]] (VM pause, cgroup freeze)
    * resumes into a world where publishers already stopped honoring
    * its marker — it must abort its sweep before deleting anything,
    * not resume the delete phase under a dead lease. The seam ages the
    * marker right before the first delete-phase check, simulating the
    * suspension. */
  test("two-sided lease: a vacuum whose own marker went stale aborts with nothing deleted") {
    import spark.implicits._
    val coord = Files.createTempDirectory("pub_lease").toString
    val l = tmp("pub_lease_lake")
    mkLake(l, 40, "x")                                             // v1
    ManifestLake.setProperties(l, Map("publish.coord" -> coord))   // v2
    ManifestLake.deleteWhereDv(spark, l, $"doc_id" < 10)           // v3
    ManifestLake.compact(spark, l, "source",
      targetRecordsPerFile = 1024L * 1024)                         // v4: v1 files now garbage
    val root = java.nio.file.Paths.get(l)
    def census(): Set[String] = {
      val w = Files.walk(root)
      try {
        val it = w.iterator(); val b = Set.newBuilder[String]
        while (it.hasNext) {
          val p = it.next()
          val n = p.toString
          if (n.endsWith(".parquet") || n.endsWith(".dv") ||
              n.contains("_manifest")) b += root.relativize(p).toString
        }
        b.result()
      } finally w.close()
    }
    val before = census()
    val marker = root.resolve(ManifestLake.VacuumIntentMarker)
    var aged = false
    ManifestLake.beforeVacuumPhase = _ => if (!aged && Files.exists(marker)) {
      aged = true
      Files.setLastModifiedTime(marker,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - PublishLog.VacuumIntentStaleMillis
            - 1000L))
    }
    try {
      val e = intercept[IllegalStateException](
        ManifestLake.vacuum(l, keepVersions = 1, graceMillis = 0L))
      assert(e.getMessage.contains("ABORTED"), e.getMessage)
      assert(aged, "the seam must actually have fired")
      assert(census() == before,
        "an aborted sweep must not have deleted a single file")
      assert(!Files.exists(marker), "the stale marker is released on abort")
    } finally ManifestLake.beforeVacuumPhase = _ => ()
    // a re-run with a fresh lease completes and reclaims
    assert(ManifestLake.vacuum(l, keepVersions = 1, graceMillis = 0L) > 0L)
    assert(ManifestLake.read(spark, l).count() == 30L)
  }
}
