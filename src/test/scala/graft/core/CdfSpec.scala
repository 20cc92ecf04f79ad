package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The change feed's DSv2 faces — batch options and the streaming
  * source — pinned against [[ManifestLake.readChangeFeed]] (the Scala
  * twin) and against the model: the three materializations share one
  * op-dispatch ([[GraftCdf.legsOf]]), so rows may never differ. */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  private def mkLake(dir: String): Unit = {
    val df = spark.range(0, 200)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        ($"id" * 10).as("n_chars"))
    ManifestLake.append(spark, dir, df, "source",
      maxRecordsPerFile = 32L, statsCols = Seq("doc_id"))
  }

  test("DSv2 batch change feed ≡ the Scala readChangeFeed, row for row") {
    val dir = tmp("cdf_batch")
    mkLake(dir)                                                    // v1
    ManifestLake.deleteWhereDv(spark, dir, $"doc_id" % 10 === 3)   // v2
    ManifestLake.updateWhereDv(spark, dir, $"doc_id" === 4,
      Seq("n_chars" -> lit(-1L)))                                  // v3
    ManifestLake.compact(spark, dir, "source",
      targetRecordsPerFile = 1024L * 1024)                         // v4
    ManifestLake.append(spark, dir, spark.range(1000, 1010)
      .select($"id".as("doc_id"), lit("s0").as("source"),
        ($"id" * 10).as("n_chars")), "source")                     // v5
    val v = ManifestLake.latestSnapshot(dir).get.version

    val dsv2 = spark.read.format("graft").option("path", dir)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", v.toString)
      .load()
    val twin = ManifestLake.readChangeFeed(spark, dir, 0L, v)
    assert(dsv2.schema.fieldNames.toSeq == twin.schema.fieldNames.toSeq)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, String, Long)] =
      df.select($"doc_id", $"source", $"n_chars", $"_change_type",
        $"_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4))).toSet
    val a = rows(dsv2); val b = rows(twin)
    assert(a == b, s"dsv2-only=${(a -- b).take(3)} twin-only=${(b -- a).take(3)}")
    assert(a.count(_._4 == "insert") == 210 && a.count(_._4 == "delete") == 20 &&
      a.count(_._4 == "update_preimage") == 1 &&
      a.count(_._4 == "update_postimage") == 1)

    // sub-window: only the delete commit
    val w = spark.read.format("graft").option("path", dir)
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2").load()
    assert(w.count() == 20L &&
      w.select($"_change_type").distinct().head().getString(0) == "delete")

    // a window-less batch read refuses; so does an invalid option value
    intercept[Exception] {
      spark.read.format("graft").option("path", dir)
        .option("readChangeFeed", "true").load().count()
    }
    intercept[Exception] {
      spark.read.format("graft").option("path", dir)
        .option("readChangeFeed", "sometimes").load().count()
    }
    // a COW commit in the window refuses at planning
    ManifestLake.deleteWhere(spark, dir, $"doc_id" === 7L)         // v6
    val e = intercept[Exception] {
      spark.read.format("graft").option("path", dir)
        .option("readChangeFeed", "true")
        .option("startingVersion", "5").option("endingVersion", "6")
        .load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("copy-on-write")), e.toString)
  }

  test("streaming change feed tails row-level changes; COW kills it") {
    val dir = tmp("cdf_stream")
    mkLake(dir)                                                    // v1
    val ckpt = Files.createTempDirectory("cdf_ckpt").toString
    val q = spark.readStream.format("graft").option("path", dir)
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("cdf_sink")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      def byType(): Map[String, Long] = spark.table("cdf_sink")
        .groupBy($"_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType() == Map("insert" -> 200L), byType().toString)
      // a MoR delete arrives as row-level deletes
      ManifestLake.deleteWhereDv(spark, dir, $"doc_id" % 10 === 3)
      q.processAllAvailable()
      assert(byType() == Map("insert" -> 200L, "delete" -> 20L))
      // a MoR update arrives as pre+post images; compaction is silent
      ManifestLake.updateWhereDv(spark, dir, $"doc_id" === 4,
        Seq("n_chars" -> lit(-1L)))
      ManifestLake.compact(spark, dir, "source",
        targetRecordsPerFile = 1024L * 1024)
      q.processAllAvailable()
      assert(byType() == Map("insert" -> 200L, "delete" -> 20L,
        "update_preimage" -> 1L, "update_postimage" -> 1L))
      assert(spark.table("cdf_sink")
        .filter($"_change_type" === "update_postimage").head()
        .getAs[Long]("n_chars") == -1L)
      // a COW mutation fails the stream (no row-level record exists)
      ManifestLake.deleteWhere(spark, dir, $"doc_id" === 7L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("copy-on-write")), e.toString)
    } finally q.stop()
  }

  test("CDF stream with streamStartingVersion=latest tails only new changes") {
    val dir = tmp("cdf_tail")
    mkLake(dir)                                                    // v1: skipped
    val ckpt = Files.createTempDirectory("cdf_tail_ckpt").toString
    val q = spark.readStream.format("graft").option("path", dir)
      .option("readChangeFeed", "true")
      .option("streamStartingVersion", "latest").load()
      .writeStream.format("memory").queryName("cdf_tail_sink")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_tail_sink").count() == 0L,
        "latest = no backfill of the pre-start history")
      ManifestLake.deleteWhereDv(spark, dir, $"doc_id" < 5)
      q.processAllAvailable()
      val rows = spark.table("cdf_tail_sink")
        .select($"_change_type").distinct().collect().map(_.getString(0)).toSeq
      assert(spark.table("cdf_tail_sink").count() == 5L && rows == Seq("delete"))
    } finally q.stop()
  }
}
