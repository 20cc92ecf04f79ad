package graft.sink

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write-layer round trips (SURVEY.md §2.1 S11-S13): one row per pair
  * after double-write, replace-partition isolation, ON CONFLICT DO
  * NOTHING idempotence, and the empty-vs-absent score contract. */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  // ---- crash idempotency (SURVEY §2.10 "restartable by construction"):
  // a killed writer leaves partial partition dirs, truncated parquet
  // files, and in-flight _temporary residue; the retry must converge to
  // exactly the clean run's content ------------------------------------

  /** The q116/q127 shard-lake write shape. */
  private def writeShardLake(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.write.mode("overwrite").partitionBy("source").parquet(dir)

  /** Blocks-shaped frame (what tokenBlocks emits into the lake). */
  private def blocksFrame = spark.range(0, 300).select(
    concat(lit("src"), $"id" % 5).as("source"),
    ($"id" / 5).cast("long").as("block_id"),
    lit(64L).as("n_tok"),
    ($"id" * 17).as("id_sum"),
    md5(($"id" * 31).cast("string")).as("id_hash"))

  private def fingerprint(dir: String): Seq[String] =
    spark.read.parquet(dir)
      .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash")
      .collect().map(_.mkString("|")).sorted.toSeq

  /** Simulate the kill: half of one partition's files deleted, one
    * survivor truncated mid-file, another partition dropped entirely,
    * and an in-flight `_temporary` task dir left behind. */
  private def vandalize(dir: String): Unit = {
    val root = new java.io.File(dir)
    val p1 = new java.io.File(root, "source=src1")
    val files = p1.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.take(files.length / 2).foreach(f => assert(f.delete()))
    val victim = files.last
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    java.nio.file.Files.write(victim.toPath, bytes.take(bytes.length / 2))
    val p2 = new java.io.File(root, "source=src2")
    p2.listFiles().foreach(f => assert(f.delete()))
    assert(p2.delete())
    val tmp = new java.io.File(root, "_temporary/0/task_000/")
    assert(tmp.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(tmp, "part-00000.parquet").toPath, Array[Byte](1, 2, 3))
  }

  test("crash idempotency: retrying the killed shard-lake writer converges to the clean run") {
    val clean = tmpDir("shards-clean")
    val crashed = tmpDir("shards-crashed")
    writeShardLake(blocksFrame, clean)
    writeShardLake(blocksFrame, crashed)
    vandalize(crashed)
    // the crashed state is REALLY broken: the lake is unreadable
    intercept[Exception] {
      spark.read.parquet(crashed).select(sum($"id_sum")).collect()
    }
    // the retry is the same writer invocation — no cleanup pre-pass
    writeShardLake(blocksFrame, crashed)
    assert(fingerprint(crashed) == fingerprint(clean))
    assert(!new java.io.File(crashed, "_temporary").exists(),
      "overwrite must clear in-flight residue")
  }

  test("crash idempotency: retrying a killed replacePartitions rebuild restores the lake") {
    val clean = tmpDir("repl-clean")
    val crashed = tmpDir("repl-crashed")
    writeShardLake(blocksFrame, clean)
    writeShardLake(blocksFrame, crashed)
    vandalize(crashed)
    // the retry rewrites ONLY the partitions its rows touch — so the
    // vandalized src1/src2 must come back and src0/src3/src4's files
    // must not be rewritten (their mtimes prove they were untouched)
    val untouched = Seq("src0", "src3", "src4").flatMap { s2 =>
      new java.io.File(crashed, s"source=$s2").listFiles()
        .map(f => f.getPath -> f.lastModified()) }
    Sinks.replacePartitions(
      blocksFrame.filter($"source".isin("src1", "src2")), crashed, Seq("source"))
    assert(fingerprint(crashed) == fingerprint(clean))
    untouched.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.lastModified() == m, s"$p was rewritten")
    }
  }

  test("upsertScores: writing a batch twice leaves exactly one row per pair") {
    val dir = tmpDir("scores")
    val batch = Seq(
      (1L, 10L, Seq(0.1, 0.2)),
      (1L, 11L, Seq.empty[Double]), // done-but-unusable marker row
      (2L, 10L, Seq(0.3))).toDF("vid_id", "model_id", "score")
    Sinks.upsertScores(spark, dir, batch)
    Sinks.upsertScores(spark, dir, batch) // idempotent re-run
    val lake = spark.read.parquet(dir)
    assert(lake.count() == 3)
    assert(lake.groupBy($"vid_id", $"model_id").count().filter($"count" > 1).count() == 0)
  }

  test("upsertScores: re-scoring replaces the stale empty-score row") {
    val dir = tmpDir("rescored")
    Sinks.upsertScores(spark, dir,
      Seq((1L, 10L, Seq.empty[Double])).toDF("vid_id", "model_id", "score"))
    Sinks.upsertScores(spark, dir,
      Seq((1L, 10L, Seq(0.5, 0.6))).toDF("vid_id", "model_id", "score"))
    val rows = spark.read.parquet(dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[Double](rows.head.fieldIndex("score")) == Seq(0.5, 0.6))
  }

  test("pending anti-join honors empty-vs-absent (P4): empty rows are retried, real rows are not") {
    val dir = tmpDir("pending")
    Sinks.upsertScores(spark, dir, Seq(
      (1L, 10L, Seq(0.1)),          // real -> done
      (2L, 10L, Seq.empty[Double])  // empty -> still pending for re-score
    ).toDF("vid_id", "model_id", "score"))
    val universe = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("vid_id", "model_id")
    val real = spark.read.parquet(dir).filter(size($"score") > 0)
      .select($"vid_id", $"model_id")
    val pending = universe.join(real, Seq("vid_id", "model_id"), "left_anti")
      .orderBy($"vid_id").collect().map(_.getLong(0))
    assert(pending.toSeq == Seq(2L, 3L))
  }

  test("upsertParquet recovers a crashed swap (.old present, target missing)") {
    val dir = tmpDir("recover")
    val first = Seq((1L, 10L, Seq(0.1))).toDF("vid_id", "model_id", "score")
    Sinks.upsertScores(spark, dir, first)
    // simulate a crash between "target -> .old" and "staging -> target"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old")))
    // retry with a new batch: must NOT reduce the lake to just the batch
    val second = Seq((2L, 10L, Seq(0.2))).toDF("vid_id", "model_id", "score")
    Sinks.upsertScores(spark, dir, second)
    val lake = spark.read.parquet(dir)
    assert(lake.count() == 2, "pre-crash row must survive the retried upsert")
    assert(lake.select(sum(size($"score"))).head().getLong(0) == 2)
  }

  test("replacePartitions rewrites only the touched partition") {
    val dir = tmpDir("islands")
    val v1 = Seq((10L, 1, 5), (10L, 9, 14), (11L, 0, 8)).toDF("model_id", "s", "e")
    Sinks.replacePartitions(v1, dir, Seq("model_id"))
    // rebuild model 10 with a different island set; model 11 untouched
    val v2 = Seq((10L, 2, 7)).toDF("model_id", "s", "e")
    Sinks.replacePartitions(v2, dir, Seq("model_id"))
    val lake = spark.read.parquet(dir)
    assert(lake.filter($"model_id" === 10L).count() == 1)
    assert(lake.filter($"model_id" === 11L).count() == 1)
  }

  test("insertIfAbsent is ON CONFLICT DO NOTHING") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "CHANGED"), (3L, "c")).toDF("id", "v")
    val out = Sinks.insertIfAbsent(existing, updates, Seq("id"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("mergeUpsert is ON CONFLICT DO UPDATE") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val updates = Seq((2L, "CHANGED"), (3L, "c")).toDF("id", "v")
    val out = Sinks.mergeUpsert(existing, updates, Seq("id"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "CHANGED"), (3L, "c")))
  }
}
