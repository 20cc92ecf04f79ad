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
