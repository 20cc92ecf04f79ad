package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side operators (SURVEY.md §2.1 S10–S13) — the reference's
  * sink discipline re-expressed on a parquet lake.
  *
  * The reference ends every pipeline run in one of three write shapes:
  *  - S11 delete-then-insert "upsert", one row per (vid, model) pair
  *    (client/async_processing_client.py:290-313 — the score table has
  *    no unique key, so the contract "exactly one row per pair" is
  *    enforced by deleting before inserting);
  *  - S12 replace-partition (islands are rebuilt per pair and the old
  *    set deleted, island_worker.py:114-127);
  *  - S13 idempotent keyed upsert (`INSERT … ON CONFLICT DO
  *    UPDATE/NOTHING`, maintain_database.py:211-216,
  *    run_8values_survey.py:493-499).
  *
  * On Spark these become MERGE-shaped DataFrame algebra (pure,
  * testable — [[mergeUpsert]]/[[insertIfAbsent]]) plus lake writers:
  * dynamic partition overwrite for S12 and a staged full rewrite for
  * keyed merges on plain parquet. All of them are idempotent: writing
  * the same batch twice leaves the lake unchanged — the property the
  * reference gets from ON CONFLICT and delete-before-insert, and the
  * one that makes "pending = inputs anti-join outputs" restartable by
  * construction (§2.10).
  */
object Sinks {

  /** S11/S13 (DO UPDATE): rows of `updates` replace same-keyed rows of
    * `existing`; result has exactly one row per key present in
    * `updates` (updates are deduplicated on the keys, last-writer-
    * nondeterministic within a batch unless pre-deduped — the reference
    * batch is pre-deduped by construction, one score row per pair).
    * Plan: one shuffled anti-join on the key + a union — no wide
    * rewrite of untouched rows' content. */
  def mergeUpsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val dedupedUpdates = updates.dropDuplicates(keys)
    existing.join(dedupedUpdates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(dedupedUpdates)
  }

  /** S13 (DO NOTHING): insert only rows whose key is absent. */
  def insertIfAbsent(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      updates.dropDuplicates(keys)
        .join(existing.select(keys.map(col): _*), keys, "left_anti"))

  /** S12: replace exactly the partitions present in `newRows`, leave
    * every other partition's files untouched. Dynamic partition
    * overwrite is the Spark-native `replaceWhere`: at 100 TB a rebuild
    * of one (model bucket) partition rewrites only that directory. */
  def replacePartitions(newRows: DataFrame, lakeDir: String, partitionCols: Seq[String]): Unit =
    newRows.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(lakeDir)

  /** S11/S13 against a parquet lake path: read-merge-stage-swap. Parquet
    * has no transactional MERGE (that is Delta/Iceberg territory), so
    * the merged result is staged to `<dir>.staging` and swapped in — a
    * keyed upsert with exactly-one-row-per-key guaranteed structurally.
    * For lakes partitioned by a key prefix, prefer [[replacePartitions]]
    * which rewrites only touched partitions. */
  def upsertParquet(s: SparkSession, lakeDir: String, updates: DataFrame,
                    keys: Seq[String]): Unit = {
    val fs = new Path(lakeDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val target = new Path(lakeDir)
    val recoverOld = new Path(lakeDir + ".old")
    // Crash/retry recovery BEFORE reading: if a previous run failed
    // between moving target aside and swapping staging in, `.old` is
    // the only full copy — restore it first. Without this, a retry
    // would see no target, merge against nothing, and delete the
    // backup: the whole lake silently reduced to the latest batch.
    if (fs.exists(recoverOld) && !fs.exists(target)) {
      if (!fs.rename(recoverOld, target))
        throw new java.io.IOException(
          s"upsertParquet: recovery rename $recoverOld -> $target failed; not proceeding")
    }
    val merged =
      if (fs.exists(target)) mergeUpsert(s.read.parquet(lakeDir), updates, keys)
      else updates.dropDuplicates(keys)
    val staging = new Path(lakeDir + ".staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    val old = recoverOld
    // Hadoop FileSystem signals failure by RETURNING FALSE, not
    // throwing — an unchecked rename here would silently leave the old
    // lake in place (or nest staging inside it) while reporting
    // success, then delete the only backup. Fail loudly instead; the
    // staged copy survives for manual recovery.
    def mustDo(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"upsertParquet: $what failed (staged data preserved at $staging)")
    if (fs.exists(old)) mustDo(fs.delete(old, true), s"delete $old")
    if (fs.exists(target)) mustDo(fs.rename(target, old), s"rename $target -> $old")
    mustDo(fs.rename(staging, target), s"rename $staging -> $target")
    if (fs.exists(old)) mustDo(fs.delete(old, true), s"delete $old")
  }

  /** S10: batched write — batching/commit-unit logic is native to the
    * sink; `maxRecordsPerFile` is the one knob the reference's batch
    * sizes map to (client:57 SAVE_BATCH, build_islands:255-257). */
  def writeBatched(df: DataFrame, dir: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)

  /** The score-lake upsert honoring the empty-vs-absent contract (P4,
    * client:241-244 + 427-429): an empty array is a real row ("done but
    * unusable — replaced, not retried forever"), absence means pending.
    * Writing a batch twice yields the same lake (delete-then-insert
    * idempotence, client:300-305). */
  def upsertScores(s: SparkSession, lakeDir: String, scores: DataFrame): Unit =
    upsertParquet(s, lakeDir, scores, Seq("vid_id", "model_id"))
}
