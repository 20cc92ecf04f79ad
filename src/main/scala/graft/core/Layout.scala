package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production lake layout (SURVEY.md §4 physical notes): the score
  * table is the monster — 697.9M (vid, model) pairs, ~TBs — and every
  * consumer reads it either model-major (islands rebuild one model's
  * scores, island_worker.py:1-21) or pair-pointed (the pending
  * anti-join). The reference served this with partial indexes
  * (ROADMAP.md:26-28); the lake equivalent is:
  *
  *  - PARTITION by a bounded model bucket (`model_id % nBuckets`) —
  *    model-major jobs prune to 1/nBuckets of files via partition
  *    pruning (proved in LayoutSpec by inspecting the scan);
  *  - SORT WITHIN PARTITIONS by (model_id, vid_id) — parquet row-group
  *    min/max stats then prune pair-pointed reads within the bucket;
  *  - a bounded bucket count (not raw model_id: 9,511 directories of
  *    tiny files is small-file death at 100 TB).
  *
  * Readers compose with [[Tables]]: `scoresFor` pushes the bucket
  * predicate so Catalyst prunes partitions — the 100 TB difference
  * between scanning 1/64th and scanning everything.
  */
object Layout {

  val ScoreBuckets = 64

  def bucketOf(modelId: Long): Long = modelId % ScoreBuckets

  /** Write the score lake in the production layout. */
  def writeScoreLake(scores: DataFrame, dir: String): Unit =
    scores
      .withColumn("model_bucket", col("model_id") % ScoreBuckets)
      .sortWithinPartitions("model_id", "vid_id")
      .write.mode("overwrite")
      .partitionBy("model_bucket")
      .parquet(dir)

  /** Model-major read: the bucket predicate is a partition filter
    * (pruned before any file is opened); the model_id predicate then
    * rides row-group stats. */
  def scoresFor(s: SparkSession, dir: String, modelId: Long): DataFrame =
    s.read.parquet(dir)
      .filter(col("model_bucket") === bucketOf(modelId) && col("model_id") === modelId)

  /** Co-located equi-join layout — the last layout tool the 100 TB
    * story needs (PLANS.md q07: at 1000 executors the only wide
    * exchange left in the revenue rollup is the lineitem⋈orders
    * orderkey shuffle; bucketing both fact tables by the join key
    * removes it entirely). `bucketBy(n, key)` + `saveAsTable` records
    * the bucket spec in the catalog; a join of two tables bucketed by
    * the same key into the same bucket count plans WITHOUT an
    * Exchange on either side, and a same-key aggregation above the
    * join rides the join's output partitioning — LayoutSpec proves
    * both on the executed plan. `sortBy` additionally orders rows
    * inside each bucket file so the merge side of the join starts
    * from near-sorted input.
    *
    * This is a WRITE-SIDE investment: pay one shuffle at lake-build
    * time, then every orderkey-equi-join of the pair is narrow
    * forever — the right trade for fact tables joined far more often
    * than rewritten. The `path` option makes the table external, so
    * the lake lives where the caller says, not in a default
    * warehouse. */
  def writeBucketed(df: DataFrame, table: String, dir: String, key: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", dir)
      .bucketBy(nBuckets, key)
    (sortCols match {
      case head +: tail => w.sortBy(head, tail: _*)
      case _            => w
    }).saveAsTable(table)
  }

  /** Per-partition compaction outcome: `filesBefore == filesAfter`
    * means the partition was already at (or below) target and was NOT
    * rewritten — the idempotence signal callers key on. */
  final case class CompactStat(partition: String, rows: Long,
                               filesBefore: Long, filesAfter: Long)

  /** Small-file compaction — the lake-maintenance half of the layout
    * story (the write side is [[writeScoreLake]]/[[writeBucketed]]; a
    * long-lived lake also ACCUMULATES files: every incremental append
    * (q127's delta re-export), replace-partition rebuild, and
    * streaming micro-batch lands more part files, and at 100 TB a
    * partition with 10k tiny files costs 10k opens + footer reads per
    * scan). Same job as Delta/Iceberg OPTIMIZE bin-packing, expressed
    * over plain partitioned parquet:
    *
    *  - ONE footer-weight pass computes per-partition row counts
    *    (`groupBy(partitionCol).count` — zero data columns read; the
    *    collect is metadata-sized, one row per partition);
    *  - only partitions whose file count EXCEEDS
    *    `ceil(rows / targetRecordsPerFile)` are rewritten — compaction
    *    cost is ∝ fragmented partitions, never ∝ lake size;
    *  - each rewrite is a shuffle-free `coalesce(target)` of just that
    *    partition's files, landed in a dot-prefixed staging dir (paths
    *    starting with `.`/`_` are invisible to Spark's file index, so
    *    concurrent readers never see the half-written copy);
    *  - the swap is two atomic directory renames (old out, staged in),
    *    and the CRASH STATES between them are self-healing on the next
    *    run (see the recovery preamble): old-dir-present + partition
    *    missing → roll back; old-dir-present + partition present →
    *    finish the cleanup; stale staging dirs are always discarded.
    *    LayoutSpec pins all three recovery states; a manifest-commit
    *    table format would replace the rename pair, not the plan.
    *
    * Per-partition rewrites are independent Spark jobs, so they are
    * submitted CONCURRENTLY through a bounded driver-side pool
    * (`maxConcurrent`) — Spark's scheduler interleaves their tasks
    * across the executors. Sequential submission measured 12 s for a
    * 20-partition lake at sf0.1 (each small job pays its scheduling
    * round-trip alone); concurrent submission collapses that to the
    * depth of the largest rewrite. At 100 TB the pool bound is what
    * keeps a million-partition lake from flooding the scheduler. */
  def compactLake(s: SparkSession, dir: String, partitionCol: String,
                  targetRecordsPerFile: Long, maxConcurrent: Int = 8): Seq[CompactStat] = {
    require(targetRecordsPerFile > 0, s"targetRecordsPerFile must be positive: $targetRecordsPerFile")
    val root = Paths.get(dir)

    def deleteTree(p: Path): Unit =
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { Files.deleteIfExists(q); () })
        finally walk.close()
      }

    def parquetFiles(p: Path): Long = {
      if (!Files.isDirectory(p)) 0L
      else {
        val st = Files.list(p)
        try st.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet")).toLong
        finally st.close()
      }
    }

    // Recovery preamble: heal any crash state a previous compaction
    // left behind, BEFORE the row-count scan (a rolled-back partition
    // must be visible to it).
    val listing = Files.list(root)
    val entries = try listing.iterator().asScala.toVector finally listing.close()
    entries.foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith(".compact_old_")) {
        val part = root.resolve(s"$partitionCol=${name.stripPrefix(".compact_old_")}")
        if (Files.exists(part)) deleteTree(p)                          // crashed after swap-in: finish cleanup
        else Files.move(p, part, StandardCopyOption.ATOMIC_MOVE)       // crashed mid-swap: roll back
      } else if (name.startsWith(".compact_tmp_")) deleteTree(p)       // half-written staging: discard
    }

    val lakeDf = s.read.parquet(dir)
    // Data-column schema for the per-partition reads below: resolved
    // ONCE here instead of re-inferred by every rewrite job (schema
    // inference lists and footer-reads the very fragmentation being
    // repaired — 20 partitions × hundreds of files adds whole seconds
    // of pure driver metadata work).
    val dataSchema = org.apache.spark.sql.types.StructType(
      lakeDf.schema.filterNot(_.name == partitionCol))
    val rowCounts = lakeDf
      .groupBy(col(partitionCol)).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1))
      .sortBy(_._1)

    def compactOne(pv: String, rows: Long): CompactStat = {
      val pdir = root.resolve(s"$partitionCol=$pv")
      val before = parquetFiles(pdir)
      val target = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
      if (before <= target) CompactStat(pv, rows, before, before)
      else {
        val tmp = root.resolve(s".compact_tmp_$pv")
        s.read.schema(dataSchema).parquet(pdir.toString)
          .coalesce(target.toInt)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = root.resolve(s".compact_old_$pv")
        Files.move(pdir, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, pdir, StandardCopyOption.ATOMIC_MOVE)
        deleteTree(old)
        CompactStat(pv, rows, before, parquetFiles(pdir))
      }
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrent, rowCounts.length)))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(
        Future.sequence(rowCounts.toSeq.map { case (pv, rows) =>
          Future(compactOne(pv, rows))
        }),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }
}
