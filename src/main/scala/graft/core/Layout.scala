package graft.core

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
}
