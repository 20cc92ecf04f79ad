package graft.core

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Proves the production layout actually prunes: a model-major read of
  * the bucketed score lake opens only its bucket's files. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("score lake: partition pruning limits the scan to one bucket") {
    val dir = Files.createTempDirectory("lake").resolve("scores").toString
    val scores = spark.range(0, 2000).select(
      ($"id" % 40).as("vid_id"),
      ($"id" % 200).as("model_id"),
      array(lit(0.1), lit(0.2)).as("score"))
    Layout.writeScoreLake(scores, dir)

    val read = Layout.scoresFor(spark, dir, modelId = 7L)
    // correctness: exactly the rows for model 7
    assert(read.count() == scores.filter($"model_id" === 7).count())
    assert(read.select(countDistinct($"model_id")).head().getLong(0) == 1)

    // pruning: the file scan claims the partition filter and reads only
    // the one bucket directory
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty, "expected partition filters on model_bucket")
    val files = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    val dirs = files.flatMap(_.files.map(_.getPath.getParent.getName)).distinct
    assert(dirs == Seq(s"model_bucket=${Layout.bucketOf(7L)}"),
      s"scan touched partitions: $dirs")
  }

  test("one row group ordering: sortWithinPartitions keeps (model, vid) runs") {
    val dir = Files.createTempDirectory("lake2").resolve("scores").toString
    val scores = spark.range(0, 500).select(
      ($"id" % 20).as("vid_id"), ($"id" % 10).as("model_id"),
      array(lit(1.0)).as("score"))
    Layout.writeScoreLake(scores, dir)
    // reading one model still yields all its vids
    val vids = Layout.scoresFor(spark, dir, 3L)
      .select(countDistinct($"vid_id")).head().getLong(0)
    assert(vids == scores.filter($"model_id" === 3).select(countDistinct($"vid_id"))
      .head().getLong(0))
  }
}
