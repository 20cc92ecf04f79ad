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

  test("bucketed pair layout: the q07-shaped orderkey join plans with ZERO Exchange") {
    val dir = Files.createTempDirectory("bucketed").toString
    // force the shuffle-or-not question to matter: no broadcast escape
    // hatch (sf0.001 orders would broadcast and trivialize the proof)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      Layout.writeBucketed(
        Tables.lineitem(spark, Sf0001)
          .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        "li_bucketed", s"$dir/li", "l_orderkey", 8, Seq("l_orderkey"))
      Layout.writeBucketed(
        Tables.orders(spark, Sf0001).select($"o_orderkey", $"o_custkey"),
        "ord_bucketed", s"$dir/ord", "o_orderkey", 8, Seq("o_orderkey"))

      // the q07 hot pair: fact⋈fact on the bucket key, then a same-key
      // rollup that must ride the join's output partitioning
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      // zero Exchange anywhere in the executed plan: the join AND the
      // same-key aggregate are both satisfied by the bucket layout
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; executed plan:\n$plan")

      // and the layout changed the plan, not the answer: same rollup
      // over the plain parquet reads
      val want = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size == want.size)
      want.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-6, s"orderkey $k") }
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
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
