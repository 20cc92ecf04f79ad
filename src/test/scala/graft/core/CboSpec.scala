package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The q117 value-gate pattern applied to CBO: the EXECUTED PLAN is
  * the asserted output — it must flip exactly when the measured stats
  * say it should, under a session where Spark's own estimate would
  * never broadcast (autoBroadcastJoinThreshold = -1, the state a
  * planner is in when file-size estimates put a filtered dim over the
  * line). */
class CboSpec extends SparkSpec {
  import spark.implicits._

  private def withNoAutoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  // AQE wraps finished stages in QueryStageExec LEAVES — flatten
  // through their plans or collect sees nothing
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(flatten)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case _ => Seq.empty
    })
  private def collectJoins(p: SparkPlan): Seq[String] = flatten(p).collect {
    case _: BroadcastHashJoinExec => "broadcast"
    case _: SortMergeJoinExec     => "sortmerge"
    case _: ShuffledHashJoinExec  => "shuffledhash"
  }

  test("statsJoin: measured stats flip the executed plan across the threshold") {
    withNoAutoBroadcast {
      // the filtered-dim shape: a dim whose post-filter size is tiny
      // but which Spark (threshold -1 here; huge file estimate at
      // 100 TB) would never broadcast on its own
      val fact = spark.range(0, 50000).select(
        ($"id" % 1000).as("k"), $"id".as("payload"))
      val dim = spark.range(0, 1000).select(
        $"id".as("k"), concat(lit("name_"), $"id").as("name"))

      val (joined, d) = Cbo.statsJoin(fact, dim, Seq("k"))
      assert(d.broadcast, s"measured estimate ${d.estimatedBytes} must clear 10MB")
      // estimate sanity: 1000 rows x (~10B string + 8B long + slots)
      // lands in the tens of KB, not within 100x of the threshold
      assert(d.estimatedBytes > 10000 && d.estimatedBytes < 200000,
        s"estimate ${d.estimatedBytes} outside the sane band")
      val plan = executed(joined)
      assert(collectJoins(plan) == Seq("broadcast"),
        s"stats said broadcast; plan did not:\n$plan")
      assert(flatten(plan).exists(_.isInstanceOf[BroadcastExchangeLike]))

      // same inputs, threshold below the estimate: the decision (and
      // the executed plan) must flip to the shuffle join
      val (joined2, d2) = Cbo.statsJoin(fact, dim, Seq("k"),
        thresholdBytes = d.estimatedBytes - 1)
      assert(!d2.broadcast && d2.estimatedBytes == d.estimatedBytes)
      val plan2 = executed(joined2)
      assert(collectJoins(plan2).nonEmpty &&
        !collectJoins(plan2).contains("broadcast"),
        s"stats said shuffle; plan broadcast anyway:\n$plan2")

      // the decision changes the PLAN, never the ROWS
      val rows = joined.orderBy("k", "payload").collect().toSeq
      assert(rows == joined2.orderBy("k", "payload").collect().toSeq)
      assert(rows.length == 50000)
    }
  }

  test("columnStats: one pass, exact NDV and width accounting") {
    val df = spark.range(0, 100).select(
      $"id".as("k"),
      when($"id" % 10 === 0, null).otherwise(concat(lit("v"), $"id" % 7)).as("s"))
    val st = Cbo.columnStats(df)
    assert(st.nRows == 100)
    assert(st.cols("k") == Cbo.ColStats(100, 100, 800)) // 100 x 8B longs
    val s = st.cols("s")
    assert(s.nonNull == 90 && s.ndv == 7)
    assert(s.sumBytes == 90 * 2, "UTF-8 widths of 'v0'..'v6'")
    // the estimate is deterministic arithmetic over the measured stats
    assert(st.estimatedBytes ==
      (100 * ((800.0 / 100 + 8) + (180.0 / 90 + 8) + 16)).toLong)
  }

  test("analyze persists stats in the manifest; statsJoinLake decides without a scan") {
    import java.nio.file.Files
    val dim = Files.createTempDirectory("cbo_analyze").resolve("lake").toString
    val rows = spark.range(0, 500)
      .select($"id".as("doc_id"), lit("p0").as("source"),
        concat(lit("label_"), $"id").as("label"))
    ManifestLake.append(spark, dim, rows, "source", statsCols = Seq("doc_id"))
    // never analyzed: live fallback, and the decision says so
    val fact = spark.range(0, 5000).select($"id".as("doc_id"),
      ($"id" * 3).as("v"))
    val (_, d0) = Cbo.statsJoinLake(fact, spark, dim, Seq("doc_id"))
    assert(!d0.fromPersisted && d0.broadcast)
    // analyze: one pass, persisted as a metadata commit
    val live = Cbo.analyze(spark, dim)
    val (v, persisted) = Cbo.persistedStats(dim).get
    assert(persisted == live && v == 1L,
      s"persisted stats must replay the measurement exactly: $persisted vs $live")
    assert(ManifestLake.latestSnapshot(dim).get.version == 2L)
    // a second session's join decision is manifest-only and broadcast
    val (joined, d1) = Cbo.statsJoinLake(fact, spark, dim, Seq("doc_id"))
    assert(d1.fromPersisted && d1.analyzedVersion.contains(1L) &&
      d1.estimatedBytes == live.estimatedBytes && d1.broadcast)
    joined.collect()
    val hasBhj = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBhj, joined.queryExecution.executedPlan.toString)
    // re-analyze REPLACES the generation (no stale column lingers)
    ManifestLake.append(spark, dim, rows.withColumn("doc_id", $"doc_id" + 1000),
      "source")
    Cbo.analyze(spark, dim, withNdv = false)
    val (v2, again) = Cbo.persistedStats(dim).get
    assert(v2 == 3L && again.nRows == 1000L && again.cols("doc_id").ndv == 0L)
    // SQL face
    spark.conf.set("spark.sql.catalog.graft_cbo",
      classOf[GraftCatalog].getName)
    val out = spark.sql(
      s"CALL graft_cbo.analyze(path => '$dim')").collect().head
    assert(out.getAs[Long]("n_rows") == 1000L &&
      out.getAs[Int]("n_columns") == 3)
  }
}
