package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** SPJ scale probe (dev harness, like [[ProbeDml]]): measures the
  * storage-partitioned join against the SAME two bucketed lakes with
  * the SPJ gate on vs off, at a given corpus scale. The bench can't
  * isolate this — q168's wall time is dominated by building its proof
  * lakes; what must hold at scale is the JOIN plan itself:
  *  - gate ON: zero shuffle exchanges (asserted, not hoped), wall
  *    time ∝ sorted-merge of co-located buckets;
  *  - gate OFF: both sides exchange — the cost SPJ deletes, and the
  *    term that grows with corpus size at 100 TB.
  *
  * `runMain graft.ProbeSpj <corpusDir> <workDir>` builds facts
  * (doc_id, source, n_chars) and scores (doc_id, score) lakes
  * bucketed `bucketBy(doc_id, 16)` (untimed), then times the
  * doc_id equi-join (materialized through the noop sink, median of
  * 3 interleaved runs) per gate setting. Prints one JSON line per
  * setting: wall seconds + the executed plan's exchange count.
  */
object ProbeSpj {
  def main(args: Array[String]): Unit = {
    val Array(corpus, work) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$corpus/documents.parquet")
      .select($"doc_id", $"source", $"n_chars")
    val facts = s"$work/facts"
    val scores = s"$work/scores"
    ManifestLake.append(spark, facts, docs, "source",
      bucketBy = Some(("doc_id", 16)))
    ManifestLake.append(spark, scores,
      docs.select($"doc_id", $"source",
        ($"doc_id" % 97 + $"n_chars".cast("long")).as("score")),
      "source", bucketBy = Some(("doc_id", 16)))
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[graft.core.GraftCatalog].getName)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def joined: DataFrame = spark.sql(
      s"SELECT f.doc_id, f.n_chars, s.score FROM graft_probe.`$facts` f " +
        s"JOIN graft_probe.`$scores` s ON f.doc_id = s.doc_id")

    def exchanges(df: DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case n =>
          (if (n.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) 1
           else 0) + n.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }

    def timeOne(on: Boolean): (Double, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", on.toString)
      val df = joined
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, exchanges(df))
    }

    // interleaved runs: [on, off] × 3, medians reported
    val runs = (1 to 3).map(_ => (timeOne(true), timeOne(false)))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val onSecs = runs.map(_._1._1); val offSecs = runs.map(_._2._1)
    val onEx = runs.map(_._1._2).max; val offEx = runs.map(_._2._2).min
    val nRows = docs.count()
    println(f"""{"probe":"spj","corpus":"$corpus","rows":$nRows,""" +
      f""""spj_on_sec":${med(onSecs)}%.3f,"spj_on_exchanges":$onEx,""" +
      f""""spj_off_sec":${med(offSecs)}%.3f,"spj_off_exchanges":$offEx}""")
    require(onEx == 0, s"SPJ leg planned $onEx exchanges — co-location broken")
    require(offEx > 0, "baseline planned no exchange — probe is vacuous")

    // the operational query: a FIXED 1,000-key delta (not a lake —
    // the day's fresh batch) joins the bucketed corpus. With one-side
    // shuffle the delta repartitions by the lake's own bucket
    // function and the lake never moves — this leg's cost must stay
    // ~flat as the corpus grows; the both-sides baseline grows with it
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    def deltaJoin: DataFrame = {
      spark.range(0, 1000).select($"id".as("doc_id"), ($"id" * 7).as("w"))
        .createOrReplaceTempView("probe_delta")
      spark.sql(s"SELECT f.doc_id, f.n_chars, d.w FROM graft_probe.`$facts` f " +
        "JOIN probe_delta d ON f.doc_id = d.doc_id")
    }
    def timeDelta(oneSide: Boolean): (Double, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", oneSide.toString)
      if (!oneSide) spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      else spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val df = deltaJoin
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, exchanges(df))
    }
    val dRuns = (1 to 3).map(_ => (timeDelta(true), timeDelta(false)))
    val d1 = dRuns.map(_._1._1); val d2 = dRuns.map(_._2._1)
    val d1Ex = dRuns.map(_._1._2).max; val d2Ex = dRuns.map(_._2._2).min
    println(f"""{"probe":"spj_delta","corpus":"$corpus","rows":$nRows,""" +
      f""""one_side_sec":${med(d1)}%.3f,"one_side_exchanges":$d1Ex,""" +
      f""""both_sides_sec":${med(d2)}%.3f,"both_sides_exchanges":$d2Ex}""")
    require(d1Ex == 1, s"one-side leg planned $d1Ex exchanges — expected 1 (delta only)")
    require(d2Ex >= 2, "baseline should shuffle both sides")
    spark.stop()
  }
}
