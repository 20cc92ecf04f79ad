package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class Evt(user_id: Long, ts: Timestamp, event_type: String, vid_id: Long, start: Double)

/** Streaming operators driven through MemoryStream: windowed rollup,
  * session windows, watermark dedup. */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("dailyEventCounts: per-day, per-type counts over a stream") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = StreamOps.dailyEventCounts(ms.toDF())
      .writeStream.format("memory").queryName("daily").outputMode("complete").start()
    ms.addData(
      Evt(1, t("01:00"), "click", 1, 0), Evt(1, t("02:00"), "click", 1, 0),
      Evt(2, t("03:00"), "view", 1, 0))
    q.processAllAvailable()
    ms.addData(Evt(3, t("04:00"), "click", 1, 0))
    q.processAllAvailable()
    val rows = spark.table("daily").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toMap
    q.stop()
    assert(rows == Map("click" -> 3L, "view" -> 1L))
  }

  test("sessionCounts: 30-min gap splits a user's events into sessions") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = StreamOps.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    ms.addData(
      Evt(1, t("01:00"), "a", 1, 0), Evt(1, t("01:10"), "b", 1, 0), // session 1
      Evt(1, t("03:00"), "c", 1, 0),                                // session 2
      Evt(2, t("01:05"), "d", 1, 0))
    q.processAllAvailable()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    q.stop()
    assert(rows == Map(1L -> Seq(1L, 2L), 2L -> Seq(1L)))
  }

  test("purchaseClickJoin: stream-stream interval join matches the batch replay") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Evt]
    val clicks = MemoryStream[Evt]
    val q = StreamOps.purchaseClickJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ppcj").outputMode("append").start()
    // vid_id doubles as the event id in the Evt fixture
    purchases.addData(Evt(1, t("02:00"), "purchase", 100, 0))
    clicks.addData(
      Evt(1, t("02:10"), "click", 200, 0),  // in window → joins
      Evt(1, t("02:59"), "click", 201, 0),  // in window → joins
      Evt(1, t("03:30"), "click", 202, 0),  // past the 1h reach → no
      Evt(1, t("01:50"), "click", 203, 0),  // before the purchase → no
      Evt(2, t("02:10"), "click", 204, 0))  // other user → no
    q.processAllAvailable()
    // advance both watermarks far enough that all joinable state closes
    purchases.addData(Evt(9, t("09:00"), "purchase", 900, 0))
    clicks.addData(Evt(9, t("09:00"), "click", 901, 0))
    q.processAllAvailable()
    val got = spark.table("ppcj").collect()
      .map(r => (r.getAs[Long]("purchase_event"), r.getAs[Long]("click_event")))
      .toSet
    q.stop()
    // batch replay of the same interval-join predicate (the q45 shape)
    assert(got == Set((100L, 200L), (100L, 201L), (900L, 901L)),
      s"stream-stream join diverged: $got")
  }

  test("channelHighWater: custom state advances, never regresses") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val q = StreamOps.channelHighWater(ms.toDS())
      .writeStream.format("memory").queryName("hw").outputMode("update").start()
    ms.addData(("chA", t("02:00")), ("chA", t("01:00")), ("chB", t("03:00")))
    q.processAllAvailable()
    ms.addData(("chA", t("01:30"))) // late, below the mark -> no regression
    q.processAllAvailable()
    val last = spark.table("hw").collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Timestamp]("max_publish")))
      .groupBy(_._1).view.mapValues(_.map(_._2.getTime).max).toMap
    q.stop()
    assert(last == Map("chA" -> t("02:00").getTime, "chB" -> t("03:00").getTime))
  }

  test("islandsStream: flagship islands pipeline over a score stream") {
    implicit val ctx = spark.sqlContext
    import graft.islands.IslandMath
    val ms = MemoryStream[StreamOps.ScoreRow]
    // small kernel (size 1) so the fixture stays readable; threshold on
    // the smoothed values, min_len 2
    val q = StreamOps.islandsStream(ms.toDS(), threshold = 0.5, size = 1,
        sigma = 5.0, minLen = 2)
      .writeStream.format("memory").queryName("isl").outputMode("append").start()
    val arr = Array(0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    ms.addData(StreamOps.ScoreRow(7L, arr))
    q.processAllAvailable()
    val got = spark.table("isl").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("start_idx"), r.getAs[Int]("end_idx")))
      .toSet
    q.stop()
    // ground truth = the batch math on the same array
    val sm = IslandMath.smooth(arr, IslandMath.gaussianKernel(1, 5.0), 1)
    val want = IslandMath.findIslands(sm, 0.5, 2).map { case (s, e) => (7L, s, e) }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("pendingPairsStream: empty-score rows stay pending (P4 contract)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Long]
    val models = Seq(10L, 11L).toDF("model_id")
    val scores = Seq(
      (1L, 10L, Seq(0.5)),      // real -> retired
      (2L, 10L, Seq.empty[Double]) // empty -> still pending
    ).toDF("vid_id", "model_id", "score")
    val q = StreamOps.pendingPairsStream(ms.toDF().withColumnRenamed("value", "vid_id"),
        models, scores)
      .writeStream.format("memory").queryName("pending").outputMode("append").start()
    ms.addData(1L, 2L)
    q.processAllAvailable()
    val got = spark.table("pending").collect()
      .map(r => (r.getAs[Long]("vid_id"), r.getAs[Long]("model_id"))).toSet
    q.stop()
    assert(got == Set((1L, 11L), (2L, 10L), (2L, 11L)))
  }

  test("dedupSegments: duplicate (vid_id, start) within watermark dropped") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = StreamOps.dedupSegments(ms.toDF())
      .writeStream.format("memory").queryName("segs").outputMode("append").start()
    ms.addData(
      Evt(1, t("01:00"), "seg", 10, 0.0),
      Evt(1, t("01:01"), "seg", 10, 0.0), // dup key (10, 0.0)
      Evt(1, t("01:02"), "seg", 10, 5.0))
    q.processAllAvailable()
    val n = spark.table("segs").count()
    q.stop()
    assert(n == 2)
  }

  test("nearDupGate: stream verdicts match the batch q30 pair semantics") {
    implicit val ctx = spark.sqlContext
    // lake = the sf0.001 corpus's signatures; incoming = the same texts
    // (must flag as dups of themselves at hamming 0) plus a fresh text
    val lake = graft.dedup.Dedup.simHashSignatures(spark, Sf0001)
      .as[(Long, Long)].collect().sortBy(_._1)
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val (reId, reText) = docs.toSeq.minBy(_._1)
    val ms = MemoryStream[StreamOps.IngestDoc]
    val q = StreamOps.nearDupGate(ms.toDS(), lake)
      .writeStream.format("memory").queryName("gate").outputMode("append").start()
    ms.addData(
      StreamOps.IngestDoc(100000L, reText),           // re-ingest -> dup of reId
      StreamOps.IngestDoc(100001L,
        "completely fresh nonsense never indexed before xyzzy plugh"))
    q.processAllAvailable()
    val got = spark.table("gate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_of"), r.getAs[Int]("hamming"), r.getAs[Boolean]("is_dup")))).toMap
    q.stop()
    graft.core.Resources.release()
    assert(got(100000L) == ((reId, 0, true)), s"re-ingested doc: ${got(100000L)}")
    // fresh doc: verdict must equal an independent nearest-neighbor
    // recompute over the lake array (falsifiable — a gate that flags
    // everything, or picks the wrong neighbor, fails here)
    val freshSig = graft.dedup.Dedup.simHash64(
      "completely fresh nonsense never indexed before xyzzy plugh")
    val (expId, expHam) = lake.map { case (id, h) =>
      (id, java.lang.Long.bitCount(freshSig ^ h))
    }.minBy { case (id, ham) => (ham, id) }
    assert(got(100001L) == ((expId, expHam, expHam <= 6)),
      s"fresh doc verdict ${got(100001L)} != independent ($expId, $expHam)")
    assert(expHam > 0, "fresh text unexpectedly collides with a lake signature")
  }

  test("gate→lake: admitted docs land exactly-once; CDC exposes each batch") {
    // The composed production ingest loop, end-to-end on a REAL
    // structured stream: near-dup gate filters arrivals against the
    // corpus signature set → only admissions reach the manifest lake
    // (exactly-once streamSink) → a downstream consumer tails the lake
    // via CDC version windows. Each stage is oracled/spec'd alone
    // (q30/q106, LayoutSpec, q132); this pins their COMPOSITION.
    implicit val ctx = spark.sqlContext
    import graft.core.ManifestLake
    val lake = graft.dedup.Dedup.simHashSignatures(spark, Sf0001)
      .as[(Long, Long)].collect().sortBy(_._1)
    val reText = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().minBy(_._1)._2
    val dir = java.nio.file.Files.createTempDirectory("gatelake")
      .resolve("lake").toString
    val ms = MemoryStream[StreamOps.IngestDoc]
    val admitted = StreamOps.nearDupGate(ms.toDS(), lake)
      .filter((v: StreamOps.GateVerdict) => !v.is_dup)
      .map(v => (v.doc_id, v.simhash, "ingest"))
      .toDF("doc_id", "simhash", "source")
    val q = admitted.writeStream
      .foreachBatch(ManifestLake.streamSink(dir, "source"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gatelakeckpt").toString)
      .start()
    // batch 1: one re-ingest (rejected) + one fresh doc (admitted)
    ms.addData(
      StreamOps.IngestDoc(200000L, reText),
      StreamOps.IngestDoc(200001L, "fresh uncatalogued text xyzzy plugh quux"))
    q.processAllAvailable()
    val v1 = ManifestLake.latestSnapshot(dir).get.version
    // batch 2: another fresh doc
    ms.addData(StreamOps.IngestDoc(200002L, "another novel arrival corge grault"))
    q.processAllAvailable()
    q.stop()
    // the dup never landed; both fresh docs did, exactly once
    val back = ManifestLake.read(spark, dir)
    assert(back.count() == 2)
    assert(back.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(200001L, 200002L))
    // CDC window since batch 1's commit shows exactly batch 2's admission
    val v2 = ManifestLake.latestSnapshot(dir).get.version
    val delta = ManifestLake.readChanges(spark, dir, v1, v2)
    assert(delta.select($"doc_id").as[Long].collect().toSeq == Seq(200002L))
    // re-delivering batch 0 by hand (restart-after-crash) burns no version
    ManifestLake.streamSink(dir, "source")(
      Seq((200001L, 0L, "ingest")).toDF("doc_id", "simhash", "source"), 0L)
    assert(ManifestLake.latestSnapshot(dir).get.version == v2)
    assert(ManifestLake.read(spark, dir).count() == 2)
  }

  test("perplexityGate: stream verdicts match batch q93 per doc") {
    implicit val ctx = spark.sqlContext
    val model = spark.sparkContext.broadcast(
      graft.score.NgramLm.bigramStats(spark, Sf0001))
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[StreamOps.IngestDoc]
    val q = StreamOps.perplexityGate(ms.toDS(), model)
      .writeStream.format("memory").queryName("pplgate").outputMode("append").start()
    ms.addData(docs.take(50).map { case (id, t) => StreamOps.IngestDoc(id, t) }.toSeq: _*)
    q.processAllAvailable()
    val got = spark.table("pplgate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_items"), r.getAs[Double]("ppl"), r.getAs[Boolean]("keep")))).toMap
    q.stop()
    val batch = graft.score.NgramLm.qPerplexityFilter(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_items"), BigDecimal(r.getAs[String]("ppl_r")),
          r.getAs[Boolean]("keep")))).toMap
    model.destroy()
    graft.core.Resources.release()
    assert(got.size == 50)
    got.foreach { case (id, (n, ppl, keep)) =>
      val (bn, bppl, bkeep) = batch(id)
      assert(n == bn, s"doc $id items")
      assert((BigDecimal(ppl) - bppl).abs <= BigDecimal("0.001"), s"doc $id ppl")
      assert(keep == bkeep, s"doc $id keep")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("contaminationGate: flags every exactly-contaminated doc (no false negatives)") {
    implicit val ctx = spark.sqlContext
    // gate fpp sized for doc-level gating (see scaladoc): 1e-5;
    // caller-owned broadcast, destroyed after the stream stops
    val bloom = spark.sparkContext.broadcast(
      graft.dedup.Dedup.benchmarkBloom(spark, Sf0001, "src18", fpp = 1e-5))
    val exact = graft.dedup.Dedup.qBloomDecontaminate(spark, Sf0001)
      .select($"doc_id").as[Long].collect().toSet
    graft.core.Resources.release()
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .filter($"source" =!= "src18")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[StreamOps.IngestDoc]
    val q = StreamOps.contaminationGate(ms.toDS(), bloom)
      .writeStream.format("memory").queryName("contamgate").outputMode("append").start()
    ms.addData(docs.map { case (id, t) => StreamOps.IngestDoc(id, t) }.toSeq)
    q.processAllAvailable()
    val got = spark.table("contamgate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_grams"), r.getAs[Int]("flagged_grams"),
          r.getAs[Boolean]("flagged")))).toMap
    q.stop()
    bloom.destroy()
    assert(got.size == docs.length)
    // no false negatives: the bloom may only ADD flags over the exact set
    exact.foreach { id =>
      assert(got(id)._3, s"doc $id exactly contaminated but gate passed it")
    }
    assert(exact.nonEmpty, "no contaminated docs at sf0.001 — fixture drifted")
    // false alarms bounded: at fpp 1e-5 and ~60 grams/doc the expected
    // FP count over 475 docs is << 1 (deterministic given the fixed
    // bloom seed, so this is a stable bound, not a flaky one)
    val flagged = got.filter(_._2._3).keySet
    assert((flagged -- exact).size <= 2,
      s"gate false alarms: ${(flagged -- exact).size}")
    // n_grams is the scalar gram count
    docs.foreach { case (id, t) =>
      assert(got(id)._1 == graft.dedup.Dedup.gramHashes(t).length, s"doc $id n_grams")
    }
  }

  test("classifierGate: stream verdicts match batch q122 per doc") {
    implicit val ctx = spark.sqlContext
    val weights = spark.sparkContext.broadcast(
      graft.text.TextAnalysis.classifierWeightArray)
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[StreamOps.IngestDoc]
    val q = StreamOps.classifierGate(ms.toDS(), weights)
      .writeStream.format("memory").queryName("clfgate").outputMode("append").start()
    ms.addData(docs.take(60).map { case (id, t) => StreamOps.IngestDoc(id, t) }.toSeq: _*)
    q.processAllAvailable()
    val got = spark.table("clfgate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("score_r"),
          r.getAs[Boolean]("keep")))).toMap
    q.stop()
    val batch = graft.text.TextAnalysis.qClassifierScore(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("score_r"),
          r.getAs[Boolean]("keep")))).toMap
    weights.destroy()
    graft.core.Resources.release()
    assert(got.size == 60)
    got.foreach { case (id, v) =>
      // the batch form emits no row for token-less docs; the gate must
      // still rule on them — only compare where batch has a row
      batch.get(id).foreach(b => assert(v == b, s"doc $id: gate $v vs batch $b"))
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "both verdicts should occur at sf0.001")
  }

  test("classifierGate: UnscorablePolicy rules token-less arrivals") {
    implicit val ctx = spark.sqlContext
    val weights = spark.sparkContext.broadcast(
      graft.text.TextAnalysis.classifierWeightArray)
    for ((policy, expectKeep) <- Seq(
        StreamOps.UnscorablePolicy.Admit -> true,
        StreamOps.UnscorablePolicy.Reject -> false)) {
      val ms = MemoryStream[StreamOps.IngestDoc]
      val name = s"clfgate_unscorable_$expectKeep"
      val q = StreamOps.classifierGate(ms.toDS(), weights, policy)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      ms.addData(StreamOps.IngestDoc(1L, "   "), StreamOps.IngestDoc(2L, ""))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[String]("score_r"),
            r.getAs[Boolean]("keep")))).toMap
      q.stop()
      assert(got == Map(
        1L -> ((0L, "0.000000", expectKeep)),
        2L -> ((0L, "0.000000", expectKeep))), s"policy $policy")
    }
    weights.destroy()
  }

  test("CDC-upsert stream: foreachBatch(merge) converges the lake to latest-per-key") {
    // The change-data-capture ingest shape: an upstream emits row
    // VERSIONS (same key, newer values); per micro-batch, keep-latest
    // dedup inside the batch then ManifestLake.merge upserts by key —
    // the lake converges to exactly the newest version of every key,
    // regardless of how updates interleave across batches. Duplicate
    // redelivery of a whole batch is exactly-once-safe only at the
    // CONTENT level here (merge is idempotent for identical updates:
    // re-merging the same rows rewrites them in place).
    implicit val ctx = spark.sqlContext
    import graft.core.ManifestLake
    import org.apache.spark.sql.functions.{lit, row_number}
    val dir = java.nio.file.Files.createTempDirectory("cdcup")
      .resolve("lake").toString
    // seed: keys 0..99 at version 0
    ManifestLake.append(spark,
      dir, spark.range(0, 100).select($"id".as("doc_id"),
        lit("c0").as("source"), lit(0L).as("ver")).repartitionByRange(4, $"doc_id"),
      "source", statsCols = Seq("doc_id"))
    val ms = MemoryStream[(Long, Long)]      // (doc_id, ver)
    val q = ms.toDF().toDF("doc_id", "ver")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val latest = batch
          .withColumn("rn", row_number().over(
            Window.partitionBy($"doc_id").orderBy($"ver".desc)))
          .filter($"rn" === 1).drop("rn")
          .select($"doc_id", lit("c0").as("source"), $"ver")
        if (!latest.isEmpty) {
          ManifestLake.merge(batch.sparkSession, dir, latest, Seq("doc_id")); ()
        }
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdcupckpt").toString)
      .start()
    // batch 1: update keys 10..19 to ver 1, insert keys 100..104 at ver 1,
    // including an intra-batch double-update of key 10 (ver 1 then 2)
    ms.addData((10L, 1L), (10L, 2L))
    ms.addData((11L to 19L).map(k => (k, 1L)): _*)
    ms.addData((100L to 104L).map(k => (k, 1L)): _*)
    q.processAllAvailable()
    // batch 2: update key 10 again and one of the batch-1 inserts
    ms.addData((10L, 3L), (100L, 2L))
    q.processAllAvailable()
    q.stop()
    val back = ManifestLake.read(spark, dir)
    assert(back.count() == 105)
    val got = back.select($"doc_id", $"ver").as[(Long, Long)]
      .collect().toMap
    val want = ((0L until 100L).map(k => k -> 0L).toMap
      ++ (11L to 19L).map(k => k -> 1L) ++ (101L to 104L).map(k => k -> 1L)
      + (10L -> 3L) + (100L -> 2L))
    assert(got == want, s"lake must converge to latest-per-key; diff=${
      (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    assert(ManifestLake.latestSnapshot(dir).get.op == "merge")
  }
}
