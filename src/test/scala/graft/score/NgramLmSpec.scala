package graft.score

import graft.SparkSpec

/** FIXTURES.md §3 scoring fixtures (client/async_processing_client.py:
  * 163-179, test_client_functions.py:32-49) + MLE math + cross-check of
  * the broadcast-UDF and relational forms. */
class NgramLmSpec extends SparkSpec {

  private val text = "alpha beta gamma delta epsilon zeta"

  test("pad: n-1 <s> sentinels on the left") {
    val padded = NgramLm.pad(NgramLm.tokenize(text))
    assert(padded.take(3).forall(_ == "<s>"))
    assert(padded.length == 9)
  }

  test("items: one per position past padding; first context is all <s>") {
    val items = NgramLm.items(NgramLm.tokenize(text))
    assert(items.length == 6)
    assert(items.head == (("alpha", Seq("<s>", "<s>", "<s>"))))
    assert(items(1) == (("beta", Seq("<s>", "<s>", "alpha"))))
    assert(items.last._1 == "zeta")
  }

  test("constant FakeModel scores 0.5 per word (test_support.py:85-90)") {
    val model = NgramLm.ConstLm(0.5)
    val scores = NgramLm.items(NgramLm.tokenize(text))
      .map { case (w, ctx) => model.score(w, ctx) }
    assert(scores == Seq.fill(6)(0.5))
  }

  test("empty text -> empty score array (don't-retry semantics)") {
    assert(NgramLm.items(NgramLm.tokenize("   ")).isEmpty)
  }

  test("MLE: count ratios, unseen context -> 0") {
    val corpus = Seq(NgramLm.tokenize("a b c d"), NgramLm.tokenize("a b c e"))
    val lm = NgramLm.train(corpus)
    // context (<s>,a,b) -> c occurs twice out of 2
    assert(lm.score("c", Seq("<s>", "a", "b")) == 1.0)
    // context (a,b,c) -> d once of 2, e once of 2
    assert(lm.score("d", Seq("a", "b", "c")) == 0.5)
    assert(lm.score("e", Seq("a", "b", "c")) == 0.5)
    assert(lm.score("z", Seq("a", "b", "c")) == 0.0)
    assert(lm.score("d", Seq("x", "y", "z")) == 0.0)
  }

  test("S8: model blob round-trip through a BinaryType table scores identically") {
    import spark.implicits._
    val corpus = Seq(NgramLm.tokenize("a b c d e"), NgramLm.tokenize("a b c f g"))
    val direct = NgramLm.train(corpus)
    val dir = java.nio.file.Files.createTempDirectory("models").resolve("model_table").toString
    NgramLm.modelTable(spark, Seq("m1" -> direct)).write.parquet(dir)
    val loaded = NgramLm.loadModel(spark.read.parquet(dir), "m1")
    val testItems = NgramLm.items(NgramLm.tokenize("a b c d g z"))
    testItems.foreach { case (w, ctx) =>
      assert(loaded.score(w, ctx) == direct.score(w, ctx), s"($w, $ctx)")
    }
    // and through the broadcast scorer
    val bc = spark.sparkContext.broadcast(loaded)
    val scored = NgramLm.scoreColumn(Seq((1L, "a b c d")).toDF("id", "text"), "text", bc)
      .select($"score").head().getSeq[Double](0)
    assert(scored.length == 4)
    assert(scored == NgramLm.items(NgramLm.tokenize("a b c d"))
      .map { case (w, ctx) => direct.score(w, ctx) })
  }

  test("q93: relational smoothed-bigram perplexity matches a scalar replay") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // Scalar replay of the add-one bigram math over the same corpus.
    def bigrams(text: String): Seq[(String, String)] = {
      val toks = "<s>" +: NgramLm.tokenize(text).toSeq
      toks.sliding(2).collect { case Seq(c, w) => (c, w) }.toSeq
    }
    val all = docs.flatMap { case (_, t) => bigrams(t) }
    val g2 = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val g1 = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vsz = all.map(_._2).distinct.size.toLong
    val expected = docs.map { case (id, t) =>
      val items = bigrams(t)
      val nll = items.map { case (c, w) =>
        -math.log((g2.getOrElse((c, w), 0L) + 1.0) / (g1(c) + vsz))
      }.sum
      id -> (items.size.toLong, math.exp(nll / items.size))
    }.toMap
    val rows = NgramLm.qPerplexityFilter(spark, Sf0001).collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val (n, ppl) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_items") == n)
      val got = BigDecimal(r.getAs[String]("ppl_r"))
      assert((got - BigDecimal(ppl)).abs < BigDecimal("0.001"), s"doc ${r.get(0)}")
      assert(r.getAs[Boolean]("keep") == (got <= BigDecimal("30.0")))
    }
    // the cut actually splits this corpus — both classes non-empty
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("bigramStats: gate artifact is bounded by maxContexts·(topK+1), exact where bounds cover") {
    import spark.implicits._
    // in-driver ground truth over the tiny fixture
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"text").as[String].collect()
    def bigrams(text: String): Seq[(String, String)] = {
      val toks = "<s>" +: NgramLm.tokenize(text).toSeq
      toks.sliding(2).collect { case Seq(c, w) => (c, w) }.toSeq
    }
    val all = docs.flatMap(bigrams)
    val g2Full = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val g1Full = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vszFull = all.map(_._2).distinct.size.toLong

    // default bounds exceed the fixture's statistics → lossless
    val exact = NgramLm.bigramStats(spark, Sf0001)
    assert(exact.grams2 == g2Full)
    assert(exact.grams1 == g1Full)
    assert(exact.vsz == vszFull)

    // tiny bounds → the artifact is CONSTANT-bounded by construction
    // (the scale contract: never a function of corpus size)
    val (mc, k) = (4, 2)
    val pruned = NgramLm.bigramStats(spark, Sf0001, maxContexts = mc, topKPerContext = k)
    assert(pruned.grams1.size <= mc, s"${pruned.grams1.size} contexts kept")
    assert(pruned.grams2.size <= mc * k, s"${pruned.grams2.size} pairs kept")
    assert(pruned.grams2.keySet.forall(p => pruned.grams1.contains(p._1)),
      "kept pairs must live under kept contexts")
    // kept contexts are the HIGHEST-mass ones and keep their EXACT
    // total (pruning drops numerators, never denominator mass)
    val topByMass = g1Full.toSeq.sortBy { case (c, n) => (-n, c) }.take(mc).toMap
    assert(pruned.grams1 == topByMass)
    // kept pairs carry exact counts; vocab size is never pruned
    pruned.grams2.foreach { case (key, n) => assert(g2Full(key) == n) }
    assert(pruned.vsz == vszFull)
  }

  test("broadcast scorer matches the relational q46 means") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, Sf0001)
    val corpus = docs.filter($"source" === "src0").select($"text")
      .collect().map(r => NgramLm.tokenize(r.getString(0)))
    val model = NgramLm.train(corpus)
    val bc = spark.sparkContext.broadcast(model: NgramLm.LmModel)
    val viaUdf = NgramLm.scoreColumn(
        docs.filter($"source" === "src1").select($"doc_id", $"text"), "text", bc)
      .select($"doc_id",
        (expr("aggregate(score, cast(0.0 as double), (a, x) -> a + x)") / size($"score"))
          .as("mean_udf"))
    val rel = NgramLm.qNgramScore(spark, Sf0001)
      .withColumn("mean_rel", $"mean_p".cast("double"))
      .select($"doc_id", $"mean_rel")
    val joined = viaUdf.join(rel, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_udf") - r.getAs[Double]("mean_rel")) < 1e-6,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("manifest export -> ingest rebuilds a map-identical model (S7 migration)") {
    import spark.implicits._
    val corpus = Seq(NgramLm.tokenize("a b c d"), NgramLm.tokenize("a b c e f"),
      NgramLm.tokenize("b c d a"))
    val trained = NgramLm.train(corpus)
    // the manifest rows tools/export_model_manifest.py would emit
    val dir = graft.sink.TempDirs.fresh("graft_manifest_spec_").toString
    spark.createDataset(trained.grams.toSeq.map { case (ng, c) => ("m0", ng, c) })
      .toDF("model_key", "ngram", "count")
      .repartition(3)
      .write.mode("overwrite").json(dir)
    val lake = ModelManifest.ingest(spark, dir)
    val rebuilt = NgramLm.loadModel(lake, "m0").asInstanceOf[NgramLm.MleLm]
    assert(rebuilt.n == trained.n)
    assert(rebuilt.grams == trained.grams, "gram counts must survive the manifest trip")
    // contexts were NOT exported — the ingest derives them, exactly
    assert(rebuilt.contexts == trained.contexts,
      "derived context counts must equal the trained ones")
    // behavioral check incl. an unseen context
    val probes = NgramLm.items(NgramLm.tokenize("a b c d e")) :+
      (("zzz", Seq("no", "such", "ctx")))
    probes.foreach { case (w, ctx) =>
      assert(rebuilt.score(w, ctx) == trained.score(w, ctx), s"($w | $ctx)")
    }
  }
}
