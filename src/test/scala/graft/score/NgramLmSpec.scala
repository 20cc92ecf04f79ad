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
}
