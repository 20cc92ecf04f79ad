package graft.score

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** N-gram language-model scoring (SURVEY.md §2.5 W3-W5): tokenize,
  * left-pad with n−1 "<s>" symbols, build (word, context) items, score
  * each item with an n-gram MLE model
  * (client/async_processing_client.py:163-179).
  *
  * The reference ships ~9,511 pickled NLTK models as BYTEA blobs and
  * runs a pure-Python scoring loop it calls "pathologically slow"
  * (ROADMAP.md:55-61). Here the model is a JVM hash-map scored via a
  * broadcast — one ship per executor replaces the reference's
  * LRU-with-affinity machinery (client:334-361, server:91-112) — and
  * the same math is ALSO expressed relationally (count tables + joins)
  * so the DuckDB oracle can replay it. NgramLmSpec cross-checks the
  * two forms.
  */
object NgramLm {

  val N = 4
  val Pad = "<s>"

  /** The reference's model interface: probability of word given an
    * (n−1)-token context (client:177-179). */
  trait LmModel extends Serializable {
    def score(word: String, context: Seq[String]): Double
  }

  /** FakeModel analogue for tests (test_support.py:85-90). */
  final case class ConstLm(p: Double) extends LmModel {
    def score(word: String, context: Seq[String]): Double = p
  }

  /** MLE: count(context ++ word) / count(context), 0 when the context
    * (or continuation) is unseen. */
  final case class MleLm(n: Int,
                         grams: Map[Seq[String], Long],
                         contexts: Map[Seq[String], Long]) extends LmModel {
    def score(word: String, context: Seq[String]): Double = {
      val c = contexts.getOrElse(context, 0L)
      if (c == 0L) 0.0
      else grams.getOrElse(context :+ word, 0L).toDouble / c
    }
  }

  def tokenize(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  // ---- S8: model blob load + broadcast ------------------------------
  // The reference stores ~9,511 pickled NLTK models as BYTEA and
  // unpickles on the client (sql/schema.sql:85-96,
  // client/async_processing_client.py:263-287). JVM models round-trip
  // through java serialization into a BinaryType column; the blob is
  // fetched ONCE on the driver and broadcast — one ship per executor
  // replaces the reference's per-client LRU + server affinity.

  def serializeModel(model: LmModel): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(model); oos.close()
    bos.toByteArray
  }

  def deserializeModel(bytes: Array[Byte]): LmModel = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[LmModel] finally ois.close()
  }

  /** The model_table shape: (model_key, model_data BYTEA). */
  def modelTable(s: SparkSession, models: Seq[(String, LmModel)]): DataFrame = {
    import s.implicits._
    models.map { case (k, m) => (k, serializeModel(m)) }.toDF("model_key", "model_data")
  }

  /** Driver-side blob fetch + deserialize (the SELECT … WHERE id = ANY
    * shape, client:263-287) — returns the model ready to broadcast. */
  def loadModel(modelTable: DataFrame, key: String): LmModel = {
    import modelTable.sparkSession.implicits._
    val bytes = modelTable.filter($"model_key" === key)
      .select($"model_data").as[Array[Byte]].head()
    deserializeModel(bytes)
  }

  /** Left-pad with n−1 sentinels (client:163-165). */
  def pad(tokens: Array[String], n: Int = N): Array[String] =
    Array.fill(n - 1)(Pad) ++ tokens

  /** (word, context) items for every position past the padding
    * (client:168-174). */
  def items(tokens: Array[String], n: Int = N): Seq[(String, Seq[String])] = {
    val padded = pad(tokens, n)
    (n - 1 until padded.length).map(i => (padded(i), padded.slice(i - n + 1, i).toSeq))
  }

  /** Train an MLE model from a token corpus. */
  def train(corpus: Iterable[Array[String]], n: Int = N): MleLm = {
    val grams = scala.collection.mutable.Map.empty[Seq[String], Long]
    val ctxs = scala.collection.mutable.Map.empty[Seq[String], Long]
    corpus.foreach { tokens =>
      items(tokens, n).foreach { case (w, ctx) =>
        grams.updateWith(ctx :+ w)(c => Some(c.getOrElse(0L) + 1))
        ctxs.updateWith(ctx)(c => Some(c.getOrElse(0L) + 1))
      }
    }
    MleLm(n, grams.toMap, ctxs.toMap)
  }

  /** W5: score a text column against a broadcast model → per-word score
    * array. The broadcast deserializes once per executor — the Spark
    * replacement for the reference's model-major scheduling and
    * per-client LRU. The tokenizer is pluggable: the reference scores
    * RAW text through NLTK word_tokenize (client:163-165), so the
    * raw-text path should pass [[graft.text.Treebank.tokenize]];
    * normalized (punctuation-stripped) text uses the whitespace
    * default, where the two are equivalent. */
  def scoreColumn(df: DataFrame, textCol: String, model: Broadcast[LmModel],
                  tokenizer: String => Array[String] = tokenize): DataFrame = {
    val scoreUdf = udf { text: String =>
      items(tokenizer(text)).map { case (w, ctx) => model.value.score(w, ctx) }
    }
    df.withColumn("score", scoreUdf(col(textCol)))
  }

  /** W2: ordered transcript assembly — one text per source, segments
    * ordered by doc_id and joined with single spaces
    * (client/async_processing_client.py:251-260,
    * embed_transcripts_8values.py:116-122). sort_array over collected
    * (key, text) structs gives a deterministic in-group order without
    * relying on partition order; the groupBy is one shuffle of the
    * text bytes keyed by source. */
  def assembleBySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source")
      .agg(concat_ws(" ",
        expr("transform(sort_array(collect_list(struct(doc_id, text))), x -> x.text)"))
        .as("full_text"))
  }

  /** W2+W5 end-to-end (the reference's flagship hot loop,
    * client:251-260 → 163-179): assemble per-source ordered text, train
    * an MLE 4-gram model on src0's assembled corpus, broadcast it, and
    * score every other source's assembled transcript — emitting item
    * count and mean probability. The model ships once per executor;
    * scoring is a narrow per-row pass. The oracle replays the identical
    * math relationally (count tables + joins), which NgramLmSpec also
    * cross-checks in-JVM. */
  /** The SHARED q47/q67/q107 head: assembled per-source texts + the
    * src0 training text (one driver-side fetch of the single training
    * source — the Spark analogue of loading one pickled model blob,
    * S8, client:263-287). The three queries differ ONLY in how the
    * trained model is routed (in-memory / blob lake / export
    * manifest); head and tail are single definitions so their shared
    * oracle claim is structural, not a copy-paste invariant.
    *
    * SIZE CONTRACT: the training source's assembled text must fit on
    * the driver — same envelope as the reference's per-worker pickled
    * model load (~hundreds of MB, island_worker.py:15). This is the
    * train-on-one-source shape ONLY; at corpus scale the route is
    * q107's [[ModelManifest.ingest]] (counts arrive as a distributed
    * table, the model is rebuilt without any driver-side text), or
    * q93's fully-relational self-scoring form which never materializes
    * text anywhere. */
  private def assembledWithTrainText(s: SparkSession, dir: String): (DataFrame, String) = {
    import s.implicits._
    val assembled = assembleBySource(s, dir)
    val trainText = assembled.filter($"source" === "src0")
      .select($"full_text").as[String].collect().headOption.getOrElse("")
    (assembled, trainText)
  }

  /** The SHARED q47/q67/q107 tail: broadcast-model scoring of every
    * non-training source + the DECIMAL(12,6) mean_p contract the
    * relational oracle replays. */
  private def broadcastScoreTail(assembled: DataFrame,
                                 bc: Broadcast[LmModel]): DataFrame = {
    val s = assembled.sparkSession
    import s.implicits._
    scoreColumn(assembled.filter($"source" =!= "src0"), "full_text", bc)
      .select($"source", size($"score").as("n_items"),
        (expr("aggregate(score, cast(0.0 as double), (acc, x) -> acc + x)") / size($"score"))
          .cast(org.apache.spark.sql.types.DecimalType(12, 6)).cast("string").as("mean_p"))
      .orderBy($"source")
  }

  def qLmBroadcastScore(s: SparkSession, dir: String): DataFrame = {
    val (assembled, trainText) = assembledWithTrainText(s, dir)
    val bc = graft.core.Resources.broadcast(s, train(Seq(tokenize(trainText))): LmModel)
    broadcastScoreTail(assembled, bc)
  }

  val qLmBroadcastScoreSql: String =
    s"""WITH assembled AS (
         SELECT source, string_agg(text, ' ' ORDER BY doc_id) AS full_text
         FROM documents GROUP BY source),
       it AS (
         SELECT source,
           unnest(list_transform(generate_series($N, len(padded)), i -> struct_pack(
             c1 := padded[i-3], c2 := padded[i-2], c3 := padded[i-1], w := padded[i]))) AS item
         FROM (SELECT source,
                 list_concat(['$Pad', '$Pad', '$Pad'],
                   regexp_split_to_array(trim(full_text), '\\s+')) AS padded
               FROM assembled) t),
       flat AS (
         SELECT source, item.c1 AS c1, item.c2 AS c2, item.c3 AS c3, item.w AS w
         FROM it),
       grams4 AS (
         SELECT c1, c2, c3, w, COUNT(*) AS c4 FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3, w),
       grams3 AS (
         SELECT c1, c2, c3, COUNT(*) AS c3n FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3)
       SELECT f.source, COUNT(*) AS n_items,
         CAST(CAST(SUM(CASE WHEN g3.c3n IS NULL OR g3.c3n = 0 THEN 0.0
                       ELSE CAST(COALESCE(g4.c4, 0) AS DOUBLE) / g3.c3n END)
              / COUNT(*) AS DECIMAL(12,6)) AS VARCHAR) AS mean_p
       FROM flat f
       LEFT JOIN grams4 g4 ON f.c1 = g4.c1 AND f.c2 = g4.c2 AND f.c3 = g4.c3 AND f.w = g4.w
       LEFT JOIN grams3 g3 ON f.c1 = g3.c1 AND f.c2 = g3.c2 AND f.c3 = g3.c3
       WHERE f.source != 'src0'
       GROUP BY f.source ORDER BY f.source"""

  /** The relational form of train+score: 4-gram/3-gram count tables
    * from the src0 training corpus, items from src1 docs, probability
    * via two left joins (gram hit / context total), per-doc mean. At
    * 100 TB the count tables shuffle on the gram key with map-side
    * combine, and scoring is two broadcast (or shuffled) hash joins —
    * no Python loop, no model blobs. */
  def qNgramScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def itemsDf(src: String): DataFrame =
      Tables.documents(s, dir)
        .filter($"source" === src)
        .withColumn("padded", expr(
          s"concat(array_repeat('$Pad', ${N - 1}), split(trim(text), '\\\\s+'))"))
        .select($"doc_id", explode(expr(
          s"transform(sequence($N, size(padded)), i -> struct(" +
            "element_at(padded, i-3) as c1, element_at(padded, i-2) as c2, " +
            "element_at(padded, i-1) as c3, element_at(padded, i) as w))")).as("it"))
        .select($"doc_id", $"it.c1", $"it.c2", $"it.c3", $"it.w")
    val train = itemsDf("src0")
    val grams4 = train.groupBy($"c1", $"c2", $"c3", $"w").agg(count(lit(1)).as("c4"))
    val grams3 = train.groupBy($"c1", $"c2", $"c3").agg(count(lit(1)).as("c3n"))
    itemsDf("src1")
      .join(grams4, Seq("c1", "c2", "c3", "w"), "left")
      .join(grams3, Seq("c1", "c2", "c3"), "left")
      .withColumn("p",
        when($"c3n".isNull || $"c3n" === 0, 0.0)
          .otherwise(coalesce($"c4", lit(0L)).cast("double") / $"c3n"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_items"),
           (sum($"p") / count(lit(1))).as("mean_p"))
      .select($"doc_id", $"n_items",
        $"mean_p".cast(org.apache.spark.sql.types.DecimalType(12, 6)).cast("string").as("mean_p"))
      .orderBy($"doc_id")
  }

  val qNgramScoreSql: String =
    s"""WITH it AS (
         SELECT doc_id, source,
           unnest(list_transform(generate_series($N, len(padded)), i -> struct_pack(
             c1 := padded[i-3], c2 := padded[i-2], c3 := padded[i-1], w := padded[i]))) AS item
         FROM (SELECT doc_id, source,
                 list_concat(['$Pad', '$Pad', '$Pad'],
                   regexp_split_to_array(trim(text), '\\s+')) AS padded
               FROM documents WHERE source IN ('src0', 'src1')) t),
       flat AS (
         SELECT doc_id, source, item.c1 AS c1, item.c2 AS c2, item.c3 AS c3, item.w AS w
         FROM it),
       grams4 AS (
         SELECT c1, c2, c3, w, COUNT(*) AS c4 FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3, w),
       grams3 AS (
         SELECT c1, c2, c3, COUNT(*) AS c3n FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3)
       SELECT f.doc_id, COUNT(*) AS n_items,
         CAST(CAST(SUM(CASE WHEN g3.c3n IS NULL OR g3.c3n = 0 THEN 0.0
                       ELSE CAST(COALESCE(g4.c4, 0) AS DOUBLE) / g3.c3n END)
              / COUNT(*) AS DECIMAL(12,6)) AS VARCHAR) AS mean_p
       FROM flat f
       LEFT JOIN grams4 g4 ON f.c1 = g4.c1 AND f.c2 = g4.c2 AND f.c3 = g4.c3 AND f.w = g4.w
       LEFT JOIN grams3 g3 ON f.c1 = g3.c1 AND f.c2 = g3.c2 AND f.c3 = g3.c3
       WHERE f.source = 'src1'
       GROUP BY f.doc_id ORDER BY f.doc_id"""

  // ---- W3 on the oracled path: raw text through Treebank ------------

  /** Deterministic punctuation injection: the testdata's `text` is
    * punctuation-free (whitespace == Treebank there, proving nothing),
    * so q62 derives a raw form whose Treebank tokenization provably
    * DIFFERS from whitespace — a leading straight quote (→ ``) and a
    * suffix exercising the n't contraction split, comma/ellipsis/paren
    * split-off, and the final-period rule. */
  private val RawSuffix = " can't stop, really... (wow)."

  /** The 10 tokens Treebank yields for [[RawSuffix]] — pinned by
    * TreebankSpec ("q62 raw-text construction") so the oracle's
    * reconstruction and the tokenizer can never silently diverge. */
  private val RawSuffixTokens =
    Seq("ca", "n't", "stop", ",", "really", "...", "(", "wow", ")", ".")

  /** q62 — the reference's ACTUAL scoring shape (SURVEY §7.5 risk #1):
    * RAW punctuation-bearing text tokenized by the Treebank rules
    * (NLTK word_tokenize in client/async_processing_client.py:163-165),
    * then 4-gram-scored against a model trained the same way. Token
    * counts (= score-array lengths = island indexes downstream) differ
    * from whitespace by 7 per doc here — exactly the divergence class
    * that made W3 a risk; `n_ws` rides along so the divergence is IN
    * the oracled output, not just asserted in a spec. Same
    * broadcast-model plan as q47: driver-side train-source fetch, one
    * model ship per executor, narrow scoring pass.
    *
    * Scale note: the `collect()` below pulls the src0 TRAINING split to
    * the driver — fixture-scale only, and deliberate: it mirrors the
    * reference's offline per-work model training (a few documents per
    * model, never the corpus). The corpus-scale path is q93's
    * [[graft.score.NgramLm.BigramStats]], which trains the LM fully distributed
    * (map-side partial counts, no driver materialization). */
  def qTreebankScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = Tables.documents(s, dir)
      .filter($"source".isin("src0", "src1"))
      .withColumn("raw", concat(lit("\""), $"text", lit(RawSuffix)))
    val trainDocs = raw.filter($"source" === "src0")
      .select($"raw").as[String].collect()
    val bc = graft.core.Resources.broadcast(s,
      train(trainDocs.toSeq.map(graft.text.Treebank.tokenize)): LmModel)
    scoreColumn(raw.filter($"source" === "src1"), "raw", bc,
        graft.text.Treebank.tokenize)
      .select($"doc_id",
        size($"score").cast("long").as("n_items"),
        size(split(trim($"raw"), "\\s+")).cast("long").as("n_ws"),
        (expr("aggregate(score, cast(0.0 as double), (acc, x) -> acc + x)") / size($"score"))
          .cast(org.apache.spark.sql.types.DecimalType(12, 6)).cast("string").as("mean_p"))
      .orderBy($"doc_id")
  }

  /** Oracle: DuckDB can't run the regex cascade, but it doesn't need
    * to — the base text is punctuation-free, so the Treebank result is
    * exactly ['``'] ++ whitespace(text) ++ [[RawSuffixTokens]]
    * (TreebankSpec pins the bridge). The LM replay is then q46's
    * relational math over those reconstructed token lists. */
  val qTreebankScoreSql: String = {
    val sufToks = RawSuffixTokens.map(t => "'" + t.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
         SELECT doc_id, source,
           list_concat(list_concat(['``'], regexp_split_to_array(trim(text), '\\s+')), $sufToks) AS toks,
           len(regexp_split_to_array(trim('"' || text || ' can''t stop, really... (wow).'), '\\s+')) AS n_ws
         FROM documents WHERE source IN ('src0', 'src1')),
       it AS (
         SELECT doc_id, source, n_ws,
           unnest(list_transform(generate_series($N, len(padded)), i -> struct_pack(
             c1 := padded[i-3], c2 := padded[i-2], c3 := padded[i-1], w := padded[i]))) AS item
         FROM (SELECT doc_id, source, n_ws,
                 list_concat(['$Pad', '$Pad', '$Pad'], toks) AS padded
               FROM toks) t),
       flat AS (
         SELECT doc_id, source, n_ws, item.c1 AS c1, item.c2 AS c2, item.c3 AS c3, item.w AS w
         FROM it),
       grams4 AS (
         SELECT c1, c2, c3, w, COUNT(*) AS c4 FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3, w),
       grams3 AS (
         SELECT c1, c2, c3, COUNT(*) AS c3n FROM flat WHERE source = 'src0'
         GROUP BY c1, c2, c3)
       SELECT f.doc_id, COUNT(*) AS n_items, ANY_VALUE(f.n_ws) AS n_ws,
         CAST(CAST(SUM(CASE WHEN g3.c3n IS NULL OR g3.c3n = 0 THEN 0.0
                       ELSE CAST(COALESCE(g4.c4, 0) AS DOUBLE) / g3.c3n END)
              / COUNT(*) AS DECIMAL(12,6)) AS VARCHAR) AS mean_p
       FROM flat f
       LEFT JOIN grams4 g4 ON f.c1 = g4.c1 AND f.c2 = g4.c2 AND f.c3 = g4.c3 AND f.w = g4.w
       LEFT JOIN grams3 g3 ON f.c1 = g3.c1 AND f.c2 = g3.c2 AND f.c3 = g3.c3
       WHERE f.source = 'src1'
       GROUP BY f.doc_id ORDER BY f.doc_id"""
  }

  /** q67 — S7 on the oracled path: the q47 model serialized to a
    * BinaryType blob table, written to and re-read from an actual
    * parquet lake (the reference's BYTEA model_table shape,
    * sql/schema.sql:85-96), driver-fetched by key and deserialized
    * ([[loadModel]] = the SELECT … WHERE id = ANY fetch,
    * client:263-287), broadcast, and scored. The output is q47's
    * output by construction, so the q47 oracle replays it — any
    * corruption anywhere in the serialize → parquet → read → fetch →
    * deserialize chain breaks score parity. */
  def qModelBlobRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val (assembled, trainText) = assembledWithTrainText(s, dir)
    val model = train(Seq(tokenize(trainText)))
    val lake = graft.sink.TempDirs.fresh("graft_model_blobs_")
    modelTable(s, Seq("lm0" -> model)).write.mode("overwrite").parquet(lake.toString)
    val loaded = loadModel(s.read.parquet(lake.toString), "lm0")
    broadcastScoreTail(assembled, graft.core.Resources.broadcast(s, loaded))
  }

  /** q107 — S7 migration path end-to-end: the manifest a reference
    * operator exports from their pickled models
    * (tools/export_model_manifest.py) → [[ModelManifest.ingest]]'s
    * distributed rebuild → blob lake → S8 load + broadcast → the q47
    * scoring pass. The manifest FIXTURE here is authored from an
    * in-engine trained model (fixture scaffolding — at migration time
    * those rows come from the pickles; the operator under test is the
    * ingest), and the oracle is q47's relational replay: if the
    * manifest trip corrupts a single count, every downstream mean_p
    * shifts and the hash breaks. */
  def qModelManifestRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (assembled, trainText) = assembledWithTrainText(s, dir)
    val trained = train(Seq(tokenize(trainText)))
    val manifestDir = graft.sink.TempDirs.fresh("graft_model_manifest_").toString
    s.createDataset(trained.grams.toSeq.map { case (ng, c) => ("src0", ng, c) })
      .toDF("model_key", "ngram", "count")
      .repartition(4)
      .write.mode("overwrite").json(manifestDir)
    val lake = ModelManifest.ingest(s, manifestDir)
    broadcastScoreTail(assembled, graft.core.Resources.broadcast(s, loadModel(lake, "src0")))
  }

  // ---- q93: perplexity-based quality filter -------------------------

  /** Add-one-smoothed bigram perplexity cut (the CCNet/KenLM-style
    * LM-quality gate a training pipeline runs corpus-wide): train a
    * bigram model on the WHOLE documents table, score every doc's
    * perplexity under it, keep docs at or below the cut. Unlike
    * q46/q62 (score one source against another's model) this is the
    * self-scoring curation form — outlier docs are exactly the ones
    * the corpus's own statistics find surprising.
    *
    * p(w|c) = (count(c,w) + 1) / (count(c) + V), V = |vocab|;
    * ppl(doc) = exp(−Σ ln p / n). Plan shape: the corpus explodes to
    * bigram items twice — once into the map-side-combined bigram count
    * table, once as the scoring stream — and the OTHER statistics
    * derive from the bigram table itself: the context table is a sum
    * over it, the vocab size a distinct over it (count-table-sized
    * aggregations, not corpus re-derivations; the naive form explodes
    * the corpus four times). Measured trade at sf0.1: the derivation
    * costs ~0.3 s of stage serialization locally (grams1 now waits on
    * grams2's output instead of running concurrently off its own
    * corpus pass) but removes one full text scan+explode pass — the
    * term that grows with the corpus, since map-side combine already
    * kept every aggregation's shuffled bytes count-table-sized. A
    * per-doc pre-aggregation was also measured and REJECTED: it saves
    * explode CPU but adds a corpus-sized (doc,c1,w) shuffle that
    * map-side combine doesn't shrink (docs rarely repeat bigrams) —
    * 1.5x slower at sf0.1, and the same shuffle added at 100 TB.
    * The keep flag compares the
    * DECIMAL-rounded perplexity (not the raw double) so the flag is
    * derived from the same value both engines emit. */
  private val PplCut = "30.0"

  def qPerplexityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def items = Tables.documents(s, dir)
      .withColumn("padded", expr(s"concat(array('$Pad'), split(trim(text), '\\\\s+'))"))
      .select($"doc_id", explode(expr(
        "transform(sequence(2, size(padded)), i -> struct(" +
          "element_at(padded, i-1) as c1, element_at(padded, i) as w))")).as("it"))
      .select($"doc_id", $"it.c1", $"it.w")
    val grams2 = items.groupBy($"c1", $"w").agg(count(lit(1)).as("c2"))
    val grams1 = grams2.groupBy($"c1").agg(sum($"c2").as("c1n"))
    val vocab = grams2.agg(countDistinct($"w").as("vsz"))
    // inner joins: the model is self-trained, so every (c1,w) a doc
    // emits exists in the count tables by construction
    items
      .join(grams2, Seq("c1", "w"))
      .join(grams1, Seq("c1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log(($"c2" + lit(1.0)) / ($"c1n" + $"vsz")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_items"), exp(sum($"nll") / count(lit(1))).as("ppl"))
      .withColumn("ppl_r", $"ppl".cast(org.apache.spark.sql.types.DecimalType(12, 4)))
      .select($"doc_id", $"n_items", $"ppl_r".cast("string").as("ppl_r"),
        ($"ppl_r" <= expr(s"cast($PplCut as decimal(12,4))")).as("keep"))
      .orderBy($"doc_id")
  }

  val qPerplexityFilterSql: String =
    s"""WITH it AS (
         SELECT doc_id,
           unnest(list_transform(generate_series(2, len(padded)), i -> struct_pack(
             c1 := padded[i-1], w := padded[i]))) AS item
         FROM (SELECT doc_id,
                 list_concat(['$Pad'], regexp_split_to_array(trim(text), '\\s+')) AS padded
               FROM documents) t),
       flat AS (SELECT doc_id, item.c1 AS c1, item.w AS w FROM it),
       g2 AS (SELECT c1, w, COUNT(*) AS c2 FROM flat GROUP BY c1, w),
       g1 AS (SELECT c1, SUM(c2) AS c1n FROM g2 GROUP BY c1),
       v AS (SELECT COUNT(DISTINCT w) AS vsz FROM g2),
       scored AS (
         SELECT f.doc_id, COUNT(*) AS n_items,
           CAST(exp(SUM(-ln((g2.c2 + 1.0) / (g1.c1n + v.vsz))) / COUNT(*))
                AS DECIMAL(12,4)) AS ppl_r
         FROM flat f
         JOIN g2 ON f.c1 = g2.c1 AND f.w = g2.w
         JOIN g1 ON f.c1 = g1.c1
         CROSS JOIN v
         GROUP BY f.doc_id)
       SELECT doc_id, n_items, CAST(ppl_r AS VARCHAR) AS ppl_r,
         ppl_r <= CAST($PplCut AS DECIMAL(12,4)) AS keep
       FROM scored ORDER BY doc_id"""

  /** The q93 statistics as a broadcastable scalar model — the object
    * the STREAMING perplexity gate ships to executors. `ppl` replays
    * exactly the relational math (1-pad bigrams, add-one smoothing
    * over vsz, exp of mean negative ln) so the gate and q93 cannot
    * drift; NgramLmSpec/StreamSpec pin per-doc equality on fixtures
    * the pruning bounds cover losslessly. The maps are PRUNED at
    * build time ([[bigramStats]]'s KenLM-prune bounds) so the
    * broadcast stays constant-sized at any corpus scale — a missing
    * (c, w) scores as unseen against its context's exact total, a
    * missing context as a fully unseen context. */
  final case class BigramStats(grams2: Map[(String, String), Long],
                               grams1: Map[String, Long],
                               vsz: Long) {
    def ppl(text: String): (Long, Double) = {
      val toks = Pad +: tokenize(text).toSeq
      var n = 0L
      var nll = 0.0
      toks.sliding(2).foreach {
        case Seq(c, w) =>
          val c1 = grams1.getOrElse(c, 0L)
          val c2 = grams2.getOrElse((c, w), 0L)
          nll += -math.log((c2 + 1.0) / (c1 + vsz))
          n += 1
        case _ => ()
      }
      (n, if (n == 0) 0.0 else math.exp(nll / n))
    }
  }

  /** Default [[bigramStats]] pruning bounds: ≤ 2^16 contexts × ≤ 64
    * followers each ⇒ the broadcast artifact is ≤ ~4.3 M map entries
    * (maxContexts·(topK+1)) REGARDLESS of corpus size — the KenLM-prune
    * operating envelope (a few hundred MB worst case), where the
    * unbounded table is vocab²-sparse and OOMs the driver at real
    * scale. */
  val DefaultGateContexts: Int = 1 << 16
  val DefaultGateFollowersPerContext: Int = 64

  /** Build [[BigramStats]] from the documents lake with a DISTRIBUTED
    * bigram aggregation, PRUNED to a driver-boundable artifact — the
    * KenLM-prune shape: keep the `maxContexts` highest-mass contexts
    * (distributed top-K via orderBy+limit, no global window) and
    * within each the `topKPerContext` most frequent followers
    * (per-context row_number, partitioned by context). The artifact
    * is ≤ maxContexts·(topKPerContext+1) entries by construction —
    * a constant chosen at build time, never a function of corpus
    * size — which is what makes broadcasting it to a stream safe at
    * 100 TB (the unbounded bigram table is vocab²-sparse: billions of
    * entries).
    *
    * Approximation contract (zero error when the bounds exceed the
    * corpus's statistics, as on the test fixtures): kept contexts
    * carry their EXACT total count c1n (pruned followers lose their
    * numerator, never their denominator mass), so a pruned (c, w)
    * scores as unseen — (0+1)/(c1n+V) — overestimating nll by at most
    * ln(cK+1) for the K-th follower count cK, the smallest in the
    * context by construction. A pruned context scores as a fully
    * unseen context (1/V). The vocab size V stays EXACT (a scalar
    * aggregation, not part of the pruned table). Rarest-first pruning
    * means the docs whose score moves are exactly the high-perplexity
    * outliers the gate rejects anyway.
    *
    * Token rule matches [[tokenize]]: whitespace split with empties
    * dropped, so an all-whitespace doc contributes nothing (its
    * padded array is the lone <s>, filtered below). */
  def bigramStats(s: SparkSession, dir: String,
                  maxContexts: Int = DefaultGateContexts,
                  topKPerContext: Int = DefaultGateFollowersPerContext): BigramStats = {
    import s.implicits._
    require(maxContexts > 0 && topKPerContext > 0,
      s"pruning bounds must be positive: $maxContexts, $topKPerContext")
    val g2 = Tables.documents(s, dir)
      .withColumn("padded", expr(
        s"concat(array('$Pad'), filter(split(trim(text), '\\\\s+'), t -> t != ''))"))
      .filter(size($"padded") >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(padded)), i -> struct(" +
          "element_at(padded, i-1) as c1, element_at(padded, i) as w))")).as("it"))
      .groupBy($"it.c1".as("c1"), $"it.w".as("w"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // exact vocab size: one scalar off the full count table
      val vsz = g2.agg(countDistinct($"w")).head().getLong(0)
      // top-maxContexts contexts by total mass — orderBy+limit is
      // Spark's distributed partial top-K (TakeOrderedAndProject),
      // NOT a single-partition global window; ties break by name for
      // determinism
      val g1Rows = g2.groupBy($"c1").agg(sum($"n").as("c1n"))
        .orderBy($"c1n".desc, $"c1".asc)
        .limit(maxContexts)
        .as[(String, Long)].collect()
      // per-kept-context top-K followers: broadcast the ≤maxContexts
      // kept keys, then a partitioned (never global) window
      val keptDf = broadcast(s.createDataset(g1Rows.map(_._1).toSeq).toDF("c1"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"c1").orderBy($"n".desc, $"w".asc)
      val g2Rows = g2.join(keptDf, Seq("c1"), "left_semi")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= topKPerContext)
        .select($"c1", $"w", $"n")
        .as[(String, String, Long)].collect()
      BigramStats(g2Rows.map { case (c, wd, n) => (c, wd) -> n }.toMap,
        g1Rows.toMap, vsz)
    } finally { g2.unpersist(); () }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_ngram_score" -> qNgramScore,
    "q47_lm_broadcast_score" -> qLmBroadcastScore,
    "q62_treebank_score" -> qTreebankScore,
    "q67_model_blob_roundtrip" -> qModelBlobRoundTrip,
    "q93_perplexity_filter" -> qPerplexityFilter,
    "q107_model_manifest_roundtrip" -> qModelManifestRoundTrip)

  val oracles: Map[String, String] = Map(
    "q46_ngram_score" -> qNgramScoreSql,
    "q47_lm_broadcast_score" -> qLmBroadcastScoreSql,
    "q62_treebank_score" -> qTreebankScoreSql,
    "q93_perplexity_filter" -> qPerplexityFilterSql,
    // q67 is q47 with the model routed through the blob lake; q107
    // routes it through the export-manifest rebuild; identical output
    // contract, same relational replay.
    "q67_model_blob_roundtrip" -> qLmBroadcastScoreSql,
    "q107_model_manifest_roundtrip" -> qLmBroadcastScoreSql)
}
