package graft.service

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.survey.{AnswerParser, Survey}

/** External-service map operators (SURVEY.md §2.1 S15/S16): the
  * reference's Ollama embedding pool
  * (embed_transcripts_to_vector_db.py:91-237 — multi-host, probe,
  * round-robin failover, one worker thread per host) and chat source
  * (run_8values_survey.py:155-186 — temperature, 300 s timeout, ≤5
  * retries then failed=true).
  *
  * On Spark the pool collapses into `mapPartitions`: one client per
  * partition (connection reuse), batches inside the partition,
  * parallelism = task count instead of host threads, retries in-map,
  * idempotency from the upsert keys downstream (Sinks). The reference's
  * HOST-management half — endpoint list, liveness probe, round-robin
  * rotation, dead hosts skipped until re-probe — is [[EndpointPool]]
  * below, composed per partition around the transports. The transport
  * trait has TWO implementations: the real HTTP clients
  * ([[HttpEmbedder]]/[[HttpChatClient]] on `java.net.http`, exercised
  * through an actual socket by HttpServiceSpec's scripted localhost
  * server — the reference's own test pattern,
  * test_async_client_functions.py:49-144), and DETERMINISTIC FAKES
  * (test_support.py FakeModel/FakePool) that keep the oracled queries
  * replayable while the container has no model server.
  */
object ServiceOps {

  /** S15: text → embedding vector. */
  trait Embedder extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Double]]
  }

  /** S16: chat completion. */
  trait ChatClient extends Serializable {
    def chat(model: String, system: String, user: String, temperature: Double): String
  }

  /** Portable polynomial fold (the q26 fingerprint primitive) — the
    * seed for every deterministic fake, replayable in DuckDB. Steps
    * over CODE POINTS (like split('')/ascii and DuckDB's replay), not
    * UTF-16 units — a char fold would diverge on non-BMP text exactly
    * as [[graft.expr.PolyHash]]'s scaladoc explains. */
  def polyFold(t: String): Long =
    graft.core.Hashing.polyFold(t, 31, 1000000007L)

  /** Deterministic fake embedder: dim rational components derived from
    * the text fingerprint. Exact in IEEE double on both engines
    * (integers < 2^53, one division). */
  final class DeterministicEmbedder(dim: Int) extends Embedder {
    def embed(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      val fp = polyFold(t)
      Array.tabulate(dim)(j => ((fp * (j + 1) + j) % 1000003L).toDouble / 1000003.0)
    }
  }

  /** Retry wrapper — the in-map retry/timeout discipline of the
    * reference pool (probe + failover + bounded retries). Injectable
    * failures are exercised in ServiceSpec. */
  final class RetryingEmbedder(inner: Embedder, maxRetries: Int) extends Embedder {
    def embed(texts: Seq[String]): Seq[Array[Double]] = {
      var attempt = 0
      while (true) {
        try return inner.embed(texts)
        catch {
          // A task-kill interrupt must cancel NOW, not after the retry
          // budget: re-throw with the flag restored so Spark's task
          // reaper sees it.
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); throw e
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
        }
      }
      sys.error("unreachable")
    }
  }

  // ---- real HTTP transport (S15/S16 live path) ----------------------

  /** S15 over REAL HTTP: the reference pool's embeddings call (POST
    * `{model, prompt}` → `{embedding: [...]}`, the Ollama wire shape of
    * embed_transcripts_to_vector_db.py:91-237) on `java.net.http`
    * (JDK built-in — no new dependency). One instance per PARTITION
    * (via [[embedPairs]]'s `mk`), so the underlying HttpClient
    * keep-alive pool gives per-partition connection reuse — the Spark
    * analogue of the reference's one-worker-per-host threads. The
    * client and mapper are transient lazies: construction happens on
    * the executor after deserialization, never on the driver.
    *
    * Timeouts apply per request AND at connect; a non-200 or a
    * malformed body throws IOException so the [[RetryingEmbedder]]
    * wrapper owns the bounded-retry policy (probe + failover
    * discipline). HttpServiceSpec drives this through a real socket
    * against a scripted localhost server — including 500-retry,
    * timeout-retry, and connection-reuse assertions. */
  final class HttpEmbedder(endpoint: String, model: String,
                           timeoutMillis: Long) extends Embedder {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    def embed(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("prompt", t)
      val resp = post(endpoint, mapper.writeValueAsString(body))
      val emb = mapper.readTree(resp).get("embedding")
      if (emb == null || !emb.isArray)
        throw new java.io.IOException(s"no embedding array in: $resp")
      Array.tabulate(emb.size())(i => emb.get(i).asDouble())
    }

    private def post(url: String, json: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(json))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
      resp.body()
    }
  }

  /** S16 over REAL HTTP: the chat call (POST `{model, system, prompt,
    * temperature}` → `{response: "..."}`, run_8values_survey.py:155-186's
    * wire shape) with the same per-partition client lifecycle as
    * [[HttpEmbedder]]. */
  final class HttpChatClient(endpoint: String,
                             timeoutMillis: Long) extends ChatClient {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    def chat(model: String, system: String, user: String,
             temperature: Double): String = {
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("system", system)
      body.put("prompt", user)
      body.put("temperature", temperature)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(mapper.writeValueAsString(body)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $endpoint")
      val node = mapper.readTree(resp.body()).get("response")
      if (node == null)
        throw new java.io.IOException(s"no response field in: ${resp.body()}")
      node.asText()
    }
  }

  // ---- multi-endpoint pool (S15/S16 failover path) ------------------

  /** Liveness probe in the reference pool's wire shape: GET
    * `/api/tags` on the endpoint's scheme/host/port answers 2xx
    * (`_ollama_reachable`, embed_transcripts_to_vector_db.py:80-88).
    * The probe ignores the endpoint PATH on purpose — liveness is a
    * host property, not an operation property, so one probe shape
    * serves both the embeddings and the chat endpoints. Probes are
    * rare (first use + post-cooldown), so a throwaway client per
    * probe is the simple correct lifecycle. */
  def ollamaProbe(endpoint: String, timeoutMillis: Long): Boolean =
    try {
      val u = java.net.URI.create(endpoint)
      val probeUri = new java.net.URI(
        u.getScheme, null, u.getHost, u.getPort, "/api/tags", null, null)
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()
      val req = java.net.http.HttpRequest.newBuilder(probeUri)
        .timeout(java.time.Duration.ofMillis(timeoutMillis)).GET().build()
      val code = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
      code >= 200 && code < 300
    } catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt(); throw e
      case _: Exception => false
    }

  /** Round-robin endpoint rotation with liveness probe + failover —
    * the host-management half of the reference pool
    * (embed_transcripts_to_vector_db.py:91-160: probe at startup with
    * unreachable hosts skipped, rotate the cursor on every success,
    * on failure walk the remaining hosts in ring order, all-dead
    * raises). On Spark one pool lives per partition (built inside the
    * `mk` closure on the executor), so its state is plain JVM state —
    * no coordination across tasks, parallelism comes from the task
    * count exactly like the rest of the service seam.
    *
    * Dead-host policy: a failed request (or failed probe) marks the
    * endpoint dead for `cooldownMillis`; while dead it is skipped
    * WITHOUT traffic; after the cooldown the next call re-probes it
    * before trusting it with a real request (pass → back in rotation,
    * fail → dead for another cooldown). The reference probes only at
    * startup; the cooldown re-probe is the long-running-job
    * generalization — a 100 TB pass outlives any host outage, so
    * hosts must be able to leave AND rejoin the ring. `clock` is
    * injectable for the cooldown specs; the default is monotonic. */
  final class EndpointPool(val endpoints: IndexedSeq[String],
                           isLive: String => Boolean,
                           cooldownMillis: Long = 30000L,
                           probeOnFirstUse: Boolean = true,
                           clock: () => Long = () => System.nanoTime() / 1000000L)
      extends Serializable {
    require(endpoints.nonEmpty,
      "endpoint list is empty (reference: 'embedding_servers is empty')")

    // 0 = in rotation; >0 = skip until that clock value, then re-probe.
    @transient private lazy val deadUntil = {
      val arr = new java.util.concurrent.atomic.AtomicLongArray(endpoints.length)
      if (probeOnFirstUse) {
        var live = 0
        endpoints.indices.foreach { i =>
          if (isLive(endpoints(i))) live += 1
          else arr.set(i, math.max(1L, clock() + cooldownMillis))
        }
        if (live == 0) throw new java.io.IOException(
          s"no endpoint passed the liveness probe: ${endpoints.mkString(", ")}")
      }
      arr
    }
    @transient private lazy val cursor =
      new java.util.concurrent.atomic.AtomicInteger(0)

    /** Endpoints currently in rotation — spec observability only. */
    def liveCount: Int = {
      deadUntil // force the first-use probe
      endpoints.indices.count(i => deadUntil.get(i) == 0L)
    }

    /** Route one operation: try endpoints in ring order from the
      * cursor, skipping dead ones; first success advances the cursor
      * (the reference's `self._next`) and returns. One call = at most
      * ONE full rotation; the bounded re-rotation budget belongs to
      * the Retrying* wrapper above this (the reference's
      * sequential-retry tail, :214-218). */
    def call[A](f: String => A): A = {
      val n = endpoints.length
      val start = cursor.get()
      var last: Throwable = null
      var i = 0
      while (i < n) {
        val idx = (start + i) % n
        val d = deadUntil.get(idx)
        val now = clock()
        val usable =
          if (d == 0L) true
          else if (d > now) false // cooling down: skip without traffic
          else if (isLive(endpoints(idx))) { deadUntil.set(idx, 0L); true }
          else { deadUntil.set(idx, now + cooldownMillis); false }
        if (usable) {
          try {
            val out = f(endpoints(idx))
            cursor.set((idx + 1) % n)
            return out
          } catch {
            case e: InterruptedException =>
              Thread.currentThread().interrupt(); throw e
            case e: Exception =>
              last = e
              deadUntil.set(idx, clock() + cooldownMillis)
          }
        }
        i += 1
      }
      cursor.set((start + 1) % n)
      throw new java.io.IOException(
        s"all $n endpoints failed or are cooling down: ${endpoints.mkString(", ")}",
        last)
    }
  }

  /** S15 across a pool: every batch is routed by [[EndpointPool]];
    * per-endpoint transports are built once and cached so their
    * keep-alive connections survive rotation. Compose as
    * `RetryingEmbedder(PooledEmbedder(...))` — pool = one rotation
    * per attempt, wrapper = bounded number of rotations. */
  final class PooledEmbedder(pool: EndpointPool,
                             perEndpoint: String => Embedder) extends Embedder {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Embedder]()
    def embed(texts: Seq[String]): Seq[Array[Double]] =
      pool.call { ep =>
        cache.computeIfAbsent(ep, e => perEndpoint(e)).embed(texts)
      }
  }

  /** S16 across a pool — same routing/caching contract as
    * [[PooledEmbedder]]. */
  final class PooledChatClient(pool: EndpointPool,
                               perEndpoint: String => ChatClient) extends ChatClient {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, ChatClient]()
    def chat(model: String, system: String, user: String,
             temperature: Double): String =
      pool.call { ep =>
        cache.computeIfAbsent(ep, e => perEndpoint(e))
          .chat(model, system, user, temperature)
      }
  }

  /** The assembled reference pool for Ollama-shaped hosts: probe each
    * endpoint, round-robin [[HttpEmbedder]]s across the survivors,
    * re-rotate up to `maxRetries` times. This is the embedding stack a
    * real multi-host user plugs into [[embedPairs]]'s `mk`. */
  def ollamaEmbedderPool(endpoints: Seq[String], model: String,
                         timeoutMillis: Long, maxRetries: Int = 3,
                         cooldownMillis: Long = 30000L,
                         probeTimeoutMillis: Long = 3000L): Embedder =
    new RetryingEmbedder(
      new PooledEmbedder(
        new EndpointPool(endpoints.toIndexedSeq,
          ep => ollamaProbe(ep, probeTimeoutMillis), cooldownMillis),
        ep => new HttpEmbedder(ep, model, timeoutMillis)),
      maxRetries)

  /** Chat-side twin of [[ollamaEmbedderPool]], with the error-row
    * capture of [[RetryingChatClient]] on top. */
  def ollamaChatPool(endpoints: Seq[String], timeoutMillis: Long,
                     maxRetries: Int = 3, cooldownMillis: Long = 30000L,
                     probeTimeoutMillis: Long = 3000L): ChatClient =
    new RetryingChatClient(
      new PooledChatClient(
        new EndpointPool(endpoints.toIndexedSeq,
          ep => ollamaProbe(ep, probeTimeoutMillis), cooldownMillis),
        ep => new HttpChatClient(ep, timeoutMillis)),
      maxRetries)

  /** Bounded-retry chat wrapper with ERROR ROW CAPTURE: the reference
    * retries ≤5 times and then records the run as failed
    * (run_8values_survey.py:426) rather than aborting the sweep — so
    * exhausted retries yield `onExhausted` (unparseable by design →
    * AnswerParser None → a failed row in the axis rollup), never an
    * exception that would kill the whole 100 TB pass. */
  final class RetryingChatClient(inner: ChatClient, maxRetries: Int,
                                 onExhausted: String = "<<chat error>>")
      extends ChatClient {
    def chat(model: String, system: String, user: String,
             temperature: Double): String = {
      var attempt = 0
      while (attempt <= maxRetries) {
        try return inner.chat(model, system, user, temperature)
        catch {
          // Same interrupt discipline as RetryingEmbedder: cancellation
          // outranks the capture-as-error-row policy.
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); throw e
          case _: Exception => attempt += 1
        }
      }
      onExhausted
    }
  }

  /** Deterministic fake chat: answers the 5-option Likert scale by
    * prompt fingerprint; fp % 6 == 5 returns unparseable garbage (the
    * failed-answer path, run_8values_survey.py:426). */
  final class DeterministicChatClient extends ChatClient {
    def chat(model: String, system: String, user: String, temperature: Double): String = {
      val fp = polyFold(user)
      (fp % 6) match {
        case 0 => """{"answer":"Strongly Agree","confidence":0.9,"reason":"stub"}"""
        case 1 => """{"answer":"Agree","confidence":0.8,"reason":"stub"}"""
        case 2 => """{"answer":"Neutral/Unsure","confidence":0.7,"reason":"stub"}"""
        case 3 => """{"answer":"Disagree","confidence":0.8,"reason":"stub"}"""
        case 4 => """{"answer":"Strongly Disagree","confidence":0.9,"reason":"stub"}"""
        case _ => "no parseable answer here !!"
      }
    }
  }

  /** The mapPartitions embedding operator: one Embedder per partition
    * (connection reuse), fixed-size batches inside the partition (the
    * reference's page-of-50, embed_transcripts_to_vector_db.py:488). */
  def embedPairs(ds: Dataset[(Long, String)], mk: () => Embedder,
                 batchSize: Int = 32): Dataset[(Long, Array[Double])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val emb = mk()
      it.grouped(batchSize).flatMap { batch =>
        batch.map(_._1).zip(emb.embed(batch.map(_._2)))
      }
    }
  }

  /** The PARALLEL half of the reference pool (`embed_indexed_parallel`,
    * embed_transcripts_to_vector_db.py:166-218: one worker thread per
    * host drains a shared task queue; failed items are retried
    * sequentially with full round-robin failover after the workers
    * join). Spark shape: within each partition, pages of
    * (batchSize × #endpoints) rows fan out across a worker-per-
    * endpoint pool — concurrency INSIDE the I/O-bound task layered on
    * Spark's across-task parallelism, memory bounded by one page, so
    * a deployment with more hosts than partitions still saturates
    * every host. Failed chunks retry through the [[EndpointPool]]
    * rotation discipline after the page joins, `maxRetries` rotations
    * before the task fails. With one endpoint this degrades to
    * [[embedPairs]]. An interrupt (task kill) propagates out of the
    * page join and the pool is torn down in the finally. */
  def embedPairsParallel(ds: Dataset[(Long, String)], endpoints: Seq[String],
                         mkForEndpoint: String => Embedder,
                         batchSize: Int = 32,
                         maxRetries: Int = 3): Dataset[(Long, Array[Double])] = {
    import ds.sparkSession.implicits._
    require(endpoints.nonEmpty, "endpoint list is empty")
    if (endpoints.lengthCompare(1) == 0)
      embedPairs(ds,
        () => new RetryingEmbedder(mkForEndpoint(endpoints.head), maxRetries),
        batchSize)
    else ds.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val eps = endpoints.toIndexedSeq
      val perEp = new java.util.concurrent.ConcurrentHashMap[String, Embedder]()
      def embedderFor(ep: String): Embedder =
        perEp.computeIfAbsent(ep, e => mkForEndpoint(e))
      val retryPool = new EndpointPool(eps, _ => true, probeOnFirstUse = false)
      type Chunk = Seq[(Long, String)]
      it.grouped(batchSize * eps.length).flatMap { page =>
        val chunks = page.grouped(batchSize).toSeq
        val exec = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(eps.length, chunks.size))
        try {
          val tasks: Seq[java.util.concurrent.Callable[Either[Chunk, Seq[(Long, Array[Double])]]]] =
            chunks.zipWithIndex.map { case (chunk, i) =>
              () => try {
                val emb = embedderFor(eps(i % eps.length))
                Right(chunk.map(_._1).zip(emb.embed(chunk.map(_._2))))
              } catch {
                // interrupt = cancellation: surfaces through get() and
                // kills the task, exactly as a sequential embed would
                case e: InterruptedException => throw e
                case _: Exception => Left(chunk)
              }
            }
          val results = exec.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
          val ok = results.collect { case Right(r) => r }.flatten
          // the reference's sequential-retry tail: full rotation per
          // attempt, bounded rotations, THEN give up loudly
          val retried = results.collect { case Left(c) => c }.flatMap { chunk =>
            var attempt = 0
            var out: Seq[(Long, Array[Double])] = null
            while (out == null) {
              try out = retryPool.call(ep =>
                chunk.map(_._1).zip(embedderFor(ep).embed(chunk.map(_._2))))
              catch {
                case e: InterruptedException =>
                  Thread.currentThread().interrupt(); throw e
                case e: Exception =>
                  attempt += 1
                  if (attempt > maxRetries) throw e
              }
            }
            out
          }
          ok ++ retried
        } finally exec.shutdownNow()
      }
    }
  }

  /** The mapPartitions chat operator: one client per partition, one
    * call per row (the reference claims one run at a time; parallelism
    * across partitions replaces the worker fleet). */
  def chatColumn(ds: Dataset[(String, String)], mk: () => ChatClient,
                 model: String, temperature: Double): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val client = mk()
      it.map { case (key, prompt) => (key, client.chat(model, "", prompt, temperature)) }
    }
  }

  /** S15 end-to-end: embed every document through the partition-pooled
    * operator (retry wrapper included) and emit three vector
    * components. The oracle replays the fingerprint arithmetic — so
    * this checks batching/partition plumbing delivers exactly one
    * vector per row, in schema. */
  def qFakeEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
    // The embedding stack under test is the FULL production
    // composition — retry over a two-endpoint rotating pool — with the
    // deterministic transport at the bottom, so the oracled run
    // exercises the same routing code path a multi-host deployment
    // uses (the fake is endpoint-independent, which is exactly what
    // keeps the oracle valid; rotation/failover behavior itself is
    // pinned by ServiceSpec + HttpServiceSpec).
    embedPairs(docs, () => new RetryingEmbedder(
      new PooledEmbedder(
        new EndpointPool(Vector("fake://a", "fake://b"), _ => true),
        _ => new DeterministicEmbedder(8)),
      3))
      .toDF("doc_id", "vec")
      .select($"doc_id",
        element_at($"vec", 1).as("e0"),
        element_at($"vec", 4).as("e3"),
        element_at($"vec", 8).as("e7"))
      .orderBy($"doc_id")
  }

  val qFakeEmbedSql: String =
    """WITH fp AS (
         SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc*31 + x) % 1000000007) AS fp
         FROM documents)
       SELECT doc_id,
         CAST((fp * 1 + 0) % 1000003 AS DOUBLE) / 1000003.0 AS e0,
         CAST((fp * 4 + 3) % 1000003 AS DOUBLE) / 1000003.0 AS e3,
         CAST((fp * 8 + 7) % 1000003 AS DOUBLE) / 1000003.0 AS e7
       FROM fp ORDER BY doc_id"""

  /** §3.3 survey pipeline end-to-end (S16+F9+A9/A10): seed runs =
    * subjects × model lineup, ask 70 templated questions through the
    * chat operator, parse with AnswerParser (JSON path + garbage →
    * failed), score with the axis aggregate. The oracle recomputes the
    * whole chain from the fingerprint arithmetic — ground truth by
    * construction, checking chat plumbing, parser, and scoring
    * together. */
  def qSurveyPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val questions = Tables.part(s, dir).filter($"p_partkey" <= Survey.NumQuestions)
      .select(($"p_partkey" % Survey.NumQuestions).as("question_id"),
        lower($"p_name").as("qt"))
    val subjects = Tables.documents(s, dir).select($"source").distinct()
    val models = Seq("llm_a", "llm_b").toDF("llm_model")
    val runs = subjects.crossJoin(broadcast(models))
      .withColumn("run_id", concat($"source", lit("|"), $"llm_model"))
    val prompts = runs.crossJoin(broadcast(questions))
      .withColumn("prompt", concat(lit("I strongly believe that "), $"qt"))
    val answered = chatColumn(
      prompts.select(concat($"run_id", lit("#"), $"question_id").as("key"), $"prompt")
        .as[(String, String)],
      () => new DeterministicChatClient(), "stub-model", 0.0)
      .toDF("key", "raw")
    val parseUdf = udf { raw: String =>
      AnswerParser.parse(raw).multiplier // None = failed -> null
    }
    val responses = answered
      .withColumn("run_id", substring_index($"key", "#", 1))
      .withColumn("question_id", substring_index($"key", "#", -1).cast("long"))
      .withColumn("multiplier", parseUdf($"raw"))
      .select($"run_id", $"question_id", $"multiplier")
    Survey.axisScores(responses, Survey.questionDim(s))
      .orderBy($"run_id")
  }

  val qSurveyPipelineSql: String = {
    val qDim =
      s"""SELECT i AS question_id,
          (i * 7) % 21 - 10 AS effect_econ, (i * 11) % 21 - 10 AS effect_dipl,
          (i * 13) % 21 - 10 AS effect_govt, (i * 17) % 21 - 10 AS effect_scty
          FROM (SELECT unnest(generate_series(0, ${Survey.NumQuestions - 1})) AS i) g"""
    s"""WITH qd AS ($qDim),
       questions AS (
         SELECT p_partkey % ${Survey.NumQuestions} AS question_id, lower(p_name) AS qt
         FROM part WHERE p_partkey <= ${Survey.NumQuestions}),
       runs AS (
         SELECT source || '|' || llm_model AS run_id
         FROM (SELECT DISTINCT source FROM documents) s
         CROSS JOIN (SELECT unnest(['llm_a', 'llm_b']) AS llm_model) m),
       answers AS (
         SELECT r.run_id, q.question_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split('I strongly believe that ' || q.qt, ''),
               c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc*31 + x) % 1000000007) % 6 AS opt
         FROM runs r CROSS JOIN questions q),
       resp AS (
         SELECT run_id, question_id,
           CAST(CASE opt WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.0
             WHEN 3 THEN -0.5 WHEN 4 THEN -1.0 ELSE NULL END AS DOUBLE) AS multiplier
         FROM answers),
       maxes AS (
         SELECT SUM(ABS(effect_econ)) AS max_econ, SUM(ABS(effect_dipl)) AS max_dipl,
           SUM(ABS(effect_govt)) AS max_govt, SUM(ABS(effect_scty)) AS max_scty,
           COUNT(*) AS total_q
         FROM qd),
       raws AS (
         SELECT run_id,
           SUM(effect_econ * COALESCE(multiplier, 0.0)) AS raw_econ,
           SUM(effect_dipl * COALESCE(multiplier, 0.0)) AS raw_dipl,
           SUM(effect_govt * COALESCE(multiplier, 0.0)) AS raw_govt,
           SUM(effect_scty * COALESCE(multiplier, 0.0)) AS raw_scty,
           SUM(CASE WHEN multiplier IS NULL THEN 1 ELSE 0 END) AS n_failed
         FROM resp JOIN qd USING (question_id) GROUP BY run_id)
       SELECT run_id,
         CASE WHEN max_econ = 0 THEN 50.0 ELSE (100.0 * (CAST(max_econ AS DOUBLE) + raw_econ)) / (2.0 * CAST(max_econ AS DOUBLE)) END AS pct_econ,
         CASE WHEN max_dipl = 0 THEN 50.0 ELSE (100.0 * (CAST(max_dipl AS DOUBLE) + raw_dipl)) / (2.0 * CAST(max_dipl AS DOUBLE)) END AS pct_dipl,
         CASE WHEN max_govt = 0 THEN 50.0 ELSE (100.0 * (CAST(max_govt AS DOUBLE) + raw_govt)) / (2.0 * CAST(max_govt AS DOUBLE)) END AS pct_govt,
         CASE WHEN max_scty = 0 THEN 50.0 ELSE (100.0 * (CAST(max_scty AS DOUBLE) + raw_scty)) / (2.0 * CAST(max_scty AS DOUBLE)) END AS pct_scty,
         CAST(total_q - n_failed AS BIGINT) AS n_answered,
         CAST(n_failed AS BIGINT) AS n_failed
       FROM raws CROSS JOIN maxes ORDER BY run_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_fake_embed" -> qFakeEmbed,
    "q51_survey_pipeline" -> qSurveyPipeline)

  val oracles: Map[String, String] = Map(
    "q50_fake_embed" -> qFakeEmbedSql,
    "q51_survey_pipeline" -> qSurveyPipelineSql)
}
