package graft.service

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.service.ServiceOps._

/** S15/S16 through a REAL socket: a scripted in-test HTTP server (the
  * reference's fake-server pattern, test_async_client_functions.py:
  * 49-144) answers the Ollama-shaped embed/chat calls, with failure
  * and stall injection — so connection reuse, retry-on-500,
  * retry-on-timeout, and exhausted-retry error-row capture are all
  * exercised over actual HTTP, not trait fakes. */
class HttpServiceSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def readBody(ex: HttpExchange): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def embeddingJson(text: String): String = {
    val vec = new DeterministicEmbedder(8).embed(Seq(text)).head
    vec.mkString("""{"embedding":[""", ",", "]}")
  }

  /** Scripted server: `failFirstAttempt(prompt)` → that prompt's FIRST
    * request answers 500 (deterministic per logical call — a
    * request-count trigger would race across concurrently-retrying
    * partitions); `stallFirstMillis` → the very first request sleeps
    * that long (client timeout fires); everything else answers the
    * deterministic embedding/chat payload. Tracks request count and
    * distinct client ports (one port == one reused connection). */
  private final class Scripted(failFirstAttempt: String => Boolean = _ => false,
                               stallFirstMillis: Long = 0) {
    val requests = new AtomicInteger(0)
    val stalled = new AtomicInteger(0)
    val probes = new AtomicInteger(0)
    val clientPorts = TrieMap.empty[Int, Unit]
    private val attempts = TrieMap.empty[String, AtomicInteger]
    private def attempt(prompt: String): Int =
      attempts.getOrElseUpdate(prompt, new AtomicInteger(0)).incrementAndGet()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

    server.createContext("/api/embeddings", (ex: HttpExchange) => {
      val n = requests.incrementAndGet()
      clientPorts.put(ex.getRemoteAddress.getPort, ())
      val prompt = readBody(ex).get("prompt").asText()
      if (stallFirstMillis > 0 && n == 1) {
        stalled.incrementAndGet()
        Thread.sleep(stallFirstMillis)
        respond(ex, 200, embeddingJson(prompt))
      } else if (failFirstAttempt(prompt) && attempt(prompt) == 1) {
        respond(ex, 500, """{"error":"scripted failure"}""")
      } else respond(ex, 200, embeddingJson(prompt))
    })

    // the pool's liveness probe target (_ollama_reachable's GET shape)
    server.createContext("/api/tags", (ex: HttpExchange) => {
      probes.incrementAndGet()
      respond(ex, 200, """{"models":[]}""")
    })

    server.createContext("/api/generate", (ex: HttpExchange) => {
      requests.incrementAndGet()
      clientPorts.put(ex.getRemoteAddress.getPort, ())
      val body = readBody(ex)
      val prompt = body.get("prompt").asText()
      if (failFirstAttempt(prompt) && attempt(prompt) == 1) {
        respond(ex, 500, """{"error":"scripted failure"}""")
      } else {
        val answer = new DeterministicChatClient().chat(
          body.get("model").asText(), body.get("system").asText(), prompt,
          body.get("temperature").asDouble())
        val node = mapper.createObjectNode()
        node.put("response", answer)
        respond(ex, 200, mapper.writeValueAsString(node))
      }
    })

    server.start()
    val port: Int = server.getAddress.getPort
    def url(path: String): String = s"http://127.0.0.1:$port$path"
    def stop(): Unit = server.stop(0)
  }

  test("HttpEmbedder over a real socket == deterministic fake, with connection reuse") {
    val srv = new Scripted()
    try {
      val url = srv.url("/api/embeddings")
      val docs = (0 until 48).map(i => (i.toLong, s"text $i"))
      val got = embedPairs(docs.toDS().repartition(4),
        () => new RetryingEmbedder(new HttpEmbedder(url, "m", 5000), 3),
        batchSize = 8).collect().toMap
      val want = docs.map { case (id, t) =>
        id -> new DeterministicEmbedder(8).embed(Seq(t)).head }.toMap
      assert(got.size == 48)
      want.foreach { case (id, v) => assert(got(id).toSeq == v.toSeq, s"doc $id") }
      assert(srv.requests.get() == 48, "one HTTP call per row")
      // per-partition keep-alive: 4 partitions should reuse a handful
      // of connections, not open one per request
      assert(srv.clientPorts.size <= 8,
        s"expected connection reuse, saw ${srv.clientPorts.size} connections for 48 requests")
    } finally srv.stop()
  }

  test("retry-on-500: scripted failures are absorbed within maxRetries") {
    // every third prompt's first attempt answers 500
    val srv = new Scripted(
      failFirstAttempt = p => p.stripPrefix("text ").toInt % 3 == 0)
    try {
      val url = srv.url("/api/embeddings")
      val docs = (0 until 20).map(i => (i.toLong, s"text $i"))
      val got = embedPairs(docs.toDS().repartition(2),
        () => new RetryingEmbedder(new HttpEmbedder(url, "m", 5000), 3),
        batchSize = 4).collect().toMap
      assert(got.size == 20)
      docs.foreach { case (id, t) =>
        assert(got(id).toSeq ==
          new DeterministicEmbedder(8).embed(Seq(t)).head.toSeq) }
      assert(srv.requests.get() > 20, "retries must have re-sent failed calls")
    } finally srv.stop()
  }

  test("retry-on-timeout: a stalled first response trips the client timeout, retry lands") {
    val srv = new Scripted(stallFirstMillis = 3000)
    try {
      val url = srv.url("/api/embeddings")
      // single row, single partition: request 1 stalls 3 s against a
      // 500 ms timeout -> HttpTimeoutException -> retry succeeds fast
      val got = embedPairs(Seq((7L, "hello")).toDS().repartition(1),
        () => new RetryingEmbedder(new HttpEmbedder(url, "m", 500), 3),
        batchSize = 4).collect()
      assert(got.head._2.toSeq ==
        new DeterministicEmbedder(8).embed(Seq("hello")).head.toSeq)
      assert(srv.stalled.get() == 1 && srv.requests.get() >= 2,
        "the stalled request must have been retried")
    } finally srv.stop()
  }

  test("HttpChatClient round-trip + exhausted retries captured as failed rows") {
    val srv = new Scripted()
    try {
      val url = srv.url("/api/generate")
      val prompts = (0 until 30).map(i => (s"k$i", s"prompt $i"))
      val got = chatColumn(prompts.toDS().repartition(3),
        () => new RetryingChatClient(new HttpChatClient(url, 5000), 2),
        "m", 0.0).collect().toMap
      val fake = new DeterministicChatClient()
      prompts.foreach { case (k, p) =>
        assert(got(k) == fake.chat("m", "", p, 0.0), s"key $k") }
    } finally srv.stop()
    // dead endpoint: every attempt fails -> the sentinel comes back and
    // parses to a FAILED row (AnswerParser None), never an exception
    val dead = new RetryingChatClient(
      new HttpChatClient("http://127.0.0.1:1/api/generate", 200), 1)
    val out = dead.chat("m", "", "prompt", 0.0)
    assert(out == "<<chat error>>")
    assert(graft.survey.AnswerParser.parse(out).optionId.isEmpty,
      "exhausted retries must map to a failed answer row")
  }

  test("endpoint pool: killing one of two servers mid-partition reroutes, partition completes") {
    val a = new Scripted()
    val b = new Scripted()
    try {
      val urlA = a.url("/api/embeddings")
      val urlB = b.url("/api/embeddings")
      // kill server A once it has served the first batch; the partition
      // must finish on B alone (cooldown >> test so A never rejoins)
      val killer = new Thread(() => {
        while (a.requests.get() < 5) Thread.sleep(10)
        Thread.sleep(100) // drain the in-flight response
        a.stop()
      })
      killer.setDaemon(true)
      killer.start()
      val docs = (0 until 40).map(i => (i.toLong, s"text $i"))
      val got = embedPairs(docs.toDS().repartition(1),
        () => ollamaEmbedderPool(Seq(urlA, urlB), "m", timeoutMillis = 3000,
          maxRetries = 3, cooldownMillis = 60000L, probeTimeoutMillis = 1000L),
        batchSize = 5).collect().toMap
      killer.join(5000)
      assert(got.size == 40)
      docs.foreach { case (id, t) =>
        assert(got(id).toSeq ==
          new DeterministicEmbedder(8).embed(Seq(t)).head.toSeq, s"doc $id") }
      assert(a.probes.get() >= 1 && b.probes.get() >= 1,
        "first use must probe both endpoints")
      assert(a.requests.get() >= 5, "A served part of the ring before dying")
      assert(b.requests.get() >= 20,
        s"B must pick up the remainder after the kill, saw ${b.requests.get()}")
    } finally {
      b.stop()
      try a.stop() catch { case _: Exception => () }
    }
  }

  test("chat pool: a probe-dead endpoint is skipped at first use, sweep completes clean") {
    val live = new Scripted()
    try {
      // 127.0.0.1:1 refuses connections: the probe fails, so the dead
      // endpoint must carry ZERO chat traffic (skip-without-traffic)
      val eps = Seq("http://127.0.0.1:1/api/generate", live.url("/api/generate"))
      val prompts = (0 until 20).map(i => (s"k$i", s"prompt $i"))
      val got = chatColumn(prompts.toDS().repartition(2),
        () => ollamaChatPool(eps, timeoutMillis = 3000, maxRetries = 2,
          cooldownMillis = 60000L, probeTimeoutMillis = 500L),
        "m", 0.0).collect().toMap
      val fake = new DeterministicChatClient()
      prompts.foreach { case (k, p) =>
        assert(got(k) == fake.chat("m", "", p, 0.0), s"key $k") }
      assert(got.values.forall(_ != "<<chat error>>"),
        "no prompt may burn its retry budget on the probe-dead host")
    } finally live.stop()
  }
}
