package graft.service

import graft.SparkSpec
import graft.service.ServiceOps._

/** Static executor-side probe for the parallel-embed specs (see the
  * closure-serialization note at its use sites). */
object ParallelEmbedProbe {
  import graft.service.ServiceOps._
  val byEp = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val peak = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { byEp.clear(); inFlight.set(0); peak.set(0) }
  def count(ep: String): Int = byEp.getOrDefault(ep, 0)
  def counting(ep: String, failOn: Option[String],
               sleepMs: Long = 0): Embedder = new Embedder {
    def embed(texts: Seq[String]): Seq[Array[Double]] = {
      val cur = inFlight.incrementAndGet()
      peak.getAndUpdate(p => math.max(p, cur))
      try {
        if (sleepMs > 0) Thread.sleep(sleepMs)
        byEp.merge(ep, texts.size, (x, y) => x + y) // counts ATTEMPTS
        if (failOn.contains(ep)) throw new java.io.IOException(s"$ep is down")
        new DeterministicEmbedder(4).embed(texts)
      } finally inFlight.decrementAndGet()
    }
  }
}

/** S15/S16 operator plumbing: batching, one-vector-per-row, retry
  * discipline, deterministic chat fake parse-ability. */
class ServiceSpec extends SparkSpec {
  import spark.implicits._

  test("embedPairs: one vector per row across batches and partitions") {
    val ds = spark.range(0, 101).as[Long].map(i => (i, s"text $i")).repartition(7)
    val out = embedPairs(ds, () => new DeterministicEmbedder(4), batchSize = 8).collect()
    assert(out.length == 101)
    assert(out.map(_._1).sorted.toSeq == (0L until 101L))
    assert(out.forall(_._2.length == 4))
  }

  test("deterministic embedder: same text -> same vector, components in [0,1)") {
    val e = new DeterministicEmbedder(8)
    val Seq(a, b) = e.embed(Seq("hello world", "hello world"))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(x => x >= 0.0 && x < 1.0))
  }

  test("polyFold steps over code points (non-BMP parity with the DuckDB replay)") {
    assert(ServiceOps.polyFold("😀") == 0x1F600L) // one step, not two surrogates
    assert(ServiceOps.polyFold("ab") == (97L * 31 + 98) % 1000000007L)
  }

  test("retry wrapper: flaky embedder succeeds within maxRetries, fails beyond") {
    class Flaky(failures: Int) extends Embedder {
      var calls = 0
      def embed(texts: Seq[String]): Seq[Array[Double]] = {
        calls += 1
        if (calls <= failures) throw new RuntimeException(s"transient $calls")
        new DeterministicEmbedder(2).embed(texts)
      }
    }
    val ok = new RetryingEmbedder(new Flaky(2), maxRetries = 3)
    assert(ok.embed(Seq("x")).head.length == 2)
    val dead = new RetryingEmbedder(new Flaky(10), maxRetries = 3)
    intercept[RuntimeException](dead.embed(Seq("x")))
  }

  test("deterministic chat: 5 parseable Likert shapes + 1 failed shape") {
    val c = new DeterministicChatClient()
    // craft prompts hitting each fp % 6 residue
    val prompts = (0 until 200).map(i => s"prompt $i")
    val parsed = prompts.map(p => graft.survey.AnswerParser.parse(c.chat("m", "", p, 0.0)))
    assert(parsed.exists(_.optionId.isEmpty), "expected some failed answers")
    assert(parsed.count(_.optionId.isDefined) > 100)
    assert(parsed.flatMap(_.optionId).toSet.subsetOf(Set(1, 2, 3, 4, 5)))
  }

  test("chatColumn: one answer per prompt, client constructed per partition") {
    val ds = (0 until 40).map(i => (s"k$i", s"prompt $i")).toDS().repartition(5)
    val out = chatColumn(ds, () => new DeterministicChatClient(), "m", 0.0).collect()
    assert(out.length == 40)
    assert(out.map(_._1).toSet.size == 40)
  }

  // ---- EndpointPool semantics (fake probe + fake clock; the real-
  // socket failover lives in HttpServiceSpec) -------------------------

  /** Scripted endpoint world: per-endpoint behavior flags plus probe
    * and request counters, and a hand-cranked clock. */
  private final class World(eps: String*) {
    val probes = collection.mutable.Map(eps.map(_ -> 0): _*)
    val calls = collection.mutable.Map(eps.map(_ -> 0): _*)
    val down = collection.mutable.Set.empty[String]
    var now = 0L
    val pool = new EndpointPool(eps.toIndexedSeq,
      isLive = ep => { probes(ep) += 1; !down(ep) },
      cooldownMillis = 100L, clock = () => now)
    def invoke(): String = pool.call { ep =>
      calls(ep) += 1
      if (down(ep)) throw new java.io.IOException(s"$ep is down")
      ep
    }
  }

  test("pool: round-robin rotation across healthy endpoints") {
    val w = new World("a", "b", "c")
    assert((1 to 6).map(_ => w.invoke()) == Seq("a", "b", "c", "a", "b", "c"))
    assert(w.pool.liveCount == 3)
  }

  test("pool: failure reroutes within the call, then skips the dead host without traffic") {
    val w = new World("a", "b")
    w.down += "a"
    w.now = 10 // probes at first use happen at t=10; "a" dead until 110
    assert(w.invoke() == "b") // a probed dead at first use, not even tried
    assert(w.calls("a") == 0, "dead host must receive no traffic")
    // now kill b AFTER it passed the probe: the failure happens in-call
    w.down += "b"
    w.down -= "a"
    w.now = 20 // a still cooling (deadUntil=110): only b in rotation
    val callsB = w.calls("b")
    intercept[java.io.IOException](w.invoke())
    assert(w.calls("b") == callsB + 1, "in-rotation failure = one real attempt")
    // a's cooldown expires -> re-probe -> back in rotation; b cooling
    w.now = 150
    assert(w.invoke() == "a")
    assert(w.pool.liveCount == 1)
  }

  test("pool: post-cooldown re-probe gates re-entry (fail stays dead, pass rejoins)") {
    val w = new World("a", "b")
    w.down += "a"
    w.now = 0
    assert(w.invoke() == "b")
    val probesAfterInit = w.probes("a")
    // cooldown elapses but the host is STILL down: re-probe, stay dead
    w.now = 200
    assert(w.invoke() == "b")
    assert(w.probes("a") == probesAfterInit + 1, "expired cooldown must re-probe")
    assert(w.calls("a") == 0)
    // host recovers; next expiry re-probes and restores rotation
    w.down -= "a"
    w.now = 400
    assert(w.invoke() == "a")
    assert(w.pool.liveCount == 2)
  }

  test("pool: all endpoints failing the first-use probe throws (reference all-dead rule)") {
    val w = new World("a", "b")
    w.down ++= Seq("a", "b")
    intercept[java.io.IOException](w.invoke())
    intercept[IllegalArgumentException](
      new EndpointPool(Vector.empty, _ => true))
  }

  // Counters live in a static object, NOT in the test closure: Spark
  // serializes task closures even in local mode, so a captured map
  // would be a per-task COPY and the driver's stay empty. Same-JVM
  // statics are the local-mode seam for observing executor-side work.

  test("parallel embed: work splits across endpoints, results complete and correct") {
    ParallelEmbedProbe.reset()
    val docs = (0 until 96).map(i => (i.toLong, s"text $i"))
    val got = embedPairsParallel(docs.toDS().repartition(3),
      Seq("a", "b"), ep => ParallelEmbedProbe.counting(ep, failOn = None),
      batchSize = 8).collect().toMap
    assert(got.size == 96)
    docs.foreach { case (id, t) =>
      assert(got(id).toSeq ==
        new DeterministicEmbedder(4).embed(Seq(t)).head.toSeq, s"doc $id") }
    assert(ParallelEmbedProbe.count("a") > 0 && ParallelEmbedProbe.count("b") > 0,
      s"both endpoints must carry work, saw ${ParallelEmbedProbe.byEp}")
    assert(ParallelEmbedProbe.count("a") + ParallelEmbedProbe.count("b") == 96)
  }

  test("parallel embed: a permanently dead endpoint's chunks are retried on the live one") {
    ParallelEmbedProbe.reset()
    val docs = (0 until 64).map(i => (i.toLong, s"text $i"))
    val got = embedPairsParallel(docs.toDS().repartition(2),
      Seq("dead", "live"),
      ep => ParallelEmbedProbe.counting(ep, failOn = Some("dead")),
      batchSize = 8).collect().toMap
    assert(got.size == 64)
    docs.foreach { case (id, t) =>
      assert(got(id).toSeq ==
        new DeterministicEmbedder(4).embed(Seq(t)).head.toSeq, s"doc $id") }
    assert(ParallelEmbedProbe.count("dead") > 0, "the dead endpoint was attempted")
    // every row was ultimately served by the live endpoint (failed
    // chunks re-embed there, so live count >= total)
    assert(ParallelEmbedProbe.count("live") >= 64,
      s"saw ${ParallelEmbedProbe.byEp}")
  }

  test("parallel embed: workers genuinely overlap inside one partition") {
    ParallelEmbedProbe.reset()
    val docs = (0 until 32).map(i => (i.toLong, s"text $i"))
    val got = embedPairsParallel(docs.toDS().coalesce(1),
      Seq("a", "b"), ep => ParallelEmbedProbe.counting(ep, failOn = None,
        sleepMs = 60), batchSize = 4).collect()
    assert(got.length == 32)
    // one partition, two endpoints: with 60 ms inside each call, the
    // two page workers must have been in-flight at the same moment
    assert(ParallelEmbedProbe.peak.get() >= 2,
      s"no overlap observed, peak=${ParallelEmbedProbe.peak.get()}")
  }

  test("pooled embedder: rotation survives a mid-stream death and results stay correct") {
    val world = new World("a", "b")
    val byEp = collection.mutable.Map.empty[String, Int]
    val pooled = new RetryingEmbedder(new PooledEmbedder(world.pool, ep =>
      new Embedder {
        def embed(texts: Seq[String]): Seq[Array[Double]] = {
          if (world.down(ep)) throw new java.io.IOException(s"$ep died")
          byEp(ep) = byEp.getOrElse(ep, 0) + texts.size
          new DeterministicEmbedder(4).embed(texts)
        }
      }), maxRetries = 2)
    val texts = (0 until 20).map(i => s"t$i")
    val firstHalf = texts.take(10).grouped(5).flatMap(b => pooled.embed(b)).toSeq
    world.down += "a" // host dies mid-stream
    val secondHalf = texts.drop(10).grouped(5).flatMap(b => pooled.embed(b)).toSeq
    val want = new DeterministicEmbedder(4).embed(texts)
    (firstHalf ++ secondHalf).zip(want).foreach { case (g, w2) =>
      assert(g.toSeq == w2.toSeq)
    }
    // ring trace: batches 1-2 alternate a,b; batch 3 fails over from a
    // to b (a marked dead before its counter moves); batch 4 skips the
    // cooling a — so a carried 5 texts and b the other 15
    assert(byEp("a") == 5 && byEp("b") == 15, s"rotation split, saw $byEp")
  }
}
