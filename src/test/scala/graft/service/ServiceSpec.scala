package graft.service

import graft.SparkSpec
import graft.service.ServiceOps._

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
}
