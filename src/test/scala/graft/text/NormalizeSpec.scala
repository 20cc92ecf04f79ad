package graft.text

import graft.SparkSpec

/** FIXTURES.md §2: the reference normalization chain
  * (maintain_database.py:470-473) on the micro-fixture, including the
  * greedy-bracket pin and marker-row semantics. */
class NormalizeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def normalize(raw: String): (String, Int) = {
    import spark.implicits._
    val row = Seq(raw).toDF("text")
      .select(TextAnalysis.textFormatted($"text").as("tf"))
      .select($"tf", TextAnalysis.wordCount($"tf").as("wc"))
      .head()
    (row.getString(0), row.getInt(1))
  }

  test("basic: lower + strip brackets + strip punctuation") {
    val (tf, wc) = normalize("Hello, world! [Music]")
    assert(tf == "hello world ")
    assert(wc == 2)
  }

  test("contractions and dashes lose punctuation only") {
    val (tf, wc) = normalize("it's a test — isn't it?")
    assert(tf == "its a test  isnt it")
    assert(wc == 5)
  }

  test("curly-brace stage directions") {
    val (tf, wc) = normalize("{applause} Amen.")
    assert(tf == " amen")
    assert(wc == 1)
  }

  test("greedy bracket regex spans the whole line (reference behavior pin)") {
    val (tf, wc) = normalize("a [x] b [y] c")
    assert(tf == "a  c")
    assert(wc == 2)
  }

  test("charBigrams: short docs emit no rows instead of crashing") {
    import spark.implicits._
    val docs = Seq((1L, "en", ""), (2L, "en", "a"), (3L, "en", "abc"))
      .toDF("doc_id", "lang", "t")
    val got = TextAnalysis.charBigrams(docs)
      .groupBy($"doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // sequence(1, 0) descends in Spark — without the guard, '' and 'a'
    // would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT, not return empty
    assert(got == Map(3L -> 2L)) // only "ab","bc"; docs 1/2 emit nothing
    val bgs = TextAnalysis.charBigrams(docs).select($"bg").as[String].collect().sorted
    assert(bgs.toSeq == Seq("ab", "bc"))
  }

  test("empty and whitespace-only -> word_count 0") {
    assert(normalize("")._2 == 0)
    assert(normalize("  [all bracketed]  ")._2 == 0)
  }
}
