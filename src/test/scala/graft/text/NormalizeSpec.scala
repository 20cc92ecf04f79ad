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

  test("graft_bigram_codes == charBigrams under the cp1<<21|cp2 packing") {
    import spark.implicits._
    graft.expr.VectorExpressions.register(spark)
    // includes a non-BMP char (𝄞, U+1D11E): codes must step code
    // points (one bigram per adjacent pair), same as split('')
    val docs = Seq((1L, "en", "the quick brown"), (2L, "en", "a𝄞b"),
                   (3L, "en", ""), (4L, "en", "x"))
      .toDF("doc_id", "lang", "t")
    val fromCodes = docs
      .select($"doc_id", explode(expr("graft_bigram_codes(t)")).as("code"))
      .as[(Long, Long)].collect()
      .map { case (id, code) =>
        (id, new String(Character.toChars((code >> 21).toInt)) +
          new String(Character.toChars((code & 0x1FFFFF).toInt)))
      }.sorted.toSeq
    val fromStrings = TextAnalysis.charBigrams(docs)
      .select($"doc_id", $"bg").as[(Long, String)].collect().sorted.toSeq
    assert(fromCodes == fromStrings)
    assert(fromCodes.count(_._1 == 2L) == 2) // a𝄞, 𝄞b — not surrogate halves
  }

  test("bigram code order == bigram string order (profile tie-break parity)") {
    // The q24 oracle tie-breaks top-50 profiles with ORDER BY cnt, bg on
    // STRINGS; Spark now orders packed longs. UTF-8 byte order ==
    // code-point order == (cp1, cp2) == packed-long order, so the two
    // rankings agree — pinned on a shuffled sample including non-ASCII.
    val bgs = Seq("ab", "ba", "zz", "a𝄞", "𝄞a", "éz", "zé", "  ", " a")
    def pack(s: String): Long = {
      val cp1 = s.codePointAt(0)
      val cp2 = s.codePointAt(Character.charCount(cp1))
      (cp1.toLong << 21) + cp2
    }
    // model the engines' comparator exactly: unsigned UTF-8 byte order
    // (Spark UTF8String.compareTo and DuckDB both compare raw bytes)
    val byUtf8 = bgs.sortBy(_.getBytes("UTF-8").map(b => f"${b & 0xff}%03d").mkString)
    val byCode = bgs.sortBy(pack)
    assert(byUtf8 == byCode)
  }

  test("empty and whitespace-only -> word_count 0") {
    assert(normalize("")._2 == 0)
    assert(normalize("  [all bracketed]  ")._2 == 0)
  }
}
