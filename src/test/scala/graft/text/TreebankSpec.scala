package graft.text

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Treebank tokenizer parity cases (SURVEY.md §7.5 risk #1): the
  * punctuation-bearing shapes that change token counts — and therefore
  * score-array lengths — on the raw-text scoring path
  * (client/async_processing_client.py:163-165). Expected outputs match
  * NLTK word_tokenize on the same inputs. */
class TreebankSpec extends AnyFunSuite {

  private def tok(s: String): Seq[String] = Treebank.tokenize(s).toSeq

  test("contractions split: n't / 'll / 've / 're / 's / 'm / 'd") {
    assert(tok("don't stop") == Seq("do", "n't", "stop"))
    assert(tok("I'll go, you've gone") == Seq("I", "'ll", "go", ",", "you", "'ve", "gone"))
    assert(tok("we're here") == Seq("we", "'re", "here"))
    assert(tok("it's John's book") == Seq("it", "'s", "John", "'s", "book"))
    assert(tok("I'm sure he'd agree") == Seq("I", "'m", "sure", "he", "'d", "agree"))
  }

  test("final period splits; internal periods don't") {
    assert(tok("He ran.") == Seq("He", "ran", "."))
    assert(tok("e.g. apples") == Seq("e.g.", "apples"))
    assert(tok("End of story (really).") == Seq("End", "of", "story", "(", "really", ")", "."))
  }

  test("commas, colons, question/exclamation marks") {
    assert(tok("one, two, three") == Seq("one", ",", "two", ",", "three"))
    assert(tok("note: this works") == Seq("note", ":", "this", "works"))
    assert(tok("really? yes! ok") == Seq("really", "?", "yes", "!", "ok"))
    // comma inside a number stays
    assert(tok("1,000 items") == Seq("1,000", "items"))
  }

  test("quotes become directional pairs") {
    assert(tok("\"Hello\" she said") == Seq("``", "Hello", "''", "she", "said"))
  }

  test("brackets, dashes, ellipsis") {
    assert(tok("a (b) c") == Seq("a", "(", "b", ")", "c"))
    assert(tok("wait -- now") == Seq("wait", "--", "now"))
    assert(tok("so... anyway") == Seq("so", "...", "anyway"))
  }

  test("MacIntyre special forms") {
    assert(tok("I cannot go") == Seq("I", "can", "not", "go"))
    assert(tok("gonna gotta wanna stop") == Seq("gon", "na", "got", "ta", "wan", "na", "stop"))
    assert(tok("more'n enough") == Seq("more", "'n", "enough"))
    assert(tok("d'ye ken") == Seq("d", "'ye", "ken"))
    assert(tok("'Twas fun") == Seq("'T", "was", "fun"))
  }

  test("unicode quote transforms (3.8.1 starting/ending rules)") {
    assert(tok("“Hello” she said") ==
      Seq("“", "Hello", "”", "she", "said"))
    assert(tok("«так» он сказал") == Seq("«", "так", "»", "он", "сказал"))
    // apostrophe-that-isn't-a-contraction splits off single-char words
    assert(tok("'a card") == Seq("'", "a", "card"))
  }

  test("multi-char punctuation: dot runs, stars, exact double dash") {
    assert(tok("so.. anyway") == Seq("so", "..", "anyway"))
    assert(tok("hmm....") == Seq("hmm", "...."))
    assert(tok("rated *five* stars") == Seq("rated", "*", "five", "*", "stars"))
    assert(tok("wait--no") == Seq("wait", "--", "no"))
    // 3.8.1 DOUBLE_DASHES is exactly "--": a 3-dash run leaves "-b"
    assert(tok("a---b") == Seq("a", "--", "-b"))
  }

  test("final period followed by a closing quote splits both off") {
    assert(tok("He said \"stop.\"") == Seq("He", "said", "``", "stop", ".", "''"))
    // 3.8.1's closer class contains a literal SPACE: a space-separated
    // unicode closer after the final period still triggers the split
    assert(tok("wait. ”") == Seq("wait", ".", "”"))
  }

  test("unicode word chars, digits, and whitespace (Python-re parity)") {
    // é is a word char in Python 3: \b(can)(not)\b has no boundary
    assert(tok("cannoté x") == Seq("cannoté", "x"))
    // NBSP is whitespace to str.split()
    assert(tok("a\u00A0b") == Seq("a", "b"))
  }

  test("mid-token punctuation class: ; @ # $ % &") {
    assert(tok("a; b@c 50% $5 #tag x&y") ==
      Seq("a", ";", "b", "@", "c", "50", "%", "$", "5", "#", "tag", "x", "&", "y"))
  }

  private val rnd = new Random(42)
  private def randWord(): String =
    (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("q62 raw-text construction tokenizes to the oracle's expected shape") {
    // q62 derives punctuation-bearing raw text as
    //   '"' + <clean text> + " can't stop, really... (wow)."
    // and its DuckDB oracle reconstructs the Treebank tokens as
    //   ['``'] ++ whitespace(text) ++ the 10 fixed suffix tokens.
    // This pin is the bridge: if the tokenizer and this expectation
    // ever diverge, q62's oracle row goes red here first.
    val base = "key agg row scan slow fast table value"
    val raw = "\"" + base + " can't stop, really... (wow)."
    val expected = Seq("``") ++ base.split(" ") ++
      Seq("ca", "n't", "stop", ",", "really", "...", "(", "wow", ")", ".")
    assert(tok(raw) == expected)
  }

  test("property: on punctuation-free text, Treebank == whitespace tokenize (200 samples)") {
    for (_ <- 1 to 200) {
      val text = (1 to (1 + rnd.nextInt(12))).map(_ => randWord()).mkString(" ")
      assert(tok(text) == text.trim.split("\\s+").toSeq, s"input: $text")
    }
  }

  test("property: token count >= whitespace count on punctuation-bearing input (200 samples)") {
    val suffixes = Seq("", ",", ".", "!", "?", "'s", "n't")
    for (_ <- 1 to 200) {
      val text = (1 to (1 + rnd.nextInt(12)))
        .map(_ => randWord() + suffixes(rnd.nextInt(suffixes.length))).mkString(" ")
      assert(Treebank.tokenize(text).length >= text.split("\\s+").count(_.nonEmpty),
        s"input: $text")
    }
  }
}
