package graft.text

/** Penn-Treebank-style word tokenizer (W3): the reference scores RAW
  * transcript text through NLTK's `word_tokenize`
  * (client/async_processing_client.py:163-165; client/requirements.txt
  * pins nltk==3.8.1, whose word_tokenize is NLTKWordTokenizer in
  * nltk/tokenize/destructive.py). Treebank rules split contractions
  * and punctuation — so score-array LENGTHS (and therefore island
  * indexes) depend on these rules whenever the input carries
  * punctuation (SURVEY.md §7.5 risk #1).
  *
  * This is a re-derivation of that published rule list, rule-for-rule
  * and in the same application order: starting quotes (incl. unicode
  * opening quotes and backtick runs), punctuation (final-period with
  * trailing closers, multi-dot runs, `[;@#$%&]`, `[?!]`, `*`),
  * parens/brackets, double dashes, ending quotes (incl. unicode
  * closing quotes), then the MacIntyre contraction splits (n't, 'll,
  * 've, 're, 's, 'm, 'd and the special forms cannot → can not,
  * gonna → gon na, …). Java-regex notes: `\g<0>` becomes `$0`, and
  * `(?U)` mirrors Python's re.U so `\w` stays unicode-aware.
  *
  * SCOPE: this object is NLTKWordTokenizer — the per-SENTENCE word
  * tokenizer. nltk.word_tokenize first sentence-splits with punkt,
  * then applies these rules per sentence; [[Punkt.wordTokenize]] is
  * that full-parity composition (punkt parameters ingest through
  * [[PunktManifest]] — the ModelManifest pickle-migration pattern).
  * Called directly on multi-sentence input, the `$`-anchored
  * final-period rules fire only at end of the whole input:
  * "Hi there. Bye." keeps "there." glued where word_tokenize splits
  * it (PunktSpec + q126 pin the divergence and the fix). Transcript
  * text is overwhelmingly unpunctuated (the F1 path strips
  * punctuation entirely) and q62's raw fixture is single-sentence by
  * construction, so the direct form stays correct on those paths.
  *
  * On punctuation-free text (the `text_formatted` path after F1
  * normalization) it reduces to whitespace tokenization — TreebankSpec
  * pins both properties.
  */
object Treebank {

  import java.util.regex.Pattern

  /** Rule lists compile ONCE at object init: `tokenize` runs per row
    * inside UDFs (q126 runs it twice per doc, q46/q47/q62 once), and
    * `String.replaceAll` re-compiles its pattern on every call — ~40
    * Pattern.compile per invocation, millions per query at sf0.1. */
  private def compiled(rules: Seq[(String, String)]): Array[(Pattern, String)] =
    rules.map { case (p, r) => (Pattern.compile(p), r) }.toArray

  private def applyAll(rules: Array[(Pattern, String)], text: String): String = {
    var t = text
    var i = 0
    while (i < rules.length) {
      t = rules(i)._1.matcher(t).replaceAll(rules(i)._2)
      i += 1
    }
    t
  }

  private val startingQuotes: Seq[(String, String)] = Seq(
    "([«“‘„]|[`]+)" -> " $1 ",
    "^\"" -> "``",
    "(``)" -> " $1 ",
    "([ \\(\\[{<])(\"|'{2})" -> "$1 `` ",
    // leading apostrophe that is NOT a contraction suffix splits off
    // ('a, 'I — single word chars; 're/'ve/… are handled later)
    "(?iU)(')(?!re|ve|ll|m|t|s|d|n)(\\w)\\b" -> "$1 $2")

  private val punctuation: Seq[(String, String)] = Seq(
    // final period with trailing closers (incl. unicode closing
    // quotes AND a literal space — 3.8.1's class is [\])}>"'»”’ ]*) —
    // closers become their OWN token (spaced replacement)
    "(?U)([^\\.])(\\.)([\\]\\)}>\"'»”’ ]*)\\s*$" -> "$1 $2 $3 ",
    // \d must stay unicode-aware: Python 3 regexes are unicode by
    // default, so every shorthand class below carries (?U)
    "(?U)([:,])([^\\d])" -> " $1 $2",
    "([:,])$" -> " $1 ",
    // any run of 2+ dots (.., ..., ....) — not just the 3-dot ellipsis
    "(?U)\\.{2,}" -> " $0 ",
    "([;@#$%&])" -> " $1 ",
    // ASCII-closer final-period form kept in its 3.8.1 list position
    "(?U)([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$" -> "$1 $2$3 ",
    "([?!])" -> " $1 ",
    "([^'])' " -> "$1 ' ",
    "(?U)[*]" -> " $0 ")

  private val parensBrackets: Seq[(String, String)] = Seq(
    "([\\]\\[\\(\\)\\{\\}<>])" -> " $1 ")

  // exactly two dashes (3.8.1 DOUBLE_DASHES): "---" → "-- -"
  private val doubleDashes: Seq[(String, String)] = Seq(
    "--" -> " -- ")

  private val endingQuotes: Seq[(String, String)] = Seq(
    "(?U)([»”’])" -> " $1 ",
    "''" -> " '' ",
    "\"" -> " '' ",
    "([^' ])('[sS]|'[mM]|'[dD]|') " -> "$1 $2 ",
    "([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) " -> "$1 $2 ")

  // MacIntyre CONTRACTIONS2/3 forms, split at the documented boundary.
  // (?U): \b must treat unicode letters as word chars — Python 3 does,
  // so "cannoté" has NO trailing boundary and stays unsplit there.
  private val contractions2: Seq[String] = Seq(
    "(?iU)\\b(can)(not)\\b",
    "(?iU)\\b(d)('ye)\\b",
    "(?iU)\\b(gim)(me)\\b",
    "(?iU)\\b(gon)(na)\\b",
    "(?iU)\\b(got)(ta)\\b",
    "(?iU)\\b(lem)(me)\\b",
    "(?iU)\\b(more)('n)\\b",
    "(?iU)\\b(wan)(na)(?=\\s)")
  private val contractions3: Seq[String] = Seq(
    "(?iU) ('t)(is)\\b",
    "(?iU) ('t)(was)\\b")

  private val startingQuotesP = compiled(startingQuotes)
  private val punctuationP = compiled(punctuation)
  private val parensBracketsP = compiled(parensBrackets)
  private val doubleDashesP = compiled(doubleDashes)
  private val endingQuotesP = compiled(endingQuotes)
  private val contractions2P = compiled(contractions2.map(_ -> " $1 $2 "))
  private val contractions3P = compiled(contractions3.map(_ -> " $1 $2 "))
  private val unicodeWs = Pattern.compile("(?U)\\s+")

  def tokenize(text: String): Array[String] = {
    var t = text
    t = applyAll(startingQuotesP, t)
    t = applyAll(punctuationP, t)
    t = applyAll(parensBracketsP, t)
    t = applyAll(doubleDashesP, t)
    // add padding spaces so end-of-string contractions match " $" rules
    t = " " + t + " "
    t = applyAll(endingQuotesP, t)
    t = applyAll(contractions2P, t)
    t = applyAll(contractions3P, t)
    // Python str.split() splits on UNICODE whitespace (NBSP, ideographic
    // space, …); (?U)\s+ mirrors that, and nonEmpty drops the artifacts
    // of unicode-space leading/trailing runs that ASCII trim leaves.
    unicodeWs.split(t.trim).filter(_.nonEmpty)
  }
}
