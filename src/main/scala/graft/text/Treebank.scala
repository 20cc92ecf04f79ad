package graft.text

/** Penn-Treebank-style word tokenizer (W3): the reference scores RAW
  * transcript text through NLTK's `word_tokenize`
  * (client/async_processing_client.py:163-165), whose Treebank rules
  * split contractions and punctuation — so score-array LENGTHS (and
  * therefore island indexes) depend on these rules whenever the input
  * carries punctuation (SURVEY.md §7.5 risk #1). This is a
  * re-derivation of the published Penn Treebank sed rules (the same
  * public rule set NLTK implements): punctuation split-off,
  * ellipsis/dash handling, quote directionality, and the standard
  * contraction splits (n't, 'll, 've, 're, 's, 'm, 'd) plus the
  * MacIntyre special forms (cannot → can not, gonna → gon na, …).
  *
  * On punctuation-free text (the `text_formatted` path after F1
  * normalization) it reduces to whitespace tokenization — TreebankSpec
  * pins both properties.
  */
object Treebank {

  private val startingQuotes: Seq[(String, String)] = Seq(
    "^\"" -> "``",
    "(``)" -> " $1 ",
    "([ \\(\\[{<])(\"|'{2})" -> "$1 `` ")

  private val punctuation: Seq[(String, String)] = Seq(
    "([:,])([^\\d])" -> " $1 $2",
    "([:,])$" -> " $1 ",
    "\\.\\.\\." -> " ... ",
    "([;@#$%&])" -> " $1 ",
    // final period (possibly followed by closing brackets/quotes)
    "([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$" -> "$1 $2$3 ",
    "([?!])" -> " $1 ",
    "([^'])' " -> "$1 ' ")

  private val parensBrackets: Seq[(String, String)] = Seq(
    "([\\]\\[\\(\\)\\{\\}<>])" -> " $1 ",
    "(-{2,})" -> " $1 ")

  private val endingQuotes: Seq[(String, String)] = Seq(
    "\"" -> " '' ",
    "(\\S)('')" -> "$1 $2 ",
    "([^' ])('[sS]|'[mM]|'[dD]|') " -> "$1 $2 ",
    "([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) " -> "$1 $2 ")

  // MacIntyre CONTRACTIONS2 forms, split at the documented boundary.
  private val contractions2: Seq[String] = Seq(
    "(?i)\\b(can)(not)\\b",
    "(?i)\\b(d)('ye)\\b",
    "(?i)\\b(gim)(me)\\b",
    "(?i)\\b(gon)(na)\\b",
    "(?i)\\b(got)(ta)\\b",
    "(?i)\\b(lem)(me)\\b",
    "(?i)\\b(mor)('n)\\b",
    "(?i)\\b(wan)(na)\\s")
  private val contractions3: Seq[String] = Seq(
    "(?i) ('t)(is)\\b",
    "(?i) ('t)(was)\\b")

  def tokenize(text: String): Array[String] = {
    var t = text
    for ((p, r) <- startingQuotes) t = t.replaceAll(p, r)
    for ((p, r) <- punctuation) t = t.replaceAll(p, r)
    for ((p, r) <- parensBrackets) t = t.replaceAll(p, r)
    // add padding spaces so end-of-string contractions match " $" rules
    t = " " + t + " "
    for ((p, r) <- endingQuotes) t = t.replaceAll(p, r)
    for (p <- contractions2) t = t.replaceAll(p, " $1 $2 ")
    for (p <- contractions3) t = t.replaceAll(p, " $1 $2 ")
    t.trim.split("\\s+").filter(_.nonEmpty)
  }
}
