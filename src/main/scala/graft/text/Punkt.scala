package graft.text

import java.util.regex.{Matcher, Pattern}

import scala.collection.mutable.ArrayBuffer

/** Punkt sentence segmentation (W3's last parity residue): the
  * reference scores raw text through `nltk.word_tokenize`
  * (client/async_processing_client.py:163-165), which FIRST splits
  * into sentences with the punkt model and THEN runs the Treebank
  * word tokenizer per sentence — so the `$`-anchored final-period
  * rules in [[Treebank]] fire at every sentence end, not just
  * end-of-input ("Hi there. Bye." → "there", ".", "Bye", ".").
  *
  * This is a re-derivation of the published algorithm — Kiss & Strunk
  * (2006) "Unsupervised Multilingual Sentence Boundary Detection",
  * as implemented by NLTK 3.8.1's `nltk/tokenize/punkt.py` (the
  * version the reference pins in client/requirements.txt) — covering
  * the RUNTIME (sentence-splitting) half: first-pass token annotation
  * (abbreviation lookup, ellipsis, sentence-end chars), the
  * second-pass collocation / orthographic / frequent-sentence-starter
  * heuristics, and boundary realignment of trailing quotes. The
  * TRAINING half stays in Python where the trained model already
  * lives: punkt's learned state is four parameter tables
  * (abbreviations, collocations, sentence starters, orthographic
  * contexts), and `tools/export_punkt_manifest.py` dumps them from
  * the reference's pickle with public nltk API — the same
  * pickle-migration discipline as `tools/export_model_manifest.py`
  * (S7). [[PunktManifest.ingest]] loads that manifest into a
  * [[Punkt.Params]].
  *
  * Faithfulness notes (all mirror punkt.py, cited by section):
  *  - token `type` lowercases and collapses numbers to `##number##`
  *    (PunktToken._RE_NUMERIC);
  *  - candidate sentence-end contexts come from a `[.?!]` scan with a
  *    lookahead for following punctuation-or-word, each judged on the
  *    3-token window `before + end-char + after`
  *    (_match_potential_end_contexts, 3.8.1's non-backtracking form);
  *  - `Params.orthoContext` values are punkt's `_ORTHO_*` bit-ors;
  *  - boundary realignment folds sentence-leading closers
  *    (`"')]}`) back onto the previous sentence
  *    (_realign_boundaries).
  */
object Punkt {

  // ---- orthographic context flags (punkt.py _ORTHO_*) ---------------

  val OrthoBegUc: Int = 1 << 1
  val OrthoMidUc: Int = 1 << 2
  val OrthoUnkUc: Int = 1 << 3
  val OrthoBegLc: Int = 1 << 4
  val OrthoMidLc: Int = 1 << 5
  val OrthoUnkLc: Int = 1 << 6
  val OrthoUc: Int = OrthoBegUc | OrthoMidUc | OrthoUnkUc
  val OrthoLc: Int = OrthoBegLc | OrthoMidLc | OrthoUnkLc

  /** The four learned tables of a trained punkt model
    * (PunktParameters): `abbrevTypes` are lowercase types WITHOUT the
    * final period; `collocations` are `(type_no_period,
    * type_no_sentperiod)` pairs; `orthoContext` maps a type to its
    * observed `_ORTHO_*` bit-or. Empty tables are a valid (untrained)
    * model: plain word+period always breaks, abbreviation/initial
    * rescue still applies. */
  final case class Params(
      abbrevTypes: Set[String] = Set.empty,
      collocations: Set[(String, String)] = Set.empty,
      sentStarters: Set[String] = Set.empty,
      orthoContext: Map[String, Int] = Map.empty) extends Serializable

  // ---- language vars (PunktLanguageVars, english defaults) ----------

  private val NonWordChars = """(?:[?!)";}\]*:@'({\[])"""
  private val MultiCharPunct = """(?:\-{2,}|\.{2,}|(?:\.\s){2,}\.)"""
  private val WordStart = """[^\("`{\[:;&#\*@\)}\]\-,]"""

  private def uni(p: String): Pattern =
    Pattern.compile(p, Pattern.UNICODE_CHARACTER_CLASS)

  /** `_word_tokenizer_re`: multi-char punctuation runs, then word
    * material up to a word-end marker, then any single non-space. */
  private val WordTokenizerRe: Pattern = uni(
    s"""$MultiCharPunct|(?=$WordStart)\\S+?(?=\\s|$$|$NonWordChars|$MultiCharPunct|,(?=$$|\\s|$NonWordChars|$MultiCharPunct))|\\S""")

  /** `period_context_re`: a sentence-end char whose lookahead captures
    * the following punctuation, or whitespace + next word chunk. */
  private val PeriodContextRe: Pattern = uni(
    s"""[.?!](?=(?<after>$NonWordChars|\\s+(?<next>\\S+)))""")

  /** `_re_boundary_realignment`: sentence-leading closers that belong
    * to the previous sentence. */
  private val BoundaryRealignRe: Pattern = Pattern.compile(
    """["')\]}]+?(?:\s+|(?=--)|$)""",
    Pattern.UNICODE_CHARACTER_CLASS | Pattern.MULTILINE)

  // ---- token (PunktToken) -------------------------------------------

  private val ReTrailWs = Pattern.compile("""(?U)\s+$""")

  private val ReEllipsis = Pattern.compile("""\.\.+$""")
  private val ReNumeric = Pattern.compile("""^-?[\.,]?\d[\d,\.-]*\.?$""")
  private val ReInitial = uni("""[^\W\d]\.$""")

  private val ReNonPunct = uni("""[^\W\d]""")
  private val ReAlphaFull = uni("""[^\W\d]+""")

  private[text] final class Tok(val tok: String) {
    var sentbreak: Boolean = false
    var abbr: Boolean = false
    var ellipsis: Boolean = false
    // set by tokenizeWords; read only by the TRAINER's orthographic
    // automaton (PunktToken parastart/linestart — runtime ignores them)
    var parastart: Boolean = false
    var linestart: Boolean = false

    val typ: String = {
      // Locale.ROOT: Python's str.lower() is locale-independent; the
      // default-locale overload diverges under e.g. tr_TR ('I.'→'ı.')
      // and would desync every table lookup from the reference.
      val lower = tok.toLowerCase(java.util.Locale.ROOT)
      if (ReNumeric.matcher(lower).lookingAt()) "##number##" else lower
    }
    def typNoPeriod: String =
      if (typ.length > 1 && typ.endsWith(".")) typ.dropRight(1) else typ
    def typNoSentPeriod: String = if (sentbreak) typNoPeriod else typ
    val periodFinal: Boolean = tok.endsWith(".")
    def firstUpper: Boolean = tok.nonEmpty && Character.isUpperCase(tok.charAt(0))
    def firstLower: Boolean = tok.nonEmpty && Character.isLowerCase(tok.charAt(0))
    val isEllipsisTok: Boolean = ReEllipsis.matcher(tok).lookingAt()
    val isInitial: Boolean = ReInitial.matcher(tok).lookingAt()
    /** PunktToken.is_non_punct: the TYPE contains a letter. */
    def isNonPunct: Boolean = ReNonPunct.matcher(typ).find()
    /** PunktToken.is_alpha: the type is letters only. */
    def isAlphaTok: Boolean = ReAlphaFull.matcher(typ).matches()
    def isNumberTok: Boolean = typ.startsWith("##number##")
  }

  private def isPyWhitespace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c)

  private def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPyWhitespace(s.charAt(i))) i += 1
    while (j > i && isPyWhitespace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  // ---- word-level tokenization of a judgement context ---------------

  /** `_tokenize_words`: line-by-line word tokenization. Each line's
    * first token carries `linestart`, and the first token after a run
    * of blank lines carries `parastart` — flags only the TRAINER's
    * orthographic automaton reads (runtime annotation ignores them). */
  private[text] def tokenizeWords(text: String): ArrayBuffer[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var parastart = false
    text.split("\n", -1).foreach { line =>
      if (pyStrip(line).nonEmpty) {
        val m = WordTokenizerRe.matcher(line)
        var first = true
        while (m.find()) {
          val t = new Tok(m.group())
          if (first) { t.parastart = parastart; t.linestart = true; first = false }
          out += t
        }
        parastart = false
      } else parastart = true
    }
    out
  }

  // ---- annotation (first + second pass) -----------------------------

  private val SentEndCharTokens = Set(".", "?", "!")

  /** `_first_pass_annotation`: sentence-end chars, ellipses, and the
    * abbreviation-table lookup (also on the last dash-segment).
    * Package-private: the trainer's orthographic/pair pass annotates
    * with exactly this rule. */
  private[text] def firstPass(t: Tok, params: Params): Unit = {
    if (SentEndCharTokens.contains(t.tok)) t.sentbreak = true
    else if (t.isEllipsisTok) t.ellipsis = true
    else if (t.periodFinal && !t.tok.endsWith("..")) {
      val base = t.tok.dropRight(1)
      if (params.abbrevTypes.contains(base.toLowerCase(java.util.Locale.ROOT)) ||
          params.abbrevTypes.contains(
            base.split("-", -1).last.toLowerCase(java.util.Locale.ROOT)))
        t.abbr = true
      else t.sentbreak = true
    }
  }

  /** `_ortho_heuristic`: Some(true) = definitely a sentence starter,
    * Some(false) = definitely not, None = unknown. */
  private val OrthoPunct = Set(";", ":", ",", ".", "!", "?")

  private def orthoHeuristic(t: Tok, params: Params): Option[Boolean] = {
    if (OrthoPunct.contains(t.tok)) return Some(false)
    val oc = params.orthoContext.getOrElse(t.typNoSentPeriod, 0)
    if (t.firstUpper && (oc & OrthoLc) != 0 && (oc & OrthoMidUc) == 0)
      Some(true)
    else if (t.firstLower && ((oc & OrthoUc) != 0 || (oc & OrthoBegLc) == 0))
      Some(false)
    else None
  }

  /** `_second_pass_annotation`: collocation rescue, abbreviation +
    * orthographic / frequent-sentence-starter overrides, and the
    * initial/ordinal reclassification. */
  private def secondPass(t1: Tok, t2: Tok, params: Params): Unit = {
    if (t2 == null || !t1.periodFinal) return
    val typ = t1.typNoPeriod
    val nextTyp = t2.typNoSentPeriod

    // [4.1.2] known collocation across the period → abbreviation
    if (params.collocations.contains((typ, nextTyp))) {
      t1.sentbreak = false
      t1.abbr = true
      return
    }

    // [4.2] abbreviation/ellipsis may still END a sentence
    if ((t1.abbr || t1.ellipsis) && !t1.isInitial) {
      if (orthoHeuristic(t2, params).contains(true)) {
        t1.sentbreak = true
        return
      }
      if (t2.firstUpper && params.sentStarters.contains(nextTyp)) {
        t1.sentbreak = true
        return
      }
    }

    // [4.3] initials and ordinals reclassified as abbreviations
    if (t1.isInitial || typ == "##number##") {
      orthoHeuristic(t2, params) match {
        case Some(false) =>
          t1.sentbreak = false
          t1.abbr = true
        case None if t1.isInitial && t2.firstUpper &&
            (params.orthoContext.getOrElse(nextTyp, 0) & OrthoLc) == 0 =>
          t1.sentbreak = false
          t1.abbr = true
        case _ => ()
      }
    }
  }

  private def annotate(toks: ArrayBuffer[Tok], params: Params): Unit = {
    toks.foreach(firstPass(_, params))
    var i = 0
    while (i < toks.length) {
      secondPass(toks(i), if (i + 1 < toks.length) toks(i + 1) else null, params)
      i += 1
    }
  }

  /** `text_contains_sentbreak`: true iff some NON-FINAL token of the
    * context is annotated as a sentence break. */
  private[text] def textContainsSentbreak(context: String, params: Params): Boolean = {
    val toks = tokenizeWords(context)
    annotate(toks, params)
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i).sentbreak) return true
      i += 1
    }
    false
  }

  // ---- potential-end-context scan -----------------------------------

  private final case class EndMatch(start: Int, end: Int, nextStart: Int,
                                    context: String)

  /** `_match_potential_end_contexts` (3.8.1's reverse scan): candidate
    * `[.?!]` matches, each paired with the judgement context
    * `before-word + end-char + after-token`; matches falling inside a
    * later match's before-word are that match's material, not
    * independent candidates. */
  private def matchPotentialEndContexts(text: String): Seq[EndMatch] = {
    val m = PeriodContextRe.matcher(text)
    val all = ArrayBuffer.empty[(Int, Int, Int, String)] // start, end, nextStart, after
    while (m.find()) {
      val next = m.start("next")
      all += ((m.start, m.end, next, m.group("after")))
    }
    val kept = ArrayBuffer.empty[EndMatch]
    var beforeStart = 0
    var any = false
    all.reverseIterator.foreach { case (start, end, nextStart, after) =>
      if (!any || end <= beforeStart) {
        // python: text[:start].rsplit(maxsplit=1) — strip trailing
        // whitespace, then split once on the last whitespace run
        val prefix = {
          var j = start
          while (j > 0 && isPyWhitespace(text.charAt(j - 1))) j -= 1
          text.substring(0, j)
        }
        var runEnd = prefix.length
        while (runEnd > 0 && !isPyWhitespace(prefix.charAt(runEnd - 1))) runEnd -= 1
        val beforeWord = prefix.substring(runEnd)
        var runStart = runEnd
        while (runStart > 0 && isPyWhitespace(prefix.charAt(runStart - 1))) runStart -= 1
        beforeStart = if (runEnd == 0) 0 else runStart
        any = true
        kept += EndMatch(start, end, nextStart,
          beforeWord + text.substring(start, end) + after)
      }
    }
    kept.reverseIterator.toSeq
  }

  // ---- sentence slicing ---------------------------------------------

  /** `_slices_from_text` + `_realign_boundaries`: sentence spans
    * `[start, end)` into `text`. */
  def sentenceSpans(text: String, params: Params): Seq[(Int, Int)] = {
    val raw = ArrayBuffer.empty[(Int, Int)]
    var lastBreak = 0
    matchPotentialEndContexts(text).foreach { em =>
      if (textContainsSentbreak(em.context, params)) {
        raw += ((lastBreak, em.end))
        lastBreak = if (em.nextStart >= 0) em.nextStart else em.end
      }
    }
    raw += ((lastBreak, text.length))

    // realign: a next-sentence-leading run of closers ("')]} followed
    // by whitespace/--/end belongs to the previous sentence
    val out = ArrayBuffer.empty[(Int, Int)]
    var realign = 0
    var i = 0
    while (i < raw.length) {
      val (s0, e0) = raw(i)
      val s1 = (s0 + realign, e0)
      if (i + 1 >= raw.length) {
        if (s1._2 > s1._1) out += s1
        realign = 0
      } else {
        val (ns, ne) = raw(i + 1)
        val nextText = text.substring(ns, ne)
        val m = BoundaryRealignRe.matcher(nextText)
        if (m.lookingAt()) {
          val kept = ReTrailWs.matcher(m.group()).replaceAll("")
          out += ((s1._1, ns + kept.length))
          realign = m.end()
        } else {
          realign = 0
          if (s1._2 > s1._1) out += s1
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** `PunktSentenceTokenizer.tokenize`: the sentence strings. */
  def sentences(text: String, params: Params): Seq[String] =
    sentenceSpans(text, params).map { case (s, e) => text.substring(s, e) }

  /** `nltk.word_tokenize` parity: punkt sentence split, then the
    * [[Treebank]] word tokenizer per sentence — the reference's
    * scoring-path tokenization for raw multi-sentence text. */
  def wordTokenize(text: String, params: Params): Array[String] =
    sentences(text, params).iterator.flatMap(Treebank.tokenize).toArray
}
