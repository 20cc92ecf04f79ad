package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Punkt TRAINING — the learning half of Kiss & Strunk (2006),
  * "Unsupervised Multilingual Sentence Boundary Detection", matching
  * NLTK 3.8.1's `PunktTrainer` semantics (the runtime half is
  * [[Punkt]]; the reference loads a pickle trained by exactly this
  * algorithm, client/requirements.txt pins nltk 3.8.1). With this the
  * manifest export tool (`tools/export_punkt_manifest.py`) becomes a
  * MIGRATION convenience, not a dependency: the four parameter tables
  * can be derived from any training corpus in-engine.
  *
  * The algorithm is two statistics passes over the corpus plus
  * vocab-bounded driver-side scoring — the Spark shape mirrors that
  * exactly:
  *
  *  1. TYPE COUNTS (distributed, map-side combined): token-type
  *     frequencies + the period-final token count.
  *  2. ABBREVIATIONS (driver, count-table-bounded): every type ending
  *     in a period is scored with the Dunning log-likelihood of its
  *     period being lexical rather than terminal, damped by the
  *     type's length, internal periods, and period-less occurrences
  *     (`_reclassify_abbrev_types`); score ≥ 0.3 ⇒ abbreviation.
  *  3. ANNOTATED PASS (distributed, abbreviation table broadcast):
  *     first-pass annotation, then per doc the orthographic-context
  *     automaton (`_get_orthography_data` — position×case flags
  *     bit-or'd per type), candidate collocation pair counts,
  *     candidate sentence-starter counts, and the sentence-break
  *     census. All outputs are vocab-bounded count tables.
  *  4. RARE-ABBREVIATION PASS (distributed, orthography broadcast):
  *     `_is_rare_abbrev_type` rescues low-frequency abbreviations at
  *     annotated breaks followed by internal punctuation or a
  *     lowercase word whose orthography says sentence-initial-only.
  *  5. FINALIZE (driver): sentence starters then collocations via the
  *     collocation log-likelihood with punkt's thresholds and gates.
  *
  * Faithfulness notes: formulas are literal transcriptions
  * (`_dunning_log_likelihood`, `_col_log_likelihood` with Python's
  * ValueError-on-log(≤0) branches as explicit zero guards); counting
  * conditions mirror `_train_tokens`' pair loop (only PERIOD-FINAL
  * first tokens feed starters/collocations — a `!`-terminated
  * sentence counts toward the break census but contributes no starter
  * observation); the rare-abbreviation count lookup keys
  * `type_no_sentperiod` and its last-char-dropped form exactly as
  * punkt.py does. Training semantics = one `train(corpus)` +
  * `finalize_training()` call where each input doc is its own
  * paragraph-reset text (the orthographic automaton starts "internal"
  * per doc) — order-free by construction, where NLTK's INCREMENTAL
  * train() calls reclassify abbreviations per batch and are
  * batch-order-dependent; for a single train+finalize the two
  * coincide.
  *
  * `includeAllCollocs` is PunktTrainer.INCLUDE_ALL_COLLOCS: by
  * default only breaks after numbers/initials feed the collocation
  * table; enabled, every period-final bigram does (how NLTK learns
  * `mount. Everest`-style pairs). */
object PunktTrainer {

  // PunktTrainer thresholds (punkt.py class attributes)
  val Abbrev = 0.3
  val AbbrevBackoff = 5L
  val Collocation = 7.88
  val SentStarter = 30.0
  val MinCollocFreq = 1L

  /** Corpus-wide token-type statistics (vocab-bounded). */
  final case class Counts(types: Map[String, Long], numPeriodToks: Long,
                          nTokens: Long)

  // ---- log-likelihood kernels (literal transcriptions) --------------

  /** `_dunning_log_likelihood`: H0 p(period|type)=p(period) vs the
    * abbreviation hypothesis p=0.99. */
  def dunningLogLikelihood(countA: Long, countB: Long, countAB: Long,
                           n: Long): Double = {
    val p1 = countB.toDouble / n
    val p2 = 0.99
    val nullHypo = countAB * math.log(p1) + (countA - countAB) * math.log(1.0 - p1)
    val altHypo = countAB * math.log(p2) + (countA - countAB) * math.log(1.0 - p2)
    -2.0 * (nullHypo - altHypo)
  }

  /** `_col_log_likelihood`: bigram-association log-likelihood ratio.
    * Python computes each summand under try/except ValueError (log of
    * a non-positive argument aborts the summand to 0) — transcribed
    * as explicit guards. */
  def colLogLikelihood(countA: Long, countB: Long, countAB: Long,
                       n: Long): Double = {
    val p = countB.toDouble / n
    val p1 = countAB.toDouble / countA
    val p2 = if (n == countA) 1.0 else (countB - countAB).toDouble / (n - countA)
    val s1 = if (p <= 0 || p >= 1) 0.0
      else countAB * math.log(p) + (countA - countAB) * math.log(1.0 - p)
    val s2 = if (p <= 0 || p >= 1) 0.0
      else (countB - countAB) * math.log(p) +
        (n - countA - countB + countAB) * math.log(1.0 - p)
    val s3 = if (countA == countAB || p1 <= 0 || p1 >= 1) 0.0
      else countAB * math.log(p1) + (countA - countAB) * math.log(1.0 - p1)
    val s4 = if (countB == countAB || p2 <= 0 || p2 >= 1) 0.0
      else (countB - countAB) * math.log(p2) +
        (n - countA - countB + countAB) * math.log(1.0 - p2)
    -2.0 * (s1 + s2 - s3 - s4)
  }

  // ---- phase 2: abbreviation classification -------------------------

  private val ReNonPunctTr = java.util.regex.Pattern.compile(
    """[^\W\d]""", java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** `_reclassify_abbrev_types` over the merged corpus counts; returns
    * (type-without-period, score) for every scored candidate, from
    * which callers keep score ≥ [[Abbrev]]. */
  private[text] def abbrevScores(counts: Counts): Map[String, Double] = {
    val out = Map.newBuilder[String, Double]
    counts.types.keysIterator.foreach { typ0 =>
      if (ReNonPunctTr.matcher(typ0).find() && typ0 != "##number##" &&
          typ0.endsWith(".") && typ0.length > 1) {
        val typ = typ0.dropRight(1)
        val internalPeriods = typ.count(_ == '.')
        val numPeriods = internalPeriods + 1
        // NLTK: num_nonperiods = len(typ) - num_periods + 1, with typ
        // already stripped of its trailing period = len - internal
        val numNonPeriods = typ.length - numPeriods + 1
        val withPeriod = counts.types.getOrElse(typ + ".", 0L)
        val withoutPeriod = counts.types.getOrElse(typ, 0L)
        val ll = dunningLogLikelihood(withPeriod + withoutPeriod,
          counts.numPeriodToks, withPeriod, counts.nTokens)
        val fLength = math.exp(-numNonPeriods.toDouble)
        val fPenalty = math.pow(numNonPeriods.toDouble, -withoutPeriod.toDouble)
        out += typ -> ll * fLength * numPeriods * fPenalty
      }
    }
    out.result()
  }

  // ---- phase 3: annotated statistics per doc ------------------------

  /** One doc's annotated-pass contribution. Ortho flags bit-or; the
    * rest sum. */
  private[text] final case class DocStats(
      ortho: Map[String, Int],
      collocs: Map[(String, String), Long],
      starters: Map[String, Long],
      sentbreaks: Long)

  private def orthoFlag(context: Int, t: Punkt.Tok): Int = {
    // _ORTHO_MAP[(context, first_case)]; context 0=internal 1=initial
    // 2=unknown
    if (t.firstUpper) context match {
      case 1 => Punkt.OrthoBegUc
      case 0 => Punkt.OrthoMidUc
      case _ => Punkt.OrthoUnkUc
    } else if (t.firstLower) context match {
      case 1 => Punkt.OrthoBegLc
      case 0 => Punkt.OrthoMidLc
      case _ => Punkt.OrthoUnkLc
    } else 0
  }

  private[text] def docStats(text: String, abbrevs: Set[String],
                             includeAllCollocs: Boolean): DocStats = {
    val params = Punkt.Params(abbrevTypes = abbrevs)
    val toks = Punkt.tokenizeWords(text)
    toks.foreach(Punkt.firstPass(_, params))

    // _get_orthography_data: the position×case automaton
    val ortho = mutable.Map.empty[String, Int]
    var context = 0 // internal
    toks.foreach { t =>
      if (t.parastart && context != 2) context = 1
      if (t.linestart && context == 0) context = 2
      val flag = orthoFlag(context, t)
      if (flag != 0) {
        val typ = t.typNoSentPeriod
        ortho.update(typ, ortho.getOrElse(typ, 0) | flag)
      }
      context =
        if (t.sentbreak) { if (!(t.isNumberTok || t.isInitial)) 1 else 2 }
        else if (t.ellipsis || t.abbr) 2
        else 0
    }

    // the pair loop (starter / collocation halves; rare abbreviations
    // need the FULL corpus orthography and run as their own pass)
    val collocs = mutable.Map.empty[(String, String), Long]
    val starters = mutable.Map.empty[String, Long]
    var i = 0
    while (i < toks.length - 1) {
      val t1 = toks(i)
      val t2 = toks(i + 1)
      if (t1.periodFinal) {
        if (t1.sentbreak && !(t1.isNumberTok || t1.isInitial) && t2.isAlphaTok)
          starters.update(t2.typ, starters.getOrElse(t2.typ, 0L) + 1)
        val collocable = includeAllCollocs ||
          (t1.sentbreak && (t1.isNumberTok || t1.isInitial))
        if (collocable && t1.isNonPunct && t2.isNonPunct) {
          val key = (t1.typNoPeriod, t2.typNoSentPeriod)
          collocs.update(key, collocs.getOrElse(key, 0L) + 1)
        }
      }
      i += 1
    }
    DocStats(ortho.toMap, collocs.toMap, starters.toMap,
      toks.count(_.sentbreak).toLong)
  }

  /** `_is_rare_abbrev_type` candidates of one doc (needs the corpus
    * orthography table, hence a separate pass). */
  private[text] def rareAbbrevs(text: String, abbrevs: Set[String],
                                counts: Counts,
                                ortho: Map[String, Int]): Set[String] = {
    val params = Punkt.Params(abbrevTypes = abbrevs)
    val toks = Punkt.tokenizeWords(text)
    toks.foreach(Punkt.firstPass(_, params))
    val out = Set.newBuilder[String]
    var i = 0
    while (i < toks.length - 1) {
      val t1 = toks(i)
      val t2 = toks(i + 1)
      if (t1.periodFinal && !t1.abbr && t1.sentbreak) {
        // punkt.py keys the count on type_no_sentperiod AND its
        // last-char-dropped form — transcribed verbatim (parity over
        // plausibility)
        val typ = t1.typNoSentPeriod
        val count = counts.types.getOrElse(typ, 0L) +
          counts.types.getOrElse(typ.dropRight(1), 0L)
        if (!abbrevs.contains(typ) && count < AbbrevBackoff) {
          val firstChar = t2.tok.take(1)
          if (firstChar == "," || firstChar == ":" || firstChar == ";")
            out += t1.typNoPeriod
          else if (t2.firstLower) {
            val oc = ortho.getOrElse(t2.typNoSentPeriod, 0)
            if ((oc & Punkt.OrthoBegUc) != 0 && (oc & Punkt.OrthoMidUc) == 0)
              out += t1.typNoPeriod
          }
        }
      }
      i += 1
    }
    out.result()
  }

  // ---- phase 5: finalize --------------------------------------------

  private[text] def findSentStarters(starterCounts: Map[String, Long],
                                     counts: Counts,
                                     sentbreakCount: Long): Set[String] =
    starterCounts.iterator.collect {
      case (typ, atBreak) if typ.nonEmpty && {
        val typCount = counts.types.getOrElse(typ, 0L) +
          counts.types.getOrElse(typ + ".", 0L)
        typCount >= atBreak && {
          val ll = colLogLikelihood(sentbreakCount, typCount, atBreak,
            counts.nTokens)
          ll >= SentStarter &&
            counts.nTokens.toDouble / sentbreakCount >
              typCount.toDouble / atBreak
        }
      } => typ
    }.toSet

  private[text] def findCollocations(collocCounts: Map[(String, String), Long],
                                     counts: Counts,
                                     sentStarters: Set[String]): Set[(String, String)] =
    collocCounts.iterator.collect {
      case ((typ1, typ2), colCount) if !sentStarters.contains(typ2) && {
        val c1 = counts.types.getOrElse(typ1, 0L) +
          counts.types.getOrElse(typ1 + ".", 0L)
        val c2 = counts.types.getOrElse(typ2, 0L) +
          counts.types.getOrElse(typ2 + ".", 0L)
        c1 > 1 && c2 > 1 && MinCollocFreq < colCount &&
          colCount <= math.min(c1, c2) && {
            val ll = colLogLikelihood(c1, c2, colCount, counts.nTokens)
            ll >= Collocation &&
              counts.nTokens.toDouble / c1 > c2.toDouble / colCount
          }
      } => (typ1, typ2)
    }.toSet

  // ---- scalar composition (the spec's ground truth) -----------------

  /** Single-JVM training over `docs` — phases 1-5 composed directly.
    * The distributed [[train]] must produce EXACTLY this (PunktSpec
    * pins it); sharing every phase function makes the claim
    * structural. */
  def trainScalar(docs: Seq[String],
                  includeAllCollocs: Boolean = false): Punkt.Params = {
    val typeCounts = mutable.Map.empty[String, Long]
    var periodToks = 0L
    var n = 0L
    docs.foreach { d =>
      Punkt.tokenizeWords(d).foreach { t =>
        typeCounts.update(t.typ, typeCounts.getOrElse(t.typ, 0L) + 1)
        if (t.periodFinal) periodToks += 1
        n += 1
      }
    }
    val counts = Counts(typeCounts.toMap, periodToks, n)
    val abbrevs = abbrevScores(counts).collect {
      case (t, s) if s >= Abbrev => t
    }.toSet
    val stats = docs.map(docStats(_, abbrevs, includeAllCollocs))
    val ortho = stats.flatMap(_.ortho).groupMapReduce(_._1)(_._2)(_ | _)
    val collocCounts = stats.flatMap(_.collocs).groupMapReduce(_._1)(_._2)(_ + _)
    val starterCounts = stats.flatMap(_.starters).groupMapReduce(_._1)(_._2)(_ + _)
    val sentbreaks = stats.map(_.sentbreaks).sum
    val rare = docs.flatMap(rareAbbrevs(_, abbrevs, counts, ortho)).toSet
    val starters = findSentStarters(starterCounts, counts, sentbreaks)
    Punkt.Params(abbrevs ++ rare,
      findCollocations(collocCounts, counts, starters), starters, ortho)
  }

  /** Distributed training: the same five phases with the corpus-sized
    * work as map-side-combined aggregations and ONLY vocab-bounded
    * tables on the driver (type counts, pair counts, orthography —
    * punkt's learned state is a few hundred KiB for full English; the
    * corpus text itself never leaves the executors). Three narrow
    * scans of `docs` (count / annotate / rare-rescue), each linear
    * and shuffle-free up to its count-table aggregation. */
  def train(s: SparkSession, docs: Dataset[String],
            includeAllCollocs: Boolean = false): Punkt.Params = {
    import s.implicits._
    // Scale guard: with the default (NLTK's default too) the colloc
    // table only holds pairs whose first token is period-final —
    // abbreviation-adjacent, a few hundred KiB for full English.
    // `includeAllCollocs = true` removes that restriction and makes
    // the collected table CORPUS-BIGRAM-sized — fine for the bounded
    // in-memory fixtures the specs and q126 train on, a driver OOM at
    // corpus scale. The require pins it to local (driver-side) inputs
    // so the flag can never reach a distributed corpus.
    require(!includeAllCollocs || docs.isLocal,
      "includeAllCollocs collects a corpus-bigram-sized table on the " +
        "driver — it is fixture-only and refuses non-local input")
    // phase 1: type counts (map-side combined; table is vocab-bounded)
    val typeRows = docs.flatMap(d => Punkt.tokenizeWords(d).iterator
        .map(t => (t.typ, if (t.periodFinal) 1L else 0L)))
      .toDF("typ", "pf")
      .groupBy($"typ")
      .agg(count(lit(1)).as("n"), sum($"pf").as("npf"))
      .collect()
    val counts = Counts(
      typeRows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      typeRows.map(_.getLong(2)).sum,
      typeRows.map(_.getLong(1)).sum)
    // phase 2 on the driver (count-table-bounded)
    val abbrevs = abbrevScores(counts).collect {
      case (t, sc) if sc >= Abbrev => t
    }.toSet
    val bcAbbrevs = s.sparkContext.broadcast(abbrevs)
    // phase 3: annotated statistics — one flatMap, one aggregation;
    // ortho flags bit-or, counts sum (kind-dispatched below)
    val statRows = docs.flatMap { d =>
      val st = docStats(d, bcAbbrevs.value, includeAllCollocs)
      st.ortho.iterator.map { case (w, f) => ("o", w, "", f.toLong) } ++
        st.collocs.iterator.map { case ((a, b), c) => ("c", a, b, c) } ++
        st.starters.iterator.map { case (w, c) => ("s", w, "", c) } ++
        Iterator.single(("b", "", "", st.sentbreaks))
    }.toDF("kind", "w1", "w2", "v")
      .groupBy($"kind", $"w1", $"w2")
      .agg(sum($"v").as("sv"), expr("bit_or(v)").as("bv"))
      .collect()
    val ortho = statRows.collect {
      case r if r.getString(0) == "o" => r.getString(1) -> r.getLong(4).toInt
    }.toMap
    val collocCounts = statRows.collect {
      case r if r.getString(0) == "c" => (r.getString(1), r.getString(2)) -> r.getLong(3)
    }.toMap
    val starterCounts = statRows.collect {
      case r if r.getString(0) == "s" => r.getString(1) -> r.getLong(3)
    }.toMap
    val sentbreaks = statRows.collectFirst {
      case r if r.getString(0) == "b" => r.getLong(3)
    }.getOrElse(0L)
    // phase 4: rare-abbreviation rescue (needs corpus orthography)
    val bcCounts = s.sparkContext.broadcast(counts)
    val bcOrtho = s.sparkContext.broadcast(ortho)
    val rare = docs.flatMap(d =>
        rareAbbrevs(d, bcAbbrevs.value, bcCounts.value, bcOrtho.value).iterator)
      .distinct().collect().toSet
    // phase 5 on the driver
    val starters = findSentStarters(starterCounts, counts, sentbreaks)
    Punkt.Params(abbrevs ++ rare,
      findCollocations(collocCounts, counts, starters), starters, ortho)
  }
}
