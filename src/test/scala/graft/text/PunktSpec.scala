package graft.text

import graft.SparkSpec

/** Pins the punkt sentence-boundary behaviors against the published
  * algorithm (NLTK 3.8.1 punkt.py), each heuristic in BOTH
  * directions where parameters flip the outcome, plus the manifest
  * round-trip and the q62-fixture bridge. */
class PunktSpec extends SparkSpec {

  private val empty = Punkt.Params()

  test("plain word+period breaks; word_tokenize splits final periods per sentence") {
    assert(Punkt.sentences("Hi there. Bye.", empty) == Seq("Hi there.", "Bye."))
    // the exact W3 residue class documented in Treebank.scala: the
    // single-pass tokenizer keeps "there." glued; punkt+treebank splits
    assert(Punkt.wordTokenize("Hi there. Bye.", empty).toSeq ==
      Seq("Hi", "there", ".", "Bye", "."))
    assert(Treebank.tokenize("Hi there. Bye.").toSeq ==
      Seq("Hi", "there.", "Bye", "."))
  }

  test("abbreviation table: known abbrev does not break, unknown does") {
    val text = "He met Dr. Smith. Then left."
    assert(Punkt.sentences(text, Punkt.Params(abbrevTypes = Set("dr"))) ==
      Seq("He met Dr. Smith.", "Then left."))
    assert(Punkt.sentences(text, empty) ==
      Seq("He met Dr.", "Smith.", "Then left."))
    // dash-compound lookup: final segment in the table suffices
    assert(Punkt.sentences("See co-op. next", Punkt.Params(abbrevTypes = Set("op")))
      == Seq("See co-op. next"))
  }

  test("orthographic heuristic flips an abbreviation-final break both ways") {
    val text = "Snakes etc. Are dangerous."
    val abbrev = Set("etc")
    // "are" was seen lowercase (ORTHO_LC) and never capitalized
    // mid-sentence → a capitalized occurrence IS a sentence start
    val breaks = Punkt.Params(abbrevTypes = abbrev,
      orthoContext = Map("are" -> (Punkt.OrthoBegLc | Punkt.OrthoUnkLc)))
    assert(Punkt.sentences(text, breaks) == Seq("Snakes etc.", "Are dangerous."))
    // "are" seen capitalized mid-sentence (ORTHO_MID_UC) → capital is
    // no evidence, abbrev wins
    val glues = Punkt.Params(abbrevTypes = abbrev,
      orthoContext = Map("are" -> Punkt.OrthoMidUc))
    assert(Punkt.sentences(text, glues) == Seq(text))
    // no ortho evidence at all → abbrev wins too
    assert(Punkt.sentences(text, Punkt.Params(abbrevTypes = abbrev)) == Seq(text))
  }

  test("frequent-sentence-starter table breaks after an abbreviation") {
    val text = "Snakes etc. The rest followed."
    val base = Punkt.Params(abbrevTypes = Set("etc"))
    assert(Punkt.sentences(text, base) == Seq(text))
    assert(Punkt.sentences(text, base.copy(sentStarters = Set("the"))) ==
      Seq("Snakes etc.", "The rest followed."))
    // starter evidence requires a capitalized occurrence
    assert(Punkt.sentences("Snakes etc. the rest followed.",
      base.copy(sentStarters = Set("the"))) ==
      Seq("Snakes etc. the rest followed."))
  }

  test("initials and ordinals reclassify as abbreviations") {
    // initial before a capitalized unknown word: no break (J. Bach rule)
    assert(Punkt.sentences("Then J. Smith arrived today.", empty) ==
      Seq("Then J. Smith arrived today."))
    // initial before a word known to occur lowercase → break stands
    assert(Punkt.sentences("Then J. Smith arrived today.",
      Punkt.Params(orthoContext = Map("smith" -> Punkt.OrthoBegLc))) ==
      Seq("Then J.", "Smith arrived today."))
    // ordinal before a lowercase word: no break
    assert(Punkt.sentences("See page 3. next line here.", empty) ==
      Seq("See page 3. next line here."))
    // ordinal before an unknown capitalized word: break stands
    assert(Punkt.sentences("See page 3. Next line here.", empty) ==
      Seq("See page 3.", "Next line here."))
  }

  test("collocation table glues across a non-abbrev period") {
    val text = "We climbed mount. Everest slowly."
    assert(Punkt.sentences(text, empty) ==
      Seq("We climbed mount.", "Everest slowly."))
    assert(Punkt.sentences(text,
      Punkt.Params(collocations = Set(("mount", "everest")))) == Seq(text))
  }

  test("boundary realignment folds trailing closers onto the sentence") {
    assert(Punkt.sentences("He said \"Go.\" Then left.", empty) ==
      Seq("He said \"Go.\"", "Then left."))
    assert(Punkt.wordTokenize("He said \"Go.\" Then left.", empty).toSeq ==
      Seq("He", "said", "``", "Go", ".", "''", "Then", "left", "."))
  }

  test("ellipsis does not break without orthographic evidence; ? and ! break") {
    assert(Punkt.sentences("Well... maybe so.", empty) == Seq("Well... maybe so."))
    assert(Punkt.sentences("Stop! Now. Go? Yes.", empty) ==
      Seq("Stop!", "Now.", "Go?", "Yes."))
  }

  test("q62 fixture bridge: single-sentence raw form is punkt-invariant") {
    // q62's raw construction ends in exactly one sentence-final period,
    // so word_tokenize == plain Treebank there — the property that
    // keeps q62's oracle valid alongside q126's multi-sentence one
    val raw = "\"key agg row scan slow can't stop, really... (wow)."
    assert(Punkt.wordTokenize(raw, empty).toSeq == Treebank.tokenize(raw).toSeq)
  }

  test("trainer: q126 corpus learns exactly the fixture's tables") {
    // the corpus is CONSTRUCTED so each Kiss & Strunk statistic lands
    // on the intended side of its threshold — assert entry-by-entry
    val p = PunktTrainer.trainScalar(
      TextAnalysis.punktTrainingCorpus, includeAllCollocs = true)
    // dr: always period-final, 4 occurrences, Dunning score >= 0.3
    assert(p.abbrevTypes == Set("dr"),
      s"abbrevs ${p.abbrevTypes} — mount/blick must stay below threshold")
    // mount. Everest recurs (collocation LL >= 7.88); dr Smith rides
    // along under INCLUDE_ALL_COLLOCS (harmless: same glue decision
    // the abbreviation already makes)
    assert(p.collocations.contains(("mount", "everest")), s"${p.collocations}")
    assert(p.collocations.subsetOf(Set(("mount", "everest"), ("dr", "smith"))),
      s"unexpected collocations: ${p.collocations}")
    // zonk clears the starter LL floor (30); everest (4 post-break
    // occurrences) must NOT — else the collocation above dies
    assert(p.sentStarters == Set("zonk"), s"starters ${p.sentStarters}")
    // smith: capitalized mid-sentence and after the abbreviation,
    // never lowercase, never sentence-initial
    assert(p.orthoContext("smith") == (Punkt.OrthoMidUc | Punkt.OrthoUnkUc),
      s"smith ortho ${p.orthoContext.get("smith")}")
    // the trained model drives the fixture decisions the q126 oracle
    // assumes
    assert(Punkt.sentences("Dr. Smith waved indeed. J. kept mount. Everest finale.", p)
      == Seq("Dr. Smith waved indeed.", "J. kept mount. Everest finale."))
  }

  test("trainer: distributed ≡ scalar, and export→ingest ≡ trained") {
    import spark.implicits._
    val corpus = TextAnalysis.punktTrainingCorpus
    val scalarP = PunktTrainer.trainScalar(corpus, includeAllCollocs = true)
    val distP = PunktTrainer.train(spark, spark.createDataset(corpus),
      includeAllCollocs = true)
    assert(distP == scalarP, "distributed training must equal the scalar composition")
    // the manifest surface: a trained model exports and re-ingests
    // losslessly (the in-engine replacement for the pickle export tool)
    val dir = graft.sink.TempDirs.fresh("punkt_train_manifest_").toString
    PunktManifest.export(distP).toDF("kind", "w1", "w2", "flags")
      .repartition(2).write.mode("overwrite").json(dir)
    assert(PunktManifest.ingest(spark, dir) == distP)
  }

  test("trainer: abbreviation scoring follows the Dunning formula") {
    // hand-checkable micro-corpus: "qv." 4x period-final among 12
    // tokens, 5 period-final total
    val docs = Seq("qv. ana qv. bec qv. ced qv. dex", "ana bec ced dex.")
    val p = PunktTrainer.trainScalar(docs)
    // replay the published formula directly
    val n = 12L; val periodToks = 5L; val cQv = 4L
    val ll = PunktTrainer.dunningLogLikelihood(cQv, periodToks, cQv, n)
    // NLTK: num_nonperiods = len - num_periods + 1 = 2 - 1 + 1 = 2
    val score = ll * math.exp(-2.0) * 1 * 1 // len 2 -> numNonPeriods 2, no bare qv
    assert(score >= PunktTrainer.Abbrev == p.abbrevTypes.contains("qv"),
      s"score $score vs table ${p.abbrevTypes}")
    assert(p.abbrevTypes.contains("qv"), s"qv score $score should clear 0.3")
    // dex. is a single occurrence: ll too small to clear the bar
    assert(!p.abbrevTypes.contains("dex"))
  }

  test("manifest round-trip rebuilds identical Params") {
    import spark.implicits._
    val dir = graft.sink.TempDirs.fresh("graft_punkt_manifest_spec_").toString
    val rows = Seq(
      ("abbrev", "dr", null: String, null: java.lang.Long),
      ("abbrev", "etc", null: String, null: java.lang.Long),
      ("collocation", "mount", "everest", null: java.lang.Long),
      ("sent_starter", "the", null: String, null: java.lang.Long),
      ("ortho", "smith", null: String,
        java.lang.Long.valueOf((Punkt.OrthoMidUc | Punkt.OrthoUnkUc).toLong)))
    rows.toDF("kind", "w1", "w2", "flags").repartition(2)
      .write.mode("overwrite").json(dir)
    val got = PunktManifest.ingest(spark, dir)
    assert(got == Punkt.Params(
      abbrevTypes = Set("dr", "etc"),
      collocations = Set(("mount", "everest")),
      sentStarters = Set("the"),
      orthoContext = Map("smith" -> (Punkt.OrthoMidUc | Punkt.OrthoUnkUc))))
  }

  test("committed export-format manifest ingests and drives segmentation") {
    // src/test/resources/punkt/english_sample.jsonl is a COMMITTED
    // artifact in tools/export_punkt_manifest.py's exact output format
    // (json.dumps rows, kind-grouped in export order, sorted within
    // kinds) mirroring stock-English entries — so the export→ingest
    // schema contract is pinned by a file, not by construction.
    val path = "src/test/resources/punkt/english_sample.jsonl"

    // artifact format: every line is one of the three export row
    // shapes, and kinds appear in the export's emission order
    val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
    val kindOrder = Seq("abbrev", "collocation", "sent_starter", "ortho")
    val kinds = lines.map(_.split("\"")(3))
    assert(kinds.distinct == kindOrder, s"kind grouping: ${kinds.distinct}")
    lines.foreach { l =>
      val keys = "\"(\\w+)\":".r.findAllMatchIn(l).map(_.group(1)).toSeq
      assert(keys == Seq("kind", "w1") || keys == Seq("kind", "w1", "w2") ||
        keys == Seq("kind", "w1", "flags"), s"unexpected row shape: $l")
    }

    val p = PunktManifest.ingest(spark, path)
    assert(p.abbrevTypes.size == 29 && p.collocations.size == 4 &&
      p.sentStarters.size == 8 && p.orthoContext.size == 8,
      s"table sizes: ${p.abbrevTypes.size}/${p.collocations.size}/" +
        s"${p.sentStarters.size}/${p.orthoContext.size}")
    assert(p.abbrevTypes.contains("dr") && p.abbrevTypes.contains("u.s"))
    assert(p.collocations.contains(("mt", "everest")))
    assert(p.sentStarters.contains("however"))
    assert(p.orthoContext("smith") == (Punkt.OrthoMidUc | Punkt.OrthoUnkUc))

    // and the ingested tables are live in the algorithm: the stock
    // abbrev entry suppresses the break the empty model makes
    assert(Punkt.sentences("He met Dr. Smith. Then left.", p) ==
      Seq("He met Dr. Smith.", "Then left."))
    assert(Punkt.sentences("He met Dr. Smith. Then left.", empty) ==
      Seq("He met Dr.", "Smith.", "Then left."))
  }
}
