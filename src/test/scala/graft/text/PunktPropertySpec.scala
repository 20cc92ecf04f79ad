package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Holds the WHOLE punkt boundary decision table, not just PunktSpec's
  * hand cases: an independent model of the documented table (NLTK
  * 3.8.1 punkt.py §§4.1.2/4.2/4.3 + the ortho heuristic) is evaluated
  * over the FULL cartesian product of candidate kind (abbrev-word ∪
  * initial ∪ ordinal ∪ plain) × next-word casing × every combination
  * of the learned-table bits (abbrev membership, collocation,
  * sentence-starter, all 64 ortho flag subsets) and asserted against
  * the real tokenizer's sentence split — 4096 exhaustive cases, so
  * the class of edge interactions (e.g. an initial whose base is ALSO
  * in the abbreviation table, under an ortho context that says
  * "sentence starter") is held by enumeration, not by the luck of
  * hand-picked rows. A ScalaCheck property then pins that the
  * decision depends ONLY on those coordinates: random alphabetic
  * filler words around the candidate never flip the split. */
class PunktPropertySpec extends AnyFunSuite {

  private final case class Case(kind: String, upper: Boolean,
                                abbrevBit: Boolean, collocBit: Boolean,
                                starterBit: Boolean, oc: Int) {
    // candidate token with its period, and the table keys punkt uses
    val t1: String = kind match {
      case "abbrev"  => "Dr."    // exercises the case-folding lookup
      case "initial" => "J."
      case "ordinal" => "3."
      case _         => "went."
    }
    val baseKey: String = kind match {
      case "abbrev" => "dr"; case "initial" => "j"
      case "ordinal" => "3"; case _ => "went"
    }
    val typKey: String = if (kind == "ordinal") "##number##" else baseKey
    val w2: String = if (upper) "Smith" else "smith"
    def params: Punkt.Params = Punkt.Params(
      abbrevTypes = if (abbrevBit) Set(baseKey) else Set.empty,
      collocations = if (collocBit) Set((typKey, "smith")) else Set.empty,
      sentStarters = if (starterBit) Set("smith") else Set.empty,
      orthoContext = Map("smith" -> oc))
  }

  /** The decision table, re-derived from the published algorithm —
    * NOT a call into Punkt's internals, so a bug there cannot satisfy
    * itself here. Returns whether punkt breaks between t1 and w2. */
  private def modelBreak(c: Case): Boolean = {
    import Punkt.{OrthoLc, OrthoUc, OrthoMidUc, OrthoBegLc}
    val isInitial = c.kind == "initial"
    val isNumber = c.kind == "ordinal"
    // first pass: abbreviation-table membership decides abbr-vs-break
    val abbr = c.abbrevBit
    // [4.1.2] known collocation across the period rescues ANY kind
    if (c.collocBit) return false
    // the ortho heuristic on the next word (never punctuation here)
    val ortho: Option[Boolean] =
      if (c.upper && (c.oc & OrthoLc) != 0 && (c.oc & OrthoMidUc) == 0)
        Some(true)
      else if (!c.upper && ((c.oc & OrthoUc) != 0 || (c.oc & OrthoBegLc) == 0))
        Some(false)
      else None
    // [4.2] an abbreviation (non-initial) may still end the sentence
    if (abbr && !isInitial) {
      if (ortho.contains(true)) return true
      if (c.upper && c.starterBit) return true
    }
    // [4.3] initials and ordinals reclassify as abbreviations
    if (isInitial || isNumber) {
      ortho match {
        case Some(false) => return false
        case None if isInitial && c.upper && (c.oc & OrthoLc) == 0 =>
          return false
        case _ => ()
      }
    }
    !abbr
  }

  private def observedBreak(c: Case, pre: String = "We saw",
                            post: String = "today."): Boolean = {
    val got = Punkt.sentences(s"$pre ${c.t1} ${c.w2} $post", c.params)
    val broke = Seq(s"$pre ${c.t1}", s"${c.w2} $post")
    val glued = Seq(s"$pre ${c.t1} ${c.w2} $post")
    assert(got == broke || got == glued, s"unexpected split $got for $c")
    got == broke
  }

  test("exhaustive decision table: 4 kinds x 2 casings x all table-bit combinations") {
    val cases = for {
      kind <- Seq("abbrev", "initial", "ordinal", "plain")
      upper <- Seq(true, false)
      ab <- Seq(true, false)
      co <- Seq(true, false)
      st <- Seq(true, false)
      oc <- 0 until 64 map (_ << 1) // the six _ORTHO_* bits
    } yield Case(kind, upper, ab, co, st, oc)
    assert(cases.size == 4096)
    val bad = cases.filter(c => observedBreak(c) != modelBreak(c))
    assert(bad.isEmpty,
      s"${bad.size} divergent cases, first: ${bad.headOption}")
    // the fixture matrix is not degenerate: both outcomes occur in bulk
    val breaks = cases.count(modelBreak)
    assert(breaks > 500 && cases.size - breaks > 500, s"breaks=$breaks")
  }

  test("property: surrounding filler words never flip the boundary decision") {
    val word = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genCase = for {
      kind <- Gen.oneOf("abbrev", "initial", "ordinal", "plain")
      upper <- Gen.oneOf(true, false)
      ab <- Gen.oneOf(true, false)
      co <- Gen.oneOf(true, false)
      st <- Gen.oneOf(true, false)
      oc <- Gen.choose(0, 63).map(_ << 1)
      pre1 <- word; pre2 <- word; post <- word
    } yield (Case(kind, upper, ab, co, st, oc), s"The $pre1 $pre2", s"$post today.")
    val prop = Prop.forAll(genCase) { case (c, pre, post) =>
      observedBreak(c, pre, post) == modelBreak(c)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
