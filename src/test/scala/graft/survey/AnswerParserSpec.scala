package graft.survey

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §6 parse_answer cases (run_8values_survey.py:222-262). */
class AnswerParserSpec extends AnyFunSuite {
  import AnswerParser.parse

  test("JSON answer with label") {
    val p = parse("""{"answer":"Strongly Disagree","confidence":0.9,"reason":"x"}""")
    assert(p.optionId.contains(5) && p.multiplier.contains(-1.0))
    assert(p.confidence.contains(0.9) && p.reason.contains("x"))
  }

  test("JSON bare digit maps by sort_order") {
    val p = parse("""{"answer":"3"}""")
    assert(p.optionId.contains(3) && p.multiplier.contains(0.0))
  }

  test("no JSON -> label scan in raw text") {
    val p = parse("I would Agree with that statement")
    assert(p.optionId.contains(2) && p.multiplier.contains(0.5))
  }

  test("longest label first: Strongly Agree does not match Agree") {
    assert(parse("Strongly Agree").optionId.contains(1))
    assert(parse("strongly   agree").optionId.contains(1))
    assert(parse("StronglyDisagree!").optionId.contains(5))
  }

  test("Neutral/Unsure matches with slash dropped") {
    assert(parse("neutral/unsure").optionId.contains(3))
    assert(parse("Neutral Unsure").optionId.contains(3))
  }

  test("garbage -> unmatched") {
    val p = parse("complete garbage !!")
    assert(p.optionId.isEmpty && p.multiplier.isEmpty)
  }

  test("malformed JSON falls back to label scan") {
    val p = parse("""{"answer": Disagree,} oops""")
    assert(p.optionId.contains(4))
  }

  test("two JSON objects: greedy capture spans both -> label scan, like json.loads") {
    // The greedy {.*} regex captures both objects; json.loads rejects
    // trailing tokens, so the reference falls through to the raw-text
    // label scan (longest-first) — Jackson must do the same
    // (FAIL_ON_TRAILING_TOKENS), not silently parse the first object.
    val p = parse("""{"answer":"Agree"} {"answer":"Strongly Disagree"}""")
    assert(p.optionId.contains(5))
  }

  test("JSON answer field wins over labels elsewhere in raw") {
    val p = parse("""Agree? no. {"answer":"Strongly Disagree"}""")
    assert(p.optionId.contains(5))
  }

  test("digit inside JSON answer, not stray digits in raw") {
    // confidence digit must not be read as the answer
    val p = parse("""{"answer":"Agree","confidence":4}""")
    assert(p.optionId.contains(2))
  }
}
