package graft.survey

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}

/** Port of the reference's LLM answer parsing
  * (run_8values_survey.py:218-262): pull a JSON object out of the raw
  * text (DOTALL `\{.*\}`), prefer its "answer" field (label match, then
  * bare digit 1-5), else scan the whole raw text for a label —
  * longest-normalized-label first so "Strongly Agree" isn't swallowed
  * by "Agree". Parse rules are behavior: ported exactly, including the
  * greedy JSON regex and label normalization (lowercase, strip
  * whitespace, drop '/').
  */
object AnswerParser {

  /** The fixed 5-option Likert scale (setup_8values.py:208-214);
    * option_id == sort_order. */
  val Options: Seq[(Int, String, Double)] = Seq(
    (1, "Strongly Agree", 1.0),
    (2, "Agree", 0.5),
    (3, "Neutral/Unsure", 0.0),
    (4, "Disagree", -0.5),
    (5, "Strongly Disagree", -1.0))

  final case class Parsed(optionId: Option[Int], multiplier: Option[Double],
                          confidence: Option[Double], reason: Option[String])

  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  private def norm(s: String): String =
    wsRun.matcher(s.toLowerCase(java.util.Locale.ROOT)).replaceAll("").replace("/", "")

  // Normalized labels, longest first (stable order for equal lengths —
  // mirrors Python's stable sort over insertion order).
  private val labelsByLen: Seq[(String, (Int, Double))] =
    Options.map { case (id, label, mult) => (norm(label), (id, mult)) }
      .sortBy { case (k, _) => -k.length }

  private val jsonObj = "(?s)\\{.*\\}".r
  private val bareDigit = "\\b([1-5])\\b".r
  // FAIL_ON_TRAILING_TOKENS matches Python json.loads, which rejects
  // trailing content (run_8values_survey.py:228-233): a greedy `{.*}`
  // capture spanning TWO json objects must fall through to the
  // label-scan path, exactly like the reference.
  private val mapper = new ObjectMapper()
    .enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  private def matchLabel(text: String): Option[(Int, Double)] = {
    val key = norm(text)
    labelsByLen.collectFirst { case (lbl, v) if lbl.nonEmpty && key.contains(lbl) => v }
  }

  def parse(raw: String): Parsed = {
    var answer: Option[String] = None
    var confidence: Option[Double] = None
    var reason: Option[String] = None
    jsonObj.findFirstIn(raw).foreach { js =>
      try {
        val node = mapper.readTree(js)
        if (node.hasNonNull("answer")) answer = Some(node.get("answer").asText)
        if (node.hasNonNull("confidence")) confidence = Some(node.get("confidence").asDouble)
        if (node.hasNonNull("reason")) reason = Some(node.get("reason").asText)
      } catch { case _: Exception => () }
    }
    answer match {
      case Some(a) =>
        matchLabel(a) match {
          case Some((id, m)) => return Parsed(Some(id), Some(m), confidence, reason)
          case None =>
            bareDigit.findFirstMatchIn(a).foreach { m =>
              val (id, mult) = {
                val o = m.group(1).toInt
                (o, Options(o - 1)._3)
              }
              return Parsed(Some(id), Some(mult), confidence, reason)
            }
        }
      case None => ()
    }
    matchLabel(raw) match {
      case Some((id, m)) => Parsed(Some(id), Some(m), confidence, reason)
      case None => Parsed(None, None, confidence, reason)
    }
  }
}
