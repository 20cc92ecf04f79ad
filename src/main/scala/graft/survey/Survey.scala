package graft.survey

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** The 8values survey pipeline (SURVEY.md §3.3) re-expressed on the
  * driver testdata: run seeding as dimension cross joins + anti-join
  * idempotence (run_8values_survey.py:468-504), probe templating
  * (build_succinct_probes.py:25-38), answer parsing (AnswerParser), and
  * the 4-axis weighted scoring aggregate (compute_axis_scores,
  * run_8values_survey.py:306-324) — a plain groupBy().agg(), no UDAF.
  *
  * Events play the responses (run ≡ user_id, question ≡ event_id % 70,
  * Likert multiplier from event_type, 'error' = failed) and a
  * 70-question dimension with arithmetic per-axis effects plays the
  * questionnaire. Small dims broadcast; the fact side shuffles once on
  * the run key.
  */
object Survey {

  val NumQuestions = 70

  /** The derived question dimension: q ∈ [0,70) with deterministic
    * per-axis effects in [-10, 10]. */
  def questionDim(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(NumQuestions).toDF("question_id")
      .withColumn("effect_econ", ($"question_id" * 7) % 21 - 10)
      .withColumn("effect_dipl", ($"question_id" * 11) % 21 - 10)
      .withColumn("effect_govt", ($"question_id" * 13) % 21 - 10)
      .withColumn("effect_scty", ($"question_id" * 17) % 21 - 10)
  }

  private val questionDimSql: String =
    s"""SELECT i AS question_id,
        (i * 7) % 21 - 10 AS effect_econ, (i * 11) % 21 - 10 AS effect_dipl,
        (i * 13) % 21 - 10 AS effect_govt, (i * 17) % 21 - 10 AS effect_scty
        FROM (SELECT unnest(generate_series(0, ${NumQuestions - 1})) AS i) g"""

  /** A9+A10 core (compute_axis_scores, run_8values_survey.py:306-324):
    * per-run 4-axis scores from a responses fact (run_id, question_id,
    * multiplier — null = failed) and a question dim. Reference
    * semantics: failed counts as Neutral 0 in raw but every question's
    * |effect| counts in max; max sums |effect| over ALL questions
    * (a per-axis constant); pct = 100·(max+raw)/(2·max), 50 when
    * max = 0; answered = total questions − failed. Multipliers are
    * exact halves and effects ints, so raw/max are float-exact; pct is
    * one IEEE division on identical operands in both engines — no
    * rounding needed. Plain groupBy().agg(), no UDAF. */
  def axisScores(responses: DataFrame, questions: DataFrame): DataFrame = {
    val s = responses.sparkSession
    import s.implicits._
    // total question count and per-axis |effect| sums are one broadcast
    // aggregate — no driver-side action during plan construction.
    val maxes = questions.agg(
      sum(abs($"effect_econ")).as("max_econ"), sum(abs($"effect_dipl")).as("max_dipl"),
      sum(abs($"effect_govt")).as("max_govt"), sum(abs($"effect_scty")).as("max_scty"),
      count(lit(1)).as("total_q"))
    def pct(raw: String, mx: String) =
      when(col(mx) === 0, 50.0).otherwise(
        (lit(100.0) * (col(mx).cast("double") + col(raw))) / (lit(2.0) * col(mx).cast("double")))
    responses.join(broadcast(questions), Seq("question_id"))
      .groupBy($"run_id")
      .agg(
        sum($"effect_econ" * coalesce($"multiplier", lit(0.0))).as("raw_econ"),
        sum($"effect_dipl" * coalesce($"multiplier", lit(0.0))).as("raw_dipl"),
        sum($"effect_govt" * coalesce($"multiplier", lit(0.0))).as("raw_govt"),
        sum($"effect_scty" * coalesce($"multiplier", lit(0.0))).as("raw_scty"),
        sum(when($"multiplier".isNull, 1).otherwise(0)).as("n_failed"))
      .crossJoin(broadcast(maxes))
      .select($"run_id",
        pct("raw_econ", "max_econ").as("pct_econ"),
        pct("raw_dipl", "max_dipl").as("pct_dipl"),
        pct("raw_govt", "max_govt").as("pct_govt"),
        pct("raw_scty", "max_scty").as("pct_scty"),
        ($"total_q" - $"n_failed").as("n_answered"),
        $"n_failed")
  }

  /** axisScores over the events-derived responses (run ≡ user, first
    * response per question wins, 'error' → failed). */
  def qAxisScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstResponse = Tables.events(s, dir)
      .withColumn("question_id", $"event_id" % NumQuestions)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"question_id").orderBy($"event_id")))
      .filter($"rn" === 1)
      .withColumn("multiplier",
        when($"event_type" === "purchase", 1.0)
          .when($"event_type" === "click", 0.5)
          .when($"event_type" === "view", 0.0)
          .when($"event_type" === "signup", -0.5)
          .otherwise(lit(null).cast("double")))
      .select($"user_id".as("run_id"), $"question_id", $"multiplier")
    axisScores(firstResponse, questionDim(s))
      .withColumnRenamed("run_id", "user_id")
      .orderBy($"user_id")
  }

  val qAxisScoresSql: String =
    s"""WITH q AS ($questionDimSql),
       resp AS (
         SELECT user_id, question_id, multiplier FROM (
           SELECT user_id, event_id % $NumQuestions AS question_id,
             CAST(CASE event_type WHEN 'purchase' THEN 1.0 WHEN 'click' THEN 0.5
               WHEN 'view' THEN 0.0 WHEN 'signup' THEN -0.5 ELSE NULL END AS DOUBLE) AS multiplier,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_id % $NumQuestions
                                ORDER BY event_id) AS rn
           FROM events) t WHERE rn = 1),
       maxes AS (
         SELECT SUM(ABS(effect_econ)) AS max_econ, SUM(ABS(effect_dipl)) AS max_dipl,
           SUM(ABS(effect_govt)) AS max_govt, SUM(ABS(effect_scty)) AS max_scty,
           COUNT(*) AS total_q
         FROM q),
       raws AS (
         SELECT user_id,
           SUM(effect_econ * COALESCE(multiplier, 0.0)) AS raw_econ,
           SUM(effect_dipl * COALESCE(multiplier, 0.0)) AS raw_dipl,
           SUM(effect_govt * COALESCE(multiplier, 0.0)) AS raw_govt,
           SUM(effect_scty * COALESCE(multiplier, 0.0)) AS raw_scty,
           SUM(CASE WHEN multiplier IS NULL THEN 1 ELSE 0 END) AS n_failed
         FROM resp JOIN q USING (question_id) GROUP BY user_id)
       SELECT user_id,
         CASE WHEN max_econ = 0 THEN 50.0 ELSE (100.0 * (CAST(max_econ AS DOUBLE) + raw_econ)) / (2.0 * CAST(max_econ AS DOUBLE)) END AS pct_econ,
         CASE WHEN max_dipl = 0 THEN 50.0 ELSE (100.0 * (CAST(max_dipl AS DOUBLE) + raw_dipl)) / (2.0 * CAST(max_dipl AS DOUBLE)) END AS pct_dipl,
         CASE WHEN max_govt = 0 THEN 50.0 ELSE (100.0 * (CAST(max_govt AS DOUBLE) + raw_govt)) / (2.0 * CAST(max_govt AS DOUBLE)) END AS pct_govt,
         CASE WHEN max_scty = 0 THEN 50.0 ELSE (100.0 * (CAST(max_scty AS DOUBLE) + raw_scty)) / (2.0 * CAST(max_scty AS DOUBLE)) END AS pct_scty,
         CAST(total_q - n_failed AS BIGINT) AS n_answered,
         CAST(n_failed AS BIGINT) AS n_failed
       FROM raws CROSS JOIN maxes ORDER BY user_id"""

  /** Run seeding (run_8values_survey.py:468-504): runs = subjects ×
    * models × repeats cross join, idempotent re-seed = anti-join
    * against existing runs. Subjects = distinct documents sources,
    * models = distinct langs; "existing" = repeat 0 of sources src0-src9
    * — the pending set the anti-join must reproduce. */
  def qRunSeeding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val subjects = docs.select($"source").distinct()
    val models = docs.select($"lang".as("llm_model")).distinct()
    val repeats = s.range(2).toDF("repeat_index")
    val universe = subjects.crossJoin(broadcast(models)).crossJoin(broadcast(repeats))
    val existing = universe.filter($"repeat_index" === 0 &&
      $"source".isin((0 until 10).map(i => s"src$i"): _*))
    universe.join(existing, Seq("source", "llm_model", "repeat_index"), "left_anti")
      .orderBy($"source", $"llm_model", $"repeat_index")
  }

  val qRunSeedingSql: String =
    """WITH subjects AS (SELECT DISTINCT source FROM documents),
       models AS (SELECT DISTINCT lang AS llm_model FROM documents),
       reps AS (SELECT unnest(generate_series(0, 1)) AS repeat_index),
       universe AS (SELECT source, llm_model, repeat_index
                    FROM subjects CROSS JOIN models CROSS JOIN reps),
       existing AS (SELECT * FROM universe WHERE repeat_index = 0 AND source IN
         ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9'))
       SELECT u.source, u.llm_model, u.repeat_index FROM universe u
       WHERE NOT EXISTS (SELECT 1 FROM existing e
         WHERE e.source = u.source AND e.llm_model = u.llm_model
           AND e.repeat_index = u.repeat_index)
       ORDER BY source, llm_model, repeat_index"""

  /** F14: probe-statement templating (build_succinct_probes.py:25-38) —
    * "I strongly believe that …" / "I strongly oppose the idea that …"
    * over the first 70 part names as stand-in question texts. */
  def qProbeTemplates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables.part(s, dir).filter($"p_partkey" <= NumQuestions)
      .select($"p_partkey".as("question_id"), lower($"p_name").as("qt"))
    val forD = q.select($"question_id", lit("for").as("direction"),
      concat(lit("I strongly believe that "), $"qt").as("statement_text"))
    val against = q.select($"question_id", lit("against").as("direction"),
      concat(lit("I strongly oppose the idea that "), $"qt").as("statement_text"))
    forD.union(against).orderBy($"question_id", $"direction")
  }

  val qProbeTemplatesSql: String =
    s"""SELECT question_id, direction, statement_text FROM (
         SELECT p_partkey AS question_id, 'for' AS direction,
           'I strongly believe that ' || lower(p_name) AS statement_text
         FROM part WHERE p_partkey <= $NumQuestions
         UNION ALL
         SELECT p_partkey, 'against',
           'I strongly oppose the idea that ' || lower(p_name)
         FROM part WHERE p_partkey <= $NumQuestions) t
       ORDER BY question_id, direction"""

  /** F9/O6: AnswerParser over deterministic synthetic LLM outputs (one
    * per event, shape chosen by event_id % 6 to cover the JSON path,
    * bare-digit path, label-scan fallback, longest-label-first rule,
    * and the unparseable/failed path). The oracle computes the expected
    * option straight from the constructor — ground truth by
    * construction, so it checks the parser, not itself. */
  def qParseAnswers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parseUdf = udf { raw: String =>
      AnswerParser.parse(raw).optionId.getOrElse(-1)
    }
    Tables.events(s, dir)
      .withColumn("raw", expr(
        """CASE event_id % 6
           WHEN 0 THEN '{"answer":"Strongly Disagree","confidence":0.9,"reason":"r"}'
           WHEN 1 THEN '{"answer":"3"}'
           WHEN 2 THEN 'I would Agree with that'
           WHEN 3 THEN 'Strongly Agree'
           WHEN 4 THEN 'complete garbage !!'
           ELSE '{"answer":"Disagree"} trailing text' END"""))
      .withColumn("option_id", parseUdf($"raw"))
      .groupBy($"option_id").agg(count(lit(1)).as("n"))
      .orderBy($"option_id")
  }

  val qParseAnswersSql: String =
    """SELECT CASE event_id % 6
         WHEN 0 THEN 5 WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 3 THEN 1
         WHEN 4 THEN -1 ELSE 4 END AS option_id,
       COUNT(*) AS n FROM events GROUP BY 1 ORDER BY option_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_axis_scores" -> qAxisScores,
    "q39_run_seeding" -> qRunSeeding,
    "q40_probe_templates" -> qProbeTemplates,
    "q41_parse_answers" -> qParseAnswers)

  val oracles: Map[String, String] = Map(
    "q38_axis_scores" -> qAxisScoresSql,
    "q39_run_seeding" -> qRunSeedingSql,
    "q40_probe_templates" -> qProbeTemplatesSql,
    "q41_parse_answers" -> qParseAnswersSql)
}
