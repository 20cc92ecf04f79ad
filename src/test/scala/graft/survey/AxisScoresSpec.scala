package graft.survey

import graft.SparkSpec

/** FIXTURES.md §6 axis-scoring fixture (compute_axis_scores,
  * run_8values_survey.py:306-324). */
class AxisScoresSpec extends SparkSpec {
  import spark.implicits._

  test("weighted axis percentages with failed->0 and max=0 axis") {
    // 3 questions: econ effects {+10,-5,0}; dipl all 0 (max=0 -> 50.0);
    // multipliers {1.0, 0.5, null(failed)}
    val questions = Seq(
      (0L, 10, 0, 1, 2), (1L, -5, 0, 3, 4), (2L, 0, 0, 5, 6))
      .toDF("question_id", "effect_econ", "effect_dipl", "effect_govt", "effect_scty")
    val responses = Seq(
      (7L, 0L, Some(1.0)), (7L, 1L, Some(0.5)), (7L, 2L, None))
      .toDF("run_id", "question_id", "multiplier")
    val out = Survey.axisScores(responses, questions).collect()
    assert(out.length == 1)
    val r = out.head
    // raw_econ = 10*1 + (-5)*0.5 = 7.5; max_econ = 15
    // pct = 100*(15+7.5)/30 = 75.0
    assert(r.getAs[Double]("pct_econ") == 75.0)
    assert(r.getAs[Double]("pct_dipl") == 50.0)
    assert(r.getAs[Long]("n_answered") == 2L)
    assert(r.getAs[Long]("n_failed") == 1L)
  }

  test("all-neutral run scores 50 on every axis") {
    val questions = Seq((0L, 10, 4, 1, 2), (1L, -5, 2, 3, 4))
      .toDF("question_id", "effect_econ", "effect_dipl", "effect_govt", "effect_scty")
    val responses = Seq((1L, 0L, Some(0.0)), (1L, 1L, Some(0.0)))
      .toDF("run_id", "question_id", "multiplier")
    val r = Survey.axisScores(responses, questions).collect().head
    assert(r.getAs[Double]("pct_econ") == 50.0)
    assert(r.getAs[Double]("pct_dipl") == 50.0)
  }
}
