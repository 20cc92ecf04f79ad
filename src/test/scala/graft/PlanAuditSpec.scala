package graft

/** Whole-catalog physical-plan audit: the properties the 100 TB design
  * claims everywhere, asserted mechanically over EVERY query entry
  * rather than spot-checked in PLANS.md.
  *
  *  - No `CartesianProduct` operator anywhere. Intended small-side
  *    cross products (q11's status universe, q31's query set) plan as
  *    BroadcastNestedLoopJoin over a broadcast handful of rows — a
  *    cartesian in the plan means a join lost its keys.
  *  - Column pruning reaches the parquet scans: a narrow projection
  *    must not drag unused table columns through the scan.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — a join lost its keys")
      graft.core.Resources.release()
    }
  }

  test("column pruning reaches the scan (representative narrow queries)") {
    // q22 touches only doc_id+text of documents(doc_id, text, lang,
    // source, n_chars); q02 only o_custkey+o_orderdate of orders.
    val q22 = graft.text.TextAnalysis.qTokenCounts(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!q22.contains("n_chars") && !q22.contains("lang"),
      s"q22 scan failed to prune unused document columns:\n$q22")
    val q02 = graft.queries.Relational.q02LastOrderPerCustomer(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!q02.contains("o_comment") && !q02.contains("o_totalprice"),
      s"q02 scan failed to prune unused order columns:\n$q02")
  }
}
