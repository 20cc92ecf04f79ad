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

  /** The `ReadSchema:` struct of every FileSourceScan in the executed
    * plan — pruning assertions anchor HERE, not on raw substring
    * matches over the whole plan string (where any operator name or
    * codegen id containing the column name would fail or mask the
    * test spuriously). */
  private def readSchemas(plan: String): Seq[String] =
    """ReadSchema: (struct<[^\n]*)""".r.findAllMatchIn(plan).map(_.group(1)).toSeq

  test("column pruning reaches the scan (representative narrow queries)") {
    // q22 touches only doc_id+text of documents(doc_id, text, lang,
    // source, n_chars); q02 only o_custkey+o_orderdate of orders.
    val q22 = readSchemas(graft.text.TextAnalysis.qTokenCounts(spark, Sf0001)
      .queryExecution.executedPlan.toString)
    assert(q22.nonEmpty, "q22 plan shows no FileSourceScan ReadSchema")
    q22.foreach(sch => assert(!sch.contains("n_chars") && !sch.contains("lang:"),
      s"q22 scan failed to prune unused document columns: $sch"))
    val q02 = readSchemas(graft.queries.Relational.q02LastOrderPerCustomer(spark, Sf0001)
      .queryExecution.executedPlan.toString)
    assert(q02.nonEmpty, "q02 plan shows no FileSourceScan ReadSchema")
    q02.foreach(sch => assert(!sch.contains("o_comment") && !sch.contains("o_totalprice"),
      s"q02 scan failed to prune unused order columns: $sch"))
  }

  /** The `PushedFilters:` list of every FileSourceScan — same
    * anchoring rationale as [[readSchemas]]. */
  private def pushedFilters(plan: String): Seq[String] =
    """PushedFilters: \[([^\]]*)\]""".r.findAllMatchIn(plan).map(_.group(1)).toSeq

  test("predicate pushdown reaches the parquet scan (anchored PushedFilters)") {
    // q56 scopes nation to GERMANY before its semi-join cascade: the
    // literal must land in the nation scan's PushedFilters (parquet
    // row-group pruning), not survive only as a post-scan Filter.
    val plan = graft.queries.Lifecycle.qFixtureDump(spark, Sf0001)
      .queryExecution.executedPlan.toString
    val pushed = pushedFilters(plan)
    assert(pushed.exists(_.contains("EqualTo(n_name,GERMANY)")),
      s"n_name filter not pushed to the nation scan; PushedFilters = $pushed")
    graft.core.Resources.release()
  }

  test("q137 broadcasts the component map; the corpus never sort-merge joins") {
    // The leakage-safe split's 100 TB claim: the tiny component map
    // broadcasts onto the doc_id projection — a SortMergeJoin would
    // mean the corpus shuffles for a metadata assignment.
    val plan = graft.dedup.Dedup.qLeakageSafeSplit(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "q137 must broadcast the component map")
    assert(!plan.contains("SortMergeJoin"),
      "q137 shuffles the corpus through a SortMergeJoin")
    graft.core.Resources.release()
  }

  test("bounded-count-table queries broadcast their scoring joins (q96/q102)") {
    // The 100 TB story of q96/q102 is that hashing bounds the count
    // table, so the corpus-side scoring join must plan as a broadcast —
    // a SortMergeJoin there means the gram stream shuffles on the
    // bucket key, exactly what the design forbids.
    Seq(
      "q96" -> graft.text.TextAnalysis.qImportanceWeights(spark, Sf0001),
      "q102" -> graft.text.TextAnalysis.qSourceDrift(spark, Sf0001)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$name plans no broadcast for its bounded count table")
      assert(!plan.contains("SortMergeJoin"),
        s"$name shuffles the gram stream through a SortMergeJoin")
      graft.core.Resources.release()
    }
  }
}
