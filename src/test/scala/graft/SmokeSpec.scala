package graft

/** Driver-contract invariants: entry smoke, oracle key discipline,
  * and every declared query runs at sf0.001. */
class SmokeSpec extends SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries run at sf0.001 and have stable schemas") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, Sf0001)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }
}
