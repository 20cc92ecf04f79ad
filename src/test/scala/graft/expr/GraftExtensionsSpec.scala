package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraftExtensions wiring: functions resolve through
  * `spark.sql.extensions` alone (no imperative register in this suite),
  * and DotProductRewrite swaps the HOF dot-product idiom for the
  * codegen'd expression without changing any value, including the HOF
  * chain's null semantics.
  *
  * The `repartition(1)` barriers keep ConvertToLocalRelation (which
  * runs before user-provided rules) from evaluating the tiny literal
  * relations eagerly — at which point there would be no plan left for
  * the rewrite to fire on.
  */
class GraftExtensionsSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  test("extensions-built session resolves graft functions without imperative register") {
    assert(spark.conf.get("spark.sql.extensions") == "graft.GraftExtensions")
    val r = spark.sql(
      "SELECT graft_dot(array(1D,2D), array(3D,4D)) AS d, " +
        "graft_polyhash('ab', 257L, 1000003L) AS h").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == (97L * 257 + 98) % 1000003L)
    val isl = spark.sql(
      "SELECT i.* FROM (SELECT array(0D,1D,1D,1D,0D) AS a) " +
        "LATERAL VIEW find_islands(a, 0.5D, 2) i").collect()
    assert(isl.map(x => (x.getInt(0), x.getInt(1))).toSeq == Seq((1, 3)))
    val bg = spark.sql("SELECT graft_bigram_codes('abc') AS c").head()
      .getSeq[Long](0)
    assert(bg == Seq(('a'.toLong << 21) + 'b', ('b'.toLong << 21) + 'c'))
  }

  test("DotProductRewrite turns the HOF fold into codegen'd graft_dot") {
    import spark.implicits._
    val df = spark.range(3)
      .select(array($"id".cast("double"), lit(2.0)).as("a"),
              array(lit(3.0), $"id".cast("double")).as("b"))
      .repartition(1)
      .select(expr(hofDot).as("d"), $"a", $"b")
    val opt = df.queryExecution.optimizedPlan
    assert(opt.expressions.exists(_.exists(_.isInstanceOf[DotProduct])), opt.toString)
    // dot([id,2],[3,id]) = 3*id + 2*id = 5*id; identical to graft_dot
    val got = df.select($"d", expr("graft_dot(a, b)").as("e")).collect()
    assert(got.forall(r => r.getDouble(0) == r.getDouble(1)))
    assert(got.map(_.getDouble(0)).sorted.toSeq == Seq(0.0, 5.0, 10.0))
  }

  test("rewrite preserves HOF null semantics (unequal lengths, null elements)") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0)),
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b").repartition(1)
    val rows = df.select(expr(hofDot).as("d"), expr("graft_dot(a, b)").as("e"))
      .orderBy(expr("coalesce(d, -1D)")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // one of the null rows
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // the other
    assert(rows(2).getDouble(0) == 11.0 && rows(2).getDouble(1) == 11.0)
  }

  test("non-dot-product folds pass through untouched") {
    import spark.implicits._
    val df = Seq(Array(1.0, 2.0)).toDF("a").repartition(1)
      .select(expr("aggregate(a, 0D, (acc, v) -> acc + v)").as("s"))
    assert(!df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProduct])))
    assert(df.head().getDouble(0) == 3.0)
  }
}
