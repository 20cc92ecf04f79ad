package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join/aggregate equivalence with the plain forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain inner join on a skewed key") {
    // one hot key (90% of rows) + a tail
    val left = spark.range(0, 2000)
      .select(when($"id" < 1800, 7L).otherwise($"id" % 50).as("k"), $"id".as("v"))
    val right = Seq((7L, "hot"), (3L, "cold"), (11L, "mild")).toDF("k", "label")
    val plain = left.join(right, Seq("k")).groupBy($"k", $"label")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
      .groupBy($"k", $"label").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
  }

  test("saltedCount == plain groupBy count") {
    val df = spark.range(0, 5000)
      .select(when($"id" < 4000, 1L).otherwise($"id" % 13).as("k"))
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedCount(df, Seq("k"), salt = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
