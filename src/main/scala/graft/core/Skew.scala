package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (builder brief: "salting for skew, AQE
  * for runtime re-plan").
  *
  * AQE's skew-join split (on by default in Spark 4) is the first line
  * of defense — it re-splits oversized shuffle partitions at runtime
  * and needs no code. Salting is the second line, for the case AQE
  * can't fix: a SINGLE join key whose rows exceed one executor's
  * memory (the reference's analogue: a viral channel's videos, one
  * model's 73k score rows). Manual salting becomes necessary when a
  * single-key hash partition can't be split because the key is the
  * partition.
  *
  * [[saltedJoin]] spreads each skewed-side key over `salt` synthetic
  * sub-keys and replicates the small side once per sub-key: the join
  * stays an equi-join on (key, salt) — `salt×` small-side duplication
  * buys `salt×` parallelism on the hot key. Correct for inner and
  * left-outer joins of a skewed LEFT side against a replicable RIGHT
  * side.
  */
object Skew {

  /** Inner equi-join with the left side salted over `salt` sub-keys.
    * Right side is replicated `salt` times (keep it the smaller
    * input). Result equals `left.join(right, keys, "inner")` row-for-
    * row; SkewSpec pins that. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedLeft = left.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Salted groupBy-count: partial aggregate on (key, salt), then the
    * salt dimension folds away in a second, tiny aggregate — the
    * two-phase rewrite for a skewed heavy-hitter aggregation. */
  def saltedCount(df: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("__salt", (rand(seed = 42) * salt).cast("int"))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum("__partial").as("n"))
  }
}
