package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided TPC-H-ish parquet testdata
  * (TESTDATA.md). Every query entry takes `sfDir` so the same code runs
  * at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench) — and, at
  * production scale, any lake path. Narrow `select`s in the queries let
  * Catalyst prune columns down to the parquet scan.
  */
object Tables {
  /** Session configuration every graft entry point needs. Applied by
    * Bench/Verify/test builders — NOT by readers (readers stay
    * side-effect free so a flag never silently leaks into unrelated
    * reads in a shared session). */
  val sessionConf: Map[String, String] = Map(
    // events.parquet carries TIMESTAMP(NANOS); Spark 4 rejects it
    // without the legacy flag (read as raw int64 nanos instead).
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // graft_dot / graft_polyhash / find_islands + the HOF dot-product
    // rewrite rule, installed at session build (see GraftExtensions).
    "spark.sql.extensions" -> "graft.GraftExtensions")

  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` is set
    * in the session (apply [[sessionConf]] to the session builder, as
    * Bench/Verify/Plans and the test base do; this reader stays
    * side-effect free). The raw int64 nanos are truncated to a
    * microsecond timestamp (matching DuckDB's ns→us cast semantics).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
