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
  /** events.parquet has shipped `ts` under two physical shapes across
    * testdata generations: TIMESTAMP(NANOS) — which Spark 4 surfaces as
    * a raw int64 (nanos) only when `spark.sql.legacy.parquet.nanosAsLong
    * =true` is set, see [[sessionConf]] — and plain timestamp[us]. The
    * reference survives exactly this kind of drift by inspecting the
    * live schema before reading (reference `inspect_schema.py:1-30`,
    * `build_islands_from_scores.py:179-226`), so dispatch on the actual
    * `ts` dataType instead of assuming one generation:
    *   - LongType        → nanos-as-long file: truncate to microseconds
    *     (matches DuckDB's ns→us cast semantics).
    *   - any timestamp   → already micros: normalize to session-TZ
    *     TimestampType so downstream date/window logic sees one type.
    * The reader stays side-effect free; [[sessionConf]] keeps
    * `nanosAsLong` so BOTH generations remain readable in one session.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      // integral DIV, not `/`: int64 nanos exceed double's 53-bit mantissa
      case LongType                          => timestamp_micros(expr("ts DIV 1000"))
      case TimestampType | TimestampNTZType  => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.parquet: unsupported physical type for ts: $other")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
