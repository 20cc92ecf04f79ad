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
    // AQE sizes post-shuffle partitions by BYTES, not by the default
    // parallelism (r17, guide §2.2 — Spark's own docs recommend
    // parallelismFirst=false "to respect the configured target
    // size"). Scale-adaptive in both directions: the lake rows'
    // KB-sized micro-batch shuffles collapse to one task instead of
    // #cores tasks (the r17 probe measured per-task DESERIALIZATION
    // dominating those stages — q158: 80 s deser vs 14 s cpu across
    // ~1,100 tiny tasks), while a 100 TB shuffle still fans out to
    // size/advisory (64 MB default) tasks. Overridable per run via
    // SPARK_GRAFT_PARALLELISM_FIRST=true for A/B.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" ->
      sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"),
    // graft_dot / graft_polyhash / find_islands + the HOF dot-product
    // rewrite rule, installed at session build (see GraftExtensions).
    "spark.sql.extensions" -> "graft.GraftExtensions")

  /** Kind-level schema contract, checked on every read (SURVEY §1.3's
    * "explicit StructType, checked on read", generalized from the
    * round-7 events lesson: the driver regenerates the testdata between
    * rounds and physical types DRIFT — ts flipped TIMESTAMP(NANOS) →
    * timestamp[us] and took 11 queries down with an opaque analysis
    * error deep inside the first query that touched it). The contract
    * is deliberately KIND-level, not exact-type: int32 vs int64 or
    * float vs double are Spark-transparent widenings the engine must
    * tolerate (the reference's schema inspection is similarly loose,
    * `inspect_schema.py:21-30`); what it rejects is a KIND flip
    * (string where a number was, decimal where a float was) — the
    * drifts that silently change query semantics. Violations fail AT
    * THE READER with table+column+got/want named, not N operators
    * downstream. Columns beyond the contract are allowed (additive
    * evolution is not drift); missing or kind-flipped ones are not. */
  private def kindOf(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case FloatType | DoubleType                        => "floating"
      case _: DecimalType                                => "decimal"
      case StringType                                    => "string"
      case TimestampType | TimestampNTZType              => "timestamp"
      case DateType                                      => "date"
      case BinaryType                                    => "binary"
      case BooleanType                                   => "boolean"
      case ArrayType(e, _)                               => s"array<${kindOf(e)}>"
      case MapType(k, v, _)                              => s"map<${kindOf(k)},${kindOf(v)}>"
      case _: StructType                                 => "struct"
      case other                                         => other.simpleString
    }
  }

  private def checked(df: DataFrame, table: String,
                      contract: (String, Set[String])*): DataFrame = {
    val live = df.schema.map(f => f.name -> f.dataType).toMap
    val drift = contract.flatMap { case (col, want) =>
      live.get(col) match {
        case None => Some(s"$col: MISSING (want ${want.mkString("|")})")
        case Some(dt) =>
          val got = kindOf(dt)
          if (want.contains(got)) None
          else Some(s"$col: got $got (${dt.simpleString}), want ${want.mkString("|")}")
      }
    }
    if (drift.nonEmpty) throw new IllegalStateException(
      s"$table.parquet schema drift — regenerated testdata changed column kinds; " +
        s"fix the reader or the contract: ${drift.mkString("; ")}")
    df
  }

  private val I = Set("integral")
  private val F = Set("floating")
  private val S = Set("string")
  private val T = Set("timestamp", "date") // both read correctly via cast

  def region(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/region.parquet"), "region",
      "r_regionkey" -> I, "r_name" -> S)
  def nation(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/nation.parquet"), "nation",
      "n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I)
  def customer(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/customer.parquet"), "customer",
      "c_custkey" -> I, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> F, "c_mktsegment" -> S)
  def supplier(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/supplier.parquet"), "supplier",
      "s_suppkey" -> I, "s_name" -> S, "s_nationkey" -> I, "s_acctbal" -> F)
  def part(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/part.parquet"), "part",
      "p_partkey" -> I, "p_name" -> S, "p_brand" -> S, "p_type" -> S,
      "p_size" -> I, "p_retailprice" -> F)
  def orders(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/orders.parquet"), "orders",
      "o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> S,
      "o_totalprice" -> F, "o_orderdate" -> T, "o_orderpriority" -> S)
  def lineitem(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/lineitem.parquet"), "lineitem",
      "l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I,
      "l_linenumber" -> I, "l_quantity" -> F, "l_extendedprice" -> F,
      "l_discount" -> F, "l_tax" -> F, "l_returnflag" -> S,
      "l_linestatus" -> S, "l_shipdate" -> T)
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
    checked(raw, "events",
      "event_id" -> I, "user_id" -> I, "event_type" -> S,
      "value" -> F, "props" -> S,
      "ts" -> Set("integral", "timestamp")).withColumn("ts", ts)
  }
  def documents(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/documents.parquet"), "documents",
      "doc_id" -> I, "text" -> S, "lang" -> S, "source" -> S, "n_chars" -> I)
  def embeddings(s: SparkSession, dir: String): DataFrame =
    checked(s.read.parquet(s"$dir/embeddings.parquet"), "embeddings",
      "vec_id" -> I, "embedding" -> Set("array<floating>"), "label" -> I)
}
