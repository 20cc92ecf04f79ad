package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.sink.Sinks

/** Lifecycle operators — the write-side semantics (S11/S13 as pure
  * MERGE algebra), the empty-vs-absent pending contract (P4+J4), the
  * staleness diff (W14), approximate counts (A5), VTT timestamp math
  * (F12), and the channel-scoped fixture dump (S14). Each query is the
  * CORRECTNESS face of a library operator; the file-level round trips
  * live in SinkSpec.
  */
object Lifecycle {

  /** S11/S13 MERGE semantics over the lake (the file-writing form is
    * Sinks.upsertParquet; this exercises the identical algebra the
    * writer stages): updates replace same-keyed rows, new keys insert.
    * Updates batch = every 10th order re-priced; the "exactly one row
    * per key" contract is structural (anti-join + union). */
  def qUpsertMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val existing = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val updates = existing.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"),
        ($"o_totalprice" * 2).as("o_totalprice"))
    Sinks.mergeUpsert(existing, updates, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  val qUpsertMergeSql: String =
    """WITH updates AS (
         SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
         FROM orders WHERE o_orderkey % 10 = 0)
       SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
       UNION ALL SELECT * FROM updates
       ORDER BY o_orderkey"""

  /** P4+J4: the load-bearing pending query with the empty-vs-absent
    * score contract (client:233-246): pending = has-transcript pairs
    * with NO real (size>0) score row. Empty rows model "scored but
    * unusable" — they are re-scored (delete-then-insert replaces them,
    * client:300-305), so they stay pending; the semi leg requires a
    * usable document. Scores fact derived deterministically: doc_id%3=0
    * → real array, %3=1 → empty array, %3=2 → absent. */
  def qPendingWithEmptyScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val scores = docs.filter($"doc_id" % 3 < 2)
      .select($"doc_id", $"source", $"lang",
        when($"doc_id" % 3 === 0,
          expr("sequence(1, cast(doc_id % 5 + 1 as int))"))
          .otherwise(expr("cast(array() as array<int>)")).as("score"))
    val universe = docs.select($"source").distinct()
      .crossJoin(broadcast(docs.select($"lang").distinct()))
    val hasDoc = docs.select($"source", $"lang").distinct()
    val real = scores.filter(size($"score") > 0).select($"source", $"lang").distinct()
    universe
      .join(hasDoc, Seq("source", "lang"), "left_semi")
      .join(real, Seq("source", "lang"), "left_anti")
      .orderBy($"source", $"lang")
  }

  val qPendingWithEmptyScoresSql: String =
    """WITH scores AS (
         SELECT doc_id, source, lang,
           CASE WHEN doc_id % 3 = 0 THEN range(1, CAST(doc_id % 5 + 1 AS INT) + 1)
                ELSE [] END AS score
         FROM documents WHERE doc_id % 3 < 2),
       universe AS (
         SELECT s.source, l.lang
         FROM (SELECT DISTINCT source FROM documents) s
         CROSS JOIN (SELECT DISTINCT lang FROM documents) l)
       SELECT u.source, u.lang FROM universe u
       WHERE EXISTS (SELECT 1 FROM documents d
               WHERE d.source = u.source AND d.lang = u.lang)
         AND NOT EXISTS (SELECT 1 FROM scores sc
               WHERE sc.source = u.source AND sc.lang = u.lang AND len(sc.score) > 0)
       ORDER BY source, lang"""

  /** W13+W14: metadata staleness diff
    * (embed_transcripts_to_vector_db.py:377-423): stored config = first
    * chunk's metadata per source (DISTINCT ON shape); current config =
    * constants; emit sources needing re-embed with the reason. Missing
    * sources (no stored row) count as stale, like the reference's
    * missing-metadata → False. */
  def qStalenessDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    // stored: first doc per source carries the "chunk metadata" the
    // lake was last embedded with (derived deterministically).
    val stored = docs.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"source",
        concat(lit("m"), ($"doc_id" % 2).cast("string")).as("stored_model"),
        when($"doc_id" % 3 === 0, 32).otherwise(64).as("stored_dim"))
    val current = stored
      .withColumn("current_model", lit("m0"))
      .withColumn("current_dim", lit(64))
    current
      .withColumn("stale", $"stored_model" =!= $"current_model" || $"stored_dim" =!= $"current_dim")
      .filter($"stale")
      .select($"source", $"stored_model", $"stored_dim",
        when($"stored_model" =!= $"current_model", "model_changed")
          .otherwise("dim_changed").as("reason"))
      .orderBy($"source")
  }

  val qStalenessDiffSql: String =
    """WITH stored AS (
         SELECT source, 'm' || CAST(doc_id % 2 AS VARCHAR) AS stored_model,
           CASE WHEN doc_id % 3 = 0 THEN 32 ELSE 64 END AS stored_dim
         FROM (SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
               FROM documents) t
         WHERE rn = 1)
       SELECT source, stored_model, stored_dim,
         CASE WHEN stored_model != 'm0' THEN 'model_changed' ELSE 'dim_changed' END AS reason
       FROM stored
       WHERE stored_model != 'm0' OR stored_dim != 64
       ORDER BY source"""

  /** A5: approximate counts (reltuples planner estimate,
    * dashboard.py:146-149). HLL sketches differ across engines, so the
    * oracle-stable output is the CONTRACT — each engine's own
    * approximation lands within 5% of its exact count — plus the exact
    * values. */
  def qApproxCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Pre-aggregate per key first: one map-side-combined shuffle of
    // distinct keys, instead of the Expand(×3) plan Spark builds for
    // mixed distinct/non-distinct aggregates over the raw table.
    val perKey = Tables.orders(s, dir).groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    perKey.agg(
      sum($"n").as("n_rows"),
      count(lit(1)).as("n_custs"),
      (abs(approx_count_distinct($"o_custkey", 0.01) - count(lit(1)))
        <= count(lit(1)) * 0.05).as("approx_within_5pct"))
  }

  val qApproxCountsSql: String =
    """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_custs,
       ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
         <= COUNT(DISTINCT o_custkey) * 0.05 AS approx_within_5pct
       FROM orders"""

  /** F12: VTT cue timestamps (update_missing_transcripts.py:117-123):
    * build `hh:mm:ss.mmm` from the event time-of-day, then parse it
    * back to fractional seconds — both directions as integer/decimal
    * arithmetic identical across engines. */
  def qVttTimestamps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("day_us", $"us" % (86400L * 1000000L))
      .withColumn("h", expr("day_us div 3600000000"))
      .withColumn("m", expr("(day_us % 3600000000) div 60000000"))
      .withColumn("sec", expr("(day_us % 60000000) div 1000000"))
      .withColumn("ms", expr("(day_us % 1000000) div 1000"))
      .withColumn("vtt", concat(
        lpad($"h".cast("string"), 2, "0"), lit(":"),
        lpad($"m".cast("string"), 2, "0"), lit(":"),
        lpad($"sec".cast("string"), 2, "0"), lit("."),
        lpad($"ms".cast("string"), 3, "0")))
    // parse back: split on : and . exactly like parse_vtt_time
    ev.withColumn("parts", split($"vtt", "[:.]"))
      .withColumn("seconds",
        element_at($"parts", 1).cast("long") * 3600 +
          element_at($"parts", 2).cast("long") * 60 +
          element_at($"parts", 3).cast("long") +
          element_at($"parts", 4).cast("long") / lit(1000.0))
      .select($"event_id", $"vtt", $"seconds")
      .orderBy($"event_id")
  }

  val qVttTimestampsSql: String =
    """WITH ev AS (
         SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) % (CAST(86400 AS BIGINT) * 1000000) AS day_us
         FROM events),
       f AS (
         SELECT event_id,
           CAST(day_us // 3600000000 AS BIGINT) AS h,
           CAST((day_us % 3600000000) // 60000000 AS BIGINT) AS m,
           CAST((day_us % 60000000) // 1000000 AS BIGINT) AS sec,
           CAST((day_us % 1000000) // 1000 AS BIGINT) AS ms
         FROM ev),
       v AS (
         SELECT event_id,
           lpad(CAST(h AS VARCHAR), 2, '0') || ':' || lpad(CAST(m AS VARCHAR), 2, '0')
             || ':' || lpad(CAST(sec AS VARCHAR), 2, '0') || '.' || lpad(CAST(ms AS VARCHAR), 3, '0') AS vtt
         FROM f)
       SELECT event_id, vtt,
         CAST(string_split_regex(vtt, '[:.]')[1] AS BIGINT) * 3600 +
         CAST(string_split_regex(vtt, '[:.]')[2] AS BIGINT) * 60 +
         CAST(string_split_regex(vtt, '[:.]')[3] AS BIGINT) +
         CAST(string_split_regex(vtt, '[:.]')[4] AS BIGINT) / 1000.0 AS seconds
       FROM v ORDER BY event_id"""

  /** S14: channel-filtered fixture dump (create_dev_database.py:40-89):
    * scope one "channel" (nation GERMANY) and cascade semi-joins
    * through its dependent tables; emit the per-table row counts of the
    * resulting dev fixture. */
  def qFixtureDump(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nation = Tables.nation(s, dir).filter($"n_name" === "GERMANY")
    val custs = Tables.customer(s, dir)
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey", "left_semi")
    val orders = Tables.orders(s, dir)
      .join(custs.select($"c_custkey"), $"o_custkey" === $"c_custkey", "left_semi")
    val lines = Tables.lineitem(s, dir)
      .join(orders.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_semi")
    custs.agg(count(lit(1)).as("n_customers"))
      .crossJoin(orders.agg(count(lit(1)).as("n_orders")))
      .crossJoin(lines.agg(count(lit(1)).as("n_lineitems")))
  }

  val qFixtureDumpSql: String =
    """SELECT
       (SELECT COUNT(*) FROM customer c JOIN nation n ON c_nationkey = n_nationkey
        WHERE n_name = 'GERMANY') AS n_customers,
       (SELECT COUNT(*) FROM orders o WHERE EXISTS (
          SELECT 1 FROM customer c JOIN nation n ON c_nationkey = n_nationkey
          WHERE n_name = 'GERMANY' AND c.c_custkey = o.o_custkey)) AS n_orders,
       (SELECT COUNT(*) FROM lineitem l WHERE EXISTS (
          SELECT 1 FROM orders o JOIN customer c ON o_custkey = c_custkey
          JOIN nation n ON c_nationkey = n_nationkey
          WHERE n_name = 'GERMANY' AND o.o_orderkey = l.l_orderkey)) AS n_lineitems"""

  /** F10/F11/F13/F15: the string/presentation operators — YouTube URL
    * builder with timestamp (build_islands_from_scores.py:237-241),
    * handle normalization (dashboard.py:250 lstrip('@').strip()),
    * compact number display (dashboard.py:437-448 1.2M/34K), and
    * {{PLACEHOLDER}} prompt templating (run_8values_survey.py:118-148).
    * All codegen'd builtins. */
  def qStringFormats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("watch_url",
        concat(lit("https://www.youtube.com/watch?v="), $"source",
          lit("&t="), $"doc_id".cast("string"), lit("s")))
      .withColumn("handle", concat(lit("  @@"), $"source", lit(" ")))
      .withColumn("handle_norm", regexp_replace(trim($"handle"), "^@+", ""))
      .withColumn("compact_chars", expr(
        """CASE WHEN n_chars >= 1000000
             THEN CAST(CAST(round(n_chars / 1000000.0, 1) AS DECIMAL(10,1)) AS STRING) || 'M'
           WHEN n_chars >= 1000
             THEN CAST(CAST(round(n_chars / 1000.0, 1) AS DECIMAL(10,1)) AS STRING) || 'K'
           ELSE CAST(n_chars AS STRING) END"""))
      .withColumn("prompt", expr(
        "replace(replace('Context: {{CONTEXT}}\nStatement: {{STATEMENT}}', " +
          "'{{CONTEXT}}', substring(text, 1, 40)), '{{STATEMENT}}', source)"))
      .select($"doc_id", $"watch_url", $"handle_norm", $"compact_chars", $"prompt")
      .orderBy($"doc_id")
  }

  val qStringFormatsSql: String =
    """SELECT doc_id,
       'https://www.youtube.com/watch?v=' || source || '&t=' || CAST(doc_id AS VARCHAR) || 's' AS watch_url,
       regexp_replace(trim('  @@' || source || ' '), '^@+', '') AS handle_norm,
       CASE WHEN n_chars >= 1000000
            THEN CAST(CAST(round(n_chars / 1000000.0, 1) AS DECIMAL(10,1)) AS VARCHAR) || 'M'
            WHEN n_chars >= 1000
            THEN CAST(CAST(round(n_chars / 1000.0, 1) AS DECIMAL(10,1)) AS VARCHAR) || 'K'
            ELSE CAST(n_chars AS VARCHAR) END AS compact_chars,
       replace(replace('Context: {{CONTEXT}}' || chr(10) || 'Statement: {{STATEMENT}}',
         '{{CONTEXT}}', substring(text, 1, 40)), '{{STATEMENT}}', source) AS prompt
       FROM documents ORDER BY doc_id"""

  /** q121 — corpus SNAPSHOT DIFF, the between-crawls audit a versioned
    * lake runs before promoting a new snapshot: per doc, whether it
    * was added, removed, changed (content hash differs), or unchanged
    * — then the per-source rollup a release gate reads. Snapshots are
    * deterministic derived views of the fixture (A drops ids ≡ 0 mod
    * 9; B drops ids ≡ 0 mod 11 and rewrites text for ids ≡ 0 mod 13)
    * so every branch is exercised. Plan: ONE full outer join on
    * doc_id comparing md5 hashes — content bytes never shuffle, only
    * (id, 32-char hash) rows — and a tiny rollup. */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source", $"text")
    val a = docs.filter($"doc_id" % 9 =!= 0)
      .select($"doc_id", $"source", md5($"text").as("ha"))
    val b = docs.filter($"doc_id" % 11 =!= 0)
      .withColumn("text2",
        when($"doc_id" % 13 === 0, concat($"text", lit(" v2"))).otherwise($"text"))
      .select($"doc_id", $"source".as("source_b"), md5($"text2").as("hb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"ha".isNull, "added")
          .when($"hb".isNull, "removed")
          .when($"ha" =!= $"hb", "changed")
          .otherwise("unchanged"))
      .groupBy(coalesce($"source", $"source_b").as("source"), $"status")
      .agg(count(lit(1)).as("n"))
      .orderBy($"source", $"status")
  }

  val qSnapshotDiffSql: String =
    """WITH a AS (
         SELECT doc_id, source, md5(text) AS ha FROM documents WHERE doc_id % 9 != 0),
       b AS (
         SELECT doc_id, source AS source_b,
           md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS hb
         FROM documents WHERE doc_id % 11 != 0)
       SELECT COALESCE(a.source, b.source_b) AS source,
         CASE WHEN a.ha IS NULL THEN 'added'
              WHEN b.hb IS NULL THEN 'removed'
              WHEN a.ha != b.hb THEN 'changed'
              ELSE 'unchanged' END AS status,
         COUNT(*) AS n
       FROM a FULL OUTER JOIN b USING (doc_id)
       GROUP BY 1, 2 ORDER BY source, status"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_snapshot_diff" -> qSnapshotDiff,
    "q48_upsert_merge" -> qUpsertMerge,
    "q49_pending_empty_scores" -> qPendingWithEmptyScores,
    "q53_staleness_diff" -> qStalenessDiff,
    "q54_approx_counts" -> qApproxCounts,
    "q55_vtt_timestamps" -> qVttTimestamps,
    "q56_fixture_dump" -> qFixtureDump,
    "q59_string_formats" -> qStringFormats)

  val oracles: Map[String, String] = Map(
    "q121_snapshot_diff" -> qSnapshotDiffSql,
    "q48_upsert_merge" -> qUpsertMergeSql,
    "q49_pending_empty_scores" -> qPendingWithEmptyScoresSql,
    "q53_staleness_diff" -> qStalenessDiffSql,
    "q54_approx_counts" -> qApproxCountsSql,
    "q55_vtt_timestamps" -> qVttTimestampsSql,
    "q56_fixture_dump" -> qFixtureDumpSql,
    "q59_string_formats" -> qStringFormatsSql)
}
