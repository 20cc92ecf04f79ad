package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Sequence operators over the `events` stream table — the batch forms
  * of the incremental patterns in SURVEY.md §2.10, plus the as-of and
  * interval joins a time-series pipeline needs. All window partitions
  * key on user_id: one shuffle, then narrow per-partition passes —
  * the shape that scales to arbitrarily many users.
  */
object EventOps {

  /** Sessionization with a 30-minute inactivity gap — the
    * gaps-and-islands pattern over timestamps (the same window
    * machinery as find_islands W8). Timestamps compare in microseconds
    * (Tables.events truncates ns → µs, matching DuckDB's ns→µs cast). */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(wOrd))
      .withColumn("new_session",
        when($"prev_us".isNull || $"us" - $"prev_us" > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum($"new_session").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"event_id").as("first_event"),
           max($"event_id").as("last_event"))
      .orderBy($"user_id", $"session_id")
  }

  val qSessionizeSql: String =
    """WITH t AS (
         SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
       flagged AS (
         SELECT user_id, event_id, us,
           CASE WHEN prev_us IS NULL OR us - prev_us > 30 * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
         FROM (SELECT user_id, event_id, us,
                 LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
               FROM t) x),
       sess AS (
         SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         FROM flagged)
       SELECT user_id, session_id, COUNT(*) AS n_events,
         MIN(event_id) AS first_event, MAX(event_id) AS last_event
       FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  /** Value runs: maximal runs of events with value ≥ 100 per user
    * (ordered by ts), kept when run length ≥ 3 — find_islands (W8) on a
    * measure column instead of a score array. */
  def qValueRuns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("flag", $"value" >= 100.0)
      .withColumn("boundary",
        when(lag($"flag", 1).over(wOrd).isNull || lag($"flag", 1).over(wOrd) =!= $"flag", 1)
          .otherwise(0))
      .withColumn("run_id", sum($"boundary").over(wRun))
      .filter($"flag")
      .groupBy($"user_id", $"run_id")
      .agg(count(lit(1)).as("run_len"),
           min($"event_id").as("first_event"),
           max($"event_id").as("last_event"))
      .filter($"run_len" >= 3)
      .select($"user_id", $"first_event", $"last_event", $"run_len")
      .orderBy($"user_id", $"first_event")
  }

  val qValueRunsSql: String =
    """WITH flagged AS (
         SELECT user_id, event_id, ts, value >= 100.0 AS flag,
           LAG(value >= 100.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events),
       runs AS (
         SELECT user_id, event_id, flag,
           SUM(CASE WHEN prev IS NULL OR prev != flag THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
         FROM flagged)
       SELECT user_id, MIN(event_id) AS first_event, MAX(event_id) AS last_event,
         COUNT(*) AS run_len
       FROM runs WHERE flag GROUP BY user_id, run_id
       HAVING COUNT(*) >= 3 ORDER BY user_id, first_event"""

  /** As-of join: for every event, the most recent prior 'purchase' of
    * the same user. Expressed as last(ignoreNulls) over an unbounded-
    * preceding-to-1-preceding frame — the union+window formulation of
    * as-of, which scales as one shuffle + linear pass (no range-join
    * blowup, no per-key binary search). */
  def qAsofPriorPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prior_purchase_event",
        last(when($"event_type" === "purchase", $"event_id"), ignoreNulls = true).over(w))
      .select($"event_id", $"user_id", $"event_type", $"prior_purchase_event")
      .orderBy($"event_id")
  }

  val qAsofPriorPurchaseSql: String =
    """SELECT event_id, user_id, event_type,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchase_event
       FROM events ORDER BY event_id"""

  /** Interval join (J12's shape on the time axis): clicks within
    * [purchase.ts, purchase.ts + 1h] of the same user. Equi on user_id
    * + range predicate — shuffles on the key, never a blind theta
    * join; AQE handles per-user skew. */
  def qPurchaseClickWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("us", unix_micros($"ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_event"), $"us".as("pus"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_event"), $"us".as("cus"))
    purchases.join(clicks,
        Seq("user_id"))
      .filter($"cus" >= $"pus" && $"cus" <= $"pus" + 3600L * 1000000)
      .groupBy($"purchase_event")
      .agg(count(lit(1)).as("n_clicks"), min($"click_event").as("first_click"))
      .orderBy($"purchase_event")
  }

  val qPurchaseClickWindowSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
       SELECT p.event_id AS purchase_event, COUNT(*) AS n_clicks,
         MIN(c.event_id) AS first_click
       FROM ev p JOIN ev c ON p.user_id = c.user_id
         AND c.us >= p.us AND c.us <= p.us + CAST(3600 AS BIGINT) * 1000000
       WHERE p.event_type = 'purchase' AND c.event_type = 'click'
       GROUP BY p.event_id ORDER BY purchase_event"""

  /** q147 — exact rank-based tail-outlier report per event type (the
    * p99 alerting primitive a pipeline health monitor runs over its
    * metric stream): rank every event within its type by (value,
    * event_id) — a TOTAL order, so the p99 boundary is a specific row
    * both engines agree on exactly, with none of approximate-
    * percentile's cross-engine drift — and report the boundary value,
    * the outlier census above it, and an integer id-checksum of the
    * outlier set (a single misranked row breaks the checksum, not
    * just the count). k = floor(0.99·n) rows sit at or below the
    * boundary; n−k are outliers. One shuffle on event_type, then a
    * narrow per-type sort — the window shape every §2.5 operator
    * uses. The exact-rank form is the oracle anchor; at 100 TB a
    * monitor would run `percentile_approx` and this query is the
    * ground truth it is validated against (the q31-vs-q97 pattern). */
  def qEventOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    Tables.events(s, dir)
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .withColumn("k", floor($"n" * 0.99).cast("long"))
      .groupBy($"event_type")
      .agg(max($"n").as("n_events"),
        max($"k").as("k"),
        max(when($"rnk" === $"k", $"value")).as("boundary_value"),
        sum(when($"rnk" > $"k", lit(1L)).otherwise(lit(0L))).as("n_outliers"),
        sum(when($"rnk" > $"k", $"event_id").otherwise(lit(0L))).as("outlier_id_sum"))
      .orderBy($"event_type")
  }

  val qEventOutliersSql: String =
    """WITH r AS (
         SELECT event_type, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY value, event_id) AS rnk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
         FROM events),
       kk AS (SELECT *, CAST(floor(n * 0.99) AS BIGINT) AS k FROM r)
       SELECT event_type, MAX(n) AS n_events, MAX(k) AS k,
         MAX(CASE WHEN rnk = k THEN value END) AS boundary_value,
         CAST(SUM(CASE WHEN rnk > k THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         CAST(SUM(CASE WHEN rnk > k THEN event_id ELSE 0 END) AS BIGINT) AS outlier_id_sum
       FROM kk GROUP BY event_type ORDER BY event_type"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_sessionize" -> qSessionize,
    "q147_event_outliers" -> qEventOutliers,
    "q43_value_runs" -> qValueRuns,
    "q44_asof_prior_purchase" -> qAsofPriorPurchase,
    "q45_purchase_click_window" -> qPurchaseClickWindow)

  val oracles: Map[String, String] = Map(
    "q42_sessionize" -> qSessionizeSql,
    "q147_event_outliers" -> qEventOutliersSql,
    "q43_value_runs" -> qValueRunsSql,
    "q44_asof_prior_purchase" -> qAsofPriorPurchaseSql,
    "q45_purchase_click_window" -> qPurchaseClickWindowSql)
}
