package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.2-2.4, §2.6-2.7):
  * aggregations A1-A7, joins J1-J11, windows W1/W8/W13, sorts O4,
  * set ops U1-U3 — each re-expressed as a declarative DataFrame plan so
  * Catalyst gets pushdown/pruning/broadcast for free.
  *
  * Oracle-parity rules (the driver hash-compares against DuckDB):
  *  - money/double aggregates run in exact DECIMAL arithmetic and only
  *    the final value is cast to DOUBLE (both engines convert the same
  *    exact decimal to the same IEEE-754 bits);
  *  - ratios divide a decimal-exact double by an integer count (one
  *    IEEE op on identical operands);
  *  - every query ends in a total ORDER BY on a unique key;
  *  - timestamps are cast to DATE (or formatted) before output.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A1+TPC-H Q1 shape: pricing summary per (returnflag, linestatus).
    * Map-side partial aggregation makes this a single shuffle of
    * #groups rows — scale-safe at any SF.
    * Ref: reference aggregates per-channel stats the same way
    * (maintain_database.py:289-306). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** A1: per-customer high-water mark (MAX publish-time pattern,
    * maintain_database.py:289-306 drives incremental ingest off this). */
  def q02LastOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").cast("date").as("last_order_date"),
           count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  val q02Sql: String =
    """SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS last_order_date,
       COUNT(*) AS n_orders FROM orders GROUP BY o_custkey ORDER BY o_custkey"""

  /** A2: pipeline-wide stat counts (dashboard stat cards,
    * server/dashboard.py:126-149): plain counts, COUNT(DISTINCT), and a
    * semi-join count — one row out, arbitrarily large tables in. */
  def q03StatCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nOrders = orders.agg(count(lit(1)).as("n_orders"))
    val nCust = cust.agg(count(lit(1)).as("n_customers"))
    val nDistinct = orders.agg(countDistinct($"o_custkey").as("n_custs_with_orders"))
    val nLine = Tables.lineitem(s, dir).agg(count(lit(1)).as("n_lineitems"))
    nOrders.crossJoin(nCust).crossJoin(nDistinct).crossJoin(nLine)
  }

  val q03Sql: String =
    """SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
       (SELECT COUNT(*) FROM customer) AS n_customers,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_custs_with_orders,
       (SELECT COUNT(*) FROM lineitem) AS n_lineitems"""

  /** A3+J2: per-nation customer counts with a conditional "has orders"
    * count (COUNT(v.id) FILTER(WHERE EXISTS ...), dashboard.py:167-170).
    * nation is broadcast; the distinct-custkey side map-side combines. */
  def q04ConditionalCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val haveOrders = Tables.orders(s, dir).select($"o_custkey").distinct()
    cust
      .join(haveOrders, cust("c_custkey") === haveOrders("o_custkey"), "left")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
           count($"o_custkey").as("n_with_orders"))
      .orderBy($"n_name")
  }

  val q04Sql: String =
    """SELECT n_name, COUNT(*) AS n_customers, COUNT(o.o_custkey) AS n_with_orders
       FROM customer c
       LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c.c_custkey = o.o_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  /** A4: status histogram (GROUP BY status COUNT, dashboard.py:231-235). */
  def q05StatusHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val q05Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
       GROUP BY o_orderstatus, o_orderpriority ORDER BY o_orderstatus, o_orderpriority"""

  /** A7: GROUP BY HAVING COUNT(*)=1 — the failed-transcript-marker
    * detector shape (update_missing_transcripts.py:31-39). */
  def q06SingleLineOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"))
      .filter($"n" === 1)
      .select($"l_orderkey")
      .orderBy($"l_orderkey")
  }

  val q06Sql: String =
    """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
       HAVING COUNT(*) = 1 ORDER BY l_orderkey"""

  /** J1: 3-way join revenue rollup (videos⋈vid_data⋈channels shape,
    * maintain_database.py:289-306). lineitem⋈orders shuffles on the
    * orderkey; customer⋈nation joins stay broadcast. */
  def q07RevenueBySegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount")))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"c_mktsegment")
  }

  val q07Sql: String =
    """SELECT c_mktsegment,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** J2: left-outer join + per-dim aggregate (channels⟕videos with
    * counts, dashboard.py:162-176). Shape is aggregate-THEN-join: the
    * fact side reduces to one row per dimension key first (map-side
    * combined, the only shuffle is #nations rows), and the left join
    * attaches it to the dim with the tiny agg as the broadcast build
    * side. The join-then-aggregate form can't broadcast at all — a
    * left-outer join only supports a build-right broadcast, and the
    * preserved dim side is the small one — so it degrades to shuffling
    * the whole fact table through the join. */
  def q08NationCustomerStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perNation = Tables.customer(s, dir)
      .groupBy($"c_nationkey")
      .agg(count($"c_custkey").as("cnt"), sum(dec($"c_acctbal")).as("bal"))
    Tables.nation(s, dir)
      .join(broadcast(perNation), $"n_nationkey" === $"c_nationkey", "left")
      .select($"n_nationkey", $"n_name",
        coalesce($"cnt", lit(0L)).as("n_customers"),
        coalesce($"bal", lit(0).cast(DecimalType(18, 2)))
          .cast("double").as("total_acctbal"))
      .orderBy($"n_nationkey")
  }

  val q08Sql: String =
    """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers,
       CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
       FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
       GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""

  /** J3: left-semi join — "videos with a transcript" EXISTS probe
    * (dashboard.py:134-143; the reference hand-rewrote COUNT(DISTINCT)
    * to EXISTS for this; Catalyst plans semi-joins natively). */
  def q09CustomersWithOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  /** J5/J6: left-anti join — "channels with no videos yet"
    * (maintain_database.py:189-198,412-419). */
  def q10CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  /** J4+J11: the load-bearing incremental-work operator — pending =
    * (universe cross) anti-join (done). Mirrors the vid×model pending
    * pairs (client/async_processing_client.py:233-246; 697.9M-pair
    * universe, ROADMAP.md:31). The universe stays a cross of two
    * *distinct key sets* (never materialized wide), and the anti side
    * shuffles on the same key — at 100 TB this is a shuffled anti-join
    * of key pairs, not a data-row blowup. */
  def q11PendingPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val custs = orders.select($"o_custkey").distinct()
    val statuses = orders.select($"o_orderstatus").distinct()
    val have = orders.select($"o_custkey", $"o_orderstatus").distinct()
    custs.crossJoin(broadcast(statuses))
      .join(have, Seq("o_custkey", "o_orderstatus"), "left_anti")
      .orderBy($"o_custkey", $"o_orderstatus")
  }

  val q11Sql: String =
    """WITH custs AS (SELECT DISTINCT o_custkey FROM orders),
       statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
       pairs AS (SELECT o_custkey, o_orderstatus FROM custs CROSS JOIN statuses)
       SELECT p.o_custkey, p.o_orderstatus FROM pairs p
       WHERE NOT EXISTS (SELECT 1 FROM orders o
         WHERE o.o_custkey = p.o_custkey AND o.o_orderstatus = p.o_orderstatus)
       ORDER BY o_custkey, o_orderstatus"""

  /** W1: running total per key — the cum_word_count pattern
    * (maintain_database.py:462-481). Decimal-exact running sum, cast to
    * double at the end. One shuffle on the partition key. */
  def q12RunningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_total", sum(dec($"o_totalprice")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"running_total")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** O5-pattern: top-k per group via row_number (cosine top-k uses the
    * same plan shape, run_8values_survey.py:269-283). Ties broken on the
    * unique orderkey for determinism. */
  def q13Top3OrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rnk")
  }

  val q13Sql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
         FROM orders) t
       WHERE rnk <= 3 ORDER BY o_custkey, rnk"""

  /** W13: first-row-per-group (DISTINCT ON snapshot,
    * embed_transcripts_to_vector_db.py:377-394). */
  def q14FirstEventPerUser(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type")
      .orderBy($"user_id")
  }

  val q14Sql: String =
    """SELECT user_id, event_id, event_type FROM (
         SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events) t
       WHERE rn = 1 ORDER BY user_id"""

  /** O4: ORDER BY ... DESC LIMIT — dashboard listing
    * (dashboard.py:175). Spark plans this as TakeOrderedAndProject:
    * a per-partition top-k then a k-row merge, no global sort. */
  def q15LatestOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      .limit(100)
      .select($"o_orderkey", $"o_orderdate".cast("date").as("order_date"), $"o_totalprice")
  }

  val q15Sql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
       FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100"""

  /** U1: set difference (EXCEPT / left-anti over distinct keys,
    * maintain_database.py:142-151). */
  def q16ExceptFinishedOpen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    orders.filter($"o_orderstatus" === "F").select($"o_custkey")
      .except(orders.filter($"o_orderstatus" === "O").select($"o_custkey"))
      .orderBy($"o_custkey")
  }

  val q16Sql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_custkey"""

  /** U2+U3: union of slices + distinct (per-page API unions,
    * maintain_database.py:39-50). */
  def q17UnionPriorities(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    orders.filter($"o_orderstatus" === "F").select($"o_orderpriority")
      .union(orders.filter($"o_orderstatus" === "O").select($"o_orderpriority"))
      .distinct()
      .orderBy($"o_orderpriority")
  }

  val q17Sql: String =
    """SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
       UNION SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_orderpriority"""

  /** F3: JSON field extraction (channel_snippet->>'title',
    * dashboard.py:164) — the real JSON-path operator on both sides
    * (get_json_object ↔ DuckDB json_extract_string), not a regex.
    * The outer SUM is CAST in the oracle because DuckDB SUM(BIGINT)
    * returns HUGEINT (→ pandas float64, breaking the hash compare). */
  def q18JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val q18Sql: String =
    """SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type"""

  /** F4+A-class: per-day event rollup (timestamp → date bucketing). */
  def q19DailyEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec($"value")).cast("double").as("total_value"))
      .orderBy($"day")
  }

  val q19Sql: String =
    """SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM events GROUP BY CAST(ts AS DATE) ORDER BY day"""

  /** A6: deterministic "sampled" extrapolated aggregate (TABLESAMPLE
    * estimate, sql/check_scoring.sql:29-33 — modulo sampling here so the
    * oracle can replay it). */
  def q20SampledEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_id" % 100 === 0)
      .agg((count(lit(1)) * 100).as("est_total_events"),
           sum(dec($"value")).cast("double").as("sample_value"))
  }

  val q20Sql: String =
    """SELECT COUNT(*) * 100 AS est_total_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sample_value
       FROM events WHERE event_id % 100 = 0"""

  /** q117 — [[graft.core.Skew.saltedJoin]] through the value gate: the
    * documents table (source is the natural heavy-hitter key — one
    * viral channel's rows in the reference) salted-joins a derived
    * source dim, then rolls up per source. The oracle is the PLAIN
    * join's rollup — salting must be invisible in the result (row-for-
    * row identical to the unsalted join; SkewSpec pins that at row
    * level, this pins it through the driver hash). At scale: the salt
    * spreads one hot key over `salt` sub-keys, buying salt× parallelism
    * for salt× duplication of the (tiny) dim side. */
  def q117SaltedJoinRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source", $"n_chars")
    // SHUFFLE_HASH hint: under the default broadcast threshold this
    // tiny dim would broadcast, where the skewed side never shuffles
    // on the key and salting buys nothing — the recorded plan must
    // exhibit the mechanism it documents (both sides shuffling on
    // (key, salt), the hot key split across salt partitions).
    val dim = Tables.documents(s, dir).select($"source").distinct()
      .withColumn("src_tag", length($"source") * 10)
      .hint("shuffle_hash")
    graft.core.Skew.saltedJoin(docs, dim, Seq("source"), salt = 8)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"doc_id").as("id_sum"),
        sum($"n_chars" + $"src_tag").as("tagged_chars"))
      .orderBy($"source")
  }

  val q117Sql: String =
    """WITH dim AS (SELECT DISTINCT source, len(source) * 10 AS src_tag FROM documents)
       SELECT d.source, COUNT(*) AS n_docs,
         CAST(SUM(d.doc_id) AS BIGINT) AS id_sum,
         CAST(SUM(d.n_chars + m.src_tag) AS BIGINT) AS tagged_chars
       FROM documents d JOIN dim m ON m.source = d.source
       GROUP BY d.source ORDER BY d.source"""

  /** q118 — lake referential-integrity audit, the nightly check a
    * multi-table lake needs (documents ↔ embeddings here): per source,
    * the doc count and how many docs have ≥1 vector; plus the orphan
    * count on the vector side. A tidy (metric, source, n) long format
    * so both directions fit one schema; tiny output whatever the
    * corpus size.
    *
    * Fan-out safety (review r5): the match side joins DISTINCT vector
    * ids, and the doc count comes from documents alone — a vector
    * duplicated by a re-embedding run (exactly the anomaly an
    * integrity audit must survive) cannot inflate either number.
    *
    * The audited pair is a deliberately DAMAGED derived view of the
    * fixture (docs missing every id ≡ 3 mod 7; vectors missing every
    * id ≡ 0 mod 5, PLUS ids ≡ 0 mod 11 duplicated — note the
    * duplicate branch RE-ADMITS ids ≡ 0 mod 55, so "missing" means
    * `%5 = 0 ∧ %11 ≠ 0`): the healthy fixture is referentially
    * perfect, which would leave every interesting branch — missing
    * vectors, orphan vectors, duplicate collapse — unexercised by the
    * value gate. The oracle plants the identical damage. */
  def q118LakeIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source")
      .filter($"doc_id" % 7 =!= 3)
    val vecsRaw = Tables.embeddings(s, dir).select($"vec_id")
    val vecs = vecsRaw.filter($"vec_id" % 5 =!= 0)
      .union(vecsRaw.filter($"vec_id" % 11 === 0))
    val vecIds = vecs.distinct()
    val nDocs = docs.groupBy($"source").agg(count(lit(1)).as("n"))
      .select(lit("docs").as("metric"), $"source", $"n")
    val withVec = docs.join(vecIds, docs("doc_id") === vecIds("vec_id"), "left")
      .groupBy($"source").agg(count($"vec_id").as("n"))
      .select(lit("docs_with_vec").as("metric"), $"source", $"n")
    val orphans = vecIds.join(docs, docs("doc_id") === vecIds("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("orphan_vecs").as("metric"), lit("<all>").as("source"), $"n")
    nDocs.union(withVec).union(orphans).orderBy($"metric", $"source")
  }

  val q118Sql: String =
    """WITH d AS (SELECT doc_id, source FROM documents WHERE doc_id % 7 != 3),
       v AS (SELECT vec_id FROM embeddings WHERE vec_id % 5 != 0
             UNION ALL SELECT vec_id FROM embeddings WHERE vec_id % 11 = 0),
       vd AS (SELECT DISTINCT vec_id FROM v)
       SELECT metric, source, n FROM (
         SELECT 'docs' AS metric, source, COUNT(*) AS n FROM d GROUP BY source
         UNION ALL
         SELECT 'docs_with_vec', d.source, COUNT(vd.vec_id)
         FROM d LEFT JOIN vd ON vd.vec_id = d.doc_id
         GROUP BY d.source
         UNION ALL
         SELECT 'orphan_vecs', '<all>', COUNT(*)
         FROM vd WHERE NOT EXISTS (
           SELECT 1 FROM d WHERE d.doc_id = vd.vec_id)) t
       ORDER BY metric, source"""

  /** q149 — ANALYZE-style table statistics (the CBO-stats primitive:
    * Spark's `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`, and
    * the numbers a 100 TB deployment feeds its join planner — NDV
    * drives broadcast-vs-shuffle and join-reorder decisions, null
    * counts drive IS NULL selectivity, ranges drive partition-prune
    * estimates): ONE aggregation pass over `orders` computes per-
    * column row/null/exact-NDV plus canonicalized min/max, then a
    * `stack` unpivots the single row to one row per column. The
    * multi-distinct agg plans as a single Expand (rows×#cols — the
    * standard ANALYZE cost, paid once, not per column-scan), and the
    * output is engine-exact: NDV is exact COUNT(DISTINCT), numeric
    * ranges canonicalize to integers (floor(price·100); epoch micros
    * for dates) so no float/format ambiguity crosses engines, string
    * ranges stay strings. */
  def q149TableStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .withColumn("price_c", floor($"o_totalprice" * 100).cast("long"))
      .withColumn("date_us", unix_micros($"o_orderdate".cast("timestamp")))
    // (display name, canonical numeric column or null, string column or null)
    val specs = Seq(
      ("o_orderkey", Some("o_orderkey"), None),
      ("o_custkey", Some("o_custkey"), None),
      ("o_orderstatus", None, Some("o_orderstatus")),
      ("o_totalprice", Some("price_c"), None),
      ("o_orderdate", Some("date_us"), None),
      ("o_orderpriority", None, Some("o_orderpriority")))
    val aggs = specs.flatMap { case (_, num, str) =>
      val c = num.orElse(str).get
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    // ONE action materializes the single aggregate row; the per-column
    // unpivot is then a driver-built local relation — the single-pass
    // property is structural, not dependent on exchange reuse across
    // six unioned subplans.
    val row = o.agg(count(lit(1)).as("n_rows"), aggs: _*).head()
    val n = row.getAs[Long]("n_rows")
    def opt[T](field: String): Option[T] = {
      val i = row.fieldIndex(field)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    specs.map { case (name, num, str) =>
      val c = num.orElse(str).get
      val (minN, maxN) = num match {
        case Some(_) => (opt[Long](s"min_$c"), opt[Long](s"max_$c"))
        case None    => (None, None)
      }
      val (minS, maxS) = str match {
        case Some(_) => (opt[String](s"min_$c"), opt[String](s"max_$c"))
        case None    => (None, None)
      }
      (name, n, n - row.getAs[Long](s"nn_$c"), row.getAs[Long](s"ndv_$c"),
        minN, maxN, minS, maxS)
    }.toDF("col_name", "n_rows", "n_nulls", "ndv",
        "min_num", "max_num", "min_str", "max_str")
      .orderBy($"col_name")
  }

  val q149Sql: String = {
    def leg(name: String, expr: String, isNum: Boolean) = {
      val (mn, mx) =
        if (isNum) (s"CAST(MIN($expr) AS BIGINT) AS min_num", s"CAST(MAX($expr) AS BIGINT) AS max_num")
        else ("CAST(NULL AS BIGINT) AS min_num", "CAST(NULL AS BIGINT) AS max_num")
      val (ms, xs) =
        if (!isNum) (s"MIN($expr) AS min_str", s"MAX($expr) AS max_str")
        else ("CAST(NULL AS VARCHAR) AS min_str", "CAST(NULL AS VARCHAR) AS max_str")
      s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
            CAST(COUNT(*) - COUNT($expr) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT $expr) AS BIGINT) AS ndv,
            $mn, $mx, $ms, $xs
          FROM orders"""
    }
    Seq(
      leg("o_orderkey", "o_orderkey", isNum = true),
      leg("o_custkey", "o_custkey", isNum = true),
      leg("o_orderstatus", "o_orderstatus", isNum = false),
      leg("o_totalprice", "CAST(floor(o_totalprice * 100) AS BIGINT)", isNum = true),
      leg("o_orderdate", "epoch_us(CAST(o_orderdate AS TIMESTAMP))", isNum = true),
      leg("o_orderpriority", "o_orderpriority", isNum = false))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_table_stats" -> q149TableStats,
    "q117_salted_join_rollup" -> q117SaltedJoinRollup,
    "q118_lake_integrity" -> q118LakeIntegrity,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_last_order_per_customer" -> q02LastOrderPerCustomer,
    "q03_stat_counts" -> q03StatCounts,
    "q04_conditional_counts" -> q04ConditionalCounts,
    "q05_status_histogram" -> q05StatusHistogram,
    "q06_single_line_orders" -> q06SingleLineOrders,
    "q07_revenue_by_segment" -> q07RevenueBySegment,
    "q08_nation_customer_stats" -> q08NationCustomerStats,
    "q09_customers_with_orders" -> q09CustomersWithOrders,
    "q10_customers_without_orders" -> q10CustomersWithoutOrders,
    "q11_pending_pairs" -> q11PendingPairs,
    "q12_running_total" -> q12RunningTotal,
    "q13_top3_orders_per_customer" -> q13Top3OrdersPerCustomer,
    "q14_first_event_per_user" -> q14FirstEventPerUser,
    "q15_latest_orders" -> q15LatestOrders,
    "q16_except_finished_open" -> q16ExceptFinishedOpen,
    "q17_union_priorities" -> q17UnionPriorities,
    "q18_json_extract" -> q18JsonExtract,
    "q19_daily_events" -> q19DailyEvents,
    "q20_sampled_estimate" -> q20SampledEstimate)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_last_order_per_customer" -> q02Sql,
    "q03_stat_counts" -> q03Sql,
    "q04_conditional_counts" -> q04Sql,
    "q05_status_histogram" -> q05Sql,
    "q06_single_line_orders" -> q06Sql,
    "q07_revenue_by_segment" -> q07Sql,
    "q08_nation_customer_stats" -> q08Sql,
    "q09_customers_with_orders" -> q09Sql,
    "q10_customers_without_orders" -> q10Sql,
    "q11_pending_pairs" -> q11Sql,
    "q12_running_total" -> q12Sql,
    "q13_top3_orders_per_customer" -> q13Sql,
    "q14_first_event_per_user" -> q14Sql,
    "q15_latest_orders" -> q15Sql,
    "q16_except_finished_open" -> q16Sql,
    "q17_union_priorities" -> q17Sql,
    "q18_json_extract" -> q18Sql,
    "q19_daily_events" -> q19Sql,
    "q20_sampled_estimate" -> q20Sql,
    "q117_salted_join_rollup" -> q117Sql,
    "q118_lake_integrity" -> q118Sql,
    "q149_table_stats" -> q149Sql)
}
