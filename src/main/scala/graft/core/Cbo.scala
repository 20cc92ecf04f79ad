package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost-based plan decisions driven by ANALYZE-style statistics — the
  * consumer side of the q149 primitive (`Relational.q149TableStats`),
  * closing the loop the round-9 verdict called out: stats that are
  * write-only inform nothing.
  *
  * Why Spark's own broadcast decision isn't enough at 100 TB: the
  * planner estimates a relation's size from its FILES (scaled by
  * filter selectivity guesses). A dimension that is small AFTER a
  * filter/aggregation but reads from a large table — "the 2 k active
  * models out of 2 B rows", the reference's models table filtered to
  * one run — estimates far above `autoBroadcastJoinThreshold` and
  * falls back to a sort-merge join whose shuffle moves the 100 TB fact
  * side. ANALYZE stats of the actual input (n_rows, per-column null
  * counts and average widths) give the estimate the planner cannot
  * see; when it clears the threshold, forcing the broadcast removes
  * the fact-side shuffle entirely.
  *
  * [[columnStats]] is one single-Expand aggregation pass (the q149
  * plan shape — rows × #cols, paid once); [[statsJoin]] takes the
  * measured estimate and either broadcast-hints the dim or leaves the
  * shuffle join in place. CboSpec pins the executed plans on both
  * sides of the threshold — the q117 value-gate pattern applied to
  * CBO: the PLAN, not just the rows, is the asserted output.
  */
object Cbo {

  /** Per-column stats from one aggregation pass: non-null count,
    * exact NDV, and summed byte width (strings: UTF-8 length; fixed-
    * width kinds: their encoded width). */
  final case class ColStats(nonNull: Long, ndv: Long, sumBytes: Long)
  final case class TableStats(nRows: Long, cols: Map[String, ColStats]) {
    /** Estimated in-memory row bytes: per column, the measured average
      * data width plus per-value object/offset overhead (8 B — the
      * UnsafeRow field slot), plus 16 B fixed row overhead. Deliberately
      * simple and slightly pessimistic: the decision this feeds has a
      * 10x-wide safety band (broadcast thresholds are MBs, rows are
      * tens of bytes), so a coarse-but-measured estimate beats a
      * precise guess from file sizes that can be 1000x off after a
      * selective filter. */
    def estimatedBytes: Long = {
      val perRow = cols.values.map { c =>
        val avg = if (c.nonNull == 0) 0.0 else c.sumBytes.toDouble / c.nonNull
        avg + 8.0
      }.sum + 16.0
      (nRows * perRow).toLong
    }
  }

  /** One single-Expand pass over `df` (the q149 kernel as a library
    * call): n_rows plus per-column (non-null, NDV, Σ width). Width
    * measurement: strings by UTF-8 `length`; everything else by its
    * fixed encoded width — both computable without a second scan. */
  def columnStats(df: DataFrame): TableStats = columnStats(df, withNdv = true)

  /** `withNdv = false` skips the exact per-column countDistinct — the
    * expensive part of the pass (each distinct column multiplies the
    * Expand). Size-only consumers ([[statsJoin]]'s broadcast decision
    * reads nonNull + byte widths alone) get the same answer at a
    * fraction of the scan; ndv reports 0 when skipped. */
  def columnStats(df: DataFrame, withNdv: Boolean): TableStats = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.toSeq
    def widthCol(f: StructField) = f.dataType match {
      case StringType => octet_length(col(f.name)).cast("long")
      case BinaryType => octet_length(col(f.name)).cast("long")
      case dt => lit(dt.defaultSize.toLong)
    }
    val aggs = fields.flatMap { f =>
      Seq(count(col(f.name)).as(s"nn_${f.name}")) ++
        (if (withNdv) Seq(countDistinct(col(f.name)).as(s"ndv_${f.name}"))
         else Seq.empty) ++
        Seq(sum(when(col(f.name).isNotNull, widthCol(f)).otherwise(lit(0L)))
          .as(s"w_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*).head()
    val n = row.getAs[Long]("n_rows")
    TableStats(n, fields.map { f =>
      f.name -> ColStats(row.getAs[Long](s"nn_${f.name}"),
        if (withNdv) row.getAs[Long](s"ndv_${f.name}") else 0L,
        Option(row.getAs[java.lang.Long](s"w_${f.name}"))
          .map(_.longValue).getOrElse(0L))
    }.toMap)
  }

  /** Default decision threshold — Spark's own 10 MB broadcast default,
    * applied to the MEASURED estimate instead of the file-size guess. */
  val DefaultBroadcastBytes: Long = 10L * 1024 * 1024

  /** Equi-join whose strategy is decided by MEASURED stats of the
    * right side: broadcast when the estimate clears `thresholdBytes`
    * (removing the left/fact-side shuffle), otherwise leave Spark's
    * shuffle join untouched. Returns the joined frame plus the
    * decision evidence (for value-gating and audit logs) — a decision
    * without its evidence can't be trended or alerted on. */
  final case class JoinDecision(broadcast: Boolean, estimatedBytes: Long,
                                thresholdBytes: Long)
  def statsJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                thresholdBytes: Long = DefaultBroadcastBytes)
      : (DataFrame, JoinDecision) = {
    val est = columnStats(right, withNdv = false).estimatedBytes
    val d = JoinDecision(est <= thresholdBytes, est, thresholdBytes)
    val r = if (d.broadcast) broadcast(right) else right
    (left.join(r, keys), d)
  }

  /** `ANALYZE TABLE ... COMPUTE STATISTICS`: run [[columnStats]] over
    * the lake's current snapshot and PERSIST the result as `analyze.*`
    * table properties in one metadata commit — so every later session
    * (and every later plan) reads the measurement for free instead of
    * re-paying the scan. The commit stamps the snapshot VERSION the
    * scan measured (`analyze.version`): consumers can compare it
    * against the live version to judge staleness, exactly Delta's
    * ANALYZE model (stats describe a point in history; the operator
    * re-runs after major mutations, it is not auto-maintained).
    * Column names carrying `=`, tab or newline cannot ride a manifest
    * header and refuse by name. */
  def analyze(s: org.apache.spark.sql.SparkSession, dir: String,
              withNdv: Boolean = true): TableStats = {
    val snap = ManifestLake.latestSnapshot(dir).getOrElse(
      throw new IllegalStateException(s"no committed manifest in $dir"))
    val stats = columnStats(ManifestLake.read(s, dir, Some(snap)), withNdv)
    stats.cols.keysIterator.foreach { c =>
      require(!c.contains('=') && !c.contains('\t') && !c.contains('\n'),
        s"column name '$c' cannot ride a manifest property — alias it")
    }
    val kvs = Map(
      "analyze.version" -> snap.version.toString,
      "analyze.nRows" -> stats.nRows.toString) ++
      stats.cols.map { case (c, cs) =>
        s"analyze.col.$c" -> s"${cs.nonNull},${cs.ndv},${cs.sumBytes}"
      }
    ManifestLake.persistAnalyze(dir, kvs)
    stats
  }

  /** The persisted half of [[analyze]]: `(measured-at version, stats)`
    * from the latest snapshot's `analyze.*` properties — pure manifest
    * metadata, no file opened, no job run. None = never analyzed. */
  def persistedStats(dir: String): Option[(Long, TableStats)] = {
    val snap = ManifestLake.latestSnapshot(dir).getOrElse(return None)
    for {
      v <- snap.props.get("analyze.version").flatMap(_.toLongOption)
      n <- snap.props.get("analyze.nRows").flatMap(_.toLongOption)
    } yield (v, TableStats(n, snap.props.iterator.collect {
      case (k, value) if k.startsWith("analyze.col.") =>
        val parts = value.split(",")
        k.stripPrefix("analyze.col.") -> ColStats(
          parts(0).toLong, parts(1).toLong, parts(2).toLong)
    }.toMap))
  }

  /** [[statsJoin]] driven by PERSISTED stats: the broadcast decision
    * costs a manifest parse instead of a measurement scan — the shape
    * that matters when the same dimension lake joins in hundreds of
    * queries a day. Falls back to the live single-pass measurement
    * when the lake was never analyzed (and tells you, via
    * `fromPersisted`). Persisted estimates describe the analyzed
    * version — re-run [[analyze]] after mutations that materially
    * change the lake's size; the 10x decision band absorbs drift in
    * between. */
  final case class LakeJoinDecision(broadcast: Boolean, estimatedBytes: Long,
                                    thresholdBytes: Long, fromPersisted: Boolean,
                                    analyzedVersion: Option[Long])
  def statsJoinLake(left: DataFrame, s: org.apache.spark.sql.SparkSession,
                    rightDir: String, keys: Seq[String],
                    thresholdBytes: Long = DefaultBroadcastBytes)
      : (DataFrame, LakeJoinDecision) = {
    val right = ManifestLake.read(s, rightDir)
    val (est, persisted, ver) = persistedStats(rightDir) match {
      case Some((v, st)) => (st.estimatedBytes, true, Some(v))
      case None => (columnStats(right, withNdv = false).estimatedBytes,
        false, None)
    }
    val d = LakeJoinDecision(est <= thresholdBytes, est, thresholdBytes,
      persisted, ver)
    val r = if (d.broadcast) broadcast(right) else right
    (left.join(r, keys), d)
  }
}
