package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query/oracle maps; every operator from
  * SURVEY.md §2 that is implemented has an entry here (SQL-expressible
  * ones also carry a DuckDB oracle).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.islands.Islands.qIslandTimeRanges(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.text.TextAnalysis.queries ++
      graft.dedup.Dedup.queries ++
      graft.vector.Similarity.queries ++
      graft.islands.Islands.queries ++
      graft.chunk.Chunkers.queries ++
      graft.survey.Survey.queries ++
      graft.events.EventOps.queries ++
      graft.score.NgramLm.queries ++
      graft.queries.Lifecycle.queries ++
      graft.service.ServiceOps.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.sink.RoundTrips.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.text.TextAnalysis.oracles ++
      graft.dedup.Dedup.oracles ++
      graft.vector.Similarity.oracles ++
      graft.islands.Islands.oracles ++
      graft.chunk.Chunkers.oracles ++
      graft.survey.Survey.oracles ++
      graft.events.EventOps.oracles ++
      graft.score.NgramLm.oracles ++
      graft.queries.Lifecycle.oracles ++
      graft.service.ServiceOps.oracles ++
      graft.multimodal.Multimodal.oracles ++
      graft.sink.RoundTrips.oracles
}
