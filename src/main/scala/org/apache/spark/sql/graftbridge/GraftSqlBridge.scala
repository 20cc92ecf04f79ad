package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession, Dataset => ClassicDataset}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge this engine needs, isolated in its own
  * package so the dependency is explicit and auditable.
  *
  * A V1 streaming `Sink.addBatch` receives a Dataset wrapping the
  * micro-batch's ALREADY-PLANNED `IncrementalExecution`. Calling any
  * write action on that Dataset re-plans the logical tree through a
  * fresh `QueryExecution` — re-executing the batch (double-reading
  * rate-limited sources) and, for stateful plans, planning stateful
  * operators WITHOUT the incremental state-store wiring. The supported
  * escape (the same one Delta's sink uses) is to lift the planned
  * physical rows into a fresh batch DataFrame:
  * `SparkSession.internalCreateDataFrame(queryExecution.toRdd, schema)`
  * — which is `private[sql]`, hence this bridge.
  */
object GraftSqlBridge {
  /** The micro-batch's planned rows as a plain batch DataFrame (the
    * incremental execution runs exactly once, when the returned frame's
    * first action fires). */
  def plannedBatchFrame(data: Dataset[Row]): DataFrame = {
    val classic = data.asInstanceOf[ClassicDataset[Row]]
    val rows: RDD[InternalRow] = classic.queryExecution.toRdd
    classic.sparkSession.internalCreateDataFrame(rows, data.schema, isStreaming = false)
  }
}
