package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Physical-type-drift guard for the events reader (round-7 regression:
  * the driver regenerated testdata and `ts` flipped from
  * TIMESTAMP(NANOS) to timestamp[us], which the old nanos-only shim
  * rejected at analysis time, killing 11 queries). `Tables.events` must
  * read every physical shape `ts` has ever shipped in and yield the
  * same TimestampType values:
  *   - int64 nanos-as-long (what `nanosAsLong=true` surfaces for the
  *     old TIMESTAMP(NANOS) generation),
  *   - timestamp[us] isAdjustedToUTC=false (TimestampNTZ — the current
  *     driver generation),
  *   - timestamp[us] isAdjustedToUTC=true (TimestampType).
  */
class TablesSpec extends SparkSpec {

  private val eventCols = Seq("event_id", "user_id", "event_type", "value", "props")

  /** Fixed instants, expressed as micros since epoch (UTC session). */
  private val micros = Seq(0L, 1700000000000000L, 1700000123456789L)

  private def payload(schemaTs: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", schemaTs),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeFixture(dir: String, tsType: DataType, tsValue: Long => Any): Unit = {
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us), i.toLong, s"type_$i", i.toDouble, "{}")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), payload(tsType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readMicros(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"events reader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    assert(df.schema.fieldNames.toSeq === "event_id" +: "ts" +: eventCols.tail,
      "reader must not reorder or drop columns")
    df.selectExpr("event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  private val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  test("events reads int64 nanos-as-long generation") {
    val dir = Files.createTempDirectory("graft-events-nanos").toString
    writeFixture(dir, LongType, us => us * 1000L)
    assert(readMicros(dir) === expected)
  }

  test("events reads timestamp[us] NTZ generation (current driver output)") {
    val dir = Files.createTempDirectory("graft-events-ntz").toString
    writeFixture(dir, TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    assert(readMicros(dir) === expected)
  }

  test("events reads timestamp[us] UTC-adjusted generation") {
    val dir = Files.createTempDirectory("graft-events-utc").toString
    writeFixture(dir, TimestampType, us => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000)))
    assert(readMicros(dir) === expected)
  }

  test("schema contract: every reader accepts the live testdata") {
    // The kind-level contract must hold for whatever generation the
    // driver shipped — a failure here IS the early warning the events
    // regression lacked.
    Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(reader => assert(reader(spark, Sf0001).schema.nonEmpty))
  }

  test("schema contract: a kind flip fails at the reader, naming the column") {
    // Simulate the next drift: doc_id arrives as a string. The read
    // must throw immediately with table + column + got/want — not an
    // opaque analysis error N operators downstream.
    val dir = Files.createTempDirectory("graft-drift").toString
    spark.range(0, 5).selectExpr(
        "CAST(id AS STRING) AS doc_id", "'x' AS text", "'en' AS lang",
        "'s0' AS source", "1L AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents.parquet schema drift"))
    assert(e.getMessage.contains("doc_id: got string"))
    assert(e.getMessage.contains("want integral"))
  }

  test("schema contract: a missing column fails at the reader") {
    val dir = Files.createTempDirectory("graft-missing").toString
    spark.range(0, 5).selectExpr("id AS vec_id", "array(1.0f) AS embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Tables.embeddings(spark, dir))
    assert(e.getMessage.contains("label: MISSING"))
  }

  test("schema contract: width widening is NOT drift (int32 vs int64 both read)") {
    val dir = Files.createTempDirectory("graft-width").toString
    spark.range(0, 5).selectExpr(
        "CAST(id AS INT) AS doc_id", "'x' AS text", "'en' AS lang",
        "'s0' AS source", "CAST(1 AS INT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(Tables.documents(spark, dir).count() == 5)
  }

  test("all generations agree with the live testdata read path") {
    // The real sf0.001 file (whatever generation the driver shipped)
    // must read without throwing and expose TimestampType.
    val df = Tables.events(spark, Sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1)
  }
}
