package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** TYPE WIDENING ([[ManifestLake.widenColumn]] — Delta 4.0's
  * type-widening feature): a lossless upcast is one metadata commit;
  * old files upcast at scan time on both parquet reader paths. Pinned
  * here: cross-generation reads (including values exceeding the old
  * type's range), era-correct time travel, the skipping index
  * surviving the widening (range stats AND bloom point lookups),
  * the SQL DDL face, and the refusal matrix (narrowing, lossy flips,
  * the bucket column). */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  test("int→long widening is metadata-only: both generations read; gen-2 exceeds int range; skipping survives") {
    val dir = tmp("tw_core")
    val gen1 = spark.range(0, 100)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        ($"id" * 10).cast("int").as("n_chars"))
    ManifestLake.append(spark, dir, gen1, "source",
      maxRecordsPerFile = 32L, statsCols = Seq("n_chars"),
      bloomCols = Seq("n_chars"))                                 // v1: int32 files
    val filesBefore = ManifestLake.latestSnapshot(dir).get.files.toSet
    ManifestLake.widenColumn(dir, "n_chars", LongType)            // v2: props only
    val v2 = ManifestLake.latestSnapshot(dir).get
    assert(v2.files.toSet == filesBefore, "no byte rewritten")
    assert(v2.schema.get("n_chars").dataType == LongType)
    // gen-2 carries values ABOVE Int.MaxValue — impossible pre-widen
    val big = 3_000_000_000L
    ManifestLake.append(spark, dir, spark.range(100, 110)
      .select($"id".as("doc_id"), lit("s0").as("source"),
        (lit(big) + $"id").as("n_chars")), "source",
      statsCols = Seq("n_chars"), bloomCols = Seq("n_chars"))     // v3
    val out = ManifestLake.read(spark, dir)
    assert(out.schema("n_chars").dataType == LongType)
    assert(out.count() == 110L)
    assert(out.agg(sum($"n_chars")).head().getLong(0) ==
      (0L until 100L).map(_ * 10).sum + (100L until 110L).map(big + _).sum)
    // range-stats pruning stays exact across the width change (int-era
    // stats answer a long-range probe)
    val hits = ManifestLake.readWhere(spark, dir, "n_chars",
      BigDecimal(100), BigDecimal(200))
    assert(hits.select($"doc_id").as[Long].collect().sorted.toSeq == (10L to 20L))
    // bloom point lookup: a LONG probe finds rows bloomed as int32
    // (BloomHash canonicalizes integer kinds through Long)
    val pt = ManifestLake.readPoint(spark, dir, "n_chars", 500L)
    assert(pt.select($"doc_id").as[Long].collect().toSeq == Seq(50L))
    // time travel BELOW the widening serves the era's type
    val old = ManifestLake.read(spark, dir, ManifestLake.snapshotAt(dir, 1L))
    assert(old.schema("n_chars").dataType == IntegerType)
    // appending the NARROW type after the widening refuses loudly
    // (schema evolution's type-conflict rule — cast before appending)
    val e = intercept[Exception](ManifestLake.append(spark, dir,
      spark.range(0, 1).select($"id".as("doc_id"), lit("s0").as("source"),
        lit(1).cast("int").as("n_chars")), "source"))
    assert(e.getMessage != null)
    // ...and widening composes with RENAME (both metadata features)
    ManifestLake.renameColumn(dir, "n_chars", "chars")
    assert(ManifestLake.read(spark, dir).agg(max($"chars")).head().getLong(0) ==
      big + 109L)
  }

  test("SQL face: ALTER COLUMN TYPE BIGINT widens; narrowing and lossy flips refuse; bucket column refuses") {
    val dir = tmp("tw_sql")
    spark.conf.set("spark.sql.catalog.graft_tw", classOf[GraftCatalog].getName)
    ManifestLake.append(spark, dir, spark.range(0, 60)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        ($"id" * 1.5f).cast("float").as("score"),
        ($"id" * 10).cast("int").as("n_chars")), "source")
    def t = s"graft_tw.`$dir`"
    spark.sql(s"ALTER TABLE $t ALTER COLUMN n_chars TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN score TYPE DOUBLE")
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.schema.get("n_chars").dataType == LongType)
    assert(snap.schema.get("score").dataType == DoubleType)
    assert(spark.sql(s"SELECT sum(n_chars) AS s FROM $t").head().getLong(0) ==
      (0L until 60L).map(_ * 10).sum)
    assert(math.abs(spark.sql(s"SELECT sum(score) AS s FROM $t").head().getDouble(0) -
      (0 until 60).map(_ * 1.5).sum) < 1e-6)
    def msgs(th: Throwable): Seq[String] =
      Iterator.iterate(th)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    // narrowing refuses — Spark's analyzer catches it before the
    // catalog (NOT_SUPPORTED_CHANGE_COLUMN); our widenColumn guards
    // the Scala path with its own message
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN n_chars TYPE INT"))
    assert(msgs(e1).exists(m => m.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      m.contains("lossless")), e1.toString)
    val e1b = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir, "n_chars", IntegerType))
    assert(e1b.getMessage.contains("lossless"), e1b.getMessage)
    // lossy flip refuses (either layer)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN source TYPE BIGINT"))
    assert(msgs(e2).nonEmpty, e2.toString)
    val e2b = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir, "doc_id", DoubleType))
    assert(e2b.getMessage.contains("lossless"), e2b.getMessage)
    // bucket column refuses (type-sensitive placement hash)
    val dir2 = tmp("tw_bucket")
    ManifestLake.append(spark, dir2, spark.range(0, 50)
      .select($"id".cast("int").as("doc_id"), lit("s0").as("source"),
        ($"id" * 10).as("v")), "source", bucketBy = Some(("doc_id", 4)))
    val e3 = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir2, "doc_id", LongType))
    assert(e3.getMessage.contains("bucket"), e3.getMessage)
    // decimal precision growth at the same scale widens; scale change refuses
    val dir3 = tmp("tw_dec")
    ManifestLake.append(spark, dir3, spark.range(0, 10)
      .select($"id".as("doc_id"), lit("s0").as("source"),
        ($"id" * 10).cast("decimal(5,1)").as("amt")), "source")
    ManifestLake.widenColumn(dir3, "amt", DecimalType(12, 1))
    assert(ManifestLake.read(spark, dir3).agg(sum($"amt")).head()
      .getDecimal(0).doubleValue() == (0 until 10).map(_ * 10.0).sum)
    val e4 = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir3, "amt", DecimalType(12, 3)))
    assert(e4.getMessage.contains("lossless"), e4.getMessage)
  }

  /** The Delta-4.0 widening extensions, each verified on this engine's
    * ACTUAL read paths (Scala + DSv2): int→double (every int32 < 2^53
    * — exact), integral→decimal(p,0) (scale 0 only: manifest stats
    * store unscaled decimal values, and only at scale 0 do the old
    * integral and new decimal stats share a unit), date→timestamp_ntz
    * (the column's range stats are STRIPPED — epoch-day vs
    * epoch-micros units are incomparable; files stay conservatively
    * un-pruned). Principled refusals: long→double (rounds above
    * 2^53), int→float (rounds above 2^24), decimal scale growth
    * (mixed unscaled units would corrupt pruning), class-changing
    * widening of the PARTITION column (directory rendering differs). */
  test("Delta-4.0 widening set: int→double, integral→decimal(p,0), date→timestamp_ntz; principled refusals") {
    val dir = tmp("tw_wide")
    ManifestLake.append(spark, dir, spark.range(0, 60)
      .select($"id".cast("int").as("n"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        $"id".cast("int").as("k"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          $"id".cast("int")).as("d")), "source",
      maxRecordsPerFile = 16L, statsCols = Seq("n", "k", "d"),
      bloomCols = Seq("k"))                                        // v1
    // int → double
    ManifestLake.widenColumn(dir, "n", DoubleType)
    // int → decimal(10, 0)
    ManifestLake.widenColumn(dir, "k", DecimalType(10, 0))
    // date → timestamp_ntz: the column's stats are stripped
    val statsBefore = ManifestLake.latestSnapshot(dir).get.stats
    assert(statsBefore.valuesIterator.flatten.exists(_.col == "d"))
    ManifestLake.widenColumn(dir, "d", TimestampNTZType)
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(!snap.stats.valuesIterator.flatten.exists(_.col == "d"),
      "date→timestamp_ntz must strip the column's range stats " +
        "(epoch-day vs epoch-micros units)")
    assert(snap.stats.valuesIterator.flatten.exists(_.col == "n"),
      "numeric widenings keep their stats (BigDecimal units align)")
    assert(!snap.blooms.valuesIterator.flatten.exists(_.col == "k"),
      "integral→decimal strips the column's blooms (canonical hash " +
        "changes kind)")
    // gen-2 lands the WIDENED types, with values impossible pre-widen
    ManifestLake.append(spark, dir, spark.range(60, 80)
      .select(($"id" + 0.5).as("n"), lit("s0").as("source"),
        $"id".cast("decimal(10,0)").as("k"),
        lit(java.time.LocalDateTime.parse("2021-06-01T12:30:00"))
          .cast(TimestampNTZType).as("d")),
      "source", maxRecordsPerFile = 16L, statsCols = Seq("n", "k", "d")) // v+
    // one scan reads BOTH generations upcast, on BOTH read paths
    def checkRead(df: org.apache.spark.sql.DataFrame): Unit = {
      assert(df.count() == 80L)
      val sumN = df.agg(sum($"n")).head().getDouble(0)
      assert(math.abs(sumN - ((0 until 60).map(_.toDouble).sum +
        (60 until 80).map(_ + 0.5).sum)) < 1e-9, sumN.toString)
      assert(df.agg(sum($"k")).head().getDecimal(0).longValueExact() ==
        (0L until 80L).sum)
      assert(df.filter($"d" === lit(java.time.LocalDateTime
        .parse("2020-01-05T00:00:00")).cast(TimestampNTZType)).count() == 1,
        "date-era rows serve as midnight timestamps")
    }
    checkRead(ManifestLake.read(spark, dir))
    checkRead(spark.read.format("graft").option("path", dir).load())
    // principled refusals
    val eLong = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir, "source", DoubleType))
    assert(eLong.getMessage.contains("lossless"))
    val dir2 = tmp("tw_wide2")
    ManifestLake.append(spark, dir2, spark.range(0, 10)
      .select($"id".as("doc_id"), lit("s0").as("source"),
        $"id".cast("int").as("v")), "source")
    // long→double rounds above 2^53; int→float above 2^24
    assert(intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir2, "doc_id", DoubleType))
      .getMessage.contains("lossless"))
    assert(intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir2, "v", FloatType))
      .getMessage.contains("lossless"))
    // integral→decimal with scale, or too-small precision, refuses
    assert(intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir2, "v", DecimalType(12, 2)))
      .getMessage.contains("lossless"))
    assert(intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir2, "v", DecimalType(9, 0)))
      .getMessage.contains("lossless"))
    // class-changing widening of the partition column refuses
    val dir3 = tmp("tw_wide3")
    ManifestLake.append(spark, dir3, spark.range(0, 10)
      .select($"id".as("doc_id"), $"id".cast("int").as("part"),
        lit(1L).as("v")), "part")
    assert(intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir3, "part", DoubleType))
      .getMessage.contains("partition"))
    // ...while integral-chain widening of the partition column is fine
    ManifestLake.widenColumn(dir3, "part", LongType)
    assert(ManifestLake.read(spark, dir3).count() == 10L)
  }

  /** NESTED widening: a struct LEAF's committed type widens in one
    * metadata commit — old files' nested int32 pages upcast at scan
    * time exactly like top-level columns (same reader machinery, here
    * probed one level down, on both read paths and through the SQL
    * DDL face). Composes with nested rename (address by the current
    * logical path); lossy nested flips refuse. */
  test("NESTED ALTER COLUMN TYPE: struct leaves widen metadata-only; both generations read; lossy refuses") {
    val dir = tmp("tw_nested")
    spark.conf.set("spark.sql.catalog.graft_twn", classOf[GraftCatalog].getName)
    ManifestLake.append(spark, dir, spark.range(0, 40).select(
      $"id".as("doc_id"),
      concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
      struct($"id".cast("int").as("n"),
        concat(lit("t"), $"id".cast("string")).as("tag")).as("meta")),
      "source", maxRecordsPerFile = 16L, statsCols = Seq("doc_id"))  // v1
    val filesBefore = ManifestLake.latestSnapshot(dir).get.files.toSet
    spark.sql(s"ALTER TABLE graft_twn.`$dir` " +
      "ALTER COLUMN meta.n TYPE BIGINT")                             // v2
    val v2 = ManifestLake.latestSnapshot(dir).get
    assert(v2.files.toSet == filesBefore, "no byte rewritten")
    assert(v2.schema.get(v2.schema.get.fieldIndex("meta")).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("n")
      .dataType == LongType)
    // gen-2 lands int64 leaf values ABOVE Int.MaxValue
    ManifestLake.append(spark, dir, spark.range(40, 50).select(
      $"id".as("doc_id"), lit("s0").as("source"),
      struct(($"id" + 3000000000L).as("n"),
        concat(lit("t"), $"id".cast("string")).as("tag")).as("meta")),
      "source", maxRecordsPerFile = 16L)                             // v3
    def checkRead(df: org.apache.spark.sql.DataFrame): Unit = {
      assert(df.count() == 50L)
      assert(df.agg(sum($"meta.n")).head().getLong(0) ==
        (0L until 40L).sum + (40L until 50L).map(_ + 3000000000L).sum)
    }
    checkRead(ManifestLake.read(spark, dir))
    checkRead(spark.read.format("graft").option("path", dir).load())
    // a narrower frame refuses at evolution (writers carry the wide type)
    val e0 = intercept[IllegalStateException](
      ManifestLake.append(spark, dir, spark.range(0, 1).select(
        $"id".as("doc_id"), lit("s0").as("source"),
        struct($"id".cast("int").as("n"), lit("t").as("tag")).as("meta")),
        "source"))
    assert(e0.getMessage.contains("schema evolution"), e0.getMessage)
    // composes with nested rename: widen via the CURRENT logical path
    ManifestLake.renameColumn(dir, Seq("meta", "tag"), "label")      // v4
    intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir, Seq("meta", "label"), LongType)) // lossy
    // lossy nested flips refuse with the widening message
    val e1 = intercept[IllegalArgumentException](
      ManifestLake.widenColumn(dir, Seq("meta", "n"), IntegerType))
    assert(e1.getMessage.contains("lossless"), e1.getMessage)
    // era-correct: v1 still serves the int leaf
    val old = ManifestLake.read(spark, dir, ManifestLake.snapshotAt(dir, 1L))
    assert(old.schema(old.schema.fieldIndex("meta")).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("n")
      .dataType == IntegerType)
  }
}
