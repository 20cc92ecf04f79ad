package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NESTED-LEAF DATA SKIPPING: declared dotted statsCols
  * (`Seq("meta.ts")`) surface parquet's per-leaf footer stats into the
  * manifest, keyed by the dotted PHYSICAL leaf path, so range filters
  * on struct leaves prune files — through the Scala prune API and the
  * DSv2 scan's pushed filters alike, and THROUGH nested rename and
  * widen (the mapping translates the logical path back to the physical
  * stats key; a widen strips stats exactly where the parquet encoding
  * changes, same rule as top-level). Before this, PLANS.md's q185
  * entry documented "filters on renamed nested leaves conservatively
  * un-prune" — this spec makes that sentence obsolete. */
class NestedSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  private def scanOf(df: org.apache.spark.sql.DataFrame): GraftScan =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.collectFirst { case g: GraftScan => g }
      .getOrElse(fail("no GraftScan in the optimized plan"))

  test("dotted statsCols collect per-leaf footer stats; struct-leaf filters prune files end-to-end") {
    val dir = tmp("nested_skip")
    // 10 range-clustered files per partition on meta.ts (int leaf, so
    // the widen leg below is a real int→long)
    val docs = spark.range(0, 1000).select(
      $"id".as("doc_id"),
      struct(($"id" * 10).cast("int").as("ts"),
        ($"id" % 7).cast("int").as("sev")).as("meta"),
      when($"id" % 2 === 0, "even").otherwise("odd").as("source"))
    ManifestLake.append(spark, dir,
      docs.repartitionByRange(10, $"meta.ts"), "source",
      statsCols = Seq("meta.ts", "doc_id"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.stats.valuesIterator.flatten.exists(_.col == "meta.ts"),
      "per-leaf stats must land in the manifest under the dotted path")
    // the Scala prune API answers on the dotted key
    val expect = ManifestLake.pruneFiles(snap, "meta.ts",
      BigDecimal(2500), BigDecimal(2600))
    assert(expect.nonEmpty && expect.length < snap.files.length,
      s"a narrow meta.ts range must prune: kept ${expect.length} of " +
        s"${snap.files.length}")
    // DSv2: the struct-leaf filter is PUSHED and prunes the planned set
    val lakeDf = spark.read.format("graft").load(dir)
    val q = lakeDf.filter($"meta.ts" >= 2500 && $"meta.ts" <= 2600)
    val scan = scanOf(q)
    assert(scan.pushed.nonEmpty,
      "the nested-leaf filter must reach the scan for pruning")
    assert(scan.keptFiles == expect,
      s"DSv2 kept ${scan.keptFiles.length}, Scala prune says ${expect.length}")
    assert(q.count() == 11 &&
      q.agg(sum($"doc_id")).head().getLong(0) == (250L to 260L).sum)

    // RENAME the leaf: the logical path changes, the stats key (the
    // physical path) does not — pruning survives via the mapping
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterRenameNested(Seq("meta", "ts"), "when")))
    val q2 = spark.read.format("graft").load(dir)
      .filter($"meta.when" >= 2500 && $"meta.when" <= 2600)
    val scan2 = scanOf(q2)
    assert(scan2.keptFiles == expect,
      "pruning must survive a nested RENAME (logical→physical path walk)")
    assert(q2.count() == 11)

    // WIDEN the renamed leaf int→long: stats survive (encoding-exact
    // widening), pruning still fires; the filter value is now long
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterWidenNested(Seq("meta", "when"),
        org.apache.spark.sql.types.LongType)))
    val q3 = spark.read.format("graft").load(dir)
      .filter($"meta.when" >= 2500L && $"meta.when" <= 2600L)
    val scan3 = scanOf(q3)
    assert(scan3.keptFiles == expect,
      "pruning must survive a nested WIDEN whose stats survive")
    assert(q3.count() == 11 &&
      q3.select(sum($"meta.when")).head().getLong(0) == (2500L to 2600L by 10).sum)

    // a MIXED-era scan: append generation-2 rows under the LOGICAL
    // shape (long `when`), check stats land for them and both eras
    // prune as one index
    val docs2 = spark.range(1000, 2000).select(
      $"id".as("doc_id"),
      struct(($"id" * 10).as("when"),
        ($"id" % 7).cast("int").as("sev")).as("meta"),
      when($"id" % 2 === 0, "even").otherwise("odd").as("source"))
    ManifestLake.append(spark, dir,
      docs2.repartitionByRange(10, $"meta.when"), "source",
      statsCols = Seq("meta.ts", "doc_id")) // declared key: PHYSICAL path
    val snap2 = ManifestLake.latestSnapshot(dir).get
    val gen2 = snap2.files.filterNot(snap.files.toSet)
    assert(gen2.forall(f => snap2.stats.getOrElse(f, Vector.empty)
        .exists(_.col == "meta.ts")),
      "generation-2 files must carry the leaf stats under the same key")
    val wide = spark.read.format("graft").load(dir)
      .filter($"meta.when" >= 2500L && $"meta.when" <= 12600L)
    val scanW = scanOf(wide)
    assert(scanW.keptFiles.length < snap2.files.length,
      "the mixed-era range must still prune")
    assert(wide.count() === (2500L to 12600L by 10).length.toLong)
  }

  /** date→timestamp_ntz changes the parquet encoding — the nested
    * widen must STRIP the leaf's stats (stale date-ordinal bounds
    * would mis-prune timestamp probes), mirroring the top-level
    * rule. */
  test("a nested widen that changes encodings strips the leaf's stats") {
    val dir = tmp("nested_strip")
    val docs = spark.range(0, 100).select(
      $"id".as("doc_id"),
      struct(date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        $"id".cast("int")).as("d")).as("meta"),
      lit("all").as("source"))
    ManifestLake.append(spark, dir, docs.repartitionByRange(4, $"meta.d"),
      "source", statsCols = Seq("meta.d"))
    assert(ManifestLake.latestSnapshot(dir).get
      .stats.valuesIterator.flatten.exists(_.col == "meta.d"))
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterWidenNested(Seq("meta", "d"),
        org.apache.spark.sql.types.TimestampNTZType)))
    val after = ManifestLake.latestSnapshot(dir).get
    assert(!after.stats.valuesIterator.flatten.exists(_.col == "meta.d"),
      "date→timestamp_ntz must strip the nested leaf's stats")
    // and the data still reads whole under the widened type
    assert(ManifestLake.read(spark, dir).count() == 100L)
  }

  test("readWhere prunes on a nested leaf, through a rename") {
    val dir = tmp("nested_readwhere")
    val docs = spark.range(0, 1000).select(
      $"id".as("doc_id"),
      struct(($"id" * 10).as("ts")).as("meta"),
      lit("all").as("source"))
    ManifestLake.append(spark, dir,
      docs.repartitionByRange(10, $"meta.ts"), "source",
      statsCols = Seq("meta.ts"))
    val got = ManifestLake.readWhere(spark, dir, "meta.ts",
      BigDecimal(2500), BigDecimal(2600))
    assert(got.count() == 11 &&
      got.select(sum($"meta.ts")).head().getLong(0) == (2500L to 2600L by 10).sum)
    // after a rename, the LOGICAL path prunes to the same answer
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterRenameNested(Seq("meta", "ts"), "when")))
    val got2 = ManifestLake.readWhere(spark, dir, "meta.when",
      BigDecimal(2500), BigDecimal(2600))
    assert(got2.count() == 11 &&
      got2.select(sum($"meta.when")).head().getLong(0) == (2500L to 2600L by 10).sum)
  }

  /** NESTED-LEAF BLOOMS (r16): dotted bloomCols build per-file point-
    * lookup filters from the struct leaf — the shape a `from_json`
    * corpus needs for `meta.request_id = 'x'` probes, where the leaf
    * is high-cardinality and UNCLUSTERED so range stats keep every
    * file. Pinned: manifest keying under the dotted path, Scala
    * readPoint and DSv2 pushed-equality prune sets identical, the
    * probe survives a nested RENAME (physical-path keying), and an
    * encoding-changing WIDEN strips exactly that leaf's blooms. */
  test("dotted bloomCols: struct-leaf point lookup prunes files, survives rename, widen strips") {
    val dir = tmp("nested_bloom")
    // request ids INTERLEAVED across files (hash layout): every file's
    // range covers every probe, so the bloom is the only subtractive
    // layer — the honest shape for this index
    val docs = spark.range(0, 1000).select(
      $"id".as("doc_id"),
      struct(concat(lit("req-"), $"id".cast("string")).as("rid"),
        ($"id" % 7).cast("int").as("sev")).as("meta"),
      when($"id" % 2 === 0, "even").otherwise("odd").as("source"))
    ManifestLake.append(spark, dir, docs.repartition(8), "source",
      maxRecordsPerFile = 128L,
      statsCols = Seq("doc_id"),
      bloomCols = Seq("meta.rid", "meta.sev"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.blooms.valuesIterator.flatten.exists(_.col == "meta.rid"),
      "leaf blooms must land in the manifest under the dotted path")
    assert(snap.files.length > 4, s"want a multi-file lake, got ${snap.files.length}")
    // Scala face: the point prune collapses the file list
    val kept = ManifestLake.pruneFilesPoint(snap, "meta.rid", "req-500")
    assert(kept.nonEmpty && kept.length < snap.files.length,
      s"bloom must prune: kept ${kept.length} of ${snap.files.length}")
    assert(ManifestLake.readPoint(spark, dir, "meta.rid", "req-500")
      .count() == 1L)
    // an absent value keeps (almost) nothing — false positives are
    // allowed by the filter's contract, wrong rows are not
    assert(ManifestLake.readPoint(spark, dir, "meta.rid", "req-no-such")
      .count() == 0L)
    // DSv2: pushed equality on the leaf consults the same blooms
    val q = spark.read.format("graft").load(dir)
      .filter($"meta.rid" === "req-500")
    val scan = scanOf(q)
    assert(scan.keptFiles == kept,
      s"DSv2 kept ${scan.keptFiles.length}, Scala prune says ${kept.length}")
    assert(q.count() == 1L)
    // RENAME the leaf: blooms key on the physical path — the probe
    // under the new logical name prunes identically
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterRenameNested(Seq("meta", "rid"), "request_id")))
    val snapR = ManifestLake.latestSnapshot(dir).get
    assert(ManifestLake.readPoint(spark, dir, "meta.request_id", "req-500")
      .count() == 1L)
    val q2 = spark.read.format("graft").load(dir)
      .filter($"meta.request_id" === "req-500")
    assert(scanOf(q2).keptFiles == kept,
      "bloom pruning must survive a nested RENAME")
    // WIDEN meta.sev int→double: the parquet encoding changes, so THAT
    // leaf's blooms strip (stale int-hashes would false-negative a
    // double probe) while meta.rid's survive untouched
    ManifestLake.alterSchema(dir, Seq(
      ManifestLake.AlterWidenNested(Seq("meta", "sev"),
        org.apache.spark.sql.types.DoubleType)))
    val snapW = ManifestLake.latestSnapshot(dir).get
    assert(!snapW.blooms.valuesIterator.flatten.exists(_.col == "meta.sev"),
      "an encoding-changing widen must strip the widened leaf's blooms")
    assert(snapW.blooms.valuesIterator.flatten.exists(_.col == "meta.rid"),
      "...and leave the other leaf's blooms alone")
    assert(ManifestLake.readPoint(spark, dir, "meta.request_id", "req-500")
      .count() == 1L)
  }

  test("create() accepts dotted statsCols that resolve to a leaf, refuses the rest") {
    import org.apache.spark.sql.types._
    val ok = tmp("nested_create_ok")
    ManifestLake.create(ok, StructType(Seq(
      StructField("source", StringType),
      StructField("meta", StructType(Seq(StructField("ts", LongType)))))),
      "source", statsCols = Seq("meta.ts"))
    assert(ManifestLake.latestSnapshot(ok).get
      .declaredStatsCols == Seq("meta.ts"))
    val bad = tmp("nested_create_bad")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.create(bad, StructType(Seq(
        StructField("source", StringType),
        StructField("meta", StructType(Seq(StructField("ts", LongType)))))),
        "source", statsCols = Seq("meta.nope"))
    }
    assert(e.getMessage.contains("meta.nope"), e.getMessage)
    // bloomCols follow the same rule (dotted leaf ok, unknown refuses)
    val okB = tmp("nested_create_okb")
    ManifestLake.create(okB, StructType(Seq(
      StructField("source", StringType),
      StructField("meta", StructType(Seq(StructField("rid", StringType)))))),
      "source", bloomCols = Seq("meta.rid"))
    assert(ManifestLake.latestSnapshot(okB).get
      .declaredBloomCols == Seq("meta.rid"))
    val badB = tmp("nested_create_badb")
    val eb = intercept[IllegalArgumentException] {
      ManifestLake.create(badB, StructType(Seq(
        StructField("source", StringType),
        StructField("meta", StructType(Seq(StructField("rid", StringType)))))),
        "source", bloomCols = Seq("meta.nope"))
    }
    assert(eb.getMessage.contains("meta.nope"), eb.getMessage)
  }
}
