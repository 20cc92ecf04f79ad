package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property coverage for the self-derived DML detection pruning
  * ([[ManifestLake.selfCandidates]] over [[GraftPrune.filtersOf]]) —
  * the conservativeness law the whole fast path rests on: for ANY
  * predicate, the candidate set must be a SUPERSET of the files that
  * actually hold a matching row (a dropped conjunct may only widen
  * it). A violation is a silent partial DELETE/UPDATE — the worst
  * failure class the lake has — so this is pinned over a generated
  * predicate zoo (ranges, equalities, INs, ORs, arithmetic the
  * translator must DROP, cast-wrapped literals, partition-column
  * equality, null-valued comparisons), not a case table. Also checks
  * the other direction where exactness is expected: a bare clustered
  * range prunes to strictly fewer files than the lake (the fast path
  * actually engages). */
class PrunePropertySpec extends SparkSpec {
  import spark.implicits._

  private def ground(dir: String, snap: ManifestLake.Snapshot,
                     pred: Column): Set[String] = {
    // files that truly hold a matching row, from a full scan
    val reader = snap.schema.foldLeft(spark.read.option("basePath", dir))(_ schema _)
    reader.parquet(snap.files.map(f => s"$dir/$f"): _*)
      .filter(coalesce(pred, lit(false)))
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => r.getString(0)).toSet
      .map { (uri: String) =>
        val p = java.nio.file.Paths.get(java.net.URI.create(uri).getPath)
        s"${p.getParent.getFileName}/${p.getFileName}"
      }
  }

  test("candidates are always a superset of the files holding matches") {
    val dir = Files.createTempDirectory("pruneprop").resolve("lake").toString
    // clustered on doc_id with stats + bloom; two partitions; a null
    // stripe in n_chars so three-valued logic is exercised
    val df = spark.range(0, 600)
      .select($"id".as("doc_id"),
        concat(lit("s"), ($"id" % 2).cast("string")).as("source"),
        when($"id" % 7 === 0, lit(null).cast("long"))
          .otherwise($"id" * 10).as("n_chars"))
    ManifestLake.append(spark, dir, df.repartitionByRange(10, $"doc_id"),
      "source", statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.files.length >= 10)

    val rnd = new scala.util.Random(1234L)
    def randLo(): Long = rnd.nextLong(700L) - 50L
    val preds: Seq[(String, Column)] =
      (1 to 12).map { _ =>
        val lo = randLo(); val hi = lo + rnd.nextInt(200)
        (s"range[$lo,$hi)", $"doc_id" >= lo && $"doc_id" < hi)
      } ++
      (1 to 6).map { _ =>
        val v = randLo()
        (s"eq($v)", $"doc_id" === v)
      } ++
      (1 to 4).map { _ =>
        val vs = Seq.fill(5)(randLo())
        (s"in(${vs.mkString(",")})", $"doc_id".isin(vs: _*))
      } ++
      Seq(
        ("or-of-ranges", $"doc_id" < 30 || $"doc_id" >= 570),
        ("partition-eq", $"source" === "s1" && $"doc_id" < 100),
        ("arith-untranslatable", $"doc_id" % 17 === 0),
        ("mixed", $"doc_id" % 17 === 0 && $"doc_id" < 200),
        ("cast-wrapped", $"doc_id" >= 100 && $"doc_id" < lit(150)),
        ("null-compare", $"n_chars" > 1000L),
        ("null-eq", $"n_chars".isNull && $"doc_id" < 50),
        ("string-range", $"source" >= "s0" && $"source" <= "s0"),
        ("always-false", $"doc_id" < -100),
        ("sql-expr", expr("doc_id BETWEEN 200 AND 260 AND source = 's0'")))

    for ((name, pred) <- preds) {
      val truth = ground(dir, snap, pred)
      ManifestLake.selfCandidates(spark, snap, pred) match {
        case None => () // no pruning claimed — trivially conservative
        case Some(cands) =>
          val missing = truth -- cands.toSet
          assert(missing.isEmpty,
            s"$name: pruning DROPPED files with matches: ${missing.take(3)}")
      }
    }

    // the fast path must actually engage on the shapes it exists for
    val engaged = ManifestLake.selfCandidates(spark, snap,
      $"doc_id" >= 100 && $"doc_id" < 150)
    assert(engaged.exists(c => c.nonEmpty && c.size < snap.files.size),
      s"clustered range should prune: $engaged vs ${snap.files.size}")
    // equality consults the bloom/stats planes and narrows further
    val point = ManifestLake.selfCandidates(spark, snap, $"doc_id" === 123L)
    assert(point.exists(_.size <= engaged.get.size))
    // an untranslatable-only predicate claims nothing rather than lying
    assert(ManifestLake.selfCandidates(spark, snap, $"doc_id" % 17 === 0).isEmpty)
  }

  /** The PARTITION-DIRECTORY layer of [[ManifestLake.pruneFilesForKeys]]
    * (r15): a partition column is directory-encoded — never stored in
    * the file, so it can carry no footer stats or blooms — and without
    * this layer every partition-keyed probe (keyed deletes, the
    * agg-view current-rows fetch, the min/max rescan) degraded to the
    * full file list. Pinned: exact per-key escaped-dir match, Hive
    * escaping parity with the writer, NULL keys and non-partition
    * columns stay conservative (full list). */
  test("pruneFilesForKeys: partition-directory layer keeps exactly the touched partitions") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    val dirs = Seq("a", "b", "c d", "x:y").map(escapePathName)
    val files = dirs.toVector.map(d => s"g=$d/f.parquet")
    val snap = ManifestLake.Snapshot(1L, files,
      schema = Some(StructType(Seq(
        StructField("g", StringType), StructField("v", LongType)))),
      props = Map("partitionCol" -> "g"))
    assert(ManifestLake.pruneFilesForKeys(snap, "g", Seq("a")) ==
      files.take(1))
    // values needing Hive escaping match their escaped directories
    assert(ManifestLake.pruneFilesForKeys(snap, "g", Seq("c d", "x:y"))
      .toSet == files.drop(2).toSet)
    // an unknown key keeps nothing (no directory can hold it)
    assert(ManifestLake.pruneFilesForKeys(snap, "g", Seq("zz")).isEmpty)
    // a NULL key bails to the full list (conservative, never wrong)
    assert(ManifestLake.pruneFilesForKeys(snap, "g", Seq("a", null)) == files)
    // a NON-partition column without stats stays conservative too
    assert(ManifestLake.pruneFilesForKeys(snap, "v", Seq(5L)) == files)
  }
}
