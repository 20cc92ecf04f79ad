package graft.core

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins the r17 manifest-planned Scala read path: lake reads go
  * through [[org.apache.spark.sql.graftbridge.GraftManifestFileIndex]]
  * (zero directory listing — guide §6's "manifest metadata avoids
  * directory listing altogether") and must be indistinguishable from
  * the listing-based `spark.read.option("basePath", …)` read they
  * replaced: same rows, same schema (order and nullability), partition
  * values restored from escaped directory names, and partition-column
  * filters pruning at the index exactly like
  * `PartitioningAwareFileIndex.prunePartitions`. */
class ManifestScanSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("lake").toString

  test("read() equals the listing-based read: rows, schema, partition restore") {
    val dir = freshLake("mscan_eq")
    // a partition value that needs Hive path escaping (space + colon)
    val df = spark.range(0, 300).select(
      $"id".as("doc_id"),
      concat(lit("txt"), $"id").as("text"),
      when($"id" % 3 === 0, "src a:1")
        .when($"id" % 3 === 1, "src_b").otherwise("src_c").as("source"))
    ManifestLake.append(spark, dir, df, "source", maxRecordsPerFile = 64L,
      statsCols = Seq("doc_id"))

    val viaManifest = ManifestLake.read(spark, dir)
    val snap = ManifestLake.latestSnapshot(dir).get
    val viaListing = snap.schema
      .foldLeft(spark.read.option("basePath", dir))(_ schema _)
      .parquet(snap.files.map(f => s"$dir/$f"): _*)

    assert(viaManifest.schema == viaListing.schema,
      s"schema drift: ${viaManifest.schema} vs ${viaListing.schema}")
    val a = viaManifest.orderBy($"doc_id").collect().toSeq
    val b = viaListing.orderBy($"doc_id").collect().toSeq
    assert(a == b)
    // the plan really is manifest-fed, not a silent fallback
    val scan = viaManifest.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.relation.location.getClass.getSimpleName ==
      "GraftManifestFileIndex",
      s"expected manifest index, got ${scan.relation.location}")
  }

  test("partition-column filter prunes at the index") {
    val dir = freshLake("mscan_prune")
    val df = spark.range(0, 200).select(
      $"id".as("doc_id"),
      concat(lit("s"), ($"id" % 4)).as("source"))
    ManifestLake.append(spark, dir, df, "source")

    val filtered = ManifestLake.read(spark, dir).filter($"source" === "s2")
    assert(filtered.count() == 50)
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "partition filter did not reach the scan")
    val kept = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    val dirs = kept.flatMap(_.files.map(_.getPath.getParent.getName)).distinct
    assert(dirs == Seq("source=s2"), s"index served partitions: $dirs")
  }

  test("input_file_name and _metadata ride the manifest scan (DML detection contract)") {
    val dir = freshLake("mscan_meta")
    val df = spark.range(0, 100).select(
      $"id".as("doc_id"), concat(lit("s"), ($"id" % 2)).as("source"))
    ManifestLake.append(spark, dir, df, "source")
    val snap = ManifestLake.latestSnapshot(dir).get
    val named = ManifestLake.read(spark, dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect()
    assert(named.forall(_.getString(0).nonEmpty))
    val rels = named.map(r => ManifestLake.relFromUri(r.getString(0))).distinct
    assert(rels.forall(snap.files.contains),
      s"input_file_name resolved outside the snapshot: ${rels.take(3).toSeq}")
    // and the DML path built on it still works end to end
    val removed = ManifestLake.deleteWhere(spark, dir, $"doc_id" % 10 === 3)
    assert(removed == 10L)
    assert(ManifestLake.read(spark, dir).count() == 90L)
  }
}
