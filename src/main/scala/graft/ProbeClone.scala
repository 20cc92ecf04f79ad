package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.ManifestLake

/** Scale probe for the round's metadata-side features:
  *
  *  - `clone`: wall time must track FILE COUNT (hard links + one
  *    manifest commit), never data bytes — the probe verifies
  *    zero-copy by inode identity (every cloned file shares its
  *    `fileKey` with the source) and by content census;
  *  - CHECK-constraint write guard: the row-wise codegen'd guard
  *    rides the staged write, so a guarded append's overhead over an
  *    unguarded one of the SAME delta must be a small constant
  *    factor, flat in corpus size (the guard never scans the lake).
  *
  * `runMain graft.ProbeClone <corpusDir> <workDir> <recordsPerFile>`
  * builds one lake from `documents` (untimed; `recordsPerFile`
  * controls the file count, the clone cost driver), then times clone
  * and the guarded/unguarded append pair. One JSON line per step.
  */
object ProbeClone {
  def main(args: Array[String]): Unit = {
    val Array(src, work, rpf) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = graft.core.Tables.documents(spark, src)
      .select($"doc_id", $"text", $"source")
    def lake(name: String): String = s"$work/$name"
    def timed[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1000000L)
    }

    // corpus lake (untimed build)
    val srcLake = lake("clone_src")
    ManifestLake.append(spark, srcLake, corpus.repartition($"source"),
      "source", maxRecordsPerFile = rpf.toLong,
      statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val snap = ManifestLake.latestSnapshot(srcLake).get
    val rows = ManifestLake.read(spark, srcLake).count()

    // 1. clone: time ∝ files, zero data bytes copied
    val dst = lake("clone_dst")
    val (_, cloneMs) = timed(ManifestLake.clone(srcLake, dst))
    val shared = snap.files.forall { f =>
      def key(d: String) = Files.readAttributes(Paths.get(d).resolve(f),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      key(srcLake) == key(dst)
    }
    val cloneRows = ManifestLake.read(spark, dst).count()
    println(s"""{"step":"clone","files":${snap.files.length},""" +
      s""""ms":$cloneMs,"rows":$rows,"rows_cloned":$cloneRows,""" +
      s""""zero_copy":$shared}""")
    require(shared && cloneRows == rows, "clone probe integrity")

    // 2. guarded vs unguarded append of the SAME fixed delta
    val delta = corpus.limit(20000)
      .withColumn("doc_id", $"doc_id" + 900000000L).cache()
    delta.count()
    val plainLake = lake("append_plain")
    val checkedLake = lake("append_checked")
    Seq(plainLake, checkedLake).foreach { l =>
      ManifestLake.append(spark, l, corpus.repartition($"source"), "source",
        maxRecordsPerFile = rpf.toLong, statsCols = Seq("doc_id"))
    }
    ManifestLake.addConstraint(spark, checkedLake,
      "ids_bounded", "doc_id < 2000000000")
    ManifestLake.addConstraint(spark, checkedLake,
      "source_present", "source IS NOT NULL")
    val (_, plainMs) = timed(
      ManifestLake.append(spark, plainLake, delta, "source",
        maxRecordsPerFile = 4096L))
    val (_, checkedMs) = timed(
      ManifestLake.append(spark, checkedLake, delta, "source",
        maxRecordsPerFile = 4096L))
    println(s"""{"step":"append_plain","ms":$plainMs,"delta_rows":20000}""")
    println(s"""{"step":"append_checked","ms":$checkedMs,""" +
      s""""delta_rows":20000,"constraints":2}""")
    spark.stop()
  }
}
