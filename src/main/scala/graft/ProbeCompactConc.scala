package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 probe: is [[graft.core.ManifestLake.compact]]'s bounded
  * per-unit rewrite pool actually achieving concurrency? ProbeR17's
  * q129 job chain shows its 20 per-unit write jobs ending back-to-back
  * with jobSum ≈ wall (no overlap) despite maxConcurrent=8. This
  * isolates it: one fragmented 20-partition lake per leg, compacted at
  * maxConcurrent 1 / 8 / 20 — if 8 ≈ 1, something in the driver path
  * serializes the pool and the fix is there, not in the job count.
  *
  * Usage: runMain graft.ProbeCompactConc [passes]
  */
object ProbeCompactConc {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val docs = graft.core.Tables.documents(s, sfDir)
      .select($"doc_id", $"text", $"source")

    def leg(conc: Int, dv: Boolean): Double = {
      val lake = java.nio.file.Files
        .createTempDirectory(s"graft_probe_compact_$conc").toString
      graft.core.ManifestLake.append(s, lake,
        docs.repartition($"source"), "source", maxRecordsPerFile = 16L)
      if (dv) graft.core.ManifestLake.deleteWhereDv(s, lake, $"doc_id" % 17 === 0)
      val t0 = System.nanoTime()
      graft.core.ManifestLake.compact(s, lake, "source",
        targetRecordsPerFile = 64L, maxConcurrent = conc)
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up
    leg(8, dv = false)
    var p = 0
    while (p < passes) {
      Seq(false, true).foreach { dv =>
        Seq(1, 8).foreach { c =>
          println(f"[probeCC] pass $p dv $dv%-5s conc $c%2d: ${leg(c, dv)}%.2f s")
        }
      }
      p += 1
    }
    s.stop()
  }
}
