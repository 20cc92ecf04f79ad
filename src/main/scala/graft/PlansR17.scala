package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-17 optimization-evidence dumper: writes
  * `plans/r17/<query>_<tag>.txt` — the `explain("formatted")` output of
  * each named catalog query — so the before/after plan claims in
  * OPTIMIZATION_r17.md are machine-checkable without running Spark.
  *
  * Usage: runMain graft.PlansR17 <tag> <q1,q2,...> [sfDir]
  *   tag   = "before" | "after"
  *   sfDir = defaults to /root/testdata/sf0.001 (plan SHAPE is
  *           sf-independent; the smallest sf keeps the dump fast)
  */
object PlansR17 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").toSeq
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r17"))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/r17/${name}_$tag.txt"), plan)
        println(s"[plans-r17] wrote plans/r17/${name}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"[plans-r17] $name FAILED: $e")
      } finally graft.core.Resources.release()
    }
    spark.stop()
  }
}
