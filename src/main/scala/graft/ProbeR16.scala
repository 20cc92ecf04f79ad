package graft

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-16 instrumentation probe (VERDICT r15 ask #1): name the
  * lifecycle-row bench variance. Runs ONE catalog query in a loop at
  * the configured cpu count, recording per-pass wall + GC delta and a
  * per-stage census (run time, GC time, task count, shuffle bytes)
  * from a SparkListener — then prints the top stages of the slowest
  * and fastest pass side by side, so the pass-to-pass delta is
  * attributable to a NAMED stage instead of adjudicated as weather.
  *
  * Usage: runMain graft.ProbeR16 <queryName> [passes]
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeR16 {

  private final case class StageRow(id: Int, name: String, tasks: Int,
                                    runMs: Long, cpuMs: Long, deserMs: Long,
                                    gcMs: Long,
                                    shufReadMb: Double, shufWriteMb: Double)

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum

  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q174_incremental_view")
    val passes = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId,
            si.name.linesIterator.next().take(90), si.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.executorDeserializeTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    })

    val fn = SparkEntry.queries(qname)
    // warm-up: table scans only (match Bench)
    Seq("documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    }

    val perPass = mutable.ArrayBuffer.empty[(Int, Double, Long, Seq[StageRow])]
    var p = 0
    while (p < passes) {
      stages.synchronized(stages.clear())
      val gc0 = gcMillis(); val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = gcMillis() - gc0
      graft.core.Resources.release()
      System.gc()
      val snap = stages.synchronized(stages.toVector)
      perPass += ((p, wall, gc, snap))
      println(f"[probe] pass $p: wall $wall%.1f s, gc ${gc}ms, " +
        s"stages ${snap.size}, tasks ${snap.map(_.tasks).sum}, " +
        f"stageRun ${snap.map(_.runMs).sum / 1000.0}%.1f s, " +
        f"stageCpu ${snap.map(_.cpuMs).sum / 1000.0}%.1f s, " +
        f"deser ${snap.map(_.deserMs).sum / 1000.0}%.1f s, " +
        f"stageGc ${snap.map(_.gcMs).sum / 1000.0}%.1f s")
      p += 1
    }
    val slow = perPass.maxBy(_._2); val fast = perPass.minBy(_._2)
    def dump(tag: String, pp: (Int, Double, Long, Seq[StageRow])): Unit = {
      println(f"[probe] === $tag pass ${pp._1} wall ${pp._2}%.1f s ===")
      pp._4.sortBy(-_.runMs).take(14).foreach { r =>
        println(f"[probe]   stage ${r.id}%4d run ${r.runMs / 1000.0}%7.1f s " +
          f"cpu ${r.cpuMs / 1000.0}%7.1f s deser ${r.deserMs / 1000.0}%5.1f s " +
          f"gc ${r.gcMs / 1000.0}%5.1f s tasks ${r.tasks}%4d " +
          f"shW ${r.shufWriteMb}%7.1f MB  ${r.name}")
      }
    }
    dump("SLOWEST", slow); dump("FASTEST", fast)
    // stage-count histogram: a pass with MORE stages is doing more jobs
    println(s"[probe] per-pass stage counts: " +
      perPass.map(x => s"${x._1}:${x._4.size}").mkString(" "))
    spark.stop()
  }
}
