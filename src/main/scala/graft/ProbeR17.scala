package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-17 job-sequence probe: the heavy catalog rows are sequential
  * CHAINS of small Spark jobs (lake DML → CDF read → maintenance batch
  * → audit read), so per-STAGE census (ProbeR16) says "many tiny
  * stages" without naming which STEP owns them. This probe records
  * every job's wall span, description, stage/task counts and the GAP
  * since the previous job ended (driver-side think time: planning,
  * manifest IO, commit protocol — exactly what guide §7.3 says to look
  * for when nothing is running), then prints the job chain of one
  * pass. The chain attributes the row's cost step by step.
  *
  * Usage: runMain graft.ProbeR17 <queryName> [passes]
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeR17 {

  private final case class JobRow(id: Int, desc: String, startMs: Long,
                                  endMs: Long, stages: Int)

  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q188_join_view")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer.empty[JobRow]
    val starts = mutable.Map.empty[Int, (String, Long, Int)]
    val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts.synchronized {
          starts(e.jobId) = (d.linesIterator.next().take(110), e.time,
            e.stageInfos.size)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(e.jobId).foreach { case (d, t0, ns) =>
            jobs.synchronized { jobs += JobRow(e.jobId, d, t0, e.time, ns) }
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskCount.addAndGet(e.stageInfo.numTasks); ()
      }
    })

    val fn = SparkEntry.queries(qname)
    Seq("documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    }

    var best: (Double, Vector[JobRow]) = (Double.MaxValue, Vector.empty)
    var p = 0
    while (p < passes) {
      jobs.synchronized(jobs.clear()); taskCount.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.Resources.release()
      val snap = jobs.synchronized(jobs.sortBy(_.startMs).toVector)
      val jobSum = snap.map(r => r.endMs - r.startMs).sum / 1000.0
      println(f"[probe17] pass $p: wall $wall%.2f s, jobs ${snap.size}, " +
        f"jobSum $jobSum%.2f s, gapSum ${wall - jobSum}%.2f s, " +
        s"stages ${snap.map(_.stages).sum}, tasks ${taskCount.get()}")
      if (wall < best._1) best = (wall, snap)
      p += 1
    }
    // fastest pass's chain: jobs in submission order with inter-job gaps
    println(f"[probe17] === job chain of fastest pass (${best._1}%.2f s) ===")
    var prevEnd = 0L
    best._2.foreach { r =>
      val gap = if (prevEnd == 0) 0L else math.max(0L, r.startMs - prevEnd)
      prevEnd = math.max(prevEnd, r.endMs)
      println(f"[probe17]   job ${r.id}%4d ${(r.endMs - r.startMs) / 1000.0}%6.2f s " +
        f"(gap ${gap / 1000.0}%5.2f s) stages ${r.stages}%2d  ${r.desc}")
    }
    // aggregate by description so repeated steps sum up
    println("[probe17] === by description (fastest pass) ===")
    best._2.groupBy(_.desc).map { case (d, rs) =>
      (d, rs.size, rs.map(r => r.endMs - r.startMs).sum / 1000.0)
    }.toSeq.sortBy(-_._3).take(25).foreach { case (d, n, s) =>
      println(f"[probe17]   $s%6.2f s  x$n%-3d  $d")
    }
    spark.stop()
  }
}
