package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-query resource hygiene: broadcasts and cached datasets a query
  * allocates are REGISTERED here and torn down by the harness
  * ([[graft.Bench]]/[[graft.Verify]] call [[release]] after each
  * query's action completes). Without this, a 60+-query run
  * accumulates every broadcast block on the executors — BENCH_r02
  * showed the resulting drift (q31: identical plan, 0.94 s → 4.59 s;
  * q54: a trivial groupBy recorded at 27 s) because the heap filled
  * with dead broadcast blocks and every query paid the GC bill of all
  * its predecessors.
  *
  * Queries stay lazy (the driver contract returns a DataFrame, not a
  * materialized result), so destruction can't live inside the query —
  * a broadcast must survive until the caller's action runs. The
  * registry is the contract: allocate through [[broadcast]]/[[persist]],
  * and whoever runs the action calls [[release]] when done.
  */
object Resources {

  private val broadcasts = new ConcurrentLinkedQueue[Broadcast[_]]()
  private val cached = new ConcurrentLinkedQueue[Dataset[_]]()

  /** `sparkContext.broadcast` + registration for later [[release]]. */
  def broadcast[T: ClassTag](s: SparkSession, value: T): Broadcast[T] = {
    val bc = s.sparkContext.broadcast(value)
    broadcasts.add(bc)
    bc
  }

  /** `ds.persist` + registration for later [[release]]. */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    cached.add(ds)
    ds
  }

  /** Destroy every registered broadcast and unpersist every registered
    * dataset. Safe to call when nothing is registered; safe to call
    * repeatedly. Blocking=false: the executors reclaim asynchronously,
    * which is enough — the point is that blocks become reclaimable at
    * all. */
  def release(): Unit = {
    var bc = broadcasts.poll()
    while (bc != null) {
      try bc.destroy() catch { case _: Throwable => () }
      bc = broadcasts.poll()
    }
    var ds = cached.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false) catch { case _: Throwable => () }
      ds = cached.poll()
    }
  }
}
