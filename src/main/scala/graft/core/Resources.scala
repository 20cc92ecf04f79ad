package graft.core

import scala.collection.mutable.ArrayBuffer
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
  *
  * SCOPE: registries are per-thread, so concurrent harnesses (two
  * threads each doing build→run→release) are isolated — a release on
  * one thread can never destroy a broadcast a query on another thread
  * is still reading. Within one thread the contract is sequential
  * build→run→release per query: interleaving plan CONSTRUCTION of two
  * queries on the same thread and releasing between their actions
  * would reclaim the later build's resources (don't do that — the
  * harness and specs never do).
  */
object Resources {

  private val broadcasts = ThreadLocal.withInitial[ArrayBuffer[Broadcast[_]]](
    () => ArrayBuffer.empty)
  private val cached = ThreadLocal.withInitial[ArrayBuffer[Dataset[_]]](
    () => ArrayBuffer.empty)

  /** `sparkContext.broadcast` + registration for later [[release]]. */
  def broadcast[T: ClassTag](s: SparkSession, value: T): Broadcast[T] = {
    val bc = s.sparkContext.broadcast(value)
    broadcasts.get() += bc
    bc
  }

  /** `ds.persist` + registration for later [[release]]. */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    cached.get() += ds
    ds
  }

  /** Register an already-materialized dataset for unpersist at
    * [[release]] without re-persisting it. NOTE: this only frees
    * storage the CacheManager knows about — a `localCheckpoint`'s
    * blocks belong to an internal RDD the CacheManager never sees, so
    * `Dataset.unpersist` silently no-ops on them; checkpoint through
    * [[checkpoint]] instead, which tracks the underlying RDD ids. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    cached.get() += ds
    ds
  }

  private val checkpointRdds = ThreadLocal.withInitial[ArrayBuffer[(SparkSession, Int)]](
    () => ArrayBuffer.empty)

  /** Eager `localCheckpoint` + registration of the checkpoint's
    * PERSISTENT RDD ids so [[release]] can actually free the blocks
    * (`Dataset.unpersist` cannot — the storage belongs to an internal
    * RDD with no CacheManager entry). Ids are attributed by a
    * before/after diff of `sparkContext.getPersistentRDDs`, which is
    * exact under the registry's per-thread sequential contract
    * (checkpoint jobs run eagerly on the calling thread); a FOREIGN
    * thread persisting concurrently could be mis-attributed, the same
    * interleaving the class doc already rules out. */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    val before = s.sparkContext.getPersistentRDDs.keySet
    val out = ds.localCheckpoint(eager = true)
    val added = s.sparkContext.getPersistentRDDs.keySet -- before
    checkpointRdds.get() ++= added.map(id => (s, id))
    out
  }

  /** Destroy every broadcast and unpersist every dataset registered BY
    * THE CALLING THREAD. Safe to call when nothing is registered; safe
    * to call repeatedly. Blocking=false: the executors reclaim
    * asynchronously, which is enough — the point is that blocks become
    * reclaimable at all. */
  def release(): Unit = {
    val bcs = broadcasts.get()
    bcs.foreach { bc => try bc.destroy() catch { case _: Throwable => () } }
    bcs.clear()
    val dss = cached.get()
    dss.foreach { ds => try ds.unpersist(blocking = false) catch { case _: Throwable => () } }
    dss.clear()
    val rdds = checkpointRdds.get()
    rdds.foreach { case (s, id) =>
      try s.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    rdds.clear()
  }
}
