package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Blocked broadcast pair-scan — the shared kernel behind the exact
  * all-pairs stages (SimHash hamming q30, embedding cosine q32): the
  * item set ships once per executor as a broadcast, the probe side is
  * `spark.range` over the SAME broadcast (one upstream pass total — no
  * re-execution of the pipeline that produced the items), and each
  * task runs a primitive inner loop over the array. At 100 TB the
  * broadcast side tiles into fixed-size blocks: outer loop over
  * blocks, same kernel per block.
  */
object Blocked {

  /** For each item i (distributed via `spark.range`), `emit(arr(i),
    * arr)` produces that row's pairs — the caller's inner loop stays a
    * primitive `while` over the array (the hot path; no per-pair
    * closure dispatch). Ordering conventions (e.g. emit only
    * `b.id > a.id`) live in `emit`. */
  def pairScan[A, R: Encoder](s: SparkSession, block: Broadcast[Array[A]])
                             (emit: (A, Array[A]) => IterableOnce[R]): Dataset[R] = {
    import s.implicits._
    val n = block.value.length
    s.range(n.toLong).as[Long].flatMap { i =>
      val arr = block.value
      emit(arr(i.toInt), arr)
    }
  }
}
