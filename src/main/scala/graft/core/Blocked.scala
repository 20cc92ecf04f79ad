package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Blocked broadcast pair-scan — the shared kernel behind the exact
  * all-pairs stages (SimHash hamming q30, embedding cosine q32): one
  * side of the pair space ships per executor as a broadcast block, the
  * probe side stays a distributed dataset, and each task runs a
  * primitive inner loop over the block array.
  *
  * [[tiledPairScan]] is the scale form: the block side is split into
  * deterministic key-hash tiles of ≤ `blockSize` rows; each tile is
  * collected (a BOUNDED driver fetch — never the whole table),
  * broadcast, probed by the full distributed dataset, and the per-tile
  * results union. Driver memory is O(blockSize) in both modes. The
  * EXECUTOR-side broadcast residency depends on `eagerTiles`:
  *
  *  - `eagerTiles = false` (default, the local-runner shape): one lazy
  *    union plan; every tile's broadcast stays referenced until the
  *    caller's single action completes, so concurrent broadcast
  *    residency is O(total block side) — fine on a shared heap, NOT
  *    the bound to quote at cluster scale.
  *  - `eagerTiles = true`: each tile runs as its OWN job — probe
  *    results are materialized to executor storage (`localCheckpoint`)
  *    and the tile's broadcast is destroyed before the next tile is
  *    collected. Concurrent broadcast residency is exactly one tile;
  *    what accumulates is only the (small) pair output. BlockedSpec
  *    pins result-equality of the two modes. FAULT-TOLERANCE TRADE:
  *    localCheckpoint truncates lineage AND the broadcast needed to
  *    recompute is already destroyed, so losing an executor that held
  *    checkpointed tile partitions fails the action non-retryably
  *    (Spark documents localCheckpoint as unsafe under dynamic
  *    allocation for the same reason). A cluster deployment that needs
  *    recovery swaps the localCheckpoint for a RELIABLE checkpoint
  *    (`sparkContext.setCheckpointDir` + `Dataset.checkpoint`) — same
  *    residency bound, the tile output survives executor loss; the
  *    lazy mode also recovers fine, at the cost of full broadcast
  *    residency.
  *
  * Lazy-mode blocks are registered via [[Resources]] so the harness
  * reclaims them after the action; eager-mode blocks are destroyed
  * inline.
  */
object Blocked {

  /** For each item i (distributed via `spark.range`), `emit(arr(i),
    * arr)` produces that row's pairs — the caller's inner loop stays a
    * primitive `while` over the array (the hot path; no per-pair
    * closure dispatch). Ordering conventions (e.g. emit only
    * `b.id > a.id`) live in `emit`. Single-block form: use only when
    * the block side is known-small (e.g. a centroid table). */
  def pairScan[A, R: Encoder](s: SparkSession, block: Broadcast[Array[A]])
                             (emit: (A, Array[A]) => IterableOnce[R]): Dataset[R] = {
    import s.implicits._
    val n = block.value.length
    s.range(n.toLong).as[Long].flatMap { i =>
      val arr = block.value
      emit(arr(i.toInt), arr)
    }
  }

  /** All-pairs scan with the block side tiled: `items` is hashed on
    * `key` into `ceil(n / blockSize)` tiles; tile j is collected
    * (≤ ~blockSize rows — the driver never holds the full set),
    * broadcast, and probed by the full distributed `items`. `emit(a,
    * tile)` must emit each qualifying pair exactly once given that
    * every row b appears in exactly one tile (the usual `b.id > a.id`
    * convention does this unchanged). `items` is cached for the
    * duration (one upstream computation, tiles+probes read the cache);
    * cache and broadcasts are released by the harness via
    * [[Resources.release]]. */
  def tiledPairScan[A: scala.reflect.ClassTag, R: Encoder](items: Dataset[A], blockSize: Int,
                                  eagerTiles: Boolean = false)
                                  (key: A => Long)
                                  (emit: (A, Array[A]) => IterableOnce[R]): Dataset[R] = {
    require(blockSize > 0, s"blockSize=$blockSize must be positive")
    val s = items.sparkSession
    val cached = Resources.persist(items)
    val n = cached.count()
    val nTiles = math.max(1L, (n + blockSize - 1) / blockSize).toInt
    val parts = (0 until nTiles).map { j =>
      val tile = cached.filter((a: A) => java.lang.Math.floorMod(key(a), nTiles.toLong) == j.toLong)
        .collect()
      // The bounded-driver-memory contract holds only when `key` is
      // ~uniform (unique ids hash uniformly; a hot low-cardinality key
      // funnels the table into one tile). Fail fast instead of
      // silently becoming the whole-table collect this API forbids.
      require(tile.length <= 4L * blockSize,
        s"tiledPairScan tile $j holds ${tile.length} rows (limit 4×blockSize = ${4L * blockSize}): " +
          "the key function is skewed or low-cardinality; pass a ~unique key")
      val bc = if (eagerTiles) s.sparkContext.broadcast(tile)
               else Resources.broadcast(s, tile)
      val probed = cached.mapPartitions { it =>
        val arr = bc.value
        it.flatMap(a => emit(a, arr).iterator)
      }
      if (eagerTiles) {
        // Separate job per tile: materialize this tile's pairs to
        // executor storage NOW, then drop the block before the next
        // tile ships — concurrent broadcast residency is one tile.
        val done = Resources.checkpoint(probed)
        try bc.destroy() catch { case _: Throwable => () }
        done
      } else probed
    }
    parts.reduce(_ union _)
  }
}
