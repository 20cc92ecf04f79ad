package graft.vector

import scala.collection.mutable

/** Deterministic in-memory HNSW (Malkov & Yashunin, "Efficient and
  * robust approximate nearest neighbor search using Hierarchical
  * Navigable Small World graphs", TPAMI 2018) over cosine distance —
  * the per-bucket kernel of the partitioned graph index (q135), the
  * structure the reference actually serves from (pgvector `USING hnsw
  * (embedding vector_cosine_ops)`, setup_vector_db.py:148-150).
  *
  * Differences from the paper, all in the service of reproducibility
  * (a distributed index must build to the SAME graph regardless of
  * which executor builds it, or retries/speculative tasks corrupt it):
  *  - node levels come from a splitmix64 hash of the vec id instead of
  *    an RNG (same geometric distribution, seedless and machine-free);
  *  - insertion order is ascending vec id (callers sort);
  *  - every ordering comparison breaks distance ties by id, so equal
  *    distances cannot reorder under float-identical math.
  * Neighbor selection is the paper's SELECT-NEIGHBORS-SIMPLE (M
  * closest); degree caps are M per upper layer and 2M at layer 0.
  *
  * The graph is plain data (`toRows`/`fromRows` round-trip through
  * `(vec_id, level, neighbors)` adjacency rows), so a bucket's index
  * serializes to parquet like any other lake artifact — no
  * pointer-chasing state outlives the task that used it.
  */
object Hnsw extends Serializable {

  /** One adjacency row: a node's neighbor list at one level. The
    * level-0 row carries the vector payload (norm + components);
    * upper-level rows leave it empty rather than duplicate it. */
  final case class Row(vecId: Long, level: Int, neighbors: Array[Long],
                       vec: Array[Double], norm: Double)

  /** In-memory graph over internal indexes 0..n-1 (ids sorted asc). */
  final class Graph(val ids: Array[Long],
                    val vecs: Array[Array[Double]],
                    val norms: Array[Double],
                    val levels: Array[Int],
                    // adj(node)(level) — level indexes 0..levels(node)
                    val adj: Array[Array[mutable.ArrayBuffer[Int]]],
                    var entry: Int,
                    var maxLevel: Int) {
    def size: Int = ids.length
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic node level: floor(-ln(u)/ln(M)) with u ∈ (0,1)
    * derived from the id hash — the paper's geometric level draw with
    * the RNG replaced by a hash. StrictMath, not math: `Math.log` is
    * only semi-monotonic per the JVM spec and may differ in the last
    * ulp across architectures, and a level that flips on one executor
    * of a heterogeneous cluster breaks the build-anywhere-same-graph
    * contract this whole kernel is designed around. */
  def levelOf(id: Long, m: Int): Int = {
    val u = ((splitmix64(id) >>> 11).toDouble + 0.5) / 9007199254740992.0
    math.min(31.0, -StrictMath.log(u) / StrictMath.log(m.toDouble)).toInt
  }

  private def dotP(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Cosine DISTANCE (1 − sim) from node `i` to an external vector. */
  private def dist(g: Graph, i: Int, q: Array[Double], qn: Double): Double =
    1.0 - dotP(g.vecs(i), q) / (g.norms(i) * qn)

  /** (dist, id)-ordered candidate — id breaks float ties so every
    * traversal is total-ordered. */
  private final case class Cand(d: Double, idx: Int)
  private def candOrd(g: Graph): Ordering[Cand] =
    Ordering.by((c: Cand) => (c.d, g.ids(c.idx)))

  /** SEARCH-LAYER (alg. 2): beam search with width `ef` at `level`,
    * returning the ef closest visited nodes, ascending (dist, id). */
  private def searchLayer(g: Graph, q: Array[Double], qn: Double,
                          entries: Seq[Int], ef: Int, level: Int): mutable.ArrayBuffer[Cand] = {
    val ord = candOrd(g)
    val visited = mutable.HashSet.empty[Int]
    // candidates: closest-first; results: farthest-first (bounded to ef)
    val cand = mutable.PriorityQueue.empty[Cand](ord.reverse)
    val res = mutable.PriorityQueue.empty[Cand](ord)
    entries.foreach { e =>
      if (visited.add(e)) {
        val c = Cand(dist(g, e, q, qn), e)
        cand.enqueue(c); res.enqueue(c)
      }
    }
    while (res.size > ef) res.dequeue()
    while (cand.nonEmpty) {
      val c = cand.dequeue()
      if (res.nonEmpty && ord.gt(c, res.head)) cand.clear() // all farther than worst kept
      else {
        val nbrs = g.adj(c.idx)(level)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (visited.add(nb)) {
            val nc = Cand(dist(g, nb, q, qn), nb)
            if (res.size < ef || ord.lt(nc, res.head)) {
              cand.enqueue(nc); res.enqueue(nc)
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.empty[Cand]
    out ++= res
    out.sortInPlace()(ord)
    out
  }

  /** Greedy descent (ef=1) through levels above `downTo`, starting at
    * the graph entry — the shared head of insert and search. */
  private def greedyTo(g: Graph, q: Array[Double], qn: Double, downTo: Int): Int = {
    var ep = g.entry
    var lvl = g.maxLevel
    while (lvl > downTo) {
      var improved = true
      while (improved) {
        improved = false
        var best = ep
        var bd = dist(g, ep, q, qn)
        val nbrs = g.adj(ep)(lvl)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          val d = dist(g, nb, q, qn)
          if (d < bd || (d == bd && g.ids(nb) < g.ids(best))) { best = nb; bd = d; improved = true }
          i += 1
        }
        ep = best
      }
      lvl -= 1
    }
    ep
  }

  /** Build the graph over (ids, vecs, norms) — ids MUST be sorted
    * ascending (the deterministic insertion order). */
  def build(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double],
            m: Int, efConstruction: Int): Graph = {
    require(ids.length == vecs.length && ids.length == norms.length)
    var i = 1
    while (i < ids.length) { require(ids(i - 1) < ids(i), "ids must be sorted asc"); i += 1 }
    val n = ids.length
    val levels = ids.map(levelOf(_, m))
    val adj = Array.tabulate(n)(j => Array.fill(levels(j) + 1)(mutable.ArrayBuffer.empty[Int]))
    val g = new Graph(ids, vecs, norms, levels, adj, entry = 0, maxLevel = if (n > 0) levels(0) else 0)
    val m0 = 2 * m
    var node = 1
    while (node < n) {
      val q = vecs(node); val qn = norms(node)
      val l = levels(node)
      val ep = greedyTo(g, q, qn, math.min(l, g.maxLevel))
      var lvl = math.min(l, g.maxLevel)
      var entries: Seq[Int] = Seq(ep)
      while (lvl >= 0) {
        val found = searchLayer(g, q, qn, entries, efConstruction, lvl)
        val selected = found.take(m).map(_.idx)
        selected.foreach { nb =>
          g.adj(node)(lvl) += nb
          g.adj(nb)(lvl) += node
          val cap = if (lvl == 0) m0 else m
          if (g.adj(nb)(lvl).length > cap) {
            // prune to the cap closest (dist to nb, ties by id)
            val bv = vecs(nb); val bn = norms(nb)
            val pruned = g.adj(nb)(lvl)
              .map(x => Cand(1.0 - dotP(vecs(x), bv) / (norms(x) * bn), x))
              .sorted(candOrd(g)).take(cap).map(_.idx)
            g.adj(nb)(lvl).clear()
            g.adj(nb)(lvl) ++= pruned
          }
        }
        entries = found.map(_.idx).toSeq
        lvl -= 1
      }
      if (l > g.maxLevel) { g.maxLevel = l; g.entry = node }
      node += 1
    }
    g
  }

  /** Top-k search: greedy descent to level 1, beam at level 0, the k
    * closest as (id, cosine sim) descending (sim, then id asc). */
  def search(g: Graph, q: Array[Double], qn: Double, ef: Int, k: Int): Array[(Long, Double)] = {
    if (g.size == 0) return Array.empty
    val ep = greedyTo(g, q, qn, 0)
    searchLayer(g, q, qn, Seq(ep), math.max(ef, k), 0)
      .take(k)
      .map(c => (g.ids(c.idx), 1.0 - c.d))
      .toArray
  }

  /** Serialize to adjacency rows (the index-lake schema). */
  def toRows(g: Graph): Iterator[Row] =
    (0 until g.size).iterator.flatMap { i =>
      (0 to g.levels(i)).iterator.map { lvl =>
        Row(g.ids(i), lvl, g.adj(i)(lvl).map(g.ids(_)).toArray.sorted,
          if (lvl == 0) g.vecs(i) else Array.empty[Double],
          if (lvl == 0) g.norms(i) else 0.0)
      }
    }

  /** Rebuild from adjacency rows (inverse of [[toRows]]). Neighbor
    * SETS per (node, level) fully determine search behavior: within a
    * level the beam visits every improving neighbor regardless of
    * list order, and orderings are (dist, id)-total — so the sorted
    * round-trip is search-identical to the built graph. */
  def fromRows(rows: Iterator[Row]): Graph = {
    val byId = mutable.LongMap.empty[mutable.ArrayBuffer[Row]]
    rows.foreach(r => byId.getOrElseUpdate(r.vecId, mutable.ArrayBuffer.empty) += r)
    val ids = byId.keys.toArray.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    val levels = new Array[Int](n)
    val adj = new Array[Array[mutable.ArrayBuffer[Int]]](n)
    var i = 0
    while (i < n) {
      val rs = byId(ids(i)).sortBy(_.level)
      levels(i) = rs.last.level
      val l0 = rs.head
      require(l0.level == 0, s"node ${ids(i)} missing level-0 row")
      vecs(i) = l0.vec; norms(i) = l0.norm
      adj(i) = rs.map(r => mutable.ArrayBuffer.from(r.neighbors.map(idx))).toArray
      i += 1
    }
    var entry = 0; var maxLevel = -1
    i = 0
    while (i < n) {
      // entry = max level, ties to LOWEST id — matches build (an
      // inserted node only replaces entry when STRICTLY higher)
      if (levels(i) > maxLevel) { maxLevel = levels(i); entry = i }
      i += 1
    }
    new Graph(ids, vecs, norms, levels, adj, entry, math.max(maxLevel, 0))
  }
}
