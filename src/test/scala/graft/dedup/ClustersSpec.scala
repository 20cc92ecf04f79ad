package graft.dedup

import graft.SparkSpec
import graft.core.Resources

/** Connected components (q75's kernel): min-label propagation must
  * equal ground-truth union-find on hand-built graphs — chains (the
  * multi-round propagation case), merged clusters, and isolated
  * pairs — and the composed q75 must agree with a driver-side
  * union-find over the very pair set it clusters. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap

  test("chain, merge, and isolated-pair graphs cluster exactly") {
    // 1-2-3-4-5 chain (diameter 4 → several propagation rounds),
    // {10,11,12} triangle-ish via two pairs, {20,21} isolated pair.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (11L, 10L), (11L, 12L), (20L, 21L))
    val got = cc(pairs)
    Resources.release()
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("empty pair set yields empty components") {
    val got = cc(Seq.empty)
    Resources.release()
    assert(got.isEmpty)
  }

  test("q75 components agree with driver-side union-find on the same pairs") {
    val pairs = graft.dedup.Dedup.qMinHashLsh(spark, Sf0001)
      .select("d1", "d2").as[(Long, Long)].collect()
    Resources.release()
    assert(pairs.nonEmpty, "no LSH pairs at sf0.001 — fixture drifted")
    // ground truth: path-compressed union-find with min-id roots
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = graft.dedup.Dedup.qDupClusters(spark, Sf0001)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    Resources.release()
    assert(got == expected)
    // csize/kept consistency: one kept doc per component, kept = min
    val rows = graft.dedup.Dedup.qDupClusters(spark, Sf0001)
      .select("doc_id", "component", "csize", "kept")
      .as[(Long, Long, Long, Boolean)].collect()
    Resources.release()
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._4) == 1, s"component $comp kept != 1")
      assert(members.find(_._4).get._1 == comp, s"component $comp kept != min id")
      assert(members.forall(_._3 == members.length), s"component $comp csize wrong")
    }
  }
}
