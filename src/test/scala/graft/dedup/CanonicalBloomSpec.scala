package graft.dedup

import graft.SparkSpec
import graft.core.Resources

/** q79/q80 cross-checks in the house independent-reimplementation
  * style: canonical selection must agree with a driver-side argmax
  * over the clustered docs, and q80's Bloom gate must be invisible to
  * the result (exact equivalence with a scalar set-intersection
  * replay — if the gate dropped a true member, the comparison would
  * miss a row, so bloom's no-false-negative property is pinned by the
  * same assertion). */
class CanonicalBloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: Map[Long, (String, String)] =
    graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  test("q79: one kept per component, kept = argmax quality (ties min id), corpus covered") {
    val rows = Dedup.qClusterCanonical(spark, Sf0001)
      .select("doc_id", "component", "csize", "quality", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    Resources.release()
    assert(rows.length == docs.size, "q79 must cover the whole corpus")
    assert(rows.map(_._1).distinct.length == rows.length, "doc_id must be unique")
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, ms) =>
      assert(ms.count(_._5) == 1, s"component $comp kept != 1")
      val winner = ms.filter(_._5).head
      val best = ms.maxBy(m => (m._4, -m._1)) // max quality, tie -> min doc_id
      assert(winner._1 == best._1,
        s"component $comp kept ${winner._1}, expected ${best._1}")
      assert(ms.forall(_._3 == ms.length), s"component $comp csize wrong")
    }
    assert(byComp.exists(_._2.length > 1),
      "no multi-doc clusters at sf0.001 — fixture drifted, argmax untested")
  }

  test("q85: centroid fixed-point sums replay scalar-side over union-find clusters") {
    import graft.core.Resources
    val pairs = Dedup.qMinHashLsh(spark, Sf0001)
      .select("d1", "d2").as[(Long, Long)].collect()
    Resources.release()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val emb = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val expected = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)] // (component, dim) -> (n, fpSum)
    parent.keys.foreach { id =>
      val comp = find(id)
      emb(id).zipWithIndex.foreach { case (x, i) =>
        val fp = math.floor(x.toDouble * 1048576.0).toLong
        val k = (comp, (i + 1).toLong)
        val (c0, s0) = expected.getOrElse(k, (0L, 0L))
        expected(k) = (c0 + 1, s0 + fp)
      }
    }
    val got = Dedup.qClusterCentroids(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    Resources.release()
    assert(got == expected.toMap)
    assert(got.nonEmpty, "no clusters at sf0.001 — fixture drifted")
  }

  test("q89: medoid distances replay scalar-side; one medoid per cluster") {
    import graft.core.Resources
    val pairs = Dedup.qMinHashLsh(spark, Sf0001)
      .select("d1", "d2").as[(Long, Long)].collect()
    Resources.release()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val emb = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val byComp = parent.keys.toSeq.groupBy(find)
    val expected = byComp.flatMap { case (comp, members) =>
      val n = members.size.toLong
      val fps = members.map(id => id -> emb(id).map(x => math.floor(x.toDouble * 1048576.0).toLong))
      val sums = fps.map(_._2).transpose.map(_.sum)
      fps.map { case (id, fp) =>
        val d2 = fp.zip(sums).map { case (a, sm) => val d = n * a - sm; d * d }.sum
        (id, (comp, d2))
      }
    }
    val got = Dedup.qClusterMedoids(spark, Sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    Resources.release()
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (comp, d2)) =>
      assert(got(id)._1 == comp, s"doc $id component")
      assert(got(id)._2 == d2, s"doc $id dist2 ${got(id)._2} != $d2")
    }
    // rank is the (dist2, id) order; exactly one medoid per cluster
    byComp.foreach { case (comp, members) =>
      val ordered = members.map(id => (expected(id)._2, id)).sorted.map(_._2)
      ordered.zipWithIndex.foreach { case (id, i) =>
        assert(got(id)._3 == i + 1, s"doc $id rank")
      }
      assert(members.count(id => got(id)._4) == 1, s"component $comp medoids != 1")
      assert(got(ordered.head)._4, s"component $comp medoid not min-dist")
    }
  }

  test("q92: leakage pairs are exactly the split-crossing LSH survivors, jaccard exact") {
    import graft.core.{Hashing, Resources}
    def bucket(id: Long): Long = Hashing.polyFold(id.toString, 31, 1000000007L) % 100
    val cand = Dedup.qMinHashLsh(spark, Sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    Resources.release()
    val expectedPairs = cand.filter { case (a, b) => (bucket(a) < 80) != (bucket(b) < 80) }
    val got = Dedup.qSplitLeakage(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(4)))
    Resources.release()
    assert(got.nonEmpty, "no split-crossing near-dups at sf0.001 — fixture drifted")
    // pair set: orientation maps back to the candidate (min, max) form
    val gotPairs = got.map { case (t, h, _, _) => (math.min(t, h), math.max(t, h)) }.toSet
    assert(gotPairs == expectedPairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) })
    def shingleSet(t: String): Set[Seq[String]] =
      t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .sliding(3).filter(_.length == 3).map(_.toSeq).toSet
    got.foreach { case (train, heldout, split, jac) =>
      assert(bucket(train) < 80, s"train_doc $train not in train split")
      val hb = bucket(heldout)
      assert(hb >= 80, s"heldout_doc $heldout in train split")
      assert(split == (if (hb < 90) "val" else "test"), s"pair ($train,$heldout) split label")
      val (s1, s2) = (shingleSet(docs(train)._2), shingleSet(docs(heldout)._2))
      val expJac = s1.intersect(s2).size.toDouble / (s1.size + s2.size - s1.intersect(s2).size)
      assert(jac == expJac, s"pair ($train,$heldout) jaccard $jac != $expJac")
    }
  }

  test("q80: result equals a scalar exact-intersection replay (bloom-independent)") {
    def grams(t: String): Set[Seq[String]] =
      t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .sliding(4).filter(_.length == 4).map(_.toSeq).toSet
    val bench = docs.values.collect { case ("src18", t) => grams(t) }
      .foldLeft(Set.empty[Seq[String]])(_ ++ _)
    // expected: per training doc, DISTINCT benchmark grams it contains
    // (gram strings — the 31-bit hash space is collision-free at
    // sf0.001, same argument as the q68 spec)
    val expected = docs.collect {
      case (id, (src, t)) if src != "src18" =>
        id -> grams(t).intersect(bench).size.toLong
    }.filter(_._2 > 0L)
    val got = Dedup.qBloomDecontaminate(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    Resources.release()
    assert(got == expected.toMap)
    assert(got.nonEmpty, "no src18 overlap at sf0.001 — fixture drifted")
  }
}
