package graft.dedup

import graft.SparkSpec

/** MinHash-LSH candidates vs brute-force jaccard ground truth. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def shingleSets(): Map[Long, Set[String]] =
    graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").collect().map { r =>
        val words = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        val sh = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        r.getLong(0) -> sh
      }.toMap

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("LSH candidates with est >= 0.5 are true near-dups (no false positives)") {
    val sets = shingleSets()
    val pairs = Dedup.qMinHashLsh(spark, Sf0001).collect()
    assert(pairs.nonEmpty, "expected planted near-dup pairs in testdata")
    pairs.foreach { r =>
      val j = jaccard(sets(r.getAs[Long]("d1")), sets(r.getAs[Long]("d2")))
      assert(j >= 0.3, s"pair (${r.get(0)}, ${r.get(1)}) est=${r.get(2)} true=$j")
    }
  }

  test("LSH recall: every pair with true jaccard >= 0.8 is found") {
    val sets = shingleSets()
    val truth = for {
      (d1, s1) <- sets.toSeq; (d2, s2) <- sets.toSeq
      if d1 < d2 && jaccard(s1, s2) >= 0.8
    } yield (d1, d2)
    val found = Dedup.qMinHashLsh(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(truth.nonEmpty)
    truth.foreach(p => assert(found.contains(p), s"missed true near-dup $p"))
  }

  test("SimHash banded join == kernel all-pairs scan (pigeonhole equivalence)") {
    val sigs = Dedup.simHashSignatures(spark, Sf0001)
    val banded = Dedup.simHashBandedPairs(sigs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
    val kernel = Dedup.qSimHash(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet
    assert(kernel.nonEmpty)
    assert(banded == kernel)
  }

  test("census picks the kernel on the clustered testdata, banded on spread sigs") {
    // Real testdata: the shared small vocabulary clusters signatures
    // into few buckets — banding generates no meaningful pruning, so
    // the census must keep the tiled kernel.
    val real = Dedup.simHashSignatures(spark, Sf0001)
    val (nReal, candReal) = Dedup.simHashCandidateCensus(real)
    assert(nReal > 0)
    assert(!Dedup.chooseBanded(nReal, candReal),
      s"clustered testdata must stay on the kernel (n=$nReal cand=$candReal)")
    // Spread fixture: multiplicative-hash signatures are ~uniform over
    // the 60-bit space, so each 8-9-bit band has 256-512 occupied
    // buckets and the banded candidate volume prunes ~51x vs all
    // pairs — the census must activate the banded path.
    val mask = (1L << 60) - 1
    val spread = (0L until 4000L)
      .map(i => (i, (i * 0x9E3779B97F4A7C15L) & mask))
      .toDF("doc_id", "simhash")
    val (nSp, candSp) = Dedup.simHashCandidateCensus(spread)
    assert(nSp == 4000L)
    assert(Dedup.chooseBanded(nSp, candSp),
      s"spread signatures must activate the banded path (cand=$candSp, " +
        s"allPairs/32=${nSp * (nSp - 1) / 2 / Dedup.BandedAdvantageMin})")
  }

  test("q108 ledger dispositions aggregate exactly to the q100 funnel") {
    val funnel = Dedup.qDedupFunnel(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ledger = Dedup.qRemovalLedger(spark, Sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(ledger.nonEmpty)
    val raw = (ledger.length.toLong, ledger.map(_._2).sum)
    val exact = ledger.filter(_._1 != "exact_dup")
    val surv = ledger.filter(t => t._1 == "kept" || t._1 == "span_trimmed")
    assert(funnel("0_raw") == raw)
    assert(funnel("1_exact") == ((exact.length.toLong, exact.map(_._2).sum)))
    assert(funnel("2_cluster") == ((surv.length.toLong, surv.map(_._2).sum)))
    assert(funnel("3_span") == ((surv.length.toLong, surv.map(_._3).sum)))
  }

  test("scalar simHash64 == relational signatures, every doc") {
    val relational = Dedup.simHashSignatures(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    val texts = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      // relational form emits no row for empty docs (no words survive
      // the explode); scalar of empty text is the all-negative-vote 0
      if (relational.contains(id))
        assert(Dedup.simHash64(t) == relational(id), s"doc $id signatures diverge")
    }
    assert(relational.nonEmpty)
  }

  test("q137: no LSH near-dup pair straddles the leakage-safe split") {
    val split = Dedup.qLeakageSafeSplit(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_eval"))).toMap
    // the split must actually split (both sides populated)
    assert(split.values.exists(identity) && split.values.exists(!_),
      "expected both train and eval docs")
    // the q92-style crossing check against THIS split: empty by
    // construction (cluster members share a component, components
    // share a side)
    val crossings = Dedup.lshCandidates(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .filter { case (a, b) => split(a) != split(b) }
    assert(crossings.isEmpty, s"near-dup pairs crossing the split: $crossings")
  }

  test("artifact lakes survive a second corpus dir in the same JVM") {
    // regression: the per-corpus lake registries create their dirs
    // OUTSIDE TempDirs.fresh's per-prefix reclamation — building the
    // same artifact for corpus B must not delete corpus A's cached
    // lake (the multi-SF-session / scale-probe-comparison shape)
    val a1 = Dedup.qSimHash(spark, Sf0001).count()
    assert(a1 > 0)
    val b = Dedup.qSimHash(spark, "/root/testdata/sf0.01").count()
    assert(b > 0)
    // corpus A's lake is still readable after B's build
    assert(Dedup.qSimHash(spark, Sf0001).count() == a1)
  }

  test("SimHash near-dup pairs overlap the jaccard near-dups") {
    val sets = shingleSets()
    val sim = Dedup.qSimHash(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(sim.nonEmpty)
    // hamming <= 6 of 64 bits should be dominated by genuinely similar docs
    val js = sim.map { case (a, b) => jaccard(sets(a), sets(b)) }
    assert(js.max >= 0.8)
  }
}
