package graft.text

import graft.SparkSpec

/** Scalar cross-checks for the round-3 pipeline operators (q68–q73):
  * each distributed plan's output is recomputed per-doc with plain
  * Scala collections and compared exactly — the same
  * independent-reimplementation style the islands/chunker suites use —
  * plus plan-shape assertions where the scale story depends on one
  * (q68's benchmark side must broadcast). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: Map[Long, (String, String)] =
    graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  private def words(t: String): Seq[String] =
    t.trim.split("\\s+").filter(_.nonEmpty).toSeq

  test("q68: every flagged doc truly shares a 4-gram with the benchmark source") {
    def grams(t: String): Set[Seq[String]] =
      words(t).sliding(4).filter(_.length == 4).map(_.toSeq).toSet
    val bench = docs.values.collect { case ("src19", t) => grams(t) }
      .foldLeft(Set.empty[Seq[String]])(_ ++ _)
    val flagged = graft.dedup.Dedup.qDecontaminate(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hash-keyed plan may ADD collision hits but on this corpus the
    // 31-bit space is effectively collision-free at sf0.001 — exact set
    val expected = docs.collect {
      case (id, (src, t)) if src != "src19" && grams(t).intersect(bench).nonEmpty => id
    }.toSet
    assert(flagged.keySet == expected)
  }

  test("q68: benchmark gram side broadcasts (plan shape)") {
    val plan = graft.dedup.Dedup.qDecontaminate(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q70: split manifest sums to the corpus and buckets deterministically") {
    val rows = TextAnalysis.qTrainSplit(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == docs.size)
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows("train") > rows.getOrElse("val", 0L))
    // repeated run → identical assignment (hash, not rand)
    val again = TextAnalysis.qTrainSplit(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == rows)
  }

  test("q71: reconstruction error is bounded by half a quantization step") {
    graft.vector.Similarity.qQuantizeInt8(spark, Sf0001).collect().foreach { r =>
      val err = BigDecimal(r.getString(2)).toDouble
      val scale = BigDecimal(r.getString(3)).toDouble
      // clamp never fires for symmetric scaling (|x| <= maxabs = 127*scale),
      // so floor(x/scale + 0.5) is within scale/2 of x everywhere;
      // 1.5e-6 slack covers the DECIMAL(12,6) rounding of both strings
      assert(err <= scale / 2 + 1.5e-6, s"vec ${r.getLong(0)}: err=$err scale=$scale")
    }
  }

  test("q72: stats and verdicts match a scalar recomputation") {
    val got = TextAnalysis.qRepetitionFilter(spark, Sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(7)))).toMap
    val expected = docs.collect { case (id, (_, t)) if words(t).length >= 2 =>
      val ws = words(t)
      val bgs = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top = bgs.groupBy(identity).values.map(_.size).max.toLong
      val keep = top.toDouble / bgs.size <= 0.05 &&
        ws.distinct.size.toDouble / ws.size >= 0.35
      id -> ((ws.size.toLong, ws.distinct.size.toLong, top, bgs.size.toLong, keep))
    }
    assert(got == expected)
  }

  test("q74: duplicate-span fractions match a scalar recomputation") {
    // recompute over the SAME portable hash the query keys on — hash
    // collisions are part of the operator's semantics (the oracle
    // replays them too), and at sf0.001 two real collisions exist
    def gramHashes(t: String): Set[Long] =
      words(t).sliding(5).filter(_.length == 5)
        .map(g => graft.core.Hashing.polyFold(g.mkString(" "), 31, 1000000007L)).toSet
    val perDoc = docs.collect { case (id, (_, t)) if words(t).length >= 5 =>
      id -> gramHashes(t)
    }
    val docCount = perDoc.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = perDoc.map { case (id, hs) =>
      id -> ((hs.size.toLong, hs.count(h => docCount(h) >= 2).toLong))
    }
    val got = graft.dedup.Dedup.qDupSpanFraction(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("q94: span removal matches a scalar gaps-and-islands recomputation") {
    // same portable gram hash as q74 (collisions are semantics)
    def gramHashAt(ws: Seq[String]): Seq[Long] =
      ws.sliding(5).filter(_.length == 5)
        .map(g => graft.core.Hashing.polyFold(g.mkString(" "), 31, 1000000007L)).toSeq
    val perDoc = docs.map { case (id, (_, t)) => id -> gramHashAt(words(t)) }
    val docCount = perDoc.toSeq
      .flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docs.map { case (id, (_, t)) =>
      val ws = words(t)
      val covered = perDoc(id).zipWithIndex.collect {
        case (h, p) if docCount.getOrElse(h, 0) >= 2 => (p + 1) to (p + 5)
      }.flatten.toSet
      val sorted = covered.toSeq.sorted
      val nSpans = sorted.zipWithIndex.count { case (idx, k) =>
        k == 0 || sorted(k - 1) != idx - 1
      }
      val clean = ws.zipWithIndex.collect {
        case (w, p) if !covered.contains(p + 1) => w
      }.mkString(" ")
      id -> ((nSpans.toLong, covered.size.toLong, clean))
    }
    val got = graft.dedup.Dedup.qDupSpanRemoval(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    // the fixture actually exercises removal — some doc loses a span,
    // some doc passes through whole
    assert(got.values.exists(_._2 > 0))
    assert(got.values.exists(_._2 == 0))
  }

  test("q98: source overlap matrix matches a scalar set-intersection replay") {
    def gramHashes(t: String): Set[Long] =
      words(t).sliding(4).filter(_.length == 4)
        .map(g => graft.core.Hashing.polyFold(g.mkString(" "), 31, 1000000007L)).toSet
    val bySource = docs.values.groupBy(_._1).view
      .mapValues(_.map(d => gramHashes(d._2)).foldLeft(Set.empty[Long])(_ ++ _)).toMap
    val expected = (for {
      (s1, g1) <- bySource; (s2, g2) <- bySource if s1 != s2
      common = g1.intersect(g2).size if common > 0
    } yield (s1, s2) -> ((common.toLong, common.toDouble / g1.size))).toMap
    val got = graft.dedup.Dedup.qSourceOverlap(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture should have cross-source 4-gram overlap")
  }

  test("q99: CDC chunk manifest matches a scalar rolling-hash replay") {
    def fp(ws: Seq[String]): Long =
      graft.core.Hashing.polyFold(ws.mkString(" "), 31, 1000000007L)
    // scalar CDC: boundary after word i when the 3-gram ending at i
    // hashes to 0 mod 16; chunks = runs between boundaries
    def chunksOf(t: String): Seq[Seq[String]] = {
      val ws = words(t)
      val bounds = (3 to ws.length).filter { i =>
        fp(ws.slice(i - 3, i)) % 16L == 0L
      }.toSet
      val out = Seq.newBuilder[Seq[String]]
      var cur = Seq.newBuilder[String]
      ws.zipWithIndex.foreach { case (w, k) =>
        cur += w
        if (bounds.contains(k + 1)) { out += cur.result(); cur = Seq.newBuilder }
      }
      val last = cur.result()
      if (last.nonEmpty) out += last
      out.result()
    }
    val perDoc = docs.view.mapValues { case (_, t) => chunksOf(t) }.toMap
    val counts = perDoc.values.flatten.map(fp).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val docsPerFp = perDoc.toSeq.flatMap { case (id, cs) => cs.map(c => (fp(c), id)) }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = perDoc.map { case (id, cs) =>
      val shared = cs.count(c => docsPerFp(fp(c)) >= 2)
      id -> ((cs.size.toLong, shared.toLong))
    }
    val got = graft.chunk.Chunkers.qCdcChunks(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // chunk sharing actually happens (the resynchronization property
    // CDC exists for) AND not everything is shared
    assert(got.values.exists(_._2 > 0))
    assert(got.values.exists(v => v._2 < v._1))
  }

  test("q100: funnel stages agree with the standalone q27/q79/q94 rules") {
    val wc = docs.view.mapValues { case (_, t) => words(t).size.toLong }.toMap
    // exact rule from q52's keep-min-per-md5 (docs absent from q52's
    // dup-group output are their own keepers)
    val dupKeep = graft.dedup.Dedup.qDedupKeep(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val kExact = docs.keySet.map(id => id -> dupKeep.getOrElse(id, true)).toMap
    val kCluster = graft.dedup.Dedup.qClusterCanonical(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val removed = graft.dedup.Dedup.qDupSpanRemoval(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val s2 = docs.keySet.filter(id => kExact(id) && kCluster(id))
    val expected = Map(
      "0_raw" -> ((docs.size.toLong, wc.values.sum)),
      "1_exact" -> ((kExact.count(_._2).toLong,
        docs.keySet.filter(kExact).toSeq.map(wc).sum)),
      "2_cluster" -> ((s2.size.toLong, s2.toSeq.map(wc).sum)),
      "3_span" -> ((s2.size.toLong, s2.toSeq.map(id => wc(id) - removed(id)).sum)))
    val got = graft.dedup.Dedup.qDedupFunnel(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the funnel actually narrows somewhere
    assert(got("3_span")._2 < got("0_raw")._2)
  }

  test("q102: per-source KL drift matches a scalar replay, non-negative-ish") {
    def bucket(w: String): Long =
      graft.core.Hashing.polyFold(w, 31, 1000000007L) % 65536L
    val toks = docs.values.toSeq.flatMap { case (src, t) => words(t).map(w => (src, bucket(w))) }
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toDouble
    val expected = cnt.keys.groupBy(_._1).map { case (src, keys) =>
      val kl = keys.toSeq.map { case (_, b) =>
        val ps = cnt((src, b)).toDouble / ns(src)
        ps * math.log(ps / (cb(b).toDouble / n))
      }.sum
      src -> ((keys.size.toLong, kl))
    }
    val got = TextAnalysis.qSourceDrift(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getString(2))))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, (nb, kl)) =>
      assert(nb == expected(src)._1, s"source $src buckets")
      assert((kl - BigDecimal(expected(src)._2)).abs <= BigDecimal("0.000001"), s"source $src kl")
      // occupied-support KL estimate: strictly positive for any source
      // whose distribution differs from the corpus marginal
      assert(kl > 0, s"source $src kl sign")
    }
  }

  test("q103: winnowing selection matches a scalar replay, guarantee holds") {
    def hashAt(ws: Seq[String]): Seq[Long] =
      ws.sliding(4).filter(_.length == 4)
        .map(g => graft.core.Hashing.polyFold(g.mkString(" "), 31, 1000000007L)).toSeq
    // scalar winnowing: per window of 4 hashes, min value, rightmost tie
    def fingerprints(t: String): Set[Long] = {
      val hs = hashAt(words(t))
      if (hs.length < 4) Set.empty
      else hs.sliding(4).map(_.min).toSet // tie rule picks a POSITION;
                                          // the kept VALUE is the min
    }
    val perDoc = docs.view.mapValues { case (_, t) => fingerprints(t) }.toMap
    val docsPerFp = perDoc.toSeq.flatMap { case (id, fps) => fps.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docs.map { case (id, (_, t)) =>
      val m = math.max(0, hashAt(words(t)).length - 3)
      val fps = perDoc(id)
      id -> ((m.toLong, fps.size.toLong, fps.count(docsPerFp(_) >= 2).toLong))
    }
    val got = TextAnalysis.qWinnowFingerprints(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // Schleimer guarantee on a constructed pair: two docs sharing a
    // 7-word (k+w-1) run MUST share a fingerprint
    val shared = "alpha bravo charlie delta echo foxtrot golf"
    val fpsA = fingerprints(s"one two three $shared nine ten")
    val fpsB = fingerprints(s"$shared zulu yankee xray whiskey")
    assert(fpsA.intersect(fpsB).nonEmpty)
  }

  test("q105: PMI top collocations match a scalar replay") {
    val ws = docs.values.toSeq.map { case (_, t) => words(t) }
    val uni = ws.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = uni.values.sum.toDouble
    val pairs = ws.filter(_.length >= 2)
      .flatMap(_.sliding(2).collect { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBg = pairs.values.sum.toDouble
    val expected = pairs.toSeq.collect { case ((a, b), c12) if c12 >= 5 =>
      val pmi = math.log((c12 / nBg) / ((uni(a) / nTok) * (uni(b) / nTok)))
      (a, b, c12, pmi)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    val got = TextAnalysis.qPmiCollocations(spark, Sf0001).collect()
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((r, (a, b, c12, pmi)), k) =>
      assert(r.getAs[Int]("rank") == k + 1)
      assert(r.getString(1) == a && r.getString(2) == b, s"rank ${k + 1} pair")
      assert(r.getLong(3) == c12, s"rank ${k + 1} count")
      assert((BigDecimal(r.getString(4)) - BigDecimal(pmi)).abs <= BigDecimal("0.000001"),
        s"rank ${k + 1} pmi")
    }
  }

  test("q106: delta admission verdicts match a scalar nearest-lake replay") {
    val sigs = docs.view.mapValues { case (_, t) => graft.dedup.Dedup.simHash64(t) }.toMap
    val (fresh, lake) = sigs.partition { case (id, _) => id % 4 == 0 }
    val expected = fresh.map { case (id, sig) =>
      val cands = lake.toSeq
        .map { case (lid, lsig) => (java.lang.Long.bitCount(sig ^ lsig), lid) }
        .filter(_._1 <= 6)
      id -> (if (cands.isEmpty) None else Some(cands.min.swap))
    }
    val got = graft.dedup.Dedup.qDeltaDedup(spark, Sf0001).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
                       else Some((r.getLong(1), r.getInt(2))))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    }
    assert(got.values.exists(_.isDefined), "fixture should contain delta dups")
  }

  test("q96: importance weights match a scalar hashed-gram replay") {
    def buckets(t: String): Seq[Long] =
      words(t).sliding(2).filter(_.length == 2)
        .map(g => graft.core.Hashing.polyFold(g.mkString(" "), 31, 1000000007L) % 65536L)
        .toSeq
    val perDoc = docs.map { case (id, (src, t)) => (id, src, buckets(t)) }
      .filter(_._3.nonEmpty)
    val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cr = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, src, bs) =>
      bs.foreach(b => if (src == "src0") ct(b) += 1 else cr(b) += 1)
    }
    val (nt, nr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    val expected = perDoc.collect { case (id, src, bs) if src != "src0" =>
      val w = bs.map { b =>
        math.log(((ct(b) + 1.0) / (nt + 65536.0)) / ((cr(b) + 1.0) / (nr + 65536.0)))
      }.sum / bs.size
      id -> ((bs.size.toLong, BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    }.toMap
    val got = TextAnalysis.qImportanceWeights(spark, Sf0001).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getString(2))))
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (n, w)) =>
      assert(n == expected(id)._1, s"doc $id gram count")
      assert((w - expected(id)._2).abs <= BigDecimal("0.000001"), s"doc $id weight")
    }
    // the target flag fires both ways on this corpus
    val flags = TextAnalysis.qImportanceWeights(spark, Sf0001).collect()
      .map(_.getAs[Boolean]("target_like")).toSet
    assert(flags == Set(true, false))
  }

  test("q73: encode manifest matches a scalar vocab build") {
    val all = docs.values.flatMap { case (_, t) => words(t) }.toSeq
    val vocab = all.groupBy(identity).map { case (w, g) => (w, g.size) }.toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20).zipWithIndex
      .map { case ((w, _), i) => w -> (i + 1L) }.toMap
    val expected = docs.collect { case (id, (_, t)) if words(t).nonEmpty =>
      val ws = words(t)
      id -> ((ws.size.toLong,
        ws.map(w => vocab.getOrElse(w, 0L)).sum,
        ws.count(w => !vocab.contains(w)).toLong))
    }
    val got = TextAnalysis.qVocabEncode(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q77: top terms match a scalar tf-idf recomputation") {
    val n = docs.size
    val tf = docs.toSeq.flatMap { case (id, (_, t)) =>
      words(t).groupBy(identity).map { case (w, g) => ((id, w), g.size.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val expected = tf.keys.groupBy(_._1).map { case (id, keys) =>
      val ranked = keys.toSeq.map { case (_, w) =>
        (w, tf((id, w)), df(w), tf((id, w)) * math.log((n + 1.0) / (df(w) + 1.0)))
      }.sortBy { case (w, _, _, score) => (-score, w) }.take(3)
      id -> ranked.zipWithIndex.map { case ((w, t, d, _), i) => (i + 1, w, t, d) }
    }
    val got = TextAnalysis.qTfIdfTopTerms(spark, Sf0001).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Int]("rank"), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
      }
    assert(got == expected)
  }

  test("q78: sampling verdicts match a scalar recomputation, rate tracks quality") {
    val stop = Set("the", "a", "and", "of", "to", "in", "is")
    val expected = docs.map { case (id, (_, t)) =>
      val ws = t.trim.split("\\s+").toSeq // empty string -> [""], matching size(split(...))
      val stopRatio = ws.count(stop).toDouble / ws.size
      val quality = stopRatio * 0.4 + math.min(1.0, ws.size.toDouble / 50) * 0.6
      val bucket = graft.core.Hashing.polyFold(s"$id:graftsample", 131, 998244353L) % 1000000L
      val thresh = math.floor(quality * 1000000.0).toLong
      id -> ((bucket, thresh, bucket < thresh))
    }
    val got = TextAnalysis.qQualitySample(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected)
    // Deterministic sampling must still SAMPLE: keep-rate within ±0.15
    // of the mean keep probability (the hash is uniform; sf0.001 has
    // hundreds of docs, so a wider gap means a broken hash or theta).
    val meanP = expected.values.map(_._2 / 1e6).sum / expected.size
    val rate = got.values.count(_._3).toDouble / got.size
    assert(math.abs(rate - meanP) <= 0.15, s"keep rate $rate vs mean p $meanP")
  }

  test("q124: apportionment satisfies quota — Σ alloc ≡ budget, |alloc − exact share| < 1") {
    import spark.implicits._
    val rows = TextAnalysis.qTokenBudgetAllocation(spark, Sf0001)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val budget = total / 2
    assert(rows.map(_._3).sum == budget, "allocations must sum exactly to the budget")
    rows.foreach { case (src, t, alloc) =>
      val exact = budget.toDouble * t / total
      assert(math.abs(alloc - exact) < 1.0,
        s"$src alloc $alloc violates quota vs exact share $exact")
    }
  }

  test("q123: interleave is a permutation and spreads each source evenly") {
    import spark.implicits._
    val rows = TextAnalysis.qInterleaveSchedule(spark, Sf0001)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // a permutation: global positions are exactly 1..N, docs unique
    assert(rows.map(_._1).sorted.toSeq == (1L to rows.length.toLong))
    assert(rows.map(_._2).distinct.length == rows.length)
    // fairness: a source with t docs in a corpus of T appears about
    // every T/t slots — consecutive positions of the same source may
    // never exceed ~2×(T/t) (fractional-position interleave bound)
    val T = rows.length.toDouble
    rows.groupBy(_._3).foreach { case (src, rs) =>
      val ps = rs.map(_._1).sorted.toSeq
      val maxGap = (ps.head +: ps).sliding(2).map(w => w(1) - w(0)).max
      val bound = 2.0 * T / rs.length + 1
      assert(maxGap <= bound, s"$src max slot gap $maxGap exceeds $bound")
    }
  }

  test("q140: BM25 top-k matches a scalar replay of the textbook formula") {
    val terms = Seq("vector", "stream", "spark")
    val lens = docs.map { case (id, (_, t)) => id -> words(t.toLowerCase).length }
    val n = lens.size
    val avgdl = lens.values.sum.toDouble / n
    val tfs = docs.map { case (id, (_, t)) =>
      id -> words(t.toLowerCase).groupBy(identity).map { case (w, g) => w -> g.length }
    }
    val dfByTerm = terms.map(t => t -> tfs.values.count(_.contains(t))).toMap
    def idf(t: String): Double = {
      val d = dfByTerm(t).toDouble
      math.log(1.0 + (n.toDouble - d + 0.5) / (d + 0.5))
    }
    def score(id: Long): Double = terms.map { t =>
      val tf = tfs(id).getOrElse(t, 0).toDouble
      idf(t) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * lens(id) / avgdl))
    }.sum
    val expected = tfs.keys.toSeq
      .filter(id => terms.exists(tfs(id).contains))
      .sortBy(id => (-score(id), id)).take(10)
    val got = TextAnalysis.qBm25TopK(spark, Sf0001).collect()
      .sortBy(_.getInt(0)).map(r => r.getLong(1))
    assert(got.toSeq == expected,
      s"BM25 ranking diverged: got ${got.toSeq} expected $expected")
    // the evidence columns are honest: re-check one row's tf against
    // the scalar token counts
    val top = TextAnalysis.qBm25TopK(spark, Sf0001).collect().head
    val id = top.getLong(1)
    terms.zipWithIndex.foreach { case (t, i) =>
      assert(top.getLong(3 + i) == tfs(id).getOrElse(t, 0).toLong)
    }
  }

  test("q142: index-backed BM25 equals the from-scratch q140 ranking") {
    val direct = TextAnalysis.qBm25TopK(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val served = TextAnalysis.qPostingBm25(spark, Sf0001).collect()
    assert(served.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      == direct.toSeq, "posting-lake serve diverged from the corpus recompute")
    assert(served.forall(_.getAs[Boolean]("bucket_pruned_strictly")),
      "serving must open a strict subset of the posting lake's buckets")
  }

  test("q143: incrementally-maintained index serves the from-scratch ranking") {
    val direct = TextAnalysis.qBm25TopK(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val inc = TextAnalysis.qIncrementalPostings(spark, Sf0001).collect()
    assert(inc.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      == direct.toSeq, "delta-updated posting lake diverged from full recompute")
    assert(inc.forall(_.getAs[Boolean]("delta_matches_cdc")),
      "CDC view of the update window must contain exactly the delta's postings")
  }

  test("q148: weighted sample is deterministic, sized k, and quality-biased") {
    val a = TextAnalysis.qWeightedSample(spark, Sf0001).collect()
    val b = TextAnalysis.qWeightedSample(spark, Sf0001).collect()
    assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq,
      "hash-keyed sampling must be run-stable")
    assert(a.length == 50 && a.map(_.getInt(0)).toSeq == (1 to 50))
    assert(a.map(_.getLong(1)).distinct.length == 50, "without replacement")
    // weighting bias: the sample's mean fixed-point quality must beat
    // the corpus mean (E-S inclusion probability is monotone in w;
    // deterministic for the fixed fixture)
    val sampleMean = a.map(_.getLong(3)).sum.toDouble / a.length
    val corpus = TextAnalysis.qualityScores(spark, Sf0001)
      .select((org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.col("quality") * 1048576.0)).cast("long"))
      .collect().map(_.getLong(0))
    val corpusMean = corpus.sum.toDouble / corpus.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean quality $sampleMean <= corpus mean $corpusMean")
  }

  test("q154: serve-shaped hybrid agrees with the exact-legs fusion at the operating point") {
    // the fused-rank agreement gate: q151 fuses the ORACLE-ANCHOR legs
    // (from-scratch BM25 + exact cosine); q154 fuses the SERVING legs
    // (posting lake + IVF-PQ ADC shortlist + exact re-rank). The
    // lexical legs are provably identical (q142's pin); the semantic
    // serve leg may differ only where the ADC shortlist misses a true
    // neighbor, so the fused top-10 must agree on a large fraction —
    // floored at the measured value on this worst-case geometry
    // (uniform random vectors), so a serving regression is loud.
    val exact = TextAnalysis.qHybridRrf(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id"))
    graft.core.Resources.release()
    val served = TextAnalysis.qHybridServe(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id"))
    graft.core.Resources.release()
    assert(served.length == 10 && exact.length == 10)
    val overlap = served.count(exact.toSet) / 10.0
    info(f"fused top-10 agreement q154 vs q151: $overlap%.2f")
    assert(overlap >= 0.7,
      f"serve-shaped hybrid agreement $overlap%.2f fell below the 0.7 floor")
    // determinism: the serve pipeline is RNG-free end-to-end
    val again = TextAnalysis.qHybridServe(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id"))
    graft.core.Resources.release()
    assert(again.toSeq == served.toSeq, "hybrid serve must be run-stable")
  }
}
