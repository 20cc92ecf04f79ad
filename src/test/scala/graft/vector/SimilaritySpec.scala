package graft.vector

import graft.SparkSpec

/** IVF-ANN recall against the brute-force top-k baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-5 recall vs brute force >= 0.5 at sf0.001") {
    val brute = Similarity.qCosineTopK(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.qAnnIvf(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(brute.size == 100) // 20 queries x 5
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("q134: recall@6 meets the reference operating point's 0.95 floor") {
    // the HNSW-substitution gate: top_k=6 cosine (pgvector's
    // setup_vector_db.py operating point), floor 0.95 at the
    // documented nprobe=12 — asserted on the WORST-case geometry
    // (uniform random vectors, no cluster structure)
    val rows = Similarity.qAnnOperatingPoint(spark, Sf0001).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("meets_floor")),
      "mean recall@6 must clear the 0.95 reference-parity floor")
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.95, s"mean recall@6 $mean")
    rows.foreach { r =>
      assert(r.getAs[Double]("recall") == r.getAs[Long]("n_hits") / 6.0)
    }
  }

  test("IVF returns k ranked neighbors per query, no self-matches") {
    val rows = Similarity.qAnnIvf(spark, Sf0001).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("SRP-LSH pairs are a subset of the exact theta-join (q32), nonempty") {
    // Every q76 pair passed the SAME exact-cosine verify as q32, so the
    // banded candidate stage can only REMOVE pairs, never invent them.
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"), r.getAs[String]("sim_r"))).toSet
    val exact = pairs(Similarity.qEmbedNearDup(spark, Sf0001))
    graft.core.Resources.release()
    val srp = pairs(Similarity.qSrpLsh(spark, Sf0001))
    graft.core.Resources.release()
    assert(srp.nonEmpty, "SRP-LSH found no pairs at sf0.001")
    assert(srp.subsetOf(exact),
      s"SRP emitted pairs outside the exact theta-join: ${srp.diff(exact).take(5)}")
    // Uniform random vectors are LSH's worst case (no cluster
    // structure); still expect a real fraction of the exact pair set.
    val recall = srp.size.toDouble / exact.size
    assert(recall >= 0.2, s"SRP recall $recall vs exact ${exact.size} pairs")
  }

  test("q97: recall report agrees with the q31/q33 set intersection") {
    val brute = Similarity.qCosineTopK(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.qAnnIvf(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = Similarity.qAnnRecall(spark, Sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val hits = brute.filter(_._1 == q).count(ivf.contains)
      assert(r.getAs[Long]("n_hits") == hits, s"query $q")
      assert(r.getAs[Double]("recall") == hits / 5.0, s"query $q")
    }
  }

  test("q95: SemDeDup pruning matches a scalar within-bucket replay") {
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, f) => id -> f.map(_.toDouble) }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // TRAINED quantizer replay: k lowest-id seeds (ivfK(500) = 16) +
    // one fixed-point Lloyd round — the shared trainedCents kernel
    def assignTo(cs: Seq[(Long, Array[Double])], v: Array[Double]): Long =
      cs.map { case (cid, cv) => (-cos(v, cv), cid) }.min._2
    val seeds = vecs.filter(_._1 < Similarity.ivfK(vecs.length)).toSeq
    val a1 = vecs.map { case (_, v) => (assignTo(seeds, v), v) }
    val cents = seeds.map { case (cid, cv) =>
      val members = a1.collect { case (c, v) if c == cid => v }
      if (members.isEmpty) (cid, cv)
      else (cid, Array.tabulate(cv.length) { j =>
        val fs = members.map(m => math.floor(m(j) * 1048576L).toLong).sum
        fs.toDouble / (members.length.toDouble * 1048576L)
      })
    }
    def bucket(v: Array[Double]): Long = assignTo(cents, v)
    val assigned = vecs.map { case (id, v) => (id, v, bucket(v)) }
    val expected = assigned.map { case (id, v, b) =>
      val ws = assigned.collect {
        case (u, uv, ub) if ub == b && u < id && cos(uv, v) >= 0.35 => u
      }
      id -> ((b, ws.sorted.headOption))
    }.toMap
    val got = Similarity.qSemDedup(spark, Sf0001).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("bucket"),
          Option(r.getAs[java.lang.Long]("witness")).map(_.toLong)))
    }.toMap
    assert(got == expected)
    // the fixture exercises both outcomes
    assert(got.values.exists(_._2.isDefined))
    assert(got.values.exists(_._2.isEmpty))
  }

  test("q101: k-means refinement matches a scalar Lloyd replay") {
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, f) => id -> f.map(_.toDouble) }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def assign(cents: Seq[(Long, Array[Double])], v: Array[Double]): Long =
      cents.map { case (cid, cv) => (-cos(v, cv), cid) }.min._2
    var cents = vecs.filter(_._1 < 16).toSeq
    // one update round (KmRounds = 2: final assignment feeds the output)
    val a1 = vecs.map { case (id, v) => (assign(cents, v), id, v) }
    cents = cents.map { case (cid, cv) =>
      val members = a1.filter(_._1 == cid).map(_._3)
      if (members.isEmpty) (cid, cv)
      else {
        val d = Array.tabulate(cv.length) { j =>
          val fs = members.map(m => math.floor(m(j) * 1048576L).toLong).sum
          fs.toDouble / (members.length.toDouble * 1048576L)
        }
        (cid, d)
      }
    }
    val expected = vecs.map { case (id, v) => (assign(cents, v), v) }
      .groupBy(_._1).map { case (cid, rows) =>
        cid -> ((rows.length.toLong,
          rows.map(_._2.map(x => math.floor(x * 1048576L).toLong).sum).sum))
      }
    val got = Similarity.qKmeansRefine(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // refinement actually moved assignments vs the seed partition
    val seedCounts = vecs.map { case (_, v) => assign(vecs.filter(_._1 < 16).toSeq, v) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap != seedCounts)
  }

  test("q104: Gram cells match a scalar replay and drive power iteration") {
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (_, f) => f.map(_.toDouble) }
    val expected = (for {
      i <- 0 until 64; j <- i until 64
    } yield (i + 1, j + 1) ->
      ((vecs.length.toLong,
        vecs.map(v => math.floor(v(i) * v(j) * 1048576L).toLong).sum))).toMap
    val rows = Similarity.qGramMatrix(spark, Sf0001).collect()
    val got = rows.map(r => (r.getInt(0), r.getInt(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.size == 64 * 65 / 2)
    // the returned cells are usable for their PCA purpose: power
    // iteration on the reconstructed symmetric matrix converges to a
    // dominant eigenpair (residual small relative to the eigenvalue)
    val g = Array.ofDim[Double](64, 64)
    got.foreach { case ((i, j), (_, fp)) =>
      val x = fp.toDouble / 1048576L
      g(i - 1)(j - 1) = x; g(j - 1)(i - 1) = x
    }
    var x = Array.fill(64)(1.0)
    (1 to 100).foreach { _ =>
      val y = g.map(row => row.zip(x).map { case (a, b) => a * b }.sum)
      val n = math.sqrt(y.map(v => v * v).sum)
      x = y.map(_ / n)
    }
    val gx = g.map(row => row.zip(x).map { case (a, b) => a * b }.sum)
    val lambda = x.zip(gx).map { case (a, b) => a * b }.sum
    val residual = math.sqrt(gx.zip(x.map(_ * lambda))
      .map { case (a, b) => (a - b) * (a - b) }.sum)
    // uniform random embeddings have a nearly flat spectrum, so demand
    // sane Rayleigh behavior rather than tight convergence: dominant
    // eigenvalue positive, at least the spectral average (trace/64),
    // at most the trace, residual a few percent of lambda
    val trace = (1 to 64).map(i => g(i - 1)(i - 1)).sum
    assert(lambda > 0 && lambda <= trace * (1 + 1e-9) && lambda >= trace / 64,
      s"lambda $lambda outside [trace/64, trace] = [${trace / 64}, $trace]")
    assert(residual < 0.05 * lambda, s"power iteration residual $residual vs lambda $lambda")
  }

  test("q135: HNSW recall@6 meets the 0.95 floor, ranked, no self-matches") {
    val rows = Similarity.qHnswAnn(spark, Sf0001).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 20)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    // recall@6 vs brute-force ground truth at the same operating point
    // (the shared bruteTopK definition q31/q134 use)
    val gt = Similarity.bruteTopK(spark, Sf0001, 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val hnsw = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = gt.count(hnsw.contains).toDouble / gt.length
    assert(recall >= 0.95, s"HNSW recall@6 $recall below the reference-parity floor")
  }

  test("q135: graph build is deterministic and the lake round-trips") {
    import spark.implicits._
    def canon(p: String) = spark.read.parquet(p)
      .select($"bucket".cast("long"), $"vec_id", $"level", $"neighbors")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3).toList))
      .sortBy(t => (t._1, t._2, t._3))
    // TempDirs.fresh reclaims the previous lake under the same prefix,
    // so each build's rows are read back before the next build runs
    val a = canon(Similarity.hnswBuildLake(spark, Sf0001))
    val b = canon(Similarity.hnswBuildLake(spark, Sf0001))
    assert(a.length == b.length && a.sameElements(b),
      "two builds over the same corpus must serialize identical adjacency")
    // shipped-lake invariants: degree ≤ 2M at level 0 and ≤ M above
    // (the build prunes on every insertion), no self-edges
    a.foreach { case (_, id, lvl, nbrs) =>
      val cap = if (lvl == 0) 16 else 8
      assert(nbrs.size <= cap, s"node $id level $lvl degree ${nbrs.size}")
      assert(!nbrs.contains(id), "no self-edges")
    }
    // round-trip: serving from the lake equals serving from a fresh
    // build of the same corpus (fromRows ∘ toRows is search-identical)
    val r1 = Similarity.qHnswAnn(spark, Sf0001).collect().map(_.toString).toSeq
    val r2 = Similarity.qHnswAnn(spark, Sf0001).collect().map(_.toString).toSeq
    assert(r1 == r2, "HNSW serve must be deterministic end-to-end")
  }

  test("q136: incremental HNSW update is byte-identical to a from-scratch rebuild") {
    import spark.implicits._
    def canon(p: String) = spark.read.parquet(p)
      .select($"bucket".cast("long"), $"vec_id", $"level", $"neighbors")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3).toList))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val (v1, v2, ledgerDf) = Similarity.hnswDeltaLakes(spark, Sf0001)
    val ledger = ledgerDf.collect()
    val v1c = canon(v1); val v2c = canon(v2)
    // delta is sparse (1%): some buckets must be clean AND some dirty,
    // or the test proves nothing
    val dirty = ledger.filter(_.getAs[Boolean]("dirty")).map(_.getAs[Long]("bucket")).toSet
    val clean = ledger.filterNot(_.getAs[Boolean]("dirty")).map(_.getAs[Long]("bucket")).toSet
    assert(dirty.nonEmpty && clean.nonEmpty, s"need both: dirty=$dirty clean=$clean")
    // clean buckets' adjacency survives the update verbatim
    assert(v1c.filter(r => clean(r._1)) == v2c.filter(r => clean(r._1)),
      "clean buckets must carry forward unrewritten")
    // ledger arithmetic matches the lakes' node counts (level-0 rows)
    val v2nodes = v2c.filter(_._3 == 0).groupBy(_._1).view.mapValues(_.size).toMap
    ledger.foreach { r =>
      assert(v2nodes.getOrElse(r.getAs[Long]("bucket"), 0) == r.getAs[Long]("n_v2"),
        s"bucket ${r.getAs[Long]("bucket")} ledger vs lake")
    }
    // THE pin: incremental result ≡ from-scratch build of the full
    // corpus (deterministic construction makes this exact equality)
    val full = canon(Similarity.hnswBuildLake(spark, Sf0001))
    assert(v2c == full, "incremental update must equal the from-scratch index")
  }

  test("srpSig is deterministic and uses all bands") {
    val v1 = Array.tabulate(64)(i => math.sin(i + 1.0))
    val v2 = Array.tabulate(64)(i => math.cos(3.0 * i + 1.0))
    assert(Similarity.srpSig(v1) == Similarity.srpSig(v1))
    assert(Similarity.srpSig(v1) != Similarity.srpSig(v2),
      "distinct vectors should not collide on all 60 bits")
    assert((Similarity.srpSig(v1) >>> 60) == 0L, "bits above 60 must stay clear")
  }

  test("q144: PQ codes are deterministic, 128x smaller, and ADC-serviceable") {
    val (codes1, books, sub) = Similarity.pqEncode(spark, Sf0001)
    val (codes2, _, _) = Similarity.pqEncode(spark, Sf0001)
    // determinism: two builds produce identical codes (fixed seeds +
    // fixed-point updates — no RNG anywhere)
    assert(codes1.sortBy(_._1).zip(codes2.sortBy(_._1)).forall {
      case ((i1, c1), (i2, c2)) => i1 == i2 && c1.sameElements(c2)
    }, "PQ encoding must be bit-reproducible")
    // compression arithmetic: M subspaces x log2(K) bits = 2 bytes per
    // vector vs 64 float32 dims = 256 bytes → 128x
    val dim = sub * 4
    assert(dim == 64 && codes1.head._2.length == 4)
    assert(codes1.forall(_._2.forall(c => c >= 0 && c < 16)),
      "codes must fit 4 bits")

    // ADC serving: queries score the CODES via per-subspace lookup
    // tables (k x M distances per query, never a full vector read) and
    // the approximate top-10 must overlap the exact L2 top-10 — the
    // recall floor is the measured value on this worst-case geometry
    // (uniform random vectors, the distance-concentration regime PQ
    // papers call out), pinned so a regression is loud
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, f) => id -> f.map(_.toDouble) }.toMap
    val codeMap = codes1.toMap
    def exactD2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val queries = vecs.keys.filter(_ < 20).toSeq.sorted
    val recalls = queries.map { q =>
      val qv = vecs(q)
      // lookup tables: table(m)(c) = d2(query sub m, codeword c)
      val tables = Array.tabulate(4, 16) { (m, c) =>
        exactD2(java.util.Arrays.copyOfRange(qv, m * sub, (m + 1) * sub),
          books(m)(c)._2)
      }
      def adc(id: Long): Double = {
        val cs = codeMap(id)
        tables(0)(cs(0)) + tables(1)(cs(1)) + tables(2)(cs(2)) + tables(3)(cs(3))
      }
      val others = vecs.keys.filter(_ != q).toSeq
      val exactTop = others.sortBy(o => (exactD2(qv, vecs(o)), o)).take(10).toSet
      val adcTop = others.sortBy(o => (adc(o), o)).take(10).toSet
      // the production serving pattern: ADC shortlist (cheap, from
      // codes alone) -> exact re-rank of the 50-candidate shortlist
      val rerank = others.sortBy(o => (adc(o), o)).take(50)
        .sortBy(o => (exactD2(qv, vecs(o)), o)).take(10).toSet
      ((exactTop intersect adcTop).size / 10.0,
        (exactTop intersect rerank).size / 10.0)
    }
    val meanAdc = recalls.map(_._1).sum / recalls.length
    val meanRr = recalls.map(_._2).sum / recalls.length
    info(f"PQ recall@10 at sf0.001: ADC-only $meanAdc%.3f, +exact-rerank@50 $meanRr%.3f")
    // measured 0.265 / 0.640 on this fixture — uniform random vectors
    // are the distance-concentration regime the PQ papers call out as
    // the worst case; the floors pin regressions, and the ADC->rerank
    // lift is the claim that the codes preserve neighborhood structure
    assert(meanAdc >= 0.25,
      f"ADC recall@10 $meanAdc%.3f regressed below the pinned floor on the " +
        "uniform-random worst case (2 bytes/vector)")
    assert(meanRr >= meanAdc + 0.2,
      f"exact re-rank of the ADC shortlist must recover substantial recall " +
        f"(got $meanRr%.3f vs ADC $meanAdc%.3f)")
  }

  test("coarse quantizer: k derives from corpus size; buckets stay bounded at x10") {
    // the derivation rule itself
    assert(Similarity.ivfK(500) == 16)    // floor
    assert(Similarity.ivfK(2000) == 20)   // sf0.1
    assert(Similarity.ivfK(5000) == 50)   // this test's x10 corpus
    assert(Similarity.ivfK(200000) == 2000)
    // x10 corpus via ScaleData's rotation-decorrelation trick: replica
    // j offsets vec_id by j*1e6 and rotates the vector j positions
    val base = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, f) => id -> f.map(_.toDouble) }
    val x10 = (0 until 10).flatMap { j =>
      base.map { case (id, v) =>
        val r = Array.tabulate(v.length)(i => v((i + j) % v.length))
        (if (j == 0) id else id + j * 1000000L, r)
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val ds = graft.core.Resources.persist(
      spark.createDataset(x10.map { case (id, v) =>
        Similarity.Vec(id, v, math.sqrt(dot(v, v)))
      }))
    val cents = Similarity.trainedCents(spark, ds)
    assert(cents.length == 50, s"derived k must be 50 at N=5000, got ${cents.length}")
    // assign every vector; the bucket-size envelope the HNSW build
    // guards on must hold with real margin
    val sizes = x10.groupBy { case (_, v) =>
      val n = math.sqrt(dot(v, v))
      cents.map(c => (-(dot(v, c.v) / (n * c.norm)), c.id)).min._2
    }.view.mapValues(_.size)
    val maxBucket = sizes.values.max
    info(s"x10 corpus: k=50, max bucket $maxBucket (target ${Similarity.IvfTargetBucket})")
    assert(sizes.keys.size == 50, "no centroid may end up with an empty cluster here")
    assert(maxBucket <= Similarity.HnswMaxBucket,
      s"max bucket $maxBucket exceeds the HNSW build envelope ${Similarity.HnswMaxBucket}")
    graft.core.Resources.release()
  }

  test("q145: composed IVF-PQ ledger marginals are consistent") {
    val rows = Similarity.qIvfPq(spark, Sf0001).collect()
    val n = graft.core.Tables.embeddings(spark, Sf0001).count()
    // every vector contributes exactly one code per subspace
    (0 until 4).foreach { m =>
      val tot = rows.filter(_.getAs[Int]("m") == m)
        .map(_.getAs[Long]("n_members")).sum
      assert(tot == n, s"subspace $m covers $tot of $n vectors")
    }
    // the per-bucket marginal is the IVF census — identical for every m
    val perBucketM = rows.groupBy(r =>
        (r.getAs[Long]("bucket"), r.getAs[Int]("m")))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_members")).sum }
    perBucketM.keys.map(_._1).toSeq.distinct.foreach { b =>
      val sizes = (0 until 4).map(m => perBucketM.getOrElse((b, m), 0L)).distinct
      assert(sizes.length == 1, s"bucket $b census differs across subspaces: $sizes")
    }
    assert(rows.forall(_.getAs[Long]("fp_err") >= 0L),
      "L2^2 quantization error mass cannot be negative")
  }

  test("q155: serve ledger fences the graph walk — emitted neighbors lie in probed buckets") {
    val ledger = Similarity.qHnswServeLedger(spark, Sf0001).collect()
    graft.core.Resources.release()
    // relational shape: 20 queries x nprobe rows, ranks contiguous
    val byQuery = ledger.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 20)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("probe_rank")).sorted.toSeq == (1 to rows.length))
    }
    assert(ledger.forall(_.getAs[Int]("ef") == 96))
    // candidate-pool sizes cover the corpus exactly once per bucket:
    // distinct (bucket, n_candidates) sums to N when every bucket is
    // probed by someone (k=16, nprobe=12 at this SF covers all)
    val probedSizes = ledger.map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("n_candidates"))).distinct
    assert(probedSizes.forall(_._2 > 0), "no probed bucket may be empty here")
    // serve containment: every neighbor q135 emits for a query lives
    // in a bucket that query's ledger rows list — the procedural beam
    // is fenced by the oracled relational probe set
    val served = Similarity.qHnswAnn(spark, Sf0001).collect()
    graft.core.Resources.release()
    val vecs = graft.core.Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, f) => id -> f.map(_.toDouble) }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // trained-quantizer scalar replay (the q95 replay, reused)
    def assignTo(cs: Seq[(Long, Array[Double])], v: Array[Double]): Long =
      cs.map { case (cid, cv) => (-cos(v, cv), cid) }.min._2
    val seeds = vecs.filter(_._1 < Similarity.ivfK(vecs.length)).toSeq
    val a1 = vecs.map { case (_, v) => (assignTo(seeds, v), v) }
    val cents = seeds.map { case (cid, cv) =>
      val members = a1.collect { case (c, v) if c == cid => v }
      if (members.isEmpty) (cid, cv)
      else (cid, Array.tabulate(cv.length) { j =>
        val fs = members.map(m => math.floor(m(j) * 1048576L).toLong).sum
        fs.toDouble / (members.length.toDouble * 1048576L)
      })
    }
    val bucketOf = vecs.map { case (id, v) => id -> assignTo(cents, v) }.toMap
    val probedByQuery = ledger.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("bucket")).toSet).toMap
    served.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val n = r.getAs[Long]("neighbor_id")
      assert(probedByQuery(q).contains(bucketOf(n)),
        s"query $q emitted neighbor $n from an unprobed bucket ${bucketOf(n)}")
    }
  }
}
