package graft.text

import graft.SparkSpec

/** Scalar cross-checks for the round-4 prep operators: q81 block
  * packing replayed as a per-source fold, q82 shard order replayed
  * with the scalar polyhash fold, q83 rollup checked against direct
  * aggregation (subtotals must SUM to their leaves, not merely look
  * plausible). */
class PackShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docRows: Seq[(Long, String, String)] =
    graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def tok(t: String): Long =
    if (t.trim.isEmpty) 0L else t.trim.split("\\s+").length.toLong

  test("q81: offsets are per-source prefix sums; block arithmetic replays exactly") {
    val got = Chunkers_q81.rows(spark, Sf0001)
    val bySource = docRows.groupBy(_._2)
    val expected = bySource.flatMap { case (src, ds) =>
      var off = 0L
      ds.sortBy(_._1).map { case (id, _, t) =>
        val n = tok(t)
        val start = off / 64
        val end = if (n > 0) (off + n - 1) / 64 else start
        val row = (id, src, n, off, start, off % 64, end, end - start + 1)
        off += n
        row
      }
    }.toSet
    assert(got.toSet == expected)
    // blocks tile: per source, final offset equals the token total
    bySource.foreach { case (src, ds) =>
      val last = got.filter(_._2 == src).maxBy(_._4)
      assert(last._4 + last._3 == ds.map(d => tok(d._3)).sum)
    }
  }

  test("q82: shard order is a deterministic permutation keyed by the portable hash") {
    val rows = TextAnalysis.qShardOrder(spark, Sf0001)
      .select("doc_id", "shard", "order_key", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == docRows.length)
    // order_key replays with the scalar fold; shard = key mod 8
    rows.foreach { case (id, shard, key, _) =>
      val expect = graft.core.Hashing.polyFold(s"$id:graftorder", 131, 998244353L)
      assert(key == expect, s"doc $id order_key $key != $expect")
      assert(shard == (key % 8).toInt)
    }
    // pos is a 1..n permutation per shard, ordered by (key, id)
    rows.groupBy(_._2).foreach { case (shard, ms) =>
      val sorted = ms.sortBy(m => (m._3, m._1))
      assert(sorted.map(_._4).toSeq == (1 to ms.length).toSeq,
        s"shard $shard positions not a permutation")
    }
    // deterministic across runs
    val again = TextAnalysis.qShardOrder(spark, Sf0001)
      .select("doc_id", "shard", "order_key", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(again.toSeq == rows.toSeq)
  }

  test("q84: quality-weighted rates replay scalar-side; above-par sources keep everything") {
    val rows = TextAnalysis.qMixtureRebalance(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == docRows.length)
    // scalar replay: per-doc fixed-point quality -> per-source mass ->
    // rate -> thresh, mirroring the distributed arithmetic exactly
    val stop = Set("the", "a", "and", "of", "to", "in", "is")
    def qfp(t: String): Long = {
      val words = t.trim.split("\\s+").toSeq // split semantics: "" -> [""]
      val nw = words.length
      val stopCnt = words.count(stop)
      val q = (stopCnt.toDouble / nw) * 0.4 +
        math.min(1.0, nw.toDouble / 50) * 0.6
      math.floor(q * 1000000.0).toLong
    }
    val docQ = docRows.map(d => (d._1, d._2, qfp(d._3)))
    val bySource = docQ.groupBy(_._2)
    val n = docQ.length.toLong
    val qTot = docQ.map(_._3).sum
    val thresh = bySource.map { case (src, ds) =>
      val rate = math.min(1.0,
        (ds.map(_._3).sum.toDouble * n) / (qTot.toDouble * ds.length))
      src -> math.floor(rate * 1000000.0).toLong
    }
    rows.foreach { case (id, src, th, kept) =>
      assert(th == thresh(src), s"doc $id thresh $th != ${thresh(src)}")
      val bucket = graft.core.Hashing.polyFold(s"$id:graftmix", 131, 998244353L) % 1000000L
      assert(kept == (bucket < th), s"doc $id kept")
    }
    // the rebalance must be non-vacuous at sf0.001
    assert(rows.exists(!_._4), "no doc dropped — quality mass uniform, fixture drifted")
    assert(thresh.values.exists(_ == 1000000L), "no source at rate 1 — unexpected")
  }

  test("q86: cap keeps exactly the K hash-smallest docs per source") {
    val rows = TextAnalysis.qSourceCap(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.length == docRows.length)
    rows.groupBy(_._2).foreach { case (src, ms) =>
      // rank = position in the (hash, id) order, replayed scalar-side
      val keyed = ms.map { m =>
        (m._1, graft.core.Hashing.polyFold(s"${m._1}:graftcap", 131, 998244353L))
      }.sortBy { case (id, k) => (k, id) }
      val expectRank = keyed.zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      ms.foreach { case (id, _, rank, kept) =>
        assert(rank == expectRank(id), s"doc $id rank")
        assert(kept == (rank <= 20), s"doc $id kept")
      }
      assert(ms.count(_._4) == math.min(20, ms.length), s"$src kept count")
    }
    assert(rows.exists(!_._4), "cap never binds at sf0.001 — fixture drifted")
  }

  test("q87: quantiles replay the (n-1)p linear interpolation scalar-side") {
    val rows = TextAnalysis.qLengthQuantiles(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def q(sorted: IndexedSeq[Long], p: Double): Double = {
      val idx = (sorted.length - 1) * p
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
    }
    docRows.groupBy(_._2).foreach { case (src, ds) =>
      val toks = ds.map(d => tok(d._3)).sorted.toIndexedSeq
      val (n, p10, p50, p90) = rows(src)
      assert(n == ds.length)
      assert(p10 == q(toks, 0.1), s"$src p10")
      assert(p50 == q(toks, 0.5), s"$src p50")
      assert(p90 == q(toks, 0.9), s"$src p90")
    }
  }

  test("q88 write shape: every shard file is laid down in training order") {
    import org.apache.spark.sql.functions.input_file_name
    val lake = graft.sink.TempDirs.fresh("graft_shard_spec_").toString
    val keyed = TextAnalysis.shardKeys(spark, Sf0001)
    keyed.repartition(TextAnalysis.numShards, $"shard")
      .sortWithinPartitions($"shard", $"order_key", $"doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(lake)
    val back = spark.read.parquet(lake)
      .select(input_file_name().as("f"), $"shard".cast("int").as("shard"),
        $"order_key", $"doc_id")
      .collect()
    assert(back.length == docRows.length)
    assert(back.map(_.getInt(1)).distinct.sorted.toSeq == (0 until TextAnalysis.numShards),
      "shard directories missing or extra")
    // parquet preserves within-file row order on read; the writer must
    // have laid each file down sorted by (order_key, doc_id) — this is
    // the physical property the q88 content oracle cannot see
    back.groupBy(_.getString(0)).foreach { case (f, rows) =>
      val keys = rows.map(r => (r.getLong(2), r.getLong(3))).toSeq
      assert(keys == keys.sorted, s"file $f not in training order")
    }
    // a file only holds its directory's shard
    back.groupBy(_.getString(0)).foreach { case (f, rows) =>
      assert(rows.map(_.getInt(1)).distinct.length == 1, s"file $f mixes shards")
    }
  }

  /** Greedy left-to-right non-overlapping merge — a merged token's
    * text l+r can never equal l, so no re-merge flag is needed. */
  private def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
      else out += x
    }
    out.toVector
  }

  /** The scalar BPE trainer both the q90 and q91 tests replay against. */
  private lazy val scalarBpeRules: Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] = docRows
      .flatMap(d => d._3.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }.toSeq
    (1 to 3).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (syms, f) => mergeOnce(syms, l, r) -> f }
      (k, l, r, cnt)
    }
  }

  test("BPE merge fold ≡ positional non-overlap reference on adversarial inputs") {
    // The engine's merge relies on two subtle equivalences: (1) the
    // flag-free fold is safe because a merged token's text l+r can
    // never equal l; (2) the string form's ends_with(acc, '|'+l) is
    // exactly a last-token-equals-l test because symbols never contain
    // the delimiter. Both are pinned here against an explicit
    // positional reference, over an alphabet whose tokens are
    // prefixes/suffixes of each other (the adversarial regime).
    def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def stringFold(syms: Vector[String], l: String, r: String): Vector[String] = {
      val acc = syms.foldLeft("") { (acc, x) =>
        if (acc.nonEmpty && acc.endsWith("|" + l) && x == r) acc + x else acc + "|" + x
      }
      acc.split("\\|").filter(_.nonEmpty).toVector
    }
    val alphabet = Vector("a", "b", "ab", "ba", "aa", "aab", "baa")
    val rnd = new scala.util.Random(42)
    (1 to 5000).foreach { trial =>
      val syms = Vector.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
      val l = alphabet(rnd.nextInt(alphabet.length))
      val r = alphabet(rnd.nextInt(alphabet.length))
      val exp = refMerge(syms, l, r)
      assert(mergeOnce(syms, l, r) == exp, s"trial $trial: fold($syms, $l, $r)")
      assert(stringFold(syms, l, r) == exp, s"trial $trial: stringFold($syms, $l, $r)")
    }
  }

  test("q90: merge rules replay a scalar BPE trainer") {
    val got = TextAnalysis.qBpeMerges(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    graft.core.Resources.release()
    assert(got == scalarBpeRules, s"rules $got != $scalarBpeRules")
    // the merges must actually differ round to round (a trainer stuck
    // on one pair means the rewrite never applied)
    assert(got.map(g => (g._2, g._3)).distinct.size == 3)
  }

  test("q91: tokenization under the learned rules replays per word") {
    def applyRules(w: String): Int =
      scalarBpeRules.foldLeft(w.map(_.toString).toVector) {
        case (syms, (_, l, r, _)) => mergeOnce(syms, l, r)
      }.length
    val tok = TextAnalysis.qBpeTokenize(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.core.Resources.release()
    assert(tok.size == docRows.length)
    docRows.foreach { case (id, _, t) =>
      val words = t.trim.split("\\s+").filter(_.nonEmpty)
      val (nw, nc, nt) = tok(id)
      assert(nw == words.length, s"doc $id n_words")
      assert(nc == words.map(_.length.toLong).sum, s"doc $id n_chars")
      assert(nt == words.map(applyRules(_).toLong).sum, s"doc $id n_tokens")
    }
    // merges must actually compress the corpus
    assert(tok.values.map(_._3).sum < tok.values.map(_._2).sum)
  }

  test("q83: rollup subtotals sum to their leaves and the grand total is the corpus") {
    val rows = TextAnalysis.qSourceStats(spark, Sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val leaves = rows.filter { case ((s0, l0), _) => s0 != "<all>" && l0 != "<all>" }
    // per-source subtotal = sum of its lang leaves (max via max)
    leaves.groupBy(_._1._1).foreach { case (src, ls) =>
      val sub = rows((src, "<all>"))
      assert(sub._1 == ls.values.map(_._1).sum, s"$src n_docs subtotal")
      assert(sub._2 == ls.values.map(_._2).sum, s"$src tok_sum subtotal")
      assert(sub._3 == ls.values.map(_._3).sum, s"$src char_sum subtotal")
      assert(sub._4 == ls.values.map(_._4).max, s"$src max_chars subtotal")
    }
    val total = rows(("<all>", "<all>"))
    assert(total._1 == docRows.length)
    assert(total._2 == docRows.map(d => tok(d._3)).sum)
    // ROLLUP(source, lang) emits no (<all>, lang) slices
    assert(!rows.keys.exists { case (s0, l0) => s0 == "<all>" && l0 != "<all>" })
  }
}

/** Tiny adapter so the q81 cross-check reads tuples without repeating
  * column plumbing in the test body. */
private object Chunkers_q81 {
  def rows(s: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(Long, String, Long, Long, Long, Long, Long, Long)] = {
    graft.chunk.Chunkers.qPackBlocks(s, dir).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toSeq
  }
}
