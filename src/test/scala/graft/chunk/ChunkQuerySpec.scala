package graft.chunk

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the distributed chunking queries that the
  * value oracles cannot express directly (conservation, block-size
  * contract, order sensitivity of the q116 hash). */
class ChunkQuerySpec extends SparkSpec {
  import spark.implicits._

  test("q116 blocks conserve tokens; every non-final block is exactly full") {
    val blocks = Chunkers.qTokenShardExport(spark, Sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("block_id"),
        r.getAs[Long]("n_tok")))
    assert(blocks.nonEmpty)
    // conservation: block tokens sum to the corpus' non-empty tokens
    val corpusToks = graft.core.Tables.documents(spark, Sf0001)
      .select(size(expr("filter(split(trim(text), '\\\\s+'), t -> t != '')")).as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(blocks.map(_._3).sum == corpusToks, "token conservation across blocks")
    // the concat-and-cut contract: within a source, only the LAST
    // block may be partial, and block ids are dense from 0
    blocks.groupBy(_._1).foreach { case (src, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"$src dense ids")
      sorted.init.foreach { case (_, bid, n) =>
        assert(n == Chunkers.PackBlockTokens.toLong, s"$src block $bid not full ($n)")
      }
    }
  }

  test("q116 block hash is order-sensitive (swapped ids change it)") {
    // the fold (acc*131 + x) % M distinguishes [a, b] from [b, a]
    // whenever a != b — the property that pins token ORDER through the
    // shard trip, which n_tok/id_sum cannot
    def fold(xs: Seq[Long]): Long = xs.foldLeft(0L)((acc, x) => (acc * 131 + x) % 998244353)
    assert(fold(Seq(1L, 2L, 3L)) != fold(Seq(2L, 1L, 3L)))
    assert(fold(Seq(1L, 2L, 3L)) != fold(Seq(1L, 3L, 2L)))
  }

  test("q127 incremental export == full snapshot-B export, with both actions present") {
    val inc = Chunkers.qIncrementalShardExport(spark, Sf0001).collect()
      .map(r => ((r.getAs[String]("source"), r.getAs[Long]("block_id")),
        (r.getAs[String]("action"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("id_sum"), r.getAs[Long]("id_hash")))).toMap
    // ground truth: the full re-export of snapshot B through q116's
    // own arithmetic on a derived documents view — via SQL over the
    // same session to avoid duplicating the block math in the test
    val docs = graft.core.Tables.documents(spark, Sf0001)
    // mirror the query's fixture: src7 is the pure tail-drop source
    // (all docs except its max doc_id, no edits), others churn by
    // %11-drop / %13-edit
    val wmax = org.apache.spark.sql.expressions.Window.partitionBy($"source")
    val snapB = docs
      .withColumn("mx", max($"doc_id").over(wmax))
      .filter(when($"source" === "src7", $"doc_id" =!= $"mx")
        .otherwise($"doc_id" % 11 =!= 0))
      .withColumn("text", when($"source" =!= "src7" && $"doc_id" % 13 === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
      .drop("mx")
    val full = Chunkers.qTokenShardExportOver(spark, Sf0001, snapB).collect()
      .map(r => ((r.getAs[String]("source"), r.getAs[Long]("block_id")),
        (r.getAs[Long]("n_tok"), r.getAs[Long]("id_sum"),
          r.getAs[Long]("id_hash")))).toMap
    assert(inc.keySet == full.keySet, "incremental must cover exactly the v2 block set")
    inc.foreach { case (k, (_, n, s, h)) =>
      assert((n, s, h) == full(k), s"block $k diverges from full re-export")
    }
    val actions = inc.values.map(_._1).toSet
    assert(actions == Set("keep", "rewrite"),
      s"fixture must exercise both actions, saw $actions")
    // the tail-drop regression: src7's final PARTIAL block ends exactly
    // at first_dirty (= snapshot B's total), so an end<=first_dirty
    // rule would serve the v1 lake's stale block; it must rewrite
    val src7Tail = inc.collect { case ((s, b), v) if s == "src7" => (b, v) }
      .maxBy(_._1)
    assert(src7Tail._2._2 < Chunkers.PackBlockTokens.toLong,
      "fixture invariant: src7 tail block is partial")
    assert(src7Tail._2._1 == "rewrite",
      "partial tail block of a dirty source must rewrite, not serve stale v1 data")
  }

  test("q120 sweep is consistent: pad = blocks*B - tokens, per size") {
    val rows = Chunkers.qPackEfficiencySweep(spark, Sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val b = r.getAs[Int]("block_tokens").toLong
      val nBlocks = r.getAs[Long]("n_blocks")
      val nPad = r.getAs[Long]("n_pad")
      val nTok = r.getAs[Long]("n_tokens")
      assert(nBlocks * b - nPad == nTok, s"B=$b identity")
      assert(nPad >= 0 && nPad < b * 20, s"B=$b pad bounded by #sources*(B-1)")
    }
  }
}
