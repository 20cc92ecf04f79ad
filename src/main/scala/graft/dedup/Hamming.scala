package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded hamming-distance pair join — the shared scale path behind
  * SimHash near-dup (q30's sparse-regime form) and the multimodal
  * block-hash near-dup (q61). Signatures are single BIGINTs; bands
  * become equi-join bucket keys.
  *
  * Exactness (pigeonhole): a pair at hamming ≤ `hamMax` has differing
  * bits in at most `hamMax` bands, so with > `hamMax` bands at least
  * one band matches EXACTLY — the any-band-equality join finds every
  * qualifying pair, and the explicit `bit_count` filter discards the
  * false candidates — provably identical output to the all-pairs scan
  * at Σ bucket² candidate cost.
  *
  * Geometry matters for the Σ bucket² term: the pigeonhole needs only
  * `hamMax + 1` bands, and FEWER bands mean WIDER bands — more bucket
  * values per band, hence more pruning on spread signatures. 60 bits
  * at hamming ≤ 6: the minimal cover is 7 bands of 8-9 bits (256-512
  * buckets each, ~51× candidate pruning on uniform signatures) vs the
  * 10 × 6-bit equal split's 64 buckets (~6.4×). [[minimalBands]] is
  * therefore the default band plan.
  */
object Hamming {

  /** The minimal pigeonhole cover: `hamMax + 1` nearly-equal bands
    * (widths differ by at most 1) tiling `bits`. Widest legal bands =
    * maximal per-band bucket count = maximal pruning. `hamMax = 0`
    * degenerates to ONE full-width band — exact signature equality —
    * matching what [[bandedPairsAt]] accepts for that geometry. */
  def minimalBands(bits: Int, hamMax: Int): Seq[(Int, Int)] = {
    val nb = hamMax + 1
    require(hamMax >= 0, s"hamMax=$hamMax must be non-negative")
    require(bits >= nb, s"$bits bits cannot form $nb non-empty bands")
    val base = bits / nb
    val extra = bits % nb
    val widths = Seq.tabulate(nb)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).map { case (off, w) => (off, w) }
  }

  /** SQL array-of-structs expression `(band, bkey)` for an explicit
    * band plan — shared by the pair join and by census/diagnostic
    * aggregations so they cannot disagree about the geometry. */
  def bandStructsExpr(sigCol: String, bands: Seq[(Int, Int)]): String =
    bands.zipWithIndex.map { case ((off, w), i) =>
      // w = 64 (the hamMax=0 single-band cover of a full Long) would
      // wrap (1L << 64) - 1 to 0 — mask with -1L (all bits) instead.
      val mask = if (w >= 64) -1L else (1L << w) - 1
      s"struct($i AS band, shiftright($sigCol, $off) & $mask AS bkey)"
    }.mkString("array(", ", ", ")")

  /** Pairs `(d1, d2, hamming)` with hamming ≤ `hamMax`, from a
    * `(doc_id, <sigCol>)` frame, under an explicit band plan. Requires
    * `bands.size > hamMax` (else the pigeonhole guarantee fails and
    * the join silently under-reports). */
  def bandedPairsAt(sigs: DataFrame, sigCol: String,
                    bands: Seq[(Int, Int)], hamMax: Int): DataFrame = {
    require(bands.size > hamMax,
      s"${bands.size} bands cannot guarantee recall at hamming<=$hamMax")
    // DISJOINT bands are part of the guarantee: if bands overlap, one
    // differing bit can dirty two bands, so hamMax differing bits can
    // dirty more than hamMax bands and a qualifying pair may share no
    // exact band — the silent under-report the size check alone
    // cannot rule out.
    require(bands.forall(_._2 > 0), s"band widths must be positive: $bands")
    bands.sortBy(_._1).sliding(2).foreach {
      case Seq((o1, w1), (o2, _)) =>
        require(o1 + w1 <= o2, s"bands overlap: ($o1 width $w1) reaches past offset $o2")
      case _ => ()
    }
    val s = sigs.sparkSession
    import s.implicits._
    val banded = sigs.select(col("doc_id"), col(sigCol).as("sig"))
      .select($"doc_id", $"sig",
        explode(expr(bandStructsExpr("sig", bands))).as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bkey")
    val a = banded.select($"band", $"bkey", $"doc_id".as("d1"), $"sig".as("s1"))
    val b = banded.select($"band", $"bkey", $"doc_id".as("d2"), $"sig".as("s2"))
    // hamming filter BEFORE the distinct: candidates sharing k bands
    // appear k times, so the cheap two-long bit_count prunes the
    // duplicate-heavy stream ahead of the dedup shuffle.
    a.join(b, Seq("band", "bkey")).filter($"d1" < $"d2")
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
      .filter($"hamming" <= hamMax)
      .select($"d1", $"d2", $"hamming").distinct()
  }

  /** Equal-band form (bandBits-wide bands). Kept for callers whose
    * geometry is part of their contract (q61's 8-bit pHash blocks);
    * new callers should prefer `bandedPairsAt(_, _, minimalBands(...))`. */
  def bandedPairs(sigs: DataFrame, sigCol: String,
                  bits: Int, bandBits: Int, hamMax: Int): DataFrame = {
    require(bits % bandBits == 0, s"bits=$bits not divisible by bandBits=$bandBits")
    require(bits / bandBits > hamMax,
      s"${bits / bandBits} bands cannot guarantee recall at hamming<=$hamMax")
    val bands = Seq.tabulate(bits / bandBits)(b => (b * bandBits, bandBits))
    bandedPairsAt(sigs, sigCol, bands, hamMax)
  }
}
