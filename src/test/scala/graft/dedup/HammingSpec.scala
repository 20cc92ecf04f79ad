package graft.dedup

import graft.SparkSpec
import scala.util.Random

/** The shared banded hamming join vs brute force, randomized over the
  * geometries in use (q30 sparse path: minimal 7-band cover at ham6;
  * q61: 4×15-bit/ham3; legacy equal splits), plus the guard rails on
  * invalid geometry. */
class HammingSpec extends SparkSpec {
  import spark.implicits._

  private val sigs: Seq[(Long, Long)] = {
    val rnd = new Random(42)
    val mask = (1L << 60) - 1
    (0 until 100).flatMap { i =>
      val s = rnd.nextLong() & mask
      // plant a near-dup partner at hamming <= 2 for every even id
      val partner = s ^ (1L << rnd.nextInt(60)) ^ (1L << rnd.nextInt(60))
      Seq((i.toLong * 2, s), (i.toLong * 2 + 1, partner & mask))
    }
  }

  private def brute(hamMax: Int): Set[(Long, Long, Int)] =
    (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= hamMax
    } yield (d1, d2, h)).toSet

  test("property: bandedPairs == brute force for both live geometries (200 sigs)") {
    val df = sigs.toDF("doc_id", "sig")
    for ((bandBits, hamMax) <- Seq((6, 6), (15, 3))) {
      val got = Hamming.bandedPairs(df, "sig", 60, bandBits, hamMax).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
        .toSet
      assert(got == brute(hamMax), s"geometry 60/$bandBits/ham<=$hamMax")
      assert(got.nonEmpty, "planted near-dups should be found")
    }
  }

  test("property: minimal-band cover == brute force (q30's live geometry)") {
    val df = sigs.toDF("doc_id", "sig")
    for (hamMax <- Seq(3, 6)) {
      val bands = Hamming.minimalBands(60, hamMax)
      assert(bands.size == hamMax + 1)
      assert(bands.map(_._2).sum == 60, "bands must tile all 60 bits")
      assert(bands.map(_._2).max - bands.map(_._2).min <= 1, "nearly equal widths")
      val got = Hamming.bandedPairsAt(df, "sig", bands, hamMax).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
        .toSet
      assert(got == brute(hamMax), s"minimal cover at ham<=$hamMax")
      assert(got.nonEmpty, "planted near-dups should be found")
    }
  }

  test("hamMax=0: minimalBands degenerates to one full-width band == exact equality") {
    assert(Hamming.minimalBands(60, 0) == Seq((0, 60)))
    // plant exact duplicates: ids 0/1 share a sig, 2/3 share another
    val dup = Seq((0L, 123456789L), (1L, 123456789L), (2L, 987654L), (3L, 987654L),
      (4L, 42L)).toDF("doc_id", "sig")
    val got = Hamming.bandedPairsAt(dup, "sig", Hamming.minimalBands(60, 0), 0)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(got == Set((0L, 1L), (2L, 3L)))
    // a full-64-bit single band must not wrap its mask to zero (which
    // would bucket EVERYTHING together and emit spurious pairs)
    val expr64 = Hamming.bandStructsExpr("sig", Seq((0, 64)))
    assert(expr64.contains("& -1 "), s"64-bit band mask must be -1, got: $expr64")
  }

  test("bandedPairs rejects geometry that voids the pigeonhole guarantee") {
    val df = sigs.take(2).toDF("doc_id", "sig")
    intercept[IllegalArgumentException] {
      Hamming.bandedPairs(df, "sig", 60, 30, 6) // 2 bands <= hamMax: recall hole
    }
    intercept[IllegalArgumentException] {
      Hamming.bandedPairs(df, "sig", 60, 7, 3) // 60 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      // overlapping bands: one differing bit can dirty two bands, so
      // the hamMax+1-band count alone no longer guarantees recall
      Hamming.bandedPairsAt(df, "sig",
        Seq((0, 10), (5, 10), (15, 10), (25, 10), (35, 10), (45, 10), (50, 10)), 6)
    }
    intercept[IllegalArgumentException] {
      Hamming.bandedPairsAt(df, "sig", Seq((0, 10), (10, 0), (20, 10), (30, 10),
        (40, 5), (45, 5), (50, 10)), 6) // zero-width band
    }
  }
}
