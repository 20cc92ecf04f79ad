package graft.core

import graft.SparkSpec

/** Tiled pair-scan: the bounded-driver-memory form must be exactly
  * equivalent to the single-block form, for any tile size — including
  * tile sizes that force many tiles (the 100 TB configuration the
  * local data can't reach by volume). */
class BlockedSpec extends SparkSpec {
  import spark.implicits._

  private def allPairs(ids: Seq[Long]): Set[(Long, Long)] =
    (for { a <- ids; b <- ids if b > a } yield (a, b)).toSet

  test("tiledPairScan emits every b.id > a.id pair exactly once, any tile size") {
    val ids = (0L until 97L) ++ Seq(1000L, 5000L, 99999L) // sparse tail: hashing must not care
    val items = spark.createDataset(ids)
    val expected = allPairs(ids)
    for (tile <- Seq(1, 7, 50, 1000)) {
      val got = Blocked.tiledPairScan(items, tile)(identity) { (a, arr) =>
        arr.iterator.filter(_ > a).map(b => (a, b))
      }.collect()
      assert(got.length == expected.size, s"tile=$tile: duplicates or misses")
      assert(got.toSet == expected, s"tile=$tile: wrong pair set")
      Resources.release()
    }
  }

  test("tiledPairScan single tile == pairScan") {
    val ids = (0L until 40L).toSeq
    val items = spark.createDataset(ids)
    val bc = Resources.broadcast(spark, ids.toArray)
    val one = Blocked.pairScan(spark, bc) { (a, arr) =>
      arr.iterator.filter(_ > a).map(b => (a, b))
    }.collect().toSet
    val tiled = Blocked.tiledPairScan(items, 1000)(identity) { (a, arr) =>
      arr.iterator.filter(_ > a).map(b => (a, b))
    }.collect().toSet
    assert(one == tiled && one == allPairs(ids))
    Resources.release()
  }

  test("eagerTiles (per-tile jobs, one broadcast resident) == lazy union") {
    val ids = (0L until 97L) ++ Seq(1000L, 5000L, 99999L)
    val items = spark.createDataset(ids)
    val expected = allPairs(ids)
    for (tile <- Seq(7, 50)) {
      val eager = Blocked.tiledPairScan(items, tile, eagerTiles = true)(identity) { (a, arr) =>
        arr.iterator.filter(_ > a).map(b => (a, b))
      }.collect()
      assert(eager.length == expected.size, s"eager tile=$tile: duplicates or misses")
      assert(eager.toSet == expected, s"eager tile=$tile: wrong pair set")
      Resources.release()
    }
  }

  test("q30/q32 outputs are invariant under forced multi-tile execution") {
    // The shipped queries use large default tiles (one tile at test
    // SF); this pins that the tiling itself — collect bound, hash
    // assignment, union — preserves the exact pair sets on real data.
    val sigs = graft.dedup.Dedup.simHashSignatures(spark, Sf0001).as[(Long, Long)]
    val whole = Blocked.tiledPairScan(sigs, 1 << 20)(_._1) { case ((i1, h1), arr) =>
      arr.iterator.collect { case (i2, h2) if i2 > i1 && java.lang.Long.bitCount(h1 ^ h2) <= 6 =>
        (i1, i2)
      }
    }.collect().toSet
    Resources.release()
    val sigs2 = graft.dedup.Dedup.simHashSignatures(spark, Sf0001).as[(Long, Long)]
    val tiled = Blocked.tiledPairScan(sigs2, 16)(_._1) { case ((i1, h1), arr) =>
      arr.iterator.collect { case (i2, h2) if i2 > i1 && java.lang.Long.bitCount(h1 ^ h2) <= 6 =>
        (i1, i2)
      }
    }.collect().toSet
    Resources.release()
    assert(whole.nonEmpty && whole == tiled)
  }
}
