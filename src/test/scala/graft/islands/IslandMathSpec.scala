package graft.islands

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §4 cases + seeded-random properties over the exact
  * scalar ports. */
class IslandMathSpec extends AnyFunSuite {

  private val fixture =
    Array(0.0, 0.6, 0.6, 0.6, 0.6, 0.0, 0.7, 0.7, 0.0, 0.9, 0.9, 0.9, 0.9)

  test("find_islands fixture: thr 0.5 min_len 3 above mode") {
    assert(IslandMath.findIslands(fixture, 0.5, 3) == Seq((1, 4), (9, 12)))
  }

  test("find_islands below-threshold duality (island_worker.py:241)") {
    // below mode with the same threshold picks the complementary runs
    val below = IslandMath.findIslands(fixture, 0.5, 0, aboveThreshold = false)
    assert(below == Seq((0, 0), (5, 5), (8, 8)))
  }

  test("trailing island closes at array end") {
    assert(IslandMath.findIslands(Array(0.9, 0.9, 0.9, 0.9), 0.5, 3) == Seq((0, 3)))
  }

  test("keep rule is end - start >= min_len, ends inclusive") {
    // run of 3 elements has end-start = 2 -> dropped at minLen 3
    assert(IslandMath.findIslands(Array(0.9, 0.9, 0.9), 0.5, 3).isEmpty)
    assert(IslandMath.findIslands(Array(0.9, 0.9, 0.9), 0.5, 2) == Seq((0, 2)))
  }

  test("smooth: all-zero input stays zero (max <= 0 -> no normalize)") {
    val k = IslandMath.gaussianKernel(10, 5)
    assert(IslandMath.smooth(Array.fill(5)(0.0), k, 10).forall(_ == 0.0))
  }

  test("smooth: NaN/Inf -> 0 before convolution") {
    val k = IslandMath.gaussianKernel(2, 1)
    val out = IslandMath.smooth(Array(Double.NaN, Double.PositiveInfinity, 1.0), k, 2)
    assert(out.length == 3 && out.forall(java.lang.Double.isFinite))
  }

  test("smooth: output length = input length; max-normalized to 1") {
    val k = IslandMath.gaussianKernel(10, 5)
    val in = Array.tabulate(40)(i => math.sin(i / 3.0).abs)
    val out = IslandMath.smooth(in, k, 10)
    assert(out.length == in.length)
    assert(math.abs(out.max - 1.0) < 1e-12)
  }

  test("kernel: symmetric, peak 1 at center (build_islands:59-64)") {
    val k = IslandMath.gaussianKernel(10, 5)
    assert(k.length == 21 && k(10) == 1.0)
    assert((0 until 10).forall(i => k(i) == k(20 - i)))
  }

  test("word range: score idx i covers words [i+1, i+n] (build_islands:119-126)") {
    assert(IslandMath.wordRange(2, 9, 4) == ((3, 13)))
  }

  test("average_score_in_range: inclusive slice mean") {
    assert(IslandMath.averageScoreInRange(Array(1.0, 2.0, 3.0, 4.0), 1, 2) == 2.5)
  }

  test("property: islands are disjoint, ordered, in bounds, >= min_len") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val arr = Array.fill(rnd.nextInt(50))(rnd.nextDouble())
      val thr = rnd.nextDouble()
      val minLen = rnd.nextInt(6)
      val islands = IslandMath.findIslands(arr, thr, minLen)
      islands.foreach { case (s, e) =>
        assert(s >= 0 && e < arr.length && s <= e && e - s >= minLen)
        assert((s to e).forall(i => arr(i) >= thr))
        // maximality: neighbors are out-of-island
        assert(s == 0 || arr(s - 1) < thr)
        assert(e == arr.length - 1 || arr(e + 1) < thr)
      }
      islands.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 < s2)
        case _ => ()
      }
    }
  }

  test("property: above/below duality — above(thr) == below(-thr) on negated array") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val arr = Array.fill(rnd.nextInt(50))(rnd.nextDouble())
      val thr = rnd.nextDouble()
      val minLen = rnd.nextInt(6)
      val above = IslandMath.findIslands(arr, thr, minLen)
      val below = IslandMath.findIslands(arr.map(-_), -thr, minLen, aboveThreshold = false)
      assert(above == below)
    }
  }
}
