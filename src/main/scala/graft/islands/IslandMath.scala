package graft.islands

/** Exact ports of the reference island math, as pure functions on
  * arrays — used by the UDF execution path and as the ScalaCheck /
  * fixture ground truth for the relational path.
  *
  * Reference: build_islands_from_scores.py:59-79 (build_smoother,
  * smooth), :82-116 (find_islands), :119-126 (word range), :170-176
  * (average_score_in_range).
  */
object IslandMath {

  /** Gaussian kernel, x ∈ [-size, size]: exp(-x²/2σ²)
    * (build_islands_from_scores.py:59-64). */
  def gaussianKernel(size: Int, sigma: Double): Array[Double] =
    (-size to size).map(x => math.exp(-(x.toDouble * x) / (2 * sigma * sigma))).toArray

  /** Zero-pad by `size` each side, valid convolution (output length =
    * input length), non-finite → 0, then normalize by max when max > 0
    * (build_islands_from_scores.py:67-79). np.convolve reverses the
    * kernel, but the Gaussian is symmetric so plain correlation is
    * identical. Summation is sequential left-to-right — the same fold
    * order as the SQL/HOF form, so results are bit-identical. */
  def smooth(values: Array[Double], kernel: Array[Double], size: Int): Array[Double] = {
    val clean = values.map(v => if (java.lang.Double.isFinite(v)) v else 0.0)
    val padded = new Array[Double](clean.length + 2 * size)
    System.arraycopy(clean, 0, padded, size, clean.length)
    val out = new Array[Double](clean.length)
    var i = 0
    while (i < out.length) {
      var acc = 0.0
      var j = 0
      while (j < kernel.length) { acc += padded(i + j) * kernel(j); j += 1 }
      out(i) = acc
      i += 1
    }
    var mx = Double.NegativeInfinity
    var k = 0
    while (k < out.length) { if (out(k) > mx) mx = out(k); k += 1 }
    if (out.nonEmpty && mx > 0) {
      var m = 0
      while (m < out.length) { out(m) = out(m) / mx; m += 1 }
    }
    out
  }

  /** Run-length threshold segmentation with inclusive ends; keeps runs
    * where end - start >= minLen; the trailing run is closed at the
    * array end (build_islands_from_scores.py:82-116). */
  def findIslands(arr: Array[Double], threshold: Double, minLen: Int,
                  aboveThreshold: Boolean = true): Seq[(Int, Int)] = {
    val in: Double => Boolean =
      if (aboveThreshold) _ >= threshold else _ <= threshold
    val islands = Seq.newBuilder[(Int, Int)]
    var start = -1
    var i = 0
    while (i < arr.length) {
      if (start < 0) {
        if (in(arr(i))) start = i
      } else if (!in(arr(i))) {
        if ((i - 1) - start >= minLen) islands += ((start, i - 1))
        start = -1
      }
      i += 1
    }
    if (start >= 0 && (arr.length - 1) - start >= minLen)
      islands += ((start, arr.length - 1))
    islands.result()
  }

  /** Score (n-gram) index range → 1-based word range
    * (build_islands_from_scores.py:119-126). */
  def wordRange(startIdx: Int, endIdx: Int, nGram: Int): (Int, Int) =
    (startIdx + 1, endIdx + nGram)

  /** Mean of raw scores over the inclusive island slice
    * (build_islands_from_scores.py:170-176). */
  def averageScoreInRange(scores: Array[Double], startIdx: Int, endIdx: Int): Double = {
    val slice = scores.slice(startIdx, endIdx + 1)
    slice.sum / slice.length
  }
}
