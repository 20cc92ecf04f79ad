package graft.islands

import graft.SparkSpec

/** Relational islands vs the exact scalar ports, plus the FIXTURES.md
  * §4 index→word→time mapping case. */
class IslandsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("relational gaps-and-islands == IslandMath.findIslands on sf0.001") {
    val df = Islands.smoothed(spark, Sf0001).select($"vec_id", $"smoothed")
    val relational = Islands
      .islandsFromArray(df, "vec_id", "smoothed", Islands.Threshold, Islands.MinLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSet
    val scalar = df.collect().flatMap { r =>
      val arr = r.getSeq[Double](1).toArray
      IslandMath.findIslands(arr, Islands.Threshold, Islands.MinLen)
        .map { case (s, e) => (r.getLong(0), s, e) }
    }.toSet
    assert(relational.nonEmpty)
    assert(relational == scalar)
  }

  test("find_islands SQL generator == relational form on sf0.001") {
    graft.expr.FindIslandsGenerator.register(spark)
    Islands.smoothed(spark, Sf0001).select($"vec_id", $"smoothed")
      .createOrReplaceTempView("sm_gen_test")
    val viaSql = spark.sql(
      s"""SELECT vec_id, i.start_idx, i.end_idx
          FROM sm_gen_test LATERAL VIEW find_islands(smoothed, ${Islands.Threshold}D, ${Islands.MinLen}) i""")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val relational = Islands.qEmbeddingIslands(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaSql.nonEmpty)
    assert(viaSql == relational)
  }

  test("UDF smoothing == IslandMath.smooth bit-for-bit on sf0.001") {
    val kernel = IslandMath.gaussianKernel(Islands.SmoothSize, Islands.Sigma)
    Islands.smoothed(spark, Sf0001).select($"vec", $"smoothed").collect().foreach { r =>
      val expected = IslandMath.smooth(r.getSeq[Double](0).toArray, kernel, Islands.SmoothSize)
      assert(r.getSeq[Double](1) == expected.toSeq)
    }
  }

  test("FIXTURES §4: island (2,9) n=4 over the 4-segment fixture -> (0.0, 15.5)") {
    // words [3,13]; segments (start,dur,wc,cum) per FIXTURES.md §4
    val islands = Seq((101L, 2, 9, 3, 13))
      .toDF("vid", "start_idx", "end_idx", "word_start", "word_end")
    val segments = Seq(
      (101L, 1, 2, 0.0, 2.0),   // words 1-2
      (101L, 3, 7, 2.0, 3.5),   // words 3-7
      (101L, 8, 8, 5.5, 1.0),   // word 8
      (101L, 9, 14, 6.5, 4.0))  // words 9-14
      .toDF("seg_vid", "seg_start_word", "seg_end_word", "seg_start", "seg_duration")
    val out = Islands.timeRanges(islands, segments, "vid", 5.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("time_start_sec") == 0.0) // max(0, 2.0 - 5)
    assert(r.getAs[Double]("time_end_sec") == 15.5)  // 6.5 + 4.0 + 5
  }

  test("time range uses LAST overlapping segment end, not max end") {
    // second segment starts later but ends earlier — reference takes the
    // later-starting segment's end (build_islands_from_scores.py:158-160)
    val islands = Seq((1L, 0, 9, 1, 13))
      .toDF("vid", "start_idx", "end_idx", "word_start", "word_end")
    val segments = Seq(
      (1L, 1, 7, 0.0, 100.0),  // ends at 100
      (1L, 8, 14, 10.0, 5.0))  // last by start, ends at 15
      .toDF("seg_vid", "seg_start_word", "seg_end_word", "seg_start", "seg_duration")
    val r = Islands.timeRanges(islands, segments, "vid", 5.0).collect().head
    assert(r.getAs[Double]("time_end_sec") == 20.0) // 10 + 5 + 5, NOT 105
  }
}
