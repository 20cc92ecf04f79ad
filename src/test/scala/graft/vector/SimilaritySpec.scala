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

  test("IVF returns k ranked neighbors per query, no self-matches") {
    val rows = Similarity.qAnnIvf(spark, Sf0001).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }
}
