package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Similarity search over the `embeddings` table (ArrayType(Float),
  * 64-d): brute-force cosine top-k as the exactness baseline — the
  * reference's retrieval primitive (run_8values_survey.py:269-283,
  * top_k=6 cosine over chunk vectors; pgvector HNSW in
  * setup_vector_db.py:148-150) — plus an IVF-bucketed variant as the
  * scale path. All dot products run through codegen'd higher-order
  * functions (zip_with/aggregate), left-to-right, on double-cast
  * arrays.
  */
object Similarity {

  /** dot(a,b) as a sequential left fold — deterministic summation
    * order. */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")

  private def withDoubleVec(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, expr(s"transform($in, x -> cast(x as double))"))

  /** O5/F7: brute-force cosine top-k. Query set = vec_id < 20
    * (broadcast); candidates = full table. Ranks only are emitted —
    * float sums differ across engines in the last ulp, ids don't.
    * Plan shape: broadcast-nested-loop of a tiny query side against a
    * linear scan, then a per-query top-k window — at 1000 executors the
    * scan shards perfectly and the window's shuffle carries only
    * (n_queries × k) survivors per partition after the rank filter...
    * which Spark does NOT prune early; for big query sets switch to
    * groupBy(query).agg(min_by-style top-k) or the IVF variant below. */
  def qCosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = withDoubleVec(Tables.embeddings(s, dir), "embedding", "vec")
      .withColumn("norm", sqrt(dot("vec", "vec")))
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"), $"norm".as("qnorm"))
    val cands = emb.select($"vec_id".as("neighbor_id"), $"vec", $"norm")
    val scored = cands.join(broadcast(queries), $"neighbor_id" =!= $"query_id")
      .withColumn("sim", dot("qvec", "vec") / ($"qnorm" * $"norm"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id")))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id")
      .orderBy($"query_id", $"rank")
  }

  val qCosineTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
                  FROM embeddings WHERE vec_id < 20),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.qvec, CAST(e.embedding AS DOUBLE[])) AS sim
         FROM q JOIN embeddings e ON e.vec_id != q.query_id)
       SELECT query_id, rank, neighbor_id FROM (
         SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         FROM scored) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Embedding-cosine near-dup pairs (all-pairs ≥ 0.4). The quadratic
    * baseline — qAnnIvf is the scale path. Sim is emitted rounded to 6
    * dp (cross-engine float tolerance). */
  def qEmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = withDoubleVec(Tables.embeddings(s, dir), "embedding", "vec")
      .withColumn("norm", sqrt(dot("vec", "vec")))
    val a = emb.select($"vec_id".as("v1"), $"vec".as("vec1"), $"norm".as("n1"))
    val b = emb.select($"vec_id".as("v2"), $"vec".as("vec2"), $"norm".as("n2"))
    a.join(b, $"v1" < $"v2")
      .withColumn("sim", dot("vec1", "vec2") / ($"n1" * $"n2"))
      .filter($"sim" >= 0.4)
      .select($"v1", $"v2",
        $"sim".cast(org.apache.spark.sql.types.DecimalType(9, 6)).cast("string").as("sim_r"))
      .orderBy($"v1", $"v2")
  }

  val qEmbedNearDupSql: String =
    """SELECT v1, v2, CAST(CAST(sim AS DECIMAL(9,6)) AS VARCHAR) AS sim_r FROM (
         SELECT a.vec_id AS v1, b.vec_id AS v2,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
       WHERE sim >= 0.4 ORDER BY v1, v2"""

  /** IVF approximate top-k: coarse centroids = every 50th vector
    * (deterministic stand-in for k-means — the partition/probe plumbing
    * is the point), assign every vector to its nearest centroid
    * (broadcast), then search only the nprobe nearest buckets per
    * query. At 100 TB: centroid assignment is one linear pass, buckets
    * become partition keys (partition pruning on probe), and the
    * per-query candidate set drops from N to ~3N/k. Rows-only query;
    * recall vs brute force is asserted in SimilaritySpec. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = withDoubleVec(Tables.embeddings(s, dir), "embedding", "vec")
      .withColumn("norm", sqrt(dot("vec", "vec")))
    val centroids = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("centroid_id"), $"vec".as("cvec"), $"norm".as("cnorm"))
    // assign: nearest centroid per vector
    val assigned = emb.join(broadcast(centroids), lit(true))
      .withColumn("csim", dot("vec", "cvec") / ($"norm" * $"cnorm"))
      .withColumn("crn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"csim".desc, $"centroid_id")))
      .filter($"crn" === 1)
      .select($"vec_id", $"vec", $"norm", $"centroid_id".as("bucket"))
    // probe: 5 nearest centroids per query (uniform random vectors have
    // no cluster structure, so recall ~ fraction of buckets scanned;
    // clustered real embeddings need far fewer probes)
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"vec".as("qvec"), $"norm".as("qnorm"))
    val probes = queries.join(broadcast(centroids), lit(true))
      .withColumn("csim", dot("qvec", "cvec") / ($"qnorm" * $"cnorm"))
      .withColumn("crn", row_number().over(
        Window.partitionBy($"query_id").orderBy($"csim".desc, $"centroid_id")))
      .filter($"crn" <= 5)
      .select($"query_id", $"qvec", $"qnorm", $"centroid_id".as("bucket"))
    probes.join(assigned, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("sim", dot("qvec", "vec") / ($"qnorm" * $"norm"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"))
      .orderBy($"query_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_cosine_topk" -> qCosineTopK,
    "q32_embed_neardup" -> qEmbedNearDup,
    "q33_ann_ivf" -> qAnnIvf)

  val oracles: Map[String, String] = Map(
    "q31_cosine_topk" -> qCosineTopKSql,
    "q32_embed_neardup" -> qEmbedNearDupSql)
}
