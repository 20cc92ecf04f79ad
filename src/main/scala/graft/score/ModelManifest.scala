package graft.score

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S7/S8 migration closer: the reference's models are NLTK pickles in
  * a BYTEA column (sql/schema.sql:88), unpickled client-side
  * (client/async_processing_client.py:263-287) — a format the JVM
  * cannot read by design (SURVEY §7.5). The migration path is a
  * MANIFEST: `tools/export_model_manifest.py` (public nltk API only,
  * runs once in the reference environment) dumps each model's
  * top-order n-gram counts as JSONL rows `(model_key, ngram, count)`;
  * [[ingest]] rebuilds every model DISTRIBUTED from that manifest and
  * lands them in the `(model_key, model_data)` blob-lake shape that
  * [[NgramLm.loadModel]] fetches and broadcasts (S8).
  *
  * Context counts are not in the manifest — for an MLE model they are
  * exactly derivable (count(ctx) = Σ_w count(ctx ++ w)), so deriving
  * them here keeps the manifest minimal and internally consistent by
  * construction; NgramLmSpec pins that an exported-then-ingested model
  * is map-identical to one trained in-engine.
  *
  * Plan shape: one distributed JSON scan, one groupByKey(model_key)
  * shuffle — each group is a single model's vocab-bounded gram table,
  * built and serialized entirely on an executor. The reference's
  * 9,511-model census is 9,511 independent groups; the driver never
  * touches a model. */
object ModelManifest {

  val manifestSchema: StructType = StructType(Seq(
    StructField("model_key", StringType),
    StructField("ngram", ArrayType(StringType)),
    StructField("count", LongType)))

  def ingest(s: SparkSession, path: String, n: Int = NgramLm.N): DataFrame = {
    import s.implicits._
    s.read.schema(manifestSchema).json(path)
      .as[(String, Seq[String], Long)]
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val grams = scala.collection.mutable.Map.empty[Seq[String], Long]
        rows.foreach { case (_, ng, c) =>
          grams.updateWith(ng.toList)(v => Some(v.getOrElse(0L) + c))
        }
        // count(ctx) = Σ_w count(ctx ++ w): exact for an MLE model.
        val ctxs = grams.toSeq.groupMapReduce(_._1.dropRight(1))(_._2)(_ + _)
        (key, NgramLm.serializeModel(NgramLm.MleLm(n, grams.toMap, ctxs)))
      }
      .toDF("model_key", "model_data")
  }
}
