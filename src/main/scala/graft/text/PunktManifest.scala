package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Migration path for the punkt pickle (the same S7 discipline as
  * [[graft.score.ModelManifest]]): `tools/export_punkt_manifest.py`
  * runs ONCE in the reference environment with public nltk API and
  * dumps the trained model's four parameter tables as JSONL rows
  * `{kind, w1, w2, flags}`; [[ingest]] rebuilds a [[Punkt.Params]]
  * from that manifest.
  *
  * Unlike the n-gram model lake (9,511 independent models), punkt is
  * ONE model whose tables are vocab-bounded (the stock English pickle
  * holds ~1.2k abbreviations and ~13k orthographic contexts — a few
  * hundred KiB), so this is a driver-side load-and-broadcast, the S8
  * shape: the scan is distributed, the collected table is bounded by
  * model size, never by corpus size. */
object PunktManifest {

  val manifestSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("w1", StringType),
    StructField("w2", StringType),
    StructField("flags", LongType)))

  /** The inverse of [[ingest]]: a trained [[Punkt.Params]] as manifest
    * rows — what `tools/export_punkt_manifest.py` emits from the
    * pickle, derivable in-engine since [[PunktTrainer]] exists. Rows
    * are sorted for deterministic manifests. */
  def export(p: Punkt.Params): Seq[(String, String, String, java.lang.Long)] =
    p.abbrevTypes.toSeq.sorted.map(a =>
      ("abbrev", a, null: String, null: java.lang.Long)) ++
    p.collocations.toSeq.sorted.map { case (a, b) =>
      ("collocation", a, b, null: java.lang.Long) } ++
    p.sentStarters.toSeq.sorted.map(st =>
      ("sent_starter", st, null: String, null: java.lang.Long)) ++
    p.orthoContext.toSeq.sorted.map { case (w, f) =>
      ("ortho", w, null: String, java.lang.Long.valueOf(f.toLong)) }

  def ingest(s: SparkSession, path: String): Punkt.Params = {
    val rows = s.read.schema(manifestSchema).json(path).collect()
    val abbrev = Set.newBuilder[String]
    val colloc = Set.newBuilder[(String, String)]
    val starters = Set.newBuilder[String]
    val ortho = Map.newBuilder[String, Int]
    rows.foreach { r =>
      r.getString(0) match {
        case "abbrev" => abbrev += r.getString(1)
        case "collocation" => colloc += ((r.getString(1), r.getString(2)))
        case "sent_starter" => starters += r.getString(1)
        case "ortho" => ortho += (r.getString(1) -> r.getLong(3).toInt)
        case other => throw new IllegalArgumentException(
          s"unknown punkt manifest kind: $other")
      }
    }
    Punkt.Params(abbrev.result(), colloc.result(), starters.result(),
      ortho.result())
  }
}
