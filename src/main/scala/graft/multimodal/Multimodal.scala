package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column operators (builder brief): image/audio/video
  * payloads as opaque `BinaryType` columns with typed metadata, plus a
  * decode/feature-extract stage as a partition-mapped batch operator.
  *
  * The testdata has no media files, so binary payloads are derived
  * deterministically from document text (utf-8 bytes). What is REAL
  * and load-bearing here: the BinaryType schema, the metadata
  * extraction over binary columns (length, magic prefix, content
  * digest, exact binary dedup), and the mapPartitions batch plumbing
  * of the decode stage — schema in/out, batching, partition
  * parallelism. What is a STUB: the codec itself (see
  * [[decodeBatch]]) — the container ships no image/audio libraries, so
  * the decode computes deterministic fake dimensions from the leading
  * bytes; swapping in a real codec changes only that function body.
  */
object Multimodal {

  /** documents with a binary payload column — at production scale this
    * is the parquet binary column written by ingest (S7 model blobs,
    * sql/schema.sql:88 BYTEA). */
  def binaryDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", encode($"text", "utf-8"))
  }

  /** Binary metadata extraction + exact binary dedup key: octet
    * length, 4-byte magic prefix (hex), md5 digest — the fields a
    * media-lake catalog carries per blob. All computed with codegen'd
    * builtins directly on the binary column; the digest doubles as the
    * exact-dedup grouping key (shuffle carries 16 bytes, not the
    * payload). */
  def qBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryDocs(s, dir)
      .select($"doc_id",
        length($"payload").as("byte_len"),
        hex(substring($"payload", 1, 4)).as("magic"),
        md5($"payload").as("digest"))
      .orderBy($"doc_id")
  }

  val qBinaryMetaSql: String =
    """SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       hex(encode(substring(text, 1, 4))) AS magic,
       md5(text) AS digest
       FROM documents ORDER BY doc_id"""

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, format: String)

  /** STUB CODEC — deterministic fake decode. A real implementation
    * would parse the container header (JPEG SOF / WAV fmt / MP4 moov)
    * here; the container has no codec libraries, so dimensions are
    * derived from the leading payload bytes. The batch signature
    * (Seq[MediaRow] → Seq[MediaMeta]) is the real contract: it matches
    * a vectorized decode batch (mapInPandas-style), amortizing
    * per-batch codec setup. */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { m =>
    val b0 = if (m.payload.nonEmpty) m.payload(0) & 0xff else 0
    val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
    MediaMeta(m.doc_id,
      width = (b0 % 16 + 1) * 64,
      height = (b1 % 9 + 1) * 64,
      n_frames = m.payload.length % 250 + 1,
      format = (b0 % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** The decode/feature-extract operator: binary column in, typed
    * metadata out, batched per partition. One decoder context per
    * partition, fixed-size batches — the Spark-native shape of a
    * vectorized media decode at 100 TB (payload bytes never shuffle;
    * the stage is map-only over the scan). */
  def decodeMedia(ds: Dataset[MediaRow], batchSize: Int = 16): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Decode stage end-to-end over the binary lake; oracle replays the
    * stub arithmetic from the text bytes (ground truth by
    * construction — checks schema, batching, and byte plumbing). */
  def qMediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = binaryDocs(s, dir)
      .select($"doc_id", $"payload").as[MediaRow]
    decodeMedia(media).toDF()
      .select($"doc_id", $"width", $"height", $"n_frames", $"format")
      .orderBy($"doc_id")
  }

  val qMediaDecodeSql: String =
    """SELECT doc_id,
       (ascii(substring(text, 1, 1)) % 16 + 1) * 64 AS width,
       (ascii(substring(text, 2, 1)) % 9 + 1) * 64 AS height,
       octet_length(encode(text)) % 250 + 1 AS n_frames,
       CASE ascii(substring(text, 1, 1)) % 3
         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
       FROM documents ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_binary_meta" -> qBinaryMeta,
    "q58_media_decode" -> qMediaDecode)

  val oracles: Map[String, String] = Map(
    "q57_binary_meta" -> qBinaryMetaSql,
    "q58_media_decode" -> qMediaDecodeSql)
}
