package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: payload fidelity, metadata extraction,
  * stub-decode batch contract. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload round-trips the utf-8 bytes") {
    val row = Multimodal.binaryDocs(spark, Sf0001)
      .select($"text", $"payload").head()
    assert(row.getAs[Array[Byte]]("payload").toSeq ==
      row.getAs[String]("text").getBytes("UTF-8").toSeq)
  }

  test("binary metadata: byte_len matches utf-8 length, digest is md5 hex") {
    val rows = Multimodal.qBinaryMeta(spark, Sf0001).limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("digest").matches("[0-9a-f]{32}"))
      assert(r.getAs[Int]("byte_len") > 0)
      assert(r.getAs[String]("magic").length == 8) // 4 bytes -> 8 hex chars
    }
  }

  test("stub decode: deterministic dims from leading bytes, batch size preserved") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "abc".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, Array.empty[Byte]))
    val metas = Multimodal.decodeBatch(rows)
    assert(metas.length == 2)
    assert(metas.head.width == ('a'.toInt % 16 + 1) * 64)
    assert(metas.head.height == ('b'.toInt % 9 + 1) * 64)
    assert(metas(1).width == 64 && metas(1).n_frames == 1)
  }

  test("decodeMedia: one meta per row through partitioned batches") {
    val media = Multimodal.binaryDocs(spark, Sf0001)
      .select($"doc_id", $"payload").as[Multimodal.MediaRow].repartition(5)
    val n = media.count()
    val out = Multimodal.decodeMedia(media, batchSize = 7)
    assert(out.count() == n)
    assert(out.toDF().select(countDistinct($"doc_id")).head().getLong(0) == n)
  }
}
