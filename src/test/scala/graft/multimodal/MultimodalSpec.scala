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

  test("fallback decode: deterministic dims from leading bytes, batch size preserved") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "abc".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, Array.empty[Byte]))
    val metas = Multimodal.decodeBatch(rows)
    assert(metas.length == 2)
    assert(metas.head.width == ('a'.toInt % 16 + 1) * 64)
    assert(metas.head.height == ('b'.toInt % 9 + 1) * 64)
    assert(metas.head.format == "bin")
    assert(metas(1).width == 64 && metas(1).n_frames == 1)
  }

  test("real codec: javax.imageio decodes actual PNG/BMP dimensions") {
    for (fmt <- Seq("png", "bmp")) {
      val bytes = Multimodal.encodeImage(fmt, 120, 48, seed = 7L)
      val meta = Multimodal.decodeOne(Multimodal.MediaRow(9L, bytes))
      assert(meta == Multimodal.MediaMeta(9L, 120, 48, 1, fmt),
        s"$fmt decode: $meta")
    }
    // and the reader really reads the header, not our arithmetic: a
    // hand-built 3x5 PNG from the raw JDK encoder path
    val img = new java.awt.image.BufferedImage(3, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(1L, bos.toByteArray))
    assert(meta.width == 3 && meta.height == 5 && meta.format == "png")
  }

  test("real codec: javax.sound.sampled decodes actual WAV header fields") {
    val bytes = Multimodal.encodeWav(sampleRate = 11000, channels = 2,
      nFrames = 321, seed = 7L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE",
      "the writer must emit a genuine RIFF/WAVE container")
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(9L, bytes))
    // documented cross-modality mapping: width <- rate, height <- channels
    assert(meta == Multimodal.MediaMeta(9L, 11000, 2, 321, "wave"), s"$meta")
  }

  test("real codec: the ISO-BMFF walk reads mvhd timescale/duration and counts traks") {
    val bytes = Multimodal.encodeMp4(timescale = 2400, durationTicks = 777, nTracks = 2)
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "isom",
      "the writer must emit a genuine ISO-BMFF ftyp box")
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(9L, bytes))
    // documented mapping: width <- timescale, height <- tracks, frames <- ticks
    assert(meta == Multimodal.MediaMeta(9L, 2400, 2, 777, "mp4"), s"$meta")
  }

  test("corrupt mp4 bytes (truncated mid-box, lying size) degrade to the fallback") {
    val good = Multimodal.encodeMp4(2400, 777, 1)
    for (bad <- Seq(
      good.take(30),                     // truncated inside moov
      good.take(8),                      // ftyp header only
      { val b = good.clone()             // moov size field points past EOF
        b(20) = 0x7f.toByte; b })) {
      val meta = Multimodal.decodeOne(Multimodal.MediaRow(5L, bad))
      assert(meta == Multimodal.fallbackMeta(Multimodal.MediaRow(5L, bad)),
        s"len=${bad.length}")
      assert(meta.format == "bin")
    }
  }

  test("corrupt audio bytes (RIFF magic, truncated body) degrade to the fallback") {
    val good = Multimodal.encodeWav(8000, 1, 100, seed = 1L)
    val truncated = good.take(16) // past the RIFF/WAVE magic, before fmt
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(5L, truncated))
    assert(meta == Multimodal.fallbackMeta(Multimodal.MediaRow(5L, truncated)))
    assert(meta.format == "bin")
  }

  test("corrupt image bytes degrade to the fallback, never throw") {
    val good = Multimodal.encodeImage("png", 64, 64, seed = 1L)
    // valid PNG magic, truncated body: reader selection succeeds but
    // header parse fails -> fallback, not an exception
    val truncated = good.take(12)
    val meta = Multimodal.decodeOne(Multimodal.MediaRow(5L, truncated))
    assert(meta == Multimodal.fallbackMeta(Multimodal.MediaRow(5L, truncated)))
    assert(meta.format == "bin")
  }

  test("fixture is pure ASCII (byte offset == codepoint offset for the oracle)") {
    val n = Multimodal.binaryDocs(spark, Sf0001)
      .filter(length($"payload") =!= length($"text")).count()
    assert(n == 0L)
  }

  test("frame sample: 8 digests per doc, stride arithmetic deterministic") {
    val df = Multimodal.qFrameSample(spark, Sf0001)
    val perDoc = df.groupBy($"doc_id").count().select(countDistinct($"count")).head().getLong(0)
    assert(perDoc == 1L) // every doc yields exactly the same frame count
    val one = df.filter($"doc_id" === df.select(min($"doc_id")).head().getLong(0)).collect()
    assert(one.length == 8)
    assert(one.map(_.getAs[String]("frame_digest")).forall(_.matches("[0-9a-f]{32}")))
  }

  test("phash: dup/near-dup/length-shift semantics; banded join == brute force") {
    import Multimodal._
    val base = ("the quick brown fox jumps over the lazy dog " * 14).trim // 615 chars
    val nearDup = base.updated(100, 'X').updated(101, 'Y') // 2 bytes, 1 block
    val shifted = "extra head " + base // content shift scrambles blocks
    val docs = Seq(
      (1L, base), (2L, base), (3L, nearDup), (4L, shifted)
    ).toDF("doc_id", "text").withColumn("payload", encode($"text", "utf-8"))
      .select($"doc_id", $"payload").repartition(2)
    val bits = phashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bits(1L) == bits(2L)) // exact dup -> identical signature
    val nearHam = java.lang.Long.bitCount(bits(1L) ^ bits(3L))
    assert(nearHam >= 1 && nearHam <= 2) // localized edit dirties ≤2 blocks
    assert(java.lang.Long.bitCount(bits(1L) ^ bits(4L)) > 3) // shift scrambles
    val got = qPhashPairsOf(docs)
    // brute force ground truth over the 4 signatures
    val want = (for {
      (d1, p1) <- bits; (d2, p2) <- bits if d1 < d2
      h = java.lang.Long.bitCount(p1 ^ p2) if h <= 3
    } yield (d1, d2, h)).toSet
    assert(got == want && want.contains((1L, 2L, 0)))
  }

  private def qPhashPairsOf(docs: org.apache.spark.sql.DataFrame) =
    Multimodal.phashPairs(Multimodal.phashSignatures(docs)).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming"))).toSet

  test("decodeMedia: one meta per row through partitioned batches") {
    val media = Multimodal.binaryDocs(spark, Sf0001)
      .select($"doc_id", $"payload").as[Multimodal.MediaRow].repartition(5)
    val n = media.count()
    val out = Multimodal.decodeMedia(media, batchSize = 7)
    assert(out.count() == n)
    assert(out.toDF().select(countDistinct($"doc_id")).head().getLong(0) == n)
  }
}
