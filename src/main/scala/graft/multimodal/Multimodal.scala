package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column operators (builder brief): image/audio/video
  * payloads as opaque `BinaryType` columns with typed metadata, plus a
  * decode/feature-extract stage as a partition-mapped batch operator.
  *
  * The testdata has no media files, so payloads are SYNTHESIZED:
  * q57/q60/q61 derive binary payloads deterministically from document
  * text (utf-8 bytes), and q58 additionally encodes REAL PNG/BMP
  * images (JDK `ImageIO` writer) and REAL WAV audio (JDK
  * `javax.sound.sampled` writer) so the decode stage faces genuine
  * container bytes. REAL and load-bearing: the BinaryType schema, the
  * metadata extraction over binary columns (length, magic prefix,
  * content digest, exact binary dedup), the mapPartitions batch
  * plumbing of the decode stage, and the codecs themselves —
  * `javax.imageio` header parse for every image format the JDK ships
  * (png/bmp/gif/jpeg/tiff/wbmp), `javax.sound.sampled` header parse
  * for its audio containers (wav/aiff/au), and a hand-rolled
  * ISO-BMFF box walk for the MP4/MOV video family ([[decodeVideo]] —
  * the metadata layer needs no codec). Payloads outside those sets
  * (webp, non-BMFF video — codec libraries the container and the JDK
  * both lack) degrade to a documented deterministic fallback
  * ([[fallbackMeta]]); swapping in a fuller codec set changes only
  * reader discovery, which is the JDK registries', not this file.
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

  /** REAL codec via `javax.imageio` (JDK built-in — no new
    * dependency): the installed ImageReader for the payload's
    * container parses the actual header (PNG IHDR, BMP
    * BITMAPINFOHEADER, GIF logical screen, JPEG SOF) for dimensions
    * and frame count. Header-parse, not full pixel decode, is the
    * deliberate scale choice — metadata extraction at 100 TB must not
    * rasterize every payload; a feature-extract stage that needs
    * pixels calls `ImageIO.read` in the same seam.
    *
    * Payloads NO installed reader accepts (codecs the JDK lacks —
    * webp/video/audio — or corrupt blobs) degrade to the documented
    * deterministic FAKE ([[fallbackMeta]], format "bin") instead of
    * failing the job: one bad file must not kill a 100 TB pass; the
    * catalog row records it as opaque. */
  def decodeOne(m: MediaRow): MediaMeta = {
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      // MemoryCacheImageInputStream EXPLICITLY, not
      // ImageIO.createImageInputStream: the factory defaults to
      // useCache=true and hands back a FileCacheImageInputStream — one
      // temp-FILE write per payload. The r17 probe caught the decode
      // stage blocked, not computing (executorRunTime 124 s vs cpu
      // 60 s across 32 tasks): every header parse paid a disk round
      // trip for bytes already in memory. Reader behavior over the
      // stream is identical; only the backing store changes.
      iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        decodeAudio(m).orElse(decodeVideo(m)).getOrElse(fallbackMeta(m))
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(false) // known without a full scan, or -1
          MediaMeta(m.doc_id, r.getWidth(0), r.getHeight(0),
            if (n > 0) n else 1,
            r.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally r.dispose()
      }
    } catch {
      case _: java.io.IOException | _: RuntimeException => fallbackMeta(m)
    } finally if (iis != null) iis.close()
  }

  /** REAL audio-container branch via `javax.sound.sampled` (JDK
    * built-in, same no-new-dependency argument as `javax.imageio`):
    * `AudioSystem.getAudioFileFormat` parses the RIFF/WAVE `fmt ` and
    * `data` chunk headers (also AIFF/AU/SND — whatever the JDK's
    * audio-file readers register) WITHOUT decoding samples — the
    * header-parse-only discipline of the image branch. The one
    * [[MediaMeta]] catalog row type spans modalities by documented
    * field mapping: `width` ← sample rate (Hz), `height` ← channel
    * count, `n_frames` ← PCM frame count from the data-chunk length.
    * Formats the JDK's audio readers reject return None and fall
    * through to [[fallbackMeta]]. */
  private def decodeAudio(m: MediaRow): Option[MediaMeta] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(m.payload))
      val f = aff.getFormat
      val frames = aff.getFrameLength // NOT_SPECIFIED (-1) on streamy containers
      Some(MediaMeta(m.doc_id, f.getSampleRate.toInt, f.getChannels,
        if (frames >= 0) frames else 1,
        aff.getType.toString.toLowerCase(java.util.Locale.ROOT)))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL video-container branch: an ISO-BMFF (MP4/MOV family) box
    * walk in ~40 lines of pure JDK — the same no-new-dependency
    * argument as the image/audio branches, for the one container
    * family whose METADATA layer needs no codec at all (ISO/IEC
    * 14496-12 is a length-prefixed box tree; `mvhd` carries the movie
    * timescale + duration, `trak` count is the track census). Frame
    * DECODE genuinely needs external libs and stays on the fallback;
    * header parse does not, and at 100 TB cataloging a video lake is
    * exactly this walk. Field mapping follows the audio branch's
    * documented convention: `width` ← movie timescale (ticks/sec),
    * `height` ← track count, `n_frames` ← duration in timescale
    * ticks. Truncated/malformed box trees return None and fall
    * through to [[fallbackMeta]] — one bad file never kills the pass. */
  private def decodeVideo(m: MediaRow): Option[MediaMeta] = {
    val buf = java.nio.ByteBuffer.wrap(m.payload) // big-endian by default
    def u32(at: Int): Long = buf.getInt(at) & 0xffffffffL
    def tag(at: Int): String =
      new String(m.payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk the box list in [from, until); returns (type, payloadStart,
    // payloadEnd) triples, bounds-checked — malformed sizes abort.
    def boxes(from: Int, until: Int): Option[List[(String, Int, Int)]] = {
      val out = List.newBuilder[(String, Int, Int)]
      var at = from
      while (at < until) {
        if (until - at < 8) return None
        val (hdr, end) = u32(at) match {
          case 0L => (8L, until.toLong)                     // box runs to EOF
          case 1L =>                                        // 64-bit largesize
            if (until - at < 16) return None
            (16L, at + buf.getLong(at + 8))
          case sz => (8L, at + sz)
        }
        if (end > until || end < at + hdr) return None
        out += ((tag(at + 4), at + hdr.toInt, end.toInt))
        at = end.toInt
      }
      Some(out.result())
    }
    if (m.payload.length < 12 || tag(4) != "ftyp") None
    else
      for {
        top <- boxes(0, m.payload.length)
        (_, ms, me) <- top.find(_._1 == "moov")
        kids <- boxes(ms, me)
        (_, hs, he) <- kids.find(_._1 == "mvhd")
        if he - hs >= 20
      } yield {
        val v = m.payload(hs) & 0xff // version byte of the full box
        val (timescale, duration) =
          if (v == 1 && he - hs >= 32) (u32(hs + 20), buf.getLong(hs + 24))
          else (u32(hs + 12), u32(hs + 16))
        MediaMeta(m.doc_id, timescale.toInt, kids.count(_._1 == "trak"),
          duration.toInt, "mp4")
      }
  }

  /** The documented deterministic fake for payloads outside the
    * installed codec set: dimensions from the leading bytes, opaque
    * format tag. Kept exactly as fake (and exercised by q58's
    * non-image payloads) so the seam's degraded path is tested, not
    * theoretical. */
  def fallbackMeta(m: MediaRow): MediaMeta = {
    val b0 = if (m.payload.nonEmpty) m.payload(0) & 0xff else 0
    val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
    MediaMeta(m.doc_id,
      width = (b0 % 16 + 1) * 64,
      height = (b1 % 9 + 1) * 64,
      n_frames = m.payload.length % 250 + 1,
      format = "bin")
  }

  /** Batched decode (Seq[MediaRow] → Seq[MediaMeta]): the vectorized
    * decode-batch contract (mapInPandas-style), amortizing per-batch
    * codec setup. */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map(decodeOne)

  /** The decode/feature-extract operator: binary column in, typed
    * metadata out, batched per partition. One decoder context per
    * partition, fixed-size batches — the Spark-native shape of a
    * vectorized media decode at 100 TB (payload bytes never shuffle;
    * the stage is map-only over the scan). */
  def decodeMedia(ds: Dataset[MediaRow], batchSize: Int = 16): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Deterministic REAL image synthesis for the q58 fixture: a
    * solid-color image of known dimensions, encoded through the real
    * `ImageIO` writer — so the decode stage faces genuine PNG/BMP
    * container bytes, not arithmetic stand-ins. */
  private[multimodal] def encodeImage(fmt: String, w: Int, h: Int,
                                      seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color((seed % 0xffffff).toInt))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    // explicit memory-backed ImageOutputStream: ImageIO.write(_, _,
    // OutputStream) defaults to a FileCacheImageOutputStream — a
    // temp-file round trip per encoded image (same defect as the read
    // side, see decodeOne; the r17 probe measured the codec stage
    // blocked on it). Bytes produced are identical.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, fmt, ios)
    finally ios.close()
    bos.toByteArray
  }

  /** Deterministic REAL audio synthesis for the q58 fixture: 16-bit
    * little-endian PCM of stated rate/channels/frame count, filled
    * with LCG noise and written through the real
    * `javax.sound.sampled` WAVE writer — genuine RIFF container
    * bytes, like [[encodeImage]]'s genuine PNG/BMP. */
  private[multimodal] def encodeWav(sampleRate: Int, channels: Int,
                                    nFrames: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    var x = seed
    var i = 0
    while (i < pcm.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      pcm(i) = (x >>> 56).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic REAL video-container synthesis for the q58
    * fixture: a spec-shaped ISO-BMFF box tree — `ftyp` (isom), `moov`
    * holding a complete v0 `mvhd` (rate/volume/unity-matrix/
    * next-track-id fields all populated per ISO/IEC 14496-12 §8.2.2)
    * and one full v0 `tkhd` per track — written big-endian by hand,
    * the container-bytes analogue of [[encodeImage]]/[[encodeWav]].
    * No media data (`mdat`) is included: the fixture exercises the
    * metadata layer, which is the layer [[decodeVideo]] parses. */
  private[multimodal] def encodeMp4(timescale: Int, durationTicks: Int,
                                    nTracks: Int): Array[Byte] = {
    val unity = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize
    val mvhdSize = 108
    val moovSize = 8 + mvhdSize + nTracks * trakSize
    val buf = java.nio.ByteBuffer.allocate(20 + moovSize)
    def box(size: Int, typ: String): Unit = {
      buf.putInt(size)
      buf.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    box(20, "ftyp")
    buf.put("isom".getBytes); buf.putInt(0x200); buf.put("isom".getBytes)
    box(moovSize, "moov")
    box(mvhdSize, "mvhd")
    buf.putInt(0)                 // version 0 + flags
    buf.putInt(0).putInt(0)       // creation / modification time
    buf.putInt(timescale)
    buf.putInt(durationTicks)
    buf.putInt(0x00010000)        // rate 1.0 (16.16 fixed)
    buf.putShort(0x0100.toShort)  // volume 1.0 (8.8 fixed)
    buf.putShort(0)               // reserved
    buf.putLong(0L)               // reserved
    unity.foreach(buf.putInt)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(nTracks + 1)       // next_track_ID
    (1 to nTracks).foreach { tid =>
      box(trakSize, "trak")
      box(tkhdSize, "tkhd")
      buf.putInt(0x000007)        // version 0 + enabled|in-movie|in-preview
      buf.putInt(0).putInt(0)     // creation / modification time
      buf.putInt(tid)             // track_ID
      buf.putInt(0)               // reserved
      buf.putInt(durationTicks)   // duration (movie timescale)
      buf.putLong(0L)             // reserved
      buf.putShort(0).putShort(0) // layer / alternate_group
      buf.putShort(0).putShort(0) // volume (non-audio) / reserved
      unity.foreach(buf.putInt)
      buf.putInt(0).putInt(0)     // width / height (16.16; no visual sample yet)
    }
    buf.array()
  }

  /** The q58 media lake: per doc_id mod 4 a real PNG, a real BMP, a
    * real WAV (all with construction-arithmetic dimensions the oracle
    * can state independently); the mod-4=3 quarter splits mod-8 into
    * a real MP4 box tree (doc_id % 8 == 3) and raw text bytes
    * (doc_id % 8 == 7) — the opaque-blob population every real media
    * lake carries, kept so the fallback path stays exercised. */
  private def mediaDocs(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    // Spread the CPU-heavy encode/decode legs: the corpus file is one
    // scan partition at bench scale, which would run every ImageIO
    // writer+reader on a single thread (the q126 lesson). The exchange
    // moves (id, text) rows — trivial next to the codec work.
    Tables.documents(s, dir).select($"doc_id", $"text")
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        val byteLen = text.getBytes("UTF-8").length
        (id % 4) match {
          case 0 | 1 =>
            val w = (byteLen % 16 + 1) * 8
            val h = (id % 9 + 1).toInt * 8
            MediaRow(id, encodeImage(if (id % 4 == 0) "png" else "bmp", w, h, id))
          case 2 =>
            MediaRow(id, encodeWav(8000 + (byteLen % 8) * 1000,
              (id % 2).toInt + 1, (id % 500).toInt + 1, id))
          case _ if id % 8 == 3 =>
            MediaRow(id, encodeMp4(1000 + (byteLen % 10) * 100,
              (id % 1000).toInt + 1, (id % 3).toInt + 1))
          case _ => MediaRow(id, text.getBytes("UTF-8"))
        }
      }
  }

  /** Decode stage end-to-end over a media lake with REAL image,
    * audio AND video container bytes: q58 synthesizes PNG/BMP/WAV/MP4
    * payloads of independently-stated dimensions ([[mediaDocs]]),
    * runs them through the real `javax.imageio`/`javax.sound.sampled`
    * header parses and the [[decodeVideo]] box walk, and keeps a
    * raw-blob eighth on the documented fallback path. The oracle
    * states every expected value from the
    * construction arithmetic — if the codec plumbing (encode → batch
    * → reader selection → header parse) corrupts anything, dimensions
    * or formats shift and the hash breaks. */
  def qMediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeMedia(mediaDocs(s, dir)).toDF()
      .select($"doc_id", $"width", $"height", $"n_frames", $"format")
      .orderBy($"doc_id")
  }

  val qMediaDecodeSql: String =
    """SELECT doc_id,
       CASE WHEN doc_id % 4 IN (0, 1)
         THEN (octet_length(encode(text)) % 16 + 1) * 8
         WHEN doc_id % 4 = 2
         THEN 8000 + (octet_length(encode(text)) % 8) * 1000
         WHEN doc_id % 8 = 3
         THEN 1000 + (octet_length(encode(text)) % 10) * 100
         ELSE (ascii(substring(text, 1, 1)) % 16 + 1) * 64 END AS width,
       CASE WHEN doc_id % 4 IN (0, 1)
         THEN (CAST(doc_id % 9 AS INT) + 1) * 8
         WHEN doc_id % 4 = 2 THEN CAST(doc_id % 2 AS INT) + 1
         WHEN doc_id % 8 = 3 THEN CAST(doc_id % 3 AS INT) + 1
         ELSE (ascii(substring(text, 2, 1)) % 9 + 1) * 64 END AS height,
       CASE WHEN doc_id % 4 IN (0, 1) THEN 1
         WHEN doc_id % 4 = 2 THEN CAST(doc_id % 500 AS INT) + 1
         WHEN doc_id % 8 = 3 THEN CAST(doc_id % 1000 AS INT) + 1
         ELSE octet_length(encode(text)) % 250 + 1 END AS n_frames,
       CASE WHEN doc_id % 4 = 0 THEN 'png'
         WHEN doc_id % 4 = 1 THEN 'bmp'
         WHEN doc_id % 4 = 2 THEN 'wave'
         WHEN doc_id % 8 = 3 THEN 'mp4' ELSE 'bin' END AS format
       FROM documents ORDER BY doc_id"""

  /** Frame sampling (builder brief: "frame-sample" over video columns):
    * 8 evenly spaced fixed-length byte slices per payload — the stride
    * arithmetic of a keyframe sampler, with the codec stubbed exactly
    * like [[decodeBatch]]. All codegen'd builtins on the BINARY column
    * (substring/md5 operate on bytes; no UDF, payload never shuffles —
    * the explode emits 16-byte digests, not frames). The oracle replays
    * byte arithmetic on the text because the fixture is pure ASCII
    * (byte offset == codepoint offset, verified in the spec); on real
    * media lakes both sides address raw bytes. */
  def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryDocs(s, dir)
      .withColumn("byte_len", length($"payload"))
      .select($"doc_id", explode(expr(
        """transform(sequence(0, 7), i -> struct(i AS frame_idx,
             md5(substring(payload,
               1 + i * CAST(floor(greatest(byte_len - 16, 0) / 7) AS INT),
               16)) AS frame_digest))""")).as("f"))
      .select($"doc_id", $"f.frame_idx", $"f.frame_digest")
      .orderBy($"doc_id", $"frame_idx")
  }

  val qFrameSampleSql: String =
    """SELECT doc_id, CAST(i AS INT) AS frame_idx,
       md5(substring(text,
         1 + CAST(i AS INT) * CAST(floor(GREATEST(octet_length(encode(text)) - 16, 0) / 7) AS INT),
         16)) AS frame_digest
       FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) g
       ORDER BY doc_id, frame_idx"""

  private val PhashBits = 60     // stay clear of the BIGINT sign bit
  private val PhashBandBits = 15 // 4 bands × 15 bits -> 32k buckets/band
  private val PhashHamMax = 3    // ≤3 dirty bands -> ≥1 shared (pigeonhole)

  /** Perceptual (block-hash style) near-dup over binary payloads: 60
    * byte blocks per payload, bit j = parity of block j's digest, pairs
    * at hamming ≤ 3 (the standard near-dup cutoff for 64-bit
    * fingerprints, after Manku et al.'s simhash dedup — and the cutoff
    * that keeps banding sub-quadratic: exact recall at hamming ≤ k
    * needs > k bands, so a small k buys WIDE bands — 4 bands × 15 bits
    * = 32k buckets/band, vs hamming ≤ 6 forcing ≥7 narrow bands whose
    * few buckets saturate into all-pairs at scale).
    * Payloads differing in a few localized bytes
    * collide on most bits (the locality a block hash buys); a content
    * shift (prepend/reflow) scrambles every block, while a short
    * appended tail beyond the 60·stride window leaves the signature
    * unchanged — both by design, as in image block hashes (a footer
    * chunk doesn't change the picture).
    * The pair stage is the banded equi-join (4×15-bit bands): hamming
    * ≤ 3 dirties ≤ 3 bands, so qualifying pairs share ≥ 1 exact band —
    * provably equivalent to the all-pairs scan (the oracle's form), at
    * Σ bucket² candidate cost. The 100 TB shape: signatures are 8
    * bytes/doc, payloads never join. */
  /** (doc_id, phash) signatures from a (doc_id, payload) frame.
    * Shape: explode the 60 block indexes, compute each bit with
    * codegen'd builtins (substring/md5 on the binary), and sum the
    * disjoint powers of two back per doc — sum is order-independent
    * here, so the partial (map-side) aggregate combines freely and the
    * shuffle carries one long per doc. The equivalent
    * `aggregate(transform(...))` HOF fold is CodegenFallback and
    * interprets 60 Catalyst sub-expressions per row — measured 4×
    * slower at sf0.1 (4.4 s vs 1.1 s for the whole query). */
  def phashSignatures(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val odd = "('1','3','5','7','9','b','d','f')"
    docs
      .withColumn("byte_len", length($"payload"))
      .withColumn("stride", expr("greatest(CAST(floor(byte_len / 60) AS INT), 1)"))
      .select($"doc_id", $"payload", $"stride",
        explode(expr(s"sequence(0, ${PhashBits - 1})")).as("j"))
      .select($"doc_id", expr(
        s"""CASE WHEN substring(md5(substring(payload, 1 + j * stride, stride)), 1, 1)
                 IN $odd THEN shiftleft(1L, j) ELSE 0L END""").as("bit"))
      // bit_or, not sum: identical on the disjoint powers of two, but
      // idempotent if the input frame carries duplicate (doc_id,
      // payload) rows — a plain sum would double-count into garbage
      // (doc_id with CONFLICTING payloads remains caller error).
      .groupBy($"doc_id").agg(expr("bit_or(bit)").as("phash"))
  }

  /** Banded pair join over (doc_id, phash) — exact for hamming ≤
    * [[PhashHamMax]] by the pigeonhole argument in
    * [[graft.dedup.Hamming.bandedPairs]] (shared with SimHash q30). */
  def phashPairs(bits: DataFrame): DataFrame = {
    val s = bits.sparkSession
    import s.implicits._
    graft.dedup.Hamming
      .bandedPairs(bits, "phash", PhashBits, PhashBandBits, PhashHamMax)
      .orderBy($"d1", $"d2")
  }

  def qPhashNearDup(s: SparkSession, dir: String): DataFrame =
    phashPairs(phashSignatures(
      binaryDocs(s, dir).select(col("doc_id"), col("payload"))))

  val qPhashNearDupSql: String =
    s"""WITH d AS (
         SELECT doc_id, text,
           GREATEST(CAST(floor(octet_length(encode(text)) / 60) AS INT), 1) AS stride
         FROM documents),
       bits AS (
         SELECT doc_id,
           CAST(list_sum(list_transform(generate_series(0, ${PhashBits - 1}), j ->
             CASE WHEN substring(md5(substring(text, 1 + CAST(j AS INT) * stride, stride)), 1, 1)
                  IN ('1','3','5','7','9','b','d','f')
                  THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END))
             AS BIGINT) AS phash
         FROM d)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
       FROM bits a JOIN bits b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHamMax
       ORDER BY d1, d2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_binary_meta" -> qBinaryMeta,
    "q58_media_decode" -> qMediaDecode,
    "q60_frame_sample" -> qFrameSample,
    "q61_phash_neardup" -> qPhashNearDup)

  val oracles: Map[String, String] = Map(
    "q57_binary_meta" -> qBinaryMetaSql,
    "q58_media_decode" -> qMediaDecodeSql,
    "q60_frame_sample" -> qFrameSampleSql,
    "q61_phash_neardup" -> qPhashNearDupSql)
}
