package graft.chunk

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Transcript chunkers (SURVEY.md §2.5 W11-W12).
  *
  * W11 — overlapping word-window chunker
  * (embed_transcripts_8values.py:61-73): fixed window, step =
  * size − overlap, break after the chunk that reaches the end. Pure
  * per-row array work, fully relational.
  *
  * W12 — token-budget greedy chunker
  * (embed_transcripts_to_vector_db.py:265-360): split oversized
  * segments on words, greedily pack segments ≤ max_tokens, then merge
  * undersized chunks forward while ≤ max. Order-dependent sequential
  * fold per group → Dataset flatMapGroups with an explicit in-group
  * sort (parallel across groups, sequential within — the only correct
  * shape for this operator; never rely on partition order).
  */
object Chunkers {

  // ---- W11: word windows (exact port, scalar form) ----
  def chunkWords(text: String, size: Int, overlap: Int): Seq[String] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.empty
    val step = math.max(1, size - overlap)
    val out = Seq.newBuilder[String]
    var start = 0
    var done = false
    while (start < words.length && !done) {
      out += words.slice(start, start + size).mkString(" ")
      if (start + size >= words.length) done = true
      start += step
    }
    out.result()
  }

  /** W11 relational: starts = multiples of step where the previous
    * chunk did not already reach the end (s == 0 ∨ s − step + size < n). */
  def qWordChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val size = 20
    val step = 16 // overlap 4
    Tables.documents(s, dir)
      .withColumn("words", split(trim($"text"), "\\s+"))
      .withColumn("n", org.apache.spark.sql.functions.size($"words"))
      .withColumn("s", explode(expr(
        s"filter(sequence(0, n - 1, $step), x -> x = 0 OR x - $step + $size < n)")))
      .select($"doc_id", ($"s" / step).cast("int").as("chunk_index"),
        $"s".as("start_word"),
        expr(s"size(slice(words, s + 1, $size))").as("n_words"),
        expr(s"concat_ws(' ', slice(words, s + 1, $size))").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_index")
  }

  val qWordChunksSql: String =
    """WITH w AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words,
           len(regexp_split_to_array(trim(text), '\s+')) AS n
         FROM documents),
       st AS (
         SELECT doc_id, words, n,
           unnest(list_filter(generate_series(0, n - 1, 16),
             x -> x = 0 OR x - 16 + 20 < n)) AS s
         FROM w)
       SELECT doc_id, CAST(s / 16 AS INT) AS chunk_index, s AS start_word,
         len(words[s + 1 : LEAST(s + 20, n)]) AS n_words,
         array_to_string(words[s + 1 : LEAST(s + 20, n)], ' ') AS chunk_text
       FROM st ORDER BY doc_id, chunk_index"""

  // ---- W12: token-budget greedy chunker (exact port) ----

  final case class Segment(start: Double, duration: Double, text: String)
  final case class Chunk(chunkIndex: Int, text: String, startTime: Double,
                         endTime: Double, wordCount: Int, tokenCount: Int,
                         segmentCount: Int)

  def countTokens(text: String): Int = {
    val t = text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  /** split_oversized_text (embed_transcripts_to_vector_db.py:265-283).
    * The token counter is pluggable like the reference's
    * count_tokens callable (whitespace proxy or a real BPE). */
  def splitOversized(text: String, maxTokens: Int,
                     countTokens: String => Int = countTokens): Seq[String] = {
    if (countTokens(text) <= maxTokens) return Seq(text)
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.empty
    val parts = Seq.newBuilder[String]
    var buf = Vector.empty[String]
    for (w <- words) {
      buf :+= w
      if (countTokens(buf.mkString(" ")) >= maxTokens && buf.length > 1) {
        buf = buf.dropRight(1)
        parts += buf.mkString(" ")
        buf = Vector(w)
      }
    }
    if (buf.nonEmpty) parts += buf.mkString(" ")
    parts.result()
  }

  /** build_chunks_simple (embed_transcripts_to_vector_db.py:286-360):
    * greedy pack + forward merge of undersized chunks. */
  def buildChunksSimple(segments: Seq[Segment], minTokens: Int, maxTokens: Int,
                        countTokens: String => Int = countTokens): Seq[Chunk] = {
    val expanded = segments.flatMap { seg =>
      splitOversized(seg.text.trim, maxTokens, countTokens).map(p => seg.copy(text = p))
    }
    if (expanded.isEmpty) return Seq.empty
    final case class Buf(text: String, startTime: Double, endTime: Double, segs: Int)
    var chunks = Vector.empty[Buf]
    var buf = Vector.empty[Segment]
    def emit(): Unit = if (buf.nonEmpty) {
      val text = buf.map(_.text).mkString(" ")
      chunks :+= Buf(text, buf.head.start, buf.last.start + buf.last.duration, buf.length)
      buf = Vector.empty
    }
    for (seg <- expanded) {
      if (buf.isEmpty) buf :+= seg
      else {
        val trial = buf.map(_.text).mkString(" ") + " " + seg.text
        if (countTokens(trial) <= maxTokens) buf :+= seg
        else { emit(); buf :+= seg }
      }
    }
    emit()
    var i = 0
    while (i < chunks.length - 1 && {
      val next = chunks(i + 1)
      if (countTokens(next.text) < minTokens) {
        val merged = chunks(i).text + " " + next.text
        if (countTokens(merged) <= maxTokens) {
          chunks = chunks.updated(i,
            Buf(merged, chunks(i).startTime, next.endTime, chunks(i).segs + next.segs))
            .patch(i + 1, Nil, 1)
          true
        } else { i += 1; true }
      } else false
    }) {}
    chunks.zipWithIndex.map { case (c, idx) =>
      Chunk(idx, c.text, c.startTime, c.endTime,
        countTokens(c.text), countTokens(c.text), c.segs)
    }
  }

  final case class DocSegment(source: String, doc_id: Long, text: String)
  final case class SourceChunk(source: String, chunk_index: Int, token_count: Int,
                               word_count: Int, n_segments: Int,
                               start_time: Double, end_time: Double)

  /** W12 over the testdata: each `source` is a "video", its documents
    * (ordered by doc_id) are the segments (start = doc_id, duration 1),
    * budget 40-70 whitespace tokens. Rows-only query (sequential fold
    * isn't SQL-expressible); semantics are pinned by ChunkerSpec
    * against FIXTURES.md §5. */
  def qTokenBudgetChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val segs: Dataset[DocSegment] = Tables.documents(s, dir)
      .select($"source", $"doc_id", $"text").as[DocSegment]
    segs.groupByKey(_.source)
      .flatMapGroups { (src, it) =>
        val ordered = it.toSeq.sortBy(_.doc_id)
        val segments = ordered.map(d => Segment(d.doc_id.toDouble, 1.0, d.text))
        buildChunksSimple(segments, 40, 70).map(c =>
          SourceChunk(src, c.chunkIndex, c.tokenCount, c.wordCount,
            c.segmentCount, c.startTime, c.endTime))
      }
      .toDF()
      .orderBy($"source", $"chunk_index")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_word_chunks" -> qWordChunks,
    "q37_token_budget_chunks" -> qTokenBudgetChunks)

  val oracles: Map[String, String] = Map(
    "q36_word_chunks" -> qWordChunksSql)
}
