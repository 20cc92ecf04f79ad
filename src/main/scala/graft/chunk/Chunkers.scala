package graft.chunk

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Pluggable token counter (the reference's count_tokens callable,
    * embed_transcripts_to_vector_db.py:53-74). Counters that are
    * ADDITIVE over single-space joins (count(a⧺" "⧺b) = count(a) +
    * count(b), like whitespace counting) unlock the O(L) running-sum
    * chunking path; plain `String => Int` lambdas (a real BPE is not
    * additive) take the reference-exact re-count path. */
  trait TokenCounter extends (String => Int) {
    def additive: Boolean = false
  }

  /** Whitespace-token counter — additive over space joins. */
  object WhitespaceCounter extends TokenCounter {
    override val additive = true
    def apply(text: String): Int = {
      val t = text.trim
      if (t.isEmpty) 0 else t.split("\\s+").length
    }
  }

  /** cl100k-shaped counter: the published tiktoken cl100k_base
    * pre-tokenization regex (contractions / letter runs / ≤3-digit
    * runs / punctuation runs / whitespace) + a 4-chars-per-token
    * subword estimate per piece. The reference records tiktoken counts
    * in chunk metadata (embed_transcripts_to_vector_db.py:53-74); a
    * REAL cl100k count needs the BPE merge table, which this
    * environment can't ship (no deps, no network) — so this counter's
    * honest claim is the CONTRACT, not the constant: it declares
    * `additive = false`, forcing [[splitOversized]]/
    * [[buildChunksSimple]] through the reference-exact
    * re-count-the-joined-buffer arithmetic a real BPE needs. Swap
    * `apply` for a vocab-backed encoder and every chunker path is
    * already correct. */
  object RegexBpeCounter extends TokenCounter {
    override val additive = false
    private val piece = java.util.regex.Pattern.compile(
      "'(?i:[sdmt]|ll|ve|re)|[^\\r\\n\\p{L}\\p{N}]?+\\p{L}+|\\p{N}{1,3}" +
        "| ?[^\\s\\p{L}\\p{N}]++[\\r\\n]*|\\s*[\\r\\n]|\\s+(?!\\S)|\\s+")
    def apply(text: String): Int = {
      val m = piece.matcher(text)
      var n = 0
      while (m.find()) {
        val content = text.substring(m.start(), m.end()).trim
        n += (if (content.isEmpty) 1 else (content.length + 3) / 4)
      }
      n
    }
  }

  def countTokens(text: String): Int = WhitespaceCounter(text)

  private def isAdditive(counter: String => Int): Boolean = counter match {
    case t: TokenCounter => t.additive
    case _ => false
  }

  /** split_oversized_text (embed_transcripts_to_vector_db.py:265-283).
    * For additive counters the per-word running sum reproduces the
    * reference's re-count-the-joined-buffer loop in O(L) instead of
    * O(L²); non-additive counters keep the reference's exact
    * arithmetic. */
  def splitOversized(text: String, maxTokens: Int,
                     countTokens: String => Int = WhitespaceCounter): Seq[String] = {
    if (countTokens(text) <= maxTokens) return Seq(text)
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.empty
    val fast = isAdditive(countTokens)
    val parts = Seq.newBuilder[String]
    var buf = Vector.empty[String]
    var bufTok = 0
    for (w <- words) {
      buf :+= w
      bufTok = if (fast) bufTok + countTokens(w) else countTokens(buf.mkString(" "))
      if (bufTok >= maxTokens && buf.length > 1) {
        buf = buf.dropRight(1)
        parts += buf.mkString(" ")
        buf = Vector(w)
        bufTok = countTokens(w)
      }
    }
    if (buf.nonEmpty) parts += buf.mkString(" ")
    parts.result()
  }

  /** build_chunks_simple (embed_transcripts_to_vector_db.py:286-360):
    * greedy pack + forward merge of undersized chunks. With an additive
    * counter, token counts accumulate per appended segment (one
    * countTokens call each) instead of re-concatenating and re-counting
    * the whole buffer — O(total length) per group instead of O(L²) per
    * chunk; non-additive counters re-count joined text exactly like the
    * reference. */
  def buildChunksSimple(segments: Seq[Segment], minTokens: Int, maxTokens: Int,
                        countTokens: String => Int = WhitespaceCounter): Seq[Chunk] = {
    val expanded = segments.flatMap { seg =>
      splitOversized(seg.text.trim, maxTokens, countTokens).map(p => seg.copy(text = p))
    }
    if (expanded.isEmpty) return Seq.empty
    val fast = isAdditive(countTokens)
    final case class Buf(text: String, tok: Int, startTime: Double, endTime: Double, segs: Int)
    var chunks = Vector.empty[Buf]
    var buf = Vector.empty[Segment]
    var bufTok = 0
    def emit(): Unit = if (buf.nonEmpty) {
      val text = buf.map(_.text).mkString(" ")
      chunks :+= Buf(text, if (fast) bufTok else countTokens(text),
        buf.head.start, buf.last.start + buf.last.duration, buf.length)
      buf = Vector.empty
      bufTok = 0
    }
    for (seg <- expanded) {
      val segTok = countTokens(seg.text)
      if (buf.isEmpty) { buf :+= seg; bufTok = segTok }
      else {
        val trialTok =
          if (fast) bufTok + segTok
          else countTokens(buf.map(_.text).mkString(" ") + " " + seg.text)
        if (trialTok <= maxTokens) { buf :+= seg; bufTok = trialTok }
        else { emit(); buf :+= seg; bufTok = segTok }
      }
    }
    emit()
    var i = 0
    while (i < chunks.length - 1 && {
      val next = chunks(i + 1)
      if (next.tok < minTokens) {
        val mergedText = chunks(i).text + " " + next.text
        val mergedTok = if (fast) chunks(i).tok + next.tok else countTokens(mergedText)
        if (mergedTok <= maxTokens) {
          chunks = chunks.updated(i,
            Buf(mergedText, mergedTok,
              chunks(i).startTime, next.endTime, chunks(i).segs + next.segs))
            .patch(i + 1, Nil, 1)
          true
        } else { i += 1; true }
      } else false
    }) {}
    chunks.zipWithIndex.map { case (c, idx) =>
      Chunk(idx, c.text, c.startTime, c.endTime, c.tok, c.tok, c.segs)
    }
  }

  final case class DocSegment(source: String, doc_id: Long, text: String)
  final case class SourceChunk(source: String, chunk_index: Int, token_count: Int,
                               word_count: Int, n_segments: Int,
                               start_time: Double, end_time: Double)

  /** W12 over the testdata: each `source` is a "video", its documents
    * (ordered by doc_id) are the segments (start = doc_id, duration 1),
    * budget 40-70 whitespace tokens. The whole operator is a left fold
    * per source (the reference's merge loop stops at the first
    * well-sized successor, so it folds too) — which makes it
    * SQL-expressible after all: the DuckDB oracle replays split →
    * greedy pack → prefix merge with two recursive CTEs. ChunkerSpec
    * additionally pins the scalar semantics on FIXTURES.md §5. */
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

  /** q37 oracle: the fold replayed in SQL. `pack` simulates the greedy
    * accumulator (budget 70) step-by-step over the expanded parts;
    * `mrg` simulates the forward-merge state machine, emitting a
    * finished chunk per step (NULL while merging) plus each source's
    * final open chunk. `MATERIALIZED` hints stop DuckDB re-evaluating
    * the regex-split CTEs at every recursion step (95 s → 0.8 s at
    * sf0.01). Oversized segments split into 69-word parts (the
    * reference's pop-at-max loop yields exactly that for a whitespace
    * counter); empty/whitespace-only documents stay as zero-token
    * segments (n <= 70 keeps n = 0), matching splitOversized's
    * early-return — they extend n_segments and time bounds without
    * consuming budget. */
  val qTokenBudgetChunksSql: String =
    """WITH RECURSIVE
       docs AS MATERIALIZED (
         SELECT source, doc_id, trim(text) AS t,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
         FROM documents),
       parts AS MATERIALIZED (
         SELECT source, doc_id, 1 AS part_idx, n AS tc FROM docs WHERE n <= 70
         UNION ALL
         SELECT source, doc_id, CAST(g AS INT) AS part_idx,
           CASE WHEN g * 69 <= n THEN 69 ELSE n - (CAST(g AS INT) - 1) * 69 END AS tc
         FROM (SELECT source, doc_id, n,
                 unnest(generate_series(1, CAST(ceil(n / 69.0) AS BIGINT))) AS g
               FROM docs WHERE n > 70) t),
       seq AS MATERIALIZED (
         SELECT source, doc_id, part_idx, tc,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id, part_idx) AS rn
         FROM parts),
       pack AS (
         SELECT source, rn, tc AS acc, 0 AS chunk_id FROM seq WHERE rn = 1
         UNION ALL
         SELECT s.source, s.rn,
           CASE WHEN p.acc + s.tc <= 70 THEN p.acc + s.tc ELSE s.tc END,
           CASE WHEN p.acc + s.tc <= 70 THEN p.chunk_id ELSE p.chunk_id + 1 END
         FROM pack p JOIN seq s ON s.source = p.source AND s.rn = p.rn + 1),
       chunks0 AS MATERIALIZED (
         SELECT p.source, p.chunk_id,
           CAST(SUM(s.tc) AS INT) AS tok,
           CAST(MIN(s.doc_id) AS DOUBLE) AS st,
           CAST(MAX(s.doc_id) + 1 AS DOUBLE) AS en,
           CAST(COUNT(*) AS INT) AS segs
         FROM pack p JOIN seq s ON s.source = p.source AND s.rn = p.rn
         GROUP BY p.source, p.chunk_id),
       ord AS MATERIALIZED (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY chunk_id) AS INT) AS k
         FROM chunks0),
       mrg AS (
         SELECT source, k, tok AS open_tok, st AS open_st, en AS open_en, segs AS open_segs,
           FALSE AS stopped,
           CAST(NULL AS INT) AS emit_tok, CAST(NULL AS DOUBLE) AS emit_st,
           CAST(NULL AS DOUBLE) AS emit_en, CAST(NULL AS INT) AS emit_segs
         FROM ord WHERE k = 1
         UNION ALL
         SELECT o.source, o.k,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN m.open_tok + o.tok ELSE o.tok END,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN m.open_st ELSE o.st END,
           o.en,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN m.open_segs + o.segs ELSE o.segs END,
           m.stopped OR o.tok >= 40,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN NULL ELSE m.open_tok END,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN NULL ELSE m.open_st END,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN NULL ELSE m.open_en END,
           CASE WHEN NOT m.stopped AND o.tok < 40 AND m.open_tok + o.tok <= 70
                THEN NULL ELSE m.open_segs END
         FROM mrg m JOIN ord o ON o.source = m.source AND o.k = m.k + 1),
       final_chunks AS (
         SELECT source, k, 0 AS fin, emit_tok AS tok, emit_st AS st, emit_en AS en, emit_segs AS segs
         FROM mrg WHERE emit_tok IS NOT NULL
         UNION ALL
         SELECT m.source, m.k, 1 AS fin, m.open_tok, m.open_st, m.open_en, m.open_segs
         FROM mrg m JOIN (SELECT source, MAX(k) AS mk FROM mrg GROUP BY source) x
           ON m.source = x.source AND m.k = x.mk)
       SELECT source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, fin) - 1 AS INT) AS chunk_index,
         tok AS token_count, tok AS word_count, segs AS n_segments,
         st AS start_time, en AS end_time
       FROM final_chunks
       ORDER BY source, chunk_index"""

  /** Block length for q81/q116 — a semantic constant of the queries
    * (the training context length stand-in), mirrored in the oracles;
    * package-visible so specs assert against the contract, not a
    * magic number. */
  private[chunk] val PackBlockTokens = 64

  /** The corpus token-count rule shared by q81/q116/q120 — ONE
    * definition so the packing family's offset arithmetic can never
    * drift (empty text counts 0; otherwise whitespace-split size). */
  private def tokCount(c: Column): Column =
    when(trim(c) === "", 0).otherwise(size(split(trim(c), "\\s+")))

  /** q81 — concat-and-cut sequence packing, the classic pretraining
    * batch-prep step: per source, documents are concatenated in
    * doc_id order and cut into fixed 64-token blocks; each doc's
    * manifest records where its tokens landed (start block + offset,
    * end block, blocks spanned). Unlike q37 (greedy chunking that
    * RESPECTS document boundaries and re-flows text), this is the
    * boundary-CROSSING packing used when training consumes a token
    * stream — zero padding waste by construction, and fully
    * relational: an exclusive prefix sum per source (one narrow
    * window over (source, doc_id, tok) rows — the text itself never
    * enters the shuffle) plus integer block arithmetic. At 100 TB a
    * giant source makes the single-partition window the bottleneck;
    * the standard rewrite is segmented prefix-sum (per-partition
    * partial sums + broadcast cumulative offsets) with identical
    * semantics — the window form IS that plan for source-sized
    * partitions. */
  def qPackBlocks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = PackBlockTokens
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .withColumn("tok", tokCount($"text"))
      .withColumn("off", coalesce(sum($"tok").over(w), lit(0L)))
      .withColumn("start_block", expr(s"off div $B"))
      .withColumn("end_block",
        when($"tok" > 0, expr(s"(off + tok - 1) div $B")).otherwise(expr(s"off div $B")))
      .select($"doc_id", $"source", $"tok", $"off".as("tok_offset"),
        $"start_block", ($"off" % B).cast("long").as("block_offset"),
        $"end_block", ($"end_block" - $"start_block" + 1).as("n_blocks"))
      .orderBy($"doc_id")
  }

  /** Oracle: the same window arithmetic (DuckDB `//` = floor div on
    * BIGINT; all operands non-negative). */
  val qPackBlocksSql: String = {
    val b = PackBlockTokens
    s"""WITH t AS (
         SELECT doc_id, source,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok
         FROM documents),
       o AS (
         SELECT doc_id, source, tok,
           CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         FROM t)
       SELECT doc_id, source, tok, off AS tok_offset,
         off // $b AS start_block,
         off % $b AS block_offset,
         CASE WHEN tok > 0 THEN (off + tok - 1) // $b ELSE off // $b END AS end_block,
         (CASE WHEN tok > 0 THEN (off + tok - 1) // $b ELSE off // $b END) - off // $b + 1 AS n_blocks
       FROM o ORDER BY doc_id"""
  }

  // ---- q99: content-defined chunking --------------------------------

  private val CdcGram = 3     // rolling-hash window (words)
  private val CdcMask = 16L   // boundary when gram hash % mask == 0 →
                              // expected chunk length ≈ mask words

  /** q99 — content-defined chunking, the storage-dedup primitive
    * (rsync/LBFS-style, public): a chunk boundary falls after word i
    * whenever the rolling [[CdcGram]]-gram hash ending at i is ≡ 0
    * (mod [[CdcMask]]), so boundaries re-synchronize inside REPEATED
    * text regardless of the offset it appears at — the property
    * fixed-size chunkers (q36/q81) lack, and the reason CDC chunk
    * fingerprints dedup shifted copies. Emits the per-doc manifest:
    * chunk count, chunks whose fingerprint recurs in ≥2 distinct docs,
    * and the shared fraction.
    *
    * Plan shape: boundary ends come off the fused shingle-hash array
    * (no gram strings); per-token chunk ids are ONE running-sum window
    * keyed by doc; chunk fingerprints hash the re-assembled chunk
    * string once per chunk; the recurrence count keys on the 8-byte
    * fingerprint. Every shuffle is keyed by doc_id or a hash — at
    * 100 TB the corpus text moves exactly twice (token explode,
    * chunk groupBy), both on the doc key. */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.expr.VectorExpressions.register(s)
    val PolyMod = 1000000007L
    val words = Tables.documents(s, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("words"))
    val ends = words
      .filter(size($"words") >= CdcGram)
      .select($"doc_id", posexplode(expr(
        s"graft_shingle_hashes(words, $CdcGram, 31L, ${PolyMod}L)")))
      .filter($"col" % CdcMask === 0)
      .select($"doc_id", ($"pos" + CdcGram).as("end_pos"), lit(1L).as("f"))
    val tok = words
      .select($"doc_id", posexplode($"words"))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("word"))
    val cid = tok.join(ends, tok("doc_id") === ends("doc_id") && $"pos" === $"end_pos", "left")
      .select(tok("doc_id"), $"pos", $"word", coalesce($"f", lit(0L)).as("f"))
      .withColumn("chunk_id", coalesce(
        sum($"f").over(Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = cid.groupBy($"doc_id", $"chunk_id")
      .agg(count(lit(1)).as("n_words"),
        expr(s"graft_polyhash(concat_ws(' ', transform(sort_array(collect_list(struct(pos, word))), x -> x.word)), 31L, ${PolyMod}L)").as("fp"))
    val shared = chunks.groupBy($"fp")
      .agg(count_distinct($"doc_id").as("nd"))
    chunks.join(shared, Seq("fp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select($"doc_id", $"n_chunks", $"n_shared",
        ($"n_shared".cast("double") / $"n_chunks").as("shared_frac"))
      .orderBy($"doc_id")
  }

  val qCdcChunksSql: String = {
    def fold(col: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split($col, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc*31 + x) % 1000000007)"""
    val gram = (0 until CdcGram).map(k => s"words[i.i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       tok AS (SELECT doc_id, i.i AS pos, w.words[i.i] AS word
               FROM w, unnest(generate_series(1, len(w.words))) AS i(i)),
       ends AS (SELECT doc_id, j + ${CdcGram - 1} AS end_pos
                FROM (SELECT doc_id, i.i AS j, ${fold(gram)} AS h
                      FROM w, unnest(generate_series(1, len(words) - ${CdcGram - 1})) AS i(i)
                      WHERE len(words) >= $CdcGram) t
                WHERE h % $CdcMask = 0),
       flagged AS (SELECT t.doc_id, t.pos, t.word,
                     CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS f
                   FROM tok t LEFT JOIN ends e
                     ON e.doc_id = t.doc_id AND e.end_pos = t.pos),
       cid AS (SELECT doc_id, pos, word,
                 COALESCE(SUM(f) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
               FROM flagged),
       chunks AS (SELECT doc_id, chunk_id, COUNT(*) AS n_words,
                    ${fold("string_agg(word, ' ' ORDER BY pos)")} AS fp
                  FROM cid GROUP BY doc_id, chunk_id),
       fpc AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp)
       SELECT c.doc_id, COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS shared_frac
       FROM chunks c JOIN fpc f USING (fp)
       GROUP BY c.doc_id ORDER BY c.doc_id"""
  }

  /** q116 — the LAST MILE of a training-data pipeline, end-to-end: raw
    * documents → vocab-encoded token-id stream (the shared q73 top-20
    * vocabulary; OOV = id 0) → concat-and-cut into B-token blocks
    * across doc boundaries (the q81 offset arithmetic, here producing
    * the actual block CONTENTS, not just the manifest) → blocks land
    * in a source-partitioned shard lake → read back and
    * checksummed. The emitted (n_tok, id_sum, order-sensitive
    * polyhash of the id sequence) per block pins the full trip: a
    * single token out of order, dropped, or re-bucketed anywhere in
    * encode→pack→write→read changes a block hash.
    *
    * Plan shape: one token explode (ids are 8-byte rows once the
    * broadcast vocab join lands), ONE per-source window for doc
    * offsets over the doc-length frame (tiny), one (source, block)
    * aggregation building each block's ordered id array, one
    * partitioned write. Text never shuffles — only token ids keyed by
    * their block. */
  def qTokenShardExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocks = tokenBlocks(s, dir,
      Tables.documents(s, dir).select($"doc_id", $"source", $"text"))
    val lake = graft.sink.TempDirs.fresh("graft_token_shards_").toString
    blocks.write.mode("overwrite").partitionBy("source").parquet(lake)
    s.read.parquet(lake)
      .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash")
      .orderBy($"source", $"block_id")
  }

  /** Test seam: the full-export arithmetic over an arbitrary snapshot
    * view (ChunkQuerySpec replays it as q127's ground truth). */
  private[chunk] def qTokenShardExportOver(s: SparkSession, dir: String,
                                           docs: DataFrame): DataFrame = {
    import s.implicits._
    tokenBlocks(s, dir, docs)
      .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash")
      .orderBy($"source", $"block_id")
  }

  /** The q116 block arithmetic over an ARBITRARY `(doc_id, source,
    * text)` snapshot view — shared by the full export (q116) and the
    * incremental re-export (q127). The vocabulary stays the corpus-
    * level q73 table (the tokenizer is a fixed artifact; it does not
    * drift with snapshots). */
  private def tokenBlocks(s: SparkSession, dir: String,
                          docs: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = PackBlockTokens
    val toks = docs
      .select($"doc_id", $"source", posexplode(
        expr("filter(split(trim(text), '\\\\s+'), t -> t != '')")).as(Seq("pos", "word")))
    val ids = toks
      .join(broadcast(graft.text.TextAnalysis.vocabTable(s, dir)), Seq("word"), "left")
      .select($"doc_id", $"source", $"pos",
        coalesce($"id", lit(0)).cast("long").as("tid"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Doc offsets come from a NARROW documents pass (the q81 token
    // count — identical to the ids branch's per-doc row count), not
    // from re-aggregating `ids`: Spark does not dedupe common subplans
    // across branches, so deriving this from `ids` would run the token
    // explode + vocab join TWICE just to produce a doc-length frame.
    val docOff = docs
      .withColumn("tok", tokCount($"text"))
      .withColumn("doc_off", coalesce(sum($"tok").over(w), lit(0L)))
      .select($"source", $"doc_id", $"doc_off")
    ids.join(docOff, Seq("source", "doc_id"))
      .withColumn("off", $"doc_off" + $"pos")
      .withColumn("block_id", expr(s"off div $B"))
      .groupBy($"source", $"block_id")
      .agg(count(lit(1)).as("n_tok"),
        sum($"tid").as("id_sum"),
        expr("aggregate(transform(sort_array(collect_list(struct(off, tid))), x -> x.tid), " +
          "0L, (acc, x) -> (acc * 131 + x) % 998244353)").as("id_hash"))
  }

  /** The q116 encode→offset→cut arithmetic as a reusable CTE chain
    * over an arbitrary `(doc_id, source, text)` relation, ending in
    * `nb(source, block_id, n_tok, id_sum, id_hash)` — shared by the
    * q116 and q127 oracles so the two cannot drift. */
  private def shardBlocksCtes(docsRel: String): String = {
    val b = PackBlockTokens
    s"""it AS (
         SELECT doc_id, source,
           unnest(list_transform(generate_series(1, len(words)),
             i -> struct_pack(pos := i - 1, word := words[i]))) AS t
         FROM (SELECT doc_id, source,
                 list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS words
               FROM $docsRel) d),
       tok AS (SELECT doc_id, source, t.pos AS pos, t.word AS word FROM it),
       vocab AS (${graft.text.TextAnalysis.vocabSqlCte}),
       ids AS (
         SELECT doc_id, source, pos, CAST(COALESCE(v.id, 0) AS BIGINT) AS tid
         FROM tok LEFT JOIN vocab v USING (word)),
       dl AS (SELECT source, doc_id, COUNT(*) AS tok FROM ids GROUP BY source, doc_id),
       dof AS (
         SELECT source, doc_id,
           CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS doc_off
         FROM dl),
       st AS (
         SELECT i.source, i.tid, o.doc_off + i.pos AS off
         FROM ids i JOIN dof o ON o.source = i.source AND o.doc_id = i.doc_id),
       nb AS (
         SELECT source, off // $b AS block_id, COUNT(*) AS n_tok,
           CAST(SUM(tid) AS BIGINT) AS id_sum,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list(tid ORDER BY off)),
             (acc, x) -> (acc * 131 + x) % 998244353) AS BIGINT) AS id_hash
         FROM st GROUP BY source, off // $b)"""
  }

  /** Oracle: the same encode→offset→cut arithmetic; the block hash
    * folds DuckDB's `list(tid ORDER BY off)` with the identical
    * polynomial. */
  val qTokenShardExportSql: String =
    s"""WITH ${shardBlocksCtes("documents")}
       SELECT source, block_id, n_tok, id_sum, id_hash
       FROM nb ORDER BY source, block_id"""

  /** q120 — packing-efficiency SWEEP, the calibration behind q81/q116's
    * block size (the q109/q110 pattern applied to sequence packing):
    * per candidate block size, the total block count and padding-token
    * waste under per-source concat-and-cut. Needs only the per-source
    * token totals — one narrow pass + a 20-row aggregate answers every
    * candidate size; the corpus is never re-scanned per size. All
    * integer arithmetic (ceil-div), so the report is engine-exact. */
  def qPackEfficiencySweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sizes = Seq(64, 128, 256, 512)
    val lens = Tables.documents(s, dir)
      .withColumn("tok", tokCount($"text"))
      .groupBy($"source").agg(sum($"tok").as("t"))
    val cols = sizes.flatMap(b => Seq(
      sum(expr(s"(t + ${b - 1}) div $b")).as(s"nb$b"),
      sum(expr(s"((t + ${b - 1}) div $b) * $b - t")).as(s"np$b"))) :+
      sum($"t").as("tt")
    val stackArgs = sizes.map(b => s"$b, nb$b, np$b, tt").mkString(", ")
    lens.agg(cols.head, cols.tail: _*)
      .select(expr(
        s"stack(${sizes.size}, $stackArgs) AS (block_tokens, n_blocks, n_pad, n_tokens)"))
      .orderBy($"block_tokens")
  }

  val qPackEfficiencySweepSql: String =
    """WITH t AS (
         SELECT source,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
         FROM documents),
       sl AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS t FROM t GROUP BY source),
       bs AS (SELECT unnest([64, 128, 256, 512]) AS b)
       SELECT CAST(b AS INT) AS block_tokens,
         CAST(SUM((t + b - 1) // b) AS BIGINT) AS n_blocks,
         CAST(SUM(((t + b - 1) // b) * b - t) AS BIGINT) AS n_pad,
         CAST(SUM(t) AS BIGINT) AS n_tokens
       FROM sl CROSS JOIN bs GROUP BY b ORDER BY block_tokens"""

  /** q127 — INCREMENTAL shard re-export, the §2.10 "pending =
    * anti-join" pattern at SHARD granularity (reference rationale
    * client:12-14 — never redo finished work): snapshot A was already
    * exported (the v1 lake); snapshot B arrives (the q121 fixture
    * derivations — drops, edits, adds); only the shards whose token
    * stream actually changed are rewritten.
    *
    * Under per-source concat-and-cut, a changed/removed/added doc
    * shifts every later offset in its source — so the dirty region is
    * a SUFFIX: everything from the first dirty doc's token offset
    * onward. The q121 hash diff finds dirty docs; one narrow window
    * pass turns them into a per-source `first_dirty` offset (offsets
    * agree between snapshots up to that point by construction); a
    * block is clean iff it is FULL and ends at or before it. The
    * fullness condition is load-bearing, not pedantry: a source whose
    * only change is dropping its tail doc(s) has `first_dirty` equal
    * to snapshot B's total token count, so B's final PARTIAL block
    * ends exactly at `first_dirty` — but the v1 lake's same-id block
    * kept filling with the deleted doc's tokens and has different
    * n_tok/id_sum/id_hash. A full block ending inside the agreed
    * prefix contains only agreed tokens and is byte-identical in both
    * exports; a partial block is only ever the source's tail, where
    * the streams may already disagree, so it always rewrites when the
    * source is dirty at all (the src7 tail-drop fixture below
    * exercises exactly this). Clean blocks are
    * SERVED FROM THE V1 LAKE — their hashes must equal what a full
    * re-export would produce, which is exactly what the oracle
    * computes, so byte-stability of kept shards is hash-asserted, not
    * assumed. Dirty blocks recompute from snapshot B only and land in
    * a source-partitioned delta lake (a no-dirt source gets no
    * directory — the write itself is incremental).
    *
    * At 100 TB: the diff is (id, 32-byte hash) rows, the dirty-block
    * recompute is bounded by the dirty suffix, and the kept majority
    * of the lake is never read, decoded, or rewritten — re-export
    * cost ∝ change volume, not corpus size. */
  /** q127's v1-export registry: corpus dir → the snapshot-A shard lake
    * (read-only fixture, see the build site below). */
  private val shardV1Lakes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qIncrementalShardExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val B = PackBlockTokens
    val base = Tables.documents(s, dir).select($"doc_id", $"source", $"text")
    // src7 is the PURE TAIL-DROP source: A carries all its docs, B
    // drops only its max doc_id and edits nothing — the one shape
    // where the old end<=first_dirty rule silently served a stale
    // partial block from the v1 lake. Other sources keep the mixed
    // %9-drop / %11-drop / %13-edit churn.
    val tail = lit("src7")
    val snapA = base.filter($"source" === tail || $"doc_id" % 9 =!= 0)
    // Per-source max doc_id as a TINY aggregate over (source, doc_id)
    // only, broadcast back — the window form (max().over(partition by
    // source) on `base`) shuffled the full corpus WITH TEXT ABOARD,
    // and snapB has several consumers (the v1-lake build's sibling,
    // the offset diff, the marked blocks), so that wide exchange ran
    // per consumer: 4.8 → 16-18 s at sf0.1. The aggregate moves
    // 12-byte rows once; the corpus pass stays narrow.
    val mxBySource = base.select($"source", $"doc_id")
      .groupBy($"source").agg(max($"doc_id").as("mx"))
    val snapB = base
      .join(broadcast(mxBySource), Seq("source"))
      .filter(when($"source" === tail, $"doc_id" =!= $"mx")
        .otherwise($"doc_id" % 11 =!= 0))
      .withColumn("text", when($"source" =!= tail && $"doc_id" % 13 === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
      .drop("mx")
    // the v1 lake: snapshot A's full export — "the artifact that
    // exists before this query runs", so it memoizes per (JVM, sf dir)
    // (r17; it is READ-ONLY below — kept blocks are served from it).
    // The incremental operator under test is everything after: the
    // hash diff, the dirty-suffix marking, the delta write, the
    // composed serve view.
    val v1 = shardV1Lakes.computeIfAbsent(dir, _ => {
      val t = graft.sink.TempDirs.persistent("graft_shards_v1_").toString
      tokenBlocks(s, dir, snapA)
        .write.mode("overwrite").partitionBy("source").parquet(t)
      t
    })
    // q121's hash diff + per-snapshot token offsets → first dirty
    // offset per source (min over dirty docs; monotone offsets make
    // that the earliest dirty doc's position)
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def hashedOffsets(docs: DataFrame): DataFrame = docs
      .withColumn("t", tokCount($"text"))
      .withColumn("o", coalesce(sum($"t").over(w), lit(0L)))
      .select($"doc_id", $"source", md5($"text").as("h"), $"o")
    val oa = hashedOffsets(snapA)
    val ob = hashedOffsets(snapB)
      .select($"doc_id", $"source".as("source_b"), $"h".as("hb"), $"o".as("ob"))
    val firstDirty = oa.join(ob, Seq("doc_id"), "full_outer")
      .filter($"h".isNull || $"hb".isNull || $"h" =!= $"hb")
      .groupBy(coalesce($"source", $"source_b").as("source"))
      .agg(min(coalesce($"o", $"ob")).as("first_dirty"))
    // Persisted: `marked` is block-level metadata (5 scalar columns,
    // ~tokens/B rows) consumed TWICE — the delta write and the kept
    // join — and its upstream is the full snapshot-B pack pipeline.
    val marked = graft.core.Resources.persist(
      tokenBlocks(s, dir, snapB)
        .join(firstDirty, Seq("source"), "left")
        .withColumn("action", when($"first_dirty".isNull ||
            (($"block_id" * B + $"n_tok") <= $"first_dirty" && $"n_tok" === B),
            "keep")
          .otherwise("rewrite")))
    // rewrite ONLY the dirty shards into the delta lake
    val v2delta = graft.sink.TempDirs.fresh("graft_shards_v2delta_").toString
    marked.filter($"action" === "rewrite")
      .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash")
      .write.mode("overwrite").partitionBy("source").parquet(v2delta)
    // the served view: kept blocks from the v1 lake, rewritten from
    // the delta — both actual parquet read-backs
    val kept = marked.filter($"action" === "keep").select($"source", $"block_id")
      .join(s.read.parquet(v1)
        .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash"),
        Seq("source", "block_id"))
      .withColumn("action", lit("keep"))
    val rewritten = s.read.parquet(v2delta)
      .select($"source", $"block_id", $"n_tok", $"id_sum", $"id_hash")
      .withColumn("action", lit("rewrite"))
    kept.unionByName(rewritten)
      .select($"source", $"block_id", $"action", $"n_tok", $"id_sum", $"id_hash")
      .orderBy($"source", $"block_id")
  }

  /** Oracle: the FULL re-export of snapshot B (the shared q116 CTE
    * chain) + the diff-derived first-dirty offsets decide each block's
    * action. Kept blocks' values come from Spark's V1 LAKE but from
    * the oracle's SNAPSHOT-B recompute — their equality is the
    * stability assertion. */
  val qIncrementalShardExportSql: String = {
    val b = PackBlockTokens
    s"""WITH docs_b AS (
         SELECT doc_id, source,
           CASE WHEN source != 'src7' AND doc_id % 13 = 0
                THEN text || ' v2' ELSE text END AS text
         FROM (SELECT doc_id, source, text,
                 MAX(doc_id) OVER (PARTITION BY source) AS mx
               FROM documents) d
         WHERE CASE WHEN source = 'src7' THEN doc_id != mx
                    ELSE doc_id % 11 != 0 END),
       ${shardBlocksCtes("docs_b")},
       la AS (
         SELECT doc_id, source, md5(text) AS h,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS t
         FROM documents WHERE source = 'src7' OR doc_id % 9 != 0),
       lb AS (
         SELECT doc_id, source, md5(text) AS h,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS t
         FROM docs_b),
       offa AS (
         SELECT doc_id, source, h,
           COALESCE(SUM(t) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
         FROM la),
       offb AS (
         SELECT doc_id, source, h,
           COALESCE(SUM(t) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
         FROM lb),
       dirty AS (
         SELECT COALESCE(a.source, bb.source) AS source, COALESCE(a.o, bb.o) AS o
         FROM offa a FULL OUTER JOIN offb bb USING (doc_id)
         WHERE a.h IS NULL OR bb.h IS NULL OR a.h != bb.h),
       fd AS (SELECT source, MIN(o) AS first_dirty FROM dirty GROUP BY source)
       SELECT nb.source, nb.block_id,
         CASE WHEN fd.first_dirty IS NULL
                OR (nb.block_id * $b + nb.n_tok <= fd.first_dirty
                    AND nb.n_tok = $b)
              THEN 'keep' ELSE 'rewrite' END AS action,
         nb.n_tok, nb.id_sum, nb.id_hash
       FROM nb LEFT JOIN fd ON fd.source = nb.source
       ORDER BY nb.source, nb.block_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_word_chunks" -> qWordChunks,
    "q37_token_budget_chunks" -> qTokenBudgetChunks,
    "q81_pack_blocks" -> qPackBlocks,
    "q99_cdc_chunks" -> qCdcChunks,
    "q116_token_shard_export" -> qTokenShardExport,
    "q120_pack_efficiency_sweep" -> qPackEfficiencySweep,
    "q127_incremental_shard_export" -> qIncrementalShardExport)

  val oracles: Map[String, String] = Map(
    "q36_word_chunks" -> qWordChunksSql,
    "q37_token_budget_chunks" -> qTokenBudgetChunksSql,
    "q81_pack_blocks" -> qPackBlocksSql,
    "q99_cdc_chunks" -> qCdcChunksSql,
    "q116_token_shard_export" -> qTokenShardExportSql,
    "q120_pack_efficiency_sweep" -> qPackEfficiencySweepSql,
    "q127_incremental_shard_export" -> qIncrementalShardExportSql)
}
