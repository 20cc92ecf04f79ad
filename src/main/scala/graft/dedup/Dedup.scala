package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deduplication operators for a training-data pipeline over the
  * `documents` table: exact (hash groupBy), n-gram Jaccard near-dup
  * (oracled), MinHash+LSH (band-bucket join — the 100 TB scale path),
  * and SimHash. The LSH/SimHash signatures use deterministic constants
  * so every run (and every executor) agrees.
  */
object Dedup {

  /** Words → distinct 3-word shingles per doc. Shared by
    * jaccard/minhash. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", split(trim($"text"), "\\s+").as("words"))
      .filter(size($"words") >= 3)
      .select($"doc_id", $"source", explode(expr(
        "transform(sequence(1, size(words)-2), i -> concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2)))"))
        .as("shingle"))
      .distinct()
  }

  /** Exact dedup summary: hash-groupBy on full text. At scale this is
    * one shuffle keyed on a 128-bit text hash (not the text itself) —
    * here the summary counts stand in for the keep-min-id rewrite. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val perText = docs.groupBy($"text").agg(count(lit(1)).as("n"), min($"doc_id").as("keep_id"))
    perText.agg(
      sum($"n").as("n_docs"),
      count(lit(1)).as("n_distinct_texts"),
      (sum($"n") - count(lit(1))).as("n_exact_dups"))
  }

  val qDedupExactSql: String =
    """SELECT SUM(n) AS n_docs, COUNT(*) AS n_distinct_texts,
       SUM(n) - COUNT(*) AS n_exact_dups
       FROM (SELECT text, COUNT(*) AS n, MIN(doc_id) AS keep_id
             FROM documents GROUP BY text) t"""

  /** N-gram Jaccard near-dup pairs: distinct 3-shingles, self-join on
    * shingle (scoped to same `source` to bound the candidate space —
    * at 100 TB you run qMinHashLsh first and use this only to verify
    * candidates), jaccard = |∩| / |∪| from exact int counts. */
  def qJaccardNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, dir)
    val cnt = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select($"doc_id".as("d1"), $"source", $"shingle")
    val b = sh.select($"doc_id".as("d2"), $"source".as("source2"), $"shingle".as("shingle2"))
    val common = a.join(b,
        $"shingle" === $"shingle2" && $"source" === $"source2" && $"d1" < $"d2")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("common"))
    common
      .join(cnt.select($"doc_id".as("d1"), $"n_sh".as("n1")), Seq("d1"))
      .join(cnt.select($"doc_id".as("d2"), $"n_sh".as("n2")), Seq("d2"))
      .withColumn("jaccard", $"common".cast("double") / ($"n1" + $"n2" - $"common"))
      .filter($"jaccard" >= 0.05)
      .select($"d1", $"d2", $"common", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  val qJaccardNearDupSql: String =
    """WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS words
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id, source,
                unnest(list_transform(generate_series(1, len(words)-2),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
              FROM w WHERE len(words) >= 3),
       cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       common AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
         FROM sh a JOIN sh b
           ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
       SELECT d1, d2, common,
         CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) AS jaccard
       FROM common JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
       WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.05
       ORDER BY d1, d2"""

  // --- MinHash + LSH (rows-only: signature constants aren't portable
  // --- to the SQL oracle; correctness is asserted in DedupSpec against
  // --- brute-force jaccard) -------------------------------------------

  private val NumHashes = 32
  private val BandRows = 4 // 8 bands × 4 rows
  private val MersennePrime = 2147483647L // 2^31-1
  /** Deterministic LCG-derived (a,b) coefficient pairs. */
  private[dedup] val hashCoeffs: Seq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 33) }
    Seq.fill(NumHashes)(((next() % (MersennePrime - 1)) + 1, next() % MersennePrime))
  }

  /** MinHash signatures: shingle → 32-bit hash → per-permutation min.
    * One groupBy per doc; the 32 mins are computed as 32 agg columns
    * (map-side combined, no wide shuffle). */
  def minHashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, dir)
      .withColumn("h", (hash($"shingle").cast("long") + lit(2147483648L)) % MersennePrime)
    val minCols: Seq[Column] = hashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min((($"h" * a + b) % MersennePrime)).as(s"m$i")
    }
    sh.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
      .withColumn("sig", array((0 until NumHashes).map(i => col(s"m$i")): _*))
      .select($"doc_id", $"sig")
  }

  /** LSH candidate pairs → verified by estimated jaccard (fraction of
    * equal signature slots) ≥ 0.5. Banding keeps the self-join keyed on
    * (band, band-hash) buckets — the canonical linear-ish scale path
    * for 100 TB dedup, vs the quadratic shingle self-join. */
  def qMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = minHashSignatures(s, dir)
    val banded = sigs.select($"doc_id", $"sig",
        explode(expr(s"transform(sequence(0, ${NumHashes / BandRows - 1}), b -> struct(b as band, hash(slice(sig, b*$BandRows + 1, $BandRows)) as bkey))")).as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bkey")
    val a = banded.select($"band", $"bkey", $"doc_id".as("d1"), $"sig".as("sig1"))
    val b = banded.select($"band", $"bkey", $"doc_id".as("d2"), $"sig".as("sig2"))
    val cand = a.join(b, Seq("band", "bkey")).filter($"d1" < $"d2")
      .select($"d1", $"d2", $"sig1", $"sig2").distinct()
    cand
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v)) / cast($NumHashes as double)"))
      .filter($"est_jaccard" >= 0.5)
      .select($"d1", $"d2", $"est_jaccard")
      .orderBy($"d1", $"d2")
  }

  /** SimHash (64-bit): per-word xxhash64, bit-majority vote weighted by
    * term frequency, assembled with bit_or of single-bit masks. Emits
    * near-dup pairs at hamming ≤ 6 (at scale: band the 64 bits into
    * 4×16-bit keys and join on any-band-equal instead of the full
    * cross). */
  def qSimHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      .withColumn("wh", xxhash64($"word"))
    val bits = words.select($"doc_id", $"tf", $"wh",
        explode(expr("sequence(0, 63)")).as("j"))
      .withColumn("contrib",
        when(expr("(wh >> j) & 1") === 1, $"tf").otherwise(-$"tf"))
      .groupBy($"doc_id", $"j").agg(sum($"contrib").as("v"))
    val sigs = bits
      .groupBy($"doc_id")
      .agg(expr("bit_or(CASE WHEN v > 0 THEN shiftleft(1L, j) ELSE 0L END)").as("simhash"))
    val a = sigs.select($"doc_id".as("d1"), $"simhash".as("h1"))
    val b = sigs.select($"doc_id".as("d2"), $"simhash".as("h2"))
    a.join(b, $"d1" < $"d2")
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter($"hamming" <= 6)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_dedup_exact" -> qDedupExact,
    "q28_jaccard_neardup" -> qJaccardNearDup,
    "q29_minhash_lsh" -> qMinHashLsh,
    "q30_simhash_neardup" -> qSimHash)

  val oracles: Map[String, String] = Map(
    "q27_dedup_exact" -> qDedupExactSql,
    "q28_jaccard_neardup" -> qJaccardNearDupSql)
}
