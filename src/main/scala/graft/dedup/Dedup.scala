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

  /** Words → 3-word shingle STRINGS per doc, WITH duplicates — the
    * form the Jaccard verify stages consume (q28, q66). The MinHash
    * signature path no longer reads this at all: it uses the fused
    * [[graft.expr.ShingleHashes]] expression, which skips shingle
    * strings entirely (an earlier string-based A/B at sf0.1 measured
    * 2.4 s deduped vs 4.6 s raw; the fused hash path beats both by
    * never allocating the strings the distinct was collapsing). */
  private def shinglesRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"source", split(trim($"text"), "\\s+").as("words"))
      .filter(size($"words") >= 3)
      .select($"doc_id", $"source", explode(expr(
        "transform(sequence(1, size(words)-2), i -> concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2)))"))
        .as("shingle"))
  }

  /** Distinct 3-word shingles per doc — the SET the Jaccard counts are
    * defined over (q28, q66's verify stage). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesRaw(s, dir).distinct()

  /** Exact dedup summary: hash-groupBy keyed on md5(text) — the
    * shuffle carries a 32-char digest, not the document body, which is
    * the difference between shuffling ~32 B/doc and ~100 KB/doc at
    * 100 TB. md5 is identical across engines so the oracle replays the
    * same groups. Outer integer SUMs are CAST in the oracle (DuckDB
    * SUM(BIGINT) → HUGEINT → pandas float64). */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val perText = docs.groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("n"), min($"doc_id").as("keep_id"))
    perText.agg(
      sum($"n").as("n_docs"),
      count(lit(1)).as("n_distinct_texts"),
      (sum($"n") - count(lit(1))).as("n_exact_dups"))
  }

  val qDedupExactSql: String =
    """SELECT CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_distinct_texts,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_exact_dups
       FROM (SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keep_id
             FROM documents GROUP BY md5(text)) t"""

  /** The keep-min-id rewrite itself: every doc in a duplicate group
    * mapped to its group's kept (minimum) doc_id — the actual dedup
    * output a training pipeline consumes (drop rows where doc_id !=
    * keep_id). One shuffle keyed on the digest; the join back is on
    * the same key so AQE coalesces it into the same exchange. */
  def qDedupKeep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).withColumn("h", md5($"text"))
    val groups = docs.groupBy($"h")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("group_size"))
      .filter($"group_size" > 1)
    docs.join(groups, Seq("h"))
      .select($"doc_id", $"keep_id", $"group_size",
        ($"doc_id" === $"keep_id").as("kept"))
      .orderBy($"doc_id")
  }

  val qDedupKeepSql: String =
    """WITH g AS (
         SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
         FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1)
       SELECT d.doc_id, g.keep_id, g.group_size, d.doc_id = g.keep_id AS kept
       FROM documents d JOIN g ON md5(d.text) = g.h
       ORDER BY d.doc_id"""

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

  // --- MinHash + LSH -------------------------------------------------
  // All hashes are PORTABLE polynomial folds (the q26 fingerprint
  // primitive) instead of engine-specific murmur/xxhash, so the DuckDB
  // oracle replays the exact signatures and q29/q30 carry real
  // hash-compare rows rather than rows-only checks.

  private val NumHashes = 32
  private val BandRows = 4 // 8 bands × 4 rows
  private val MersennePrime = 2147483647L // 2^31-1
  private val PolyMod1 = 1000000007L
  private val PolyMod2 = 998244353L

  /** Deterministic LCG-derived (a,b) coefficient pairs. */
  private[dedup] val hashCoeffs: Seq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 33) }
    Seq.fill(NumHashes)(((next() % (MersennePrime - 1)) + 1, next() % MersennePrime))
  }

  /** Portable per-char polynomial fold, Spark side — the native
    * codegen'd [[graft.expr.PolyHash]] (the HOF
    * aggregate/transform/split form is CodegenFallback and allocates a
    * per-char array per value). Every intermediate stays < 2^35 so
    * DuckDB BIGINT (which errors on overflow, unlike Java wrap-around)
    * computes the identical value. */
  private def polyHashExpr(col: String, base: Long, mod: Long): String =
    s"graft_polyhash($col, ${base}L, ${mod}L)"

  /** The same fold, DuckDB side. */
  private def polyHashSql(col: String, base: Long, mod: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split($col, ''), c -> CAST(ascii(c) AS BIGINT))),
        (acc, x) -> (acc*$base + x) % $mod)"""

  /** MinHash signatures via the fused [[graft.expr.ShingleHashes]]
    * expression: shingle hashes come straight off the word array — no
    * shingle STRING is ever materialized, no string distinct, no
    * string shuffle (MIN aggregation is duplicate-insensitive, so the
    * set/multiset distinction the Jaccard paths need doesn't apply
    * here). Value-identical to hashing `concat_ws(' ', ...)` strings —
    * the composition law is spec-pinned — so the DuckDB oracle (which
    * still builds strings; it has no fused form) replays the exact
    * signatures. The 32 permutation mins stay map-side-combined agg
    * columns; the only shuffle is #docs signature rows. */
  def minHashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expr.VectorExpressions.register(s)
    val hashed = Tables.documents(s, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("words"))
      .filter(size($"words") >= 3)
      .select($"doc_id",
        explode(expr(s"graft_shingle_hashes(words, 3, 31L, ${PolyMod1}L)")).as("h"))
    val minCols: Seq[Column] = hashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min((($"h" * a + b) % MersennePrime)).as(s"m$i")
    }
    hashed.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
      .withColumn("sig", array((0 until NumHashes).map(i => col(s"m$i")): _*))
      .select($"doc_id", $"sig")
  }

  /** Buckets larger than this are excluded from candidate generation
    * (mirrored in the oracle — the cap is part of the operator's
    * semantics, not a silent perf hack). One degenerate band key (e.g.
    * a corpus of identical boilerplate) otherwise goes quadratic with
    * no guard — the reason pgvector caps candidate sets with HNSW
    * (setup_vector_db.py:148-150). 4096² candidate rows per bucket is
    * the most one hot key may cost before it is dropped. The
    * `lsh_buckets` observed metrics (max bucket size, dropped count)
    * are computed by the plan's CollectMetrics node and surfaced by
    * Bench's QueryExecutionListener — a fired cap shows up in the
    * bench stderr, not just in a docstring. */
  private[dedup] val MaxBucket = 4096

  /** LSH candidate pairs → verified by estimated jaccard (fraction of
    * equal signature slots) ≥ 0.5. Banding keeps the self-join keyed on
    * (band, band-hash) buckets — the canonical linear-ish scale path
    * for 100 TB dedup, vs the quadratic shingle self-join. The band key
    * is a poly fold of the 4 slot values (portable, oracle replays it:
    * banding is part of the SEMANTICS — an est≥0.5 pair sharing no
    * band is correctly absent).
    *
    * Pair-stage shape (the BENCH_r02 fix): candidates sharing k bands
    * appear k times, and on clustered data the band join EXPLODES —
    * so the est-jaccard filter runs NARROW, inside the join stage,
    * BEFORE any distinct. Only surviving pairs (three scalar columns,
    * no signature arrays) enter the dedup shuffle. The r2 plan ran
    * `distinct()` over the full candidate stream with both 32-long
    * signatures aboard — GBs of duplicated arrays through a wide
    * shuffle, 40.2 s at sf0.1 (same pattern as
    * [[Hamming.bandedPairs]], which already filtered first). */
  def qMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lshCandidates(s, dir).orderBy($"d1", $"d2")
  }

  /** Memoized per-corpus-dir LSH pair-lake and component-lake paths —
    * the same once-per-corpus-version artifact discipline as
    * [[pairLakes]] (the SimHash lake, r6): `computeIfAbsent` blocks a
    * second asker for the same corpus while the first build runs;
    * lifetime = JVM = one harness run, matching the testdata's
    * immutability within a run. */
  private val lshLakes = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val componentLakes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The LSH candidate stage shared by q29 (standalone), q66 (the
    * composed LSH→verify pipeline), q92 (split leakage), and the
    * cluster family (q75/q79/q85/q89/q100/q108 via [[components]]):
    * distinct (d1, d2, est_jaccard) pairs with est ≥ 0.5.
    *
    * Materialized ONCE per corpus dir to a parquet lake and READ
    * thereafter — the corpus-sized signature/banding pipeline
    * ([[lshCandidatesGen]]) runs exactly once per corpus version, and
    * every downstream consumer scans 24-byte pair rows. Same artifact
    * architecture as the SimHash pair lake: at 100 TB the pair set is
    * the corpus-version artifact eight reports share, not a pipeline
    * each re-runs. */
  private[dedup] def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = lshLakes.computeIfAbsent(dir, _ => {
      val path = graft.sink.TempDirs.persistent("graft_lsh_pairs_").toString
      lshCandidatesGen(s, dir).write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(lake).select($"d1", $"d2", $"est_jaccard")
  }

  /** The pair GENERATION pass (unmaterialized). */
  private def lshCandidatesGen(s: SparkSession, dir: String): DataFrame =
    lshCandidatesFrom(s, minHashSignatures(s, dir))

  /** Near-dup component labels `(doc_id, component)` over the LSH pair
    * lake, materialized ONCE per corpus dir: label propagation
    * ([[connectedComponents]]) runs once per corpus version and the
    * cluster family (q75 assembly, q79/q100/q108 canonical+funnel,
    * q85/q89 centroid/medoid) reads the 16-byte label rows back. The
    * iterative loop is the one stage here whose cost is round-count ×
    * job overhead — paying it once instead of five times is the whole
    * point of the artifact layer. */
  private def components(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = componentLakes.computeIfAbsent(dir, _ => {
      val path = graft.sink.TempDirs.persistent("graft_components_").toString
      connectedComponents(lshCandidates(s, dir).select($"d1", $"d2"))
        .write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(lake).select($"doc_id", $"component")
  }

  private def lshCandidatesFrom(s: SparkSession, sigs: DataFrame): DataFrame = {
    import s.implicits._
    val banded = sigs.select($"doc_id", $"sig",
        explode(expr(s"transform(sequence(0, ${NumHashes / BandRows - 1}), b -> struct(b as band, " +
          s"aggregate(slice(sig, b*$BandRows + 1, $BandRows), 0L, (acc, x) -> (acc*31 + x) % $PolyMod1) as bkey))")).as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bkey")
    // Bucket-size guard: tiny aggregate (≤ bands × docs rows), observed
    // metrics expose what the cap dropped, AQE broadcasts it back.
    val bcnt = banded.groupBy($"band", $"bkey").agg(count(lit(1)).as("bsz"))
      .observe("lsh_buckets",
        max($"bsz").as("max_bucket"),
        sum(when($"bsz" > MaxBucket, 1L).otherwise(0L)).as("dropped_buckets"))
    val guarded = banded.join(bcnt.filter($"bsz" <= MaxBucket), Seq("band", "bkey"))
    val a = guarded.select($"band", $"bkey", $"doc_id".as("d1"), $"sig".as("sig1"))
    val b = guarded.select($"band", $"bkey", $"doc_id".as("d2"), $"sig".as("sig2"))
    a.join(b, Seq("band", "bkey")).filter($"d1" < $"d2")
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v)) / cast($NumHashes as double)"))
      .filter($"est_jaccard" >= 0.5)
      .select($"d1", $"d2", $"est_jaccard")
      .distinct()
  }

  /** The shared DuckDB CTE chain for the LSH candidate stage —
    * identical text in q29 (standalone), q66 (composed verify), and
    * q75 (cluster assembly); ends with `surv(d1, d2, est_jaccard)`,
    * the est ≥ 0.5 survivors. */
  private def lshCandidateCtes: String = {
    val minCols = hashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((h*$a + $b) % $MersennePrime) AS m$i"
    }.mkString(",\n           ")
    val sigList = (0 until NumHashes).map(i => s"m$i").mkString("[", ", ", "]")
    s"""w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(generate_series(1, len(words)-2),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
              FROM w WHERE len(words) >= 3),
       hh AS (SELECT doc_id, ${polyHashSql("shingle", 31, PolyMod1)} AS h FROM sh),
       mins AS (
         SELECT doc_id,
           $minCols
         FROM hh GROUP BY doc_id),
       sigs AS (SELECT doc_id, $sigList AS sig FROM mins),
       bands AS (
         SELECT doc_id, sig, b,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             sig[CAST(b*$BandRows + 1 AS INT) : CAST(b*$BandRows + $BandRows AS INT)]),
             (acc, x) -> (acc*31 + x) % $PolyMod1) AS bkey
         FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes / BandRows - 1})) AS b) g),
       bsz AS (
         SELECT doc_id, b, bkey, COUNT(*) OVER (PARTITION BY b, bkey) AS n
         FROM bands),
       cand AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bsz a JOIN bsz b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         WHERE a.n <= $MaxBucket),
       est AS (
         SELECT d1, d2,
           CAST(len(list_filter(generate_series(1, $NumHashes),
             i -> s1.sig[CAST(i AS INT)] = s2.sig[CAST(i AS INT)])) AS DOUBLE) / $NumHashes AS est_jaccard
         FROM cand JOIN sigs s1 ON s1.doc_id = d1 JOIN sigs s2 ON s2.doc_id = d2),
       surv AS (SELECT d1, d2, est_jaccard FROM est WHERE est_jaccard >= 0.5)"""
  }

  val qMinHashLshSql: String =
    s"""WITH $lshCandidateCtes
       SELECT d1, d2, est_jaccard FROM surv ORDER BY d1, d2"""

  /** q66 — the reference's actual dedup pipeline SHAPE (LSH candidates
    * → exact verify, the reason LSH exists: setup_vector_db.py:148-150
    * bounds candidate sets the same way): q29's banded candidate stage
    * feeds an exact shingle-Jaccard verification that touches ONLY
    * candidate pairs. Scale shape: the verify cost is proportional to
    * candidate volume (broadcast the tiny candidate set, semi-join
    * prune the shingle table to candidate docs, one keyed join on
    * (doc, shingle)) — never the corpus-squared shingle self-join of
    * the standalone q28 demonstrator. */
  /** The exact shingle-Jaccard verify stage, shared by q66 and q92 —
    * ONE definition of the verify semantics (shingle-set counts,
    * inner-join drop of zero-common pairs, the jaccard formula) so the
    * two consumers cannot drift. `cand` carries (d1, d2) plus any
    * columns in `carry`; the result adds (common, jaccard).
    *
    * The shingle stream feeds multiple consumers (both verify sides,
    * the per-doc counts). Measured choice: RECOMPUTE, don't cache —
    * the explode is codegen'd and scan-bound, and materializing ~15 M
    * shingle rows to storage costs more than the re-runs (persist
    * measured 2× slower end-to-end at sf0.1). The (large) shingle
    * stream is pruned to candidate docs BEFORE any wide join: the
    * candidate set is small by LSH construction. */
  private def shingleJaccardVerify(s: SparkSession, dir: String,
                                   cand: DataFrame, carry: Seq[String]): DataFrame = {
    import s.implicits._
    val sh = shingles(s, dir).select($"doc_id", $"shingle")
    val cnt = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val aSh = sh.join(broadcast(cand.select($"d1").distinct()),
        $"doc_id" === $"d1").select($"d1", $"shingle")
    val bSh = sh.join(broadcast(cand.select($"d2").distinct()),
        $"doc_id" === $"d2").select($"d2", $"shingle")
    val groupCols = (Seq("d1", "d2") ++ carry).map(col)
    cand.join(aSh, Seq("d1")).join(bSh, Seq("d2", "shingle"))
      .groupBy(groupCols: _*).agg(count(lit(1)).as("common"))
      .join(cnt.select($"doc_id".as("d1"), $"n_sh".as("n1")), Seq("d1"))
      .join(cnt.select($"doc_id".as("d2"), $"n_sh".as("n2")), Seq("d2"))
      .withColumn("jaccard", $"common".cast("double") / ($"n1" + $"n2" - $"common"))
  }

  /** The same verify stage, DuckDB side: produces `common`/`cnt` CTEs
    * over a candidate CTE named `px` carrying (d1, d2, `carry`…). */
  private def shingleJaccardVerifySqlCtes(carry: Seq[String]): String = {
    val grouped = (Seq("d1", "d2") ++ carry).map(c => s"p.$c").mkString(", ")
    s"""common AS (
         SELECT $grouped, COUNT(*) AS common
         FROM px p
         JOIN sh a ON a.doc_id = p.d1
         JOIN sh b ON b.doc_id = p.d2 AND b.shingle = a.shingle
         GROUP BY $grouped),
       cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)"""
  }

  def qLshVerified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shingleJaccardVerify(s, dir, lshCandidates(s, dir), Seq("est_jaccard"))
      .select($"d1", $"d2", $"est_jaccard", $"common", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  /** Oracle: q29's candidate CTEs composed with the exact-Jaccard
    * verify restricted to candidate pairs (inner join — a candidate
    * pair with zero common shingles drops on both sides identically).
    */
  val qLshVerifiedSql: String =
    s"""WITH $lshCandidateCtes,
       px AS (SELECT d1, d2, est_jaccard FROM surv),
       ${shingleJaccardVerifySqlCtes(Seq("est_jaccard"))}
       SELECT c.d1, c.d2, c.est_jaccard, c.common,
         CAST(c.common AS DOUBLE) / (ca.n_sh + cb.n_sh - c.common) AS jaccard
       FROM common c JOIN cnt ca ON ca.doc_id = c.d1 JOIN cnt cb ON cb.doc_id = c.d2
       ORDER BY c.d1, c.d2"""

  /** q92 — train/eval split-leakage audit, the evaluation-hygiene op a
    * pipeline runs AFTER splitting: near-duplicate pairs that CROSS
    * the q70 split boundary (a train doc ≈ a val/test doc) leak eval
    * answers into training in a way q68/q80's exact n-gram checks
    * can't see — paraphrase-level contamination needs the near-dup
    * machinery. Composition of shipped stages: q29's banded LSH
    * candidates → orient pairs as (train, heldout) under q70's exact
    * bucket rule → q66's exact shingle-Jaccard verify restricted to
    * the crossing pairs. Scale shape: the bucket columns join onto
    * the TINY candidate set (broadcast — the corpus-wide bucket frame
    * streams past it, 16-byte rows); the verify stage touches only
    * crossing pairs. */
  def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.text.TextAnalysis.{SplitBucketExpr, SplitTrainCut, SplitValCut}
    graft.expr.VectorExpressions.register(s)
    val buckets = Tables.documents(s, dir)
      .select($"doc_id", expr(SplitBucketExpr).as("bucket"))
    val cand = lshCandidates(s, dir)
    val p = buckets.toDF("d1", "b1").join(broadcast(cand), Seq("d1"))
    val crossing = buckets.toDF("d2", "b2").join(broadcast(p), Seq("d2"))
      .filter(($"b1" < SplitTrainCut) =!= ($"b2" < SplitTrainCut))
      .withColumn("hb", when($"b1" >= SplitTrainCut, $"b1").otherwise($"b2"))
      .select($"d1", $"d2", $"est_jaccard",
        when($"b1" < SplitTrainCut, $"d1").otherwise($"d2").as("train_doc"),
        when($"b1" < SplitTrainCut, $"d2").otherwise($"d1").as("heldout_doc"),
        when($"hb" < SplitValCut, "val").otherwise("test").as("split"))
    shingleJaccardVerify(s, dir, crossing,
        Seq("train_doc", "heldout_doc", "split", "est_jaccard"))
      .select($"train_doc", $"heldout_doc", $"split", $"est_jaccard", $"jaccard")
      .orderBy($"train_doc", $"heldout_doc")
  }

  /** Oracle: q29's candidate CTEs + q70's SHARED bucket rule + the
    * SHARED exact-verify CTEs, restricted to split-crossing pairs. */
  val qSplitLeakageSql: String = {
    import graft.text.TextAnalysis.{SplitBucketSql, SplitTrainCut, SplitValCut}
    s"""WITH $lshCandidateCtes,
       bk AS (SELECT doc_id, $SplitBucketSql AS bucket FROM documents),
       px AS (
         SELECT e.d1, e.d2, e.est_jaccard,
           CASE WHEN ba.bucket < $SplitTrainCut THEN e.d1 ELSE e.d2 END AS train_doc,
           CASE WHEN ba.bucket < $SplitTrainCut THEN e.d2 ELSE e.d1 END AS heldout_doc,
           CASE WHEN (CASE WHEN ba.bucket >= $SplitTrainCut THEN ba.bucket ELSE bb.bucket END) < $SplitValCut
                THEN 'val' ELSE 'test' END AS split
         FROM surv e
         JOIN bk ba ON ba.doc_id = e.d1
         JOIN bk bb ON bb.doc_id = e.d2
         WHERE (ba.bucket < $SplitTrainCut) != (bb.bucket < $SplitTrainCut)),
       ${shingleJaccardVerifySqlCtes(Seq("train_doc", "heldout_doc", "split", "est_jaccard"))}
       SELECT c.train_doc, c.heldout_doc, c.split, c.est_jaccard,
         CAST(c.common AS DOUBLE) / (ca.n_sh + cb.n_sh - c.common) AS jaccard
       FROM common c JOIN cnt ca ON ca.doc_id = c.d1 JOIN cnt cb ON cb.doc_id = c.d2
       ORDER BY c.train_doc, c.heldout_doc"""
  }

  // --- Duplicate-cluster assembly ------------------------------------

  /** q75 — duplicate clusters: connected components over the LSH
    * near-dup pair graph, the step a training pipeline runs AFTER pair
    * generation — near-duplication is transitive in practice (A≈B≈C
    * should drop to ONE kept doc, not pairwise-independent decisions),
    * so dedup-by-pairs without clustering either over-drops (both ends)
    * or under-drops (chains). Emits every clustered doc with its
    * component id (= min doc_id reachable — the canonical keep),
    * component size, and the keep flag.
    *
    * Plan: iterative min-label propagation to a fixed point — the
    * standard BSP/Pregel formulation expressed relationally. Edges (the
    * SMALL LSH survivor set, persisted once — the corpus-sized LSH
    * pipeline runs exactly once) are doubled to both directions; each
    * round unions each node's own label with its neighbors' and takes
    * MIN per node: one keyed shuffle per round, rounds = cluster
    * diameter (near-dup clusters are shallow — boilerplate families,
    * not long chains). Convergence detection is exact and O(1) per
    * round: labels are per-node non-increasing, so the label SUM is
    * strictly decreasing until the fixed point — no change-count join.
    * At 100 TB the same loop runs on the pair lake unchanged; AQE
    * handles the shrinking frontier. */
  /** Connected components over an undirected `(d1, d2)` pair frame by
    * min-label propagation (see [[qDupClusters]] for the plan story).
    * Returns `(doc_id, component)` for every endpoint; component = min
    * reachable id. ClustersSpec pins chains, merges, and singletons. */
  private[dedup] def connectedComponents(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    import graft.core.Resources
    val p = pairs.toDF("d1", "d2")
    // Eager localCheckpoint, not persist: each round's frame references
    // the previous one TWICE (own labels ∪ neighbor messages), so with
    // lazy caching the LOGICAL plan doubles per round — by round k the
    // analyzer re-walks O(2^k) copies of the whole upstream pipeline
    // even though execution hits the cache (measured: 26 s for a
    // 2-round run at sf0.1). Checkpointing truncates lineage to the
    // materialized RDD: O(1) plan per round, one tiny job per step —
    // the standard discipline for iterative algorithms on Spark.
    // Resources.checkpoint (not bare localCheckpoint) so release()
    // can free the checkpoint blocks, which Dataset.unpersist cannot.
    val edges = Resources.checkpoint(
      p.union(p.select($"d2", $"d1")).toDF("src", "dst"))
    def labelSum(df: DataFrame): Long = {
      val v = df.agg(sum($"label")).first().get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }
    var labels = Resources.checkpoint(
      edges.select($"src".as("doc_id")).distinct().withColumn("label", $"doc_id"))
    var total = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= 64,
        "connectedComponents: label propagation did not converge in 64 rounds")
      val msgs = labels.join(edges, $"doc_id" === $"src")
        .select($"dst".as("doc_id"), $"label")
      val next = Resources.checkpoint(
        labels.select($"doc_id", $"label").union(msgs)
          .groupBy($"doc_id").agg(min($"label").as("label"))) // materialized here — lineage ends
      val nextTotal = labelSum(next)
      converged = nextTotal == total
      total = nextTotal
      labels = next
    }
    labels.select($"doc_id", $"label".as("component"))
  }

  def qDupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comp = components(s, dir)
    val sizes = comp.groupBy($"component").agg(count(lit(1)).as("csize"))
    comp.join(sizes, Seq("component"))
      .select($"doc_id", $"component", $"csize",
        ($"doc_id" === $"component").as("kept"))
      .orderBy($"doc_id")
  }

  /** Transitive-closure CTE block over the `surv` LSH pair set (the
    * q75/q79/q85 oracles all open with `WITH RECURSIVE
    * $lshCandidateCtes, $closureCtes`): component = MIN reachable node
    * (reachability is symmetric because edges are doubled). Closure
    * size is Σ component², fine at oracle SF where clusters are
    * small. ONE definition so the three oracles cannot drift. */
  private def closureCtes: String =
    """edges AS (SELECT d1 AS src, d2 AS dst FROM surv
                 UNION ALL SELECT d2, d1 FROM surv),
       nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       reach AS (
         SELECT doc_id, doc_id AS node FROM nodes
         UNION
         SELECT r.doc_id, e.dst AS node FROM reach r JOIN edges e ON e.src = r.node),
       comp AS (SELECT doc_id, MIN(node) AS component FROM reach GROUP BY doc_id)"""

  val qDupClustersSql: String =
    s"""WITH RECURSIVE $lshCandidateCtes,
       $closureCtes,
       sz AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
       SELECT c.doc_id, c.component, s.csize, c.doc_id = c.component AS kept
       FROM comp c JOIN sz s USING (component) ORDER BY c.doc_id"""

  // --- Test-set decontamination --------------------------------------

  /** Gram length for the overlap check. Production decontamination uses
    * 8-13-word grams; the synthetic corpus draws from a ~30-word
    * vocabulary where 8-grams never recur across sources, so 4 is the
    * length that DEMONSTRATES the operator here (measured: 25 flagged
    * docs at sf0.01 vs zero at n≥6). The n is a constant of the query's
    * semantics, mirrored in the oracle. */
  private val DecontamN = 4

  /** q68 — benchmark decontamination, the training-pipeline op that
    * keeps eval data out of the training set: flag every training doc
    * (source != src19) sharing an n-gram with the held-out benchmark
    * source (src19). Scale shape: benchmark sets are small by nature,
    * so the DISTINCT benchmark gram hashes broadcast (8-byte keys, not
    * gram strings) and the training gram stream joins map-side — the
    * corpus never shuffles on gram. Hashing is the portable polyhash,
    * so the rare 31-bit collisions are IDENTICAL in the oracle's
    * replay (both sides join on the same hash). */
  /** The shared (doc_id, source, h) 4-gram-hash frame q68/q80/the
    * streaming gate's bloom all derive from. Fused
    * `graft_shingle_hashes` (value-identical to hashing the
    * `concat_ws(' ', …)` gram string, spec-pinned): gram hashes come
    * straight off the word array — no gram STRING is ever allocated,
    * the same win the q29 signature path measured. */
  private def gramFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expr.VectorExpressions.register(s)
    Tables.documents(s, dir)
      .select($"doc_id", $"source", split(trim($"text"), "\\s+").as("words"))
      .filter(size($"words") >= DecontamN)
      .select($"doc_id", $"source",
        explode(expr(s"graft_shingle_hashes(words, $DecontamN, 31L, ${PolyMod1}L)")).as("h"))
  }

  /** Scalar form of [[gramFrame]]'s per-doc hashes for per-row
    * contexts (the streaming contamination gate): identical whitespace
    * split + 4-gram polyhash. */
  private[graft] def gramHashes(text: String): Array[Long] = {
    val words = text.trim.split("\\s+")
    if (words.length < DecontamN) return Array.empty
    val out = new Array[Long](words.length - DecontamN + 1)
    var i = 0
    while (i < out.length) {
      var gram = words(i)
      var k = 1
      while (k < DecontamN) { gram = gram + " " + words(i + k); k += 1 }
      out(i) = graft.core.Hashing.polyFold(gram, 31, PolyMod1)
      i += 1
    }
    out
  }

  /** Benchmark gram Bloom filter (the q80 gate object) for callers
    * that need it standalone — the streaming contamination gate ships
    * THIS to the stream instead of the exact gram set. */
  private[graft] def benchmarkBloom(s: SparkSession, dir: String, benchSource: String,
                                    fpp: Double = BloomFpp): org.apache.spark.util.sketch.BloomFilter = {
    import s.implicits._
    // Persisted around the count()+bloomFilter() action pair (the gram
    // pipeline would otherwise run twice), and released HERE: unlike a
    // query's lazy frames, both consumers complete inside this call.
    val bench = gramFrame(s, dir).filter($"source" === benchSource).select($"h").distinct()
    bench.persist()
    try bench.stat.bloomFilter("h", math.max(bench.count(), 1L), fpp)
    finally bench.unpersist(blocking = false)
  }

  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = gramFrame(s, dir)
    val bench = grams.filter($"source" === "src19").select($"h").distinct()
    val train = grams.filter($"source" =!= "src19").select($"doc_id", $"h").distinct()
    train.join(broadcast(bench), Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("contaminated_grams"))
      .orderBy($"doc_id")
  }

  /** q125 — contamination-rate REPORT per source, the release-gate
    * number that decides whether a source ships (q68 lists the
    * contaminated docs; a release decision needs the per-source RATE
    * and severity): for every training source, the doc count, how
    * many docs share ≥1 benchmark gram, their total contaminated-gram
    * mass, and the worst single doc. Same plan as q68 (broadcast
    * benchmark hash set, one keyed rollup) plus a doc→source join of
    * the flagged (doc, count) frame — the corpus re-enters only as a
    * per-source doc count. Rate arithmetic stays integer (per-mille
    * floor-div) so the report is engine-exact. */
  def qContaminationReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = gramFrame(s, dir)
    val bench = grams.filter($"source" === "src19").select($"h").distinct()
    val train = grams.filter($"source" =!= "src19").select($"doc_id", $"h").distinct()
    val flagged = train.join(broadcast(bench), Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("cg"))
    val docSrc = Tables.documents(s, dir)
      .filter($"source" =!= "src19").select($"doc_id", $"source")
    docSrc.join(flagged, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count($"cg").as("n_flagged"),
        sum(coalesce($"cg", lit(0L))).as("gram_hits"),
        max(coalesce($"cg", lit(0L))).as("worst_doc_hits"))
      .withColumn("flag_permille", expr("(n_flagged * 1000) div n_docs"))
      .orderBy($"source")
  }

  val qContaminationReportSql: String = {
    val joins = (0 until DecontamN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       g AS (SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words) - ${DecontamN - 1}),
                 i -> $joins)) AS gram
             FROM w WHERE len(words) >= $DecontamN),
       gh AS (SELECT doc_id, source, ${polyHashSql("gram", 31, PolyMod1)} AS h FROM g),
       bench AS (SELECT DISTINCT h FROM gh WHERE source = 'src19'),
       train AS (SELECT DISTINCT doc_id, h FROM gh WHERE source != 'src19'),
       fl AS (SELECT doc_id, COUNT(*) AS cg FROM train JOIN bench USING (h) GROUP BY doc_id),
       ds AS (SELECT doc_id, source FROM documents WHERE source != 'src19')
       SELECT ds.source, COUNT(*) AS n_docs,
         COUNT(fl.cg) AS n_flagged,
         CAST(SUM(COALESCE(fl.cg, 0)) AS BIGINT) AS gram_hits,
         CAST(MAX(COALESCE(fl.cg, 0)) AS BIGINT) AS worst_doc_hits,
         (COUNT(fl.cg) * 1000) // COUNT(*) AS flag_permille
       FROM ds LEFT JOIN fl USING (doc_id)
       GROUP BY ds.source ORDER BY ds.source"""
  }

  val qDecontaminateSql: String = {
    val joins = (0 until DecontamN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       g AS (SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words) - ${DecontamN - 1}),
                 i -> $joins)) AS gram
             FROM w WHERE len(words) >= $DecontamN),
       gh AS (SELECT doc_id, source, ${polyHashSql("gram", 31, PolyMod1)} AS h FROM g),
       bench AS (SELECT DISTINCT h FROM gh WHERE source = 'src19'),
       train AS (SELECT DISTINCT doc_id, h FROM gh WHERE source != 'src19')
       SELECT doc_id, COUNT(*) AS contaminated_grams
       FROM train JOIN bench USING (h)
       GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q98 — cross-source overlap matrix, the dataset-composition audit
    * a pipeline runs BEFORE mixing corpora (q68/q80 ask "is this doc
    * contaminated by the benchmark"; this asks "how much does every
    * source pair share at all" — the number that decides whether two
    * crawls are near-copies of each other): for each ordered source
    * pair, the count of shared distinct 4-gram hashes and the
    * containment fraction |A∩B| / |A|.
    *
    * Scale shape: per-source DISTINCT gram hashes (8-byte keys off the
    * fused shingle expression — gram text never exists), self-joined
    * on the hash; the shuffle carries (source, hash) pairs and the
    * output is bounded by #sources² rows. A gram present in k sources
    * contributes k² candidate rows — bounded by #sources², not corpus
    * size. Containment is one exact int division (bit-identical across
    * engines, no rounding needed). */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sg = gramFrame(s, dir).select($"source", $"h").distinct()
    val totals = sg.groupBy($"source").agg(count(lit(1)).as("n1"))
    val a = sg.toDF("s1", "h")
    val b = sg.toDF("s2", "h")
    a.join(b, Seq("h")).filter($"s1" =!= $"s2")
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("n_common"))
      .join(totals.toDF("s1", "n1"), Seq("s1"))
      .select($"s1", $"s2", $"n_common",
        ($"n_common".cast("double") / $"n1").as("containment"))
      .orderBy($"s1", $"s2")
  }

  val qSourceOverlapSql: String = {
    val joins = (0 until DecontamN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       g AS (SELECT source,
               unnest(list_transform(generate_series(1, len(words) - ${DecontamN - 1}),
                 i -> $joins)) AS gram
             FROM w WHERE len(words) >= $DecontamN),
       sg AS (SELECT DISTINCT source, ${polyHashSql("gram", 31, PolyMod1)} AS h FROM g),
       tot AS (SELECT source, COUNT(*) AS n1 FROM sg GROUP BY source),
       inter AS (
         SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_common
         FROM sg a JOIN sg b ON a.h = b.h AND a.source != b.source
         GROUP BY a.source, b.source)
       SELECT i.s1, i.s2, i.n_common,
         CAST(i.n_common AS DOUBLE) / t.n1 AS containment
       FROM inter i JOIN tot t ON t.source = i.s1
       ORDER BY i.s1, i.s2"""
  }

  /** The shared per-doc funnel frame `(doc_id, wc, k_exact, k_cluster,
    * n_removed)` — q100 aggregates it, q108 emits it as the per-doc
    * ledger. Plan shape: one narrow doc pass (md5 + token count), the
    * q79 cluster frame (LSH pairs → label propagation → quality
    * argmax), the q94 coverage counts, then three metadata joins keyed
    * on doc_id. The corpus text is read once per shared frame; nothing
    * wide moves but (doc_id, flag/count) rows. */
  private def funnelFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", md5($"text").as("h"),
        size(nonEmptyWords($"text")).as("wc"))
    val keepExact = docs.groupBy($"h").agg(min($"doc_id").as("keep_id"))
    val flagged = docs.join(keepExact, Seq("h"))
      .withColumn("k_exact", $"doc_id" === $"keep_id")
      .select($"doc_id", $"wc", $"k_exact")
    val kCluster = clusterCanonicalFrame(s, dir).select($"doc_id", $"kept".as("k_cluster"))
    val removed = dupCoveredPositions(s, dir)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_removed"))
    flagged
      .join(kCluster, Seq("doc_id"))
      .join(removed, Seq("doc_id"), "left")
      .withColumn("n_removed", coalesce($"n_removed", lit(0L)))
  }

  /** q100 — the dedup FUNNEL, the artifact every curation pipeline
    * logs: corpus size (docs, tokens) after each successive dedup
    * stage — raw → exact (q27/q52's keep-min-per-md5) → cluster
    * canonical (q79's quality-argmax winner) → duplicate-span removal
    * (q94's covered-token cut on the survivors). Stages are the
    * corpus-wide keep rules INTERSECTED (each rule is computed once
    * over the full corpus, the report applies them cumulatively) —
    * deterministic, and each stage reuses the exact shared frame its
    * standalone query ships, so the funnel can never disagree with
    * q52/q79/q94. */
  def qDedupFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val full = funnelFrame(s, dir)
    // ONE conditional aggregation over the shared frame, then a 1→4-row
    // stack. r4's shape (4 filtered aggs unioned) re-evaluated the whole
    // LSH/components/coverage upstream per stage — 16.3 s at sf0.1, 4×
    // the work at any scale. A single pass needs no persist at all.
    // `when` without otherwise → NULL for non-matching rows: count()
    // skips them (so 0 like the oracle's filtered COUNT(*)) and sum()
    // of none is NULL (like the oracle's filtered SUM).
    val survives = $"k_exact" && $"k_cluster"
    full.agg(
      count(lit(1)).as("n0"), sum($"wc").as("t0"),
      count(when($"k_exact", lit(1))).as("n1"),
      sum(when($"k_exact", $"wc")).as("t1"),
      count(when(survives, lit(1))).as("n2"),
      sum(when(survives, $"wc")).as("t2"),
      sum(when(survives, $"wc" - $"n_removed")).as("t3"))
      .select(expr(
        """stack(4,
             '0_raw', n0, t0,
             '1_exact', n1, t1,
             '2_cluster', n2, t2,
             '3_span', n2, t3) AS (stage, n_docs, n_tokens)"""))
      .orderBy($"stage")
  }

  /** Non-empty whitespace tokens of a text column (the q94/q100 token
    * definition — split positions minus empties). */
  private def nonEmptyWords(c: Column): Column =
    filter(split(trim(c), "\\s+"), w => w =!= "")

  /** The SHARED q100/q108 oracle prologue — everything through the
    * per-doc `full_t` frame (the SQL mirror of [[funnelFrame]]): md5
    * keep rule + the SHARED q79 closure/quality CTEs + the SHARED q94
    * coverage CTEs. One definition so the funnel and the ledger can
    * never drift. Lazy: precedes SpanN in declaration order, and the
    * coverage block reads it — eager init would interpolate the
    * yet-unset 0. */
  private lazy val funnelCtes: String =
    s"""RECURSIVE $lshCandidateCtes,
       $closureCtes,
       qual AS (${graft.text.TextAnalysis.qualityScoresSqlCte}),
       lab AS (
         SELECT q.doc_id, COALESCE(c.component, q.doc_id) AS component, q.quality
         FROM qual q LEFT JOIN comp c ON c.doc_id = q.doc_id),
       kc AS (
         SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) = 1 AS k_cluster
         FROM lab),
       $spanCoverageCtes,
       rem AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
       d AS (
         SELECT doc_id, md5(text) AS h,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS wc
         FROM documents),
       ke AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h),
       full_t AS (
         SELECT d.doc_id, d.wc, d.doc_id = ke.keep_id AS k_exact,
           kc.k_cluster, COALESCE(rem.n_removed, 0) AS n_removed
         FROM d JOIN ke USING (h)
         JOIN kc ON kc.doc_id = d.doc_id
         LEFT JOIN rem ON rem.doc_id = d.doc_id)"""

  lazy val qDedupFunnelSql: String =
    s"""WITH $funnelCtes
       SELECT * FROM (
         SELECT '0_raw' AS stage, COUNT(*) AS n_docs, CAST(SUM(wc) AS BIGINT) AS n_tokens
         FROM full_t
         UNION ALL
         SELECT '1_exact', COUNT(*), CAST(SUM(wc) AS BIGINT) FROM full_t WHERE k_exact
         UNION ALL
         SELECT '2_cluster', COUNT(*), CAST(SUM(wc) AS BIGINT)
         FROM full_t WHERE k_exact AND k_cluster
         UNION ALL
         SELECT '3_span', COUNT(*), CAST(SUM(wc - n_removed) AS BIGINT)
         FROM full_t WHERE k_exact AND k_cluster) t
       ORDER BY stage"""

  /** q108 — per-doc removal LEDGER, the provenance artifact a curation
    * run ships next to the q100 aggregate: every document's disposition
    * (kept / exact_dup / near_dup / span_trimmed — the FIRST stage that
    * removed or trimmed it, in pipeline order) plus its token count
    * before and after. The audit answer to "why is doc X not in the
    * training set?", and the per-doc reconciliation of the funnel: the
    * ledger's dispositions aggregate exactly to q100's stage rows
    * (spec-pinned). Same one-pass plan as q100 — the shared frame IS
    * the ledger; this query just doesn't collapse it. */
  def qRemovalLedger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    funnelFrame(s, dir)
      .select($"doc_id",
        when(!$"k_exact", "exact_dup")
          .when(!$"k_cluster", "near_dup")
          .when($"n_removed" > 0, "span_trimmed")
          .otherwise("kept").as("disposition"),
        $"wc".cast("long").as("tokens_before"),
        when(!$"k_exact" || !$"k_cluster", 0L)
          .otherwise($"wc" - $"n_removed").cast("long").as("tokens_after"))
      .orderBy($"doc_id")
  }

  /** Oracle: the q100 CTE block, emitted per doc instead of rolled up. */
  lazy val qRemovalLedgerSql: String =
    s"""WITH $funnelCtes
       SELECT doc_id,
         CASE WHEN NOT k_exact THEN 'exact_dup'
              WHEN NOT k_cluster THEN 'near_dup'
              WHEN n_removed > 0 THEN 'span_trimmed'
              ELSE 'kept' END AS disposition,
         CAST(wc AS BIGINT) AS tokens_before,
         CAST(CASE WHEN NOT k_exact OR NOT k_cluster THEN 0
              ELSE wc - n_removed END AS BIGINT) AS tokens_after
       FROM full_t ORDER BY doc_id"""

  /** q74 — duplicate-span fraction, the span-level curation metric
    * (how much of each doc's text also appears in OTHER docs — the
    * per-doc statistic behind substring-dedup decisions in public
    * training-data work): a gram counts as duplicated when ≥2 distinct
    * docs contain it. Plan: distinct (doc, gram-hash) pairs (8-byte
    * keys — gram text never shuffles), one map-side-combined count per
    * hash for the distinct-doc cardinality, join back on the hash, one
    * per-doc rollup. The corpus-wide gram table is inherently the
    * heavy object here; at 100 TB both shuffles key on the same hash,
    * so bucketing the intermediate by gram hash makes the join
    * co-located. Hashing is the portable polyhash — collisions replay
    * identically in the oracle. */
  private val SpanN = 5

  def qDupSpanFraction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expr.VectorExpressions.register(s)
    // Fused gram hashing (see gramFrame): hashes straight off the word
    // array, no gram strings, value-identical to the oracle's
    // string-fold replay.
    val grams = Tables.documents(s, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("words"))
      .filter(size($"words") >= SpanN)
      .select($"doc_id",
        explode(expr(s"graft_shingle_hashes(words, $SpanN, 31L, ${PolyMod1}L)")).as("h"))
      .distinct()
    val byHash = grams.groupBy($"h").agg(count(lit(1)).as("n_docs"))
    grams.join(byHash, Seq("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"n_docs" >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac", $"n_dup_grams".cast("double") / $"n_grams")
      .orderBy($"doc_id")
  }

  val qDupSpanFractionSql: String = {
    val joins = (0 until SpanN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       g AS (SELECT DISTINCT doc_id,
               ${polyHashSql("gram", 31, PolyMod1)} AS h
             FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(words) - ${SpanN - 1}),
                       i -> $joins)) AS gram
                   FROM w WHERE len(words) >= $SpanN) t),
       bh AS (SELECT h, COUNT(*) AS n_docs FROM g GROUP BY h)
       SELECT doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
         CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
       FROM g JOIN bh USING (h)
       GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q94 — duplicate-span REMOVAL, the rewrite step downstream of
    * q74's metric (public substring-dedup work drops repeated spans
    * from the corpus rather than whole documents): positions whose
    * [[SpanN]]-gram appears in ≥2 distinct docs are expanded to the
    * tokens they cover, overlapping covered runs merge (gaps-and-
    * islands), and the doc is re-emitted with covered tokens cut.
    *
    * Plan shape: the gram stream carries (doc_id, pos, 8-byte hash) —
    * never gram text; the corpus-wide duplicated-hash table comes from
    * the same map-side-combined count q74 uses; coverage expansion is
    * a narrow explode of ≤ SpanN ints per duplicated start; the only
    * wide shuffle of word data is the per-doc rebuild groupBy, keyed
    * on doc_id — the same key the coverage anti-join uses, so AQE
    * chains them without a second exchange of the words. Docs with no
    * duplicated span (or fewer than SpanN words) pass through whole. */
  /** (doc_id, idx) token positions covered by a duplicated
    * [[SpanN]]-gram — the coverage set q94's rewrite cuts and q100's
    * funnel counts. Positions kept through the hash join, duplicates
    * kept (the same gram twice in one doc marks both starts). */
  /** Memoized per-corpus-dir coverage-lake paths (see [[lshLakes]]). */
  private val coveredLakes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Duplicated-gram token coverage `(doc_id, idx)` — the q74/q94
    * span-level artifact — materialized ONCE per corpus dir like the
    * pair/component lakes: the gram explosion + corpus-wide distinct
    * runs once per corpus version, and q94's removal pass plus the
    * q100/q108 funnel frames read the 12-byte position rows back. */
  private def dupCoveredPositions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = coveredLakes.computeIfAbsent(dir, _ => {
      val path = graft.sink.TempDirs.persistent("graft_covered_").toString
      dupCoveredPositionsGen(s, dir).write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(lake).select($"doc_id", $"idx")
  }

  /** The coverage GENERATION pass (unmaterialized). */
  private def dupCoveredPositionsGen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expr.VectorExpressions.register(s)
    val words = Tables.documents(s, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("words"))
    val gramsPos = words
      .filter(size($"words") >= SpanN)
      .select($"doc_id", posexplode(expr(
        s"graft_shingle_hashes(words, $SpanN, 31L, ${PolyMod1}L)")))
      .select($"doc_id", ($"pos" + 1).as("i"), $"col".as("h"))
    val dupHash = gramsPos.select($"doc_id", $"h").distinct()
      .groupBy($"h").agg(count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .select($"h")
    gramsPos.join(dupHash, Seq("h"))
      .select($"doc_id", explode(expr(s"sequence(i, i + ${SpanN - 1})")).as("idx"))
      .distinct()
  }

  def qDupSpanRemoval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.expr.VectorExpressions.register(s)
    val words = Tables.documents(s, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("words"))
    val covered = dupCoveredPositions(s, dir)
    // merge covered runs per doc: idx - row_number is constant per run
    val spans = covered
      .withColumn("grp", $"idx" - row_number().over(
        Window.partitionBy($"doc_id").orderBy($"idx")))
      .groupBy($"doc_id", $"grp").agg(count(lit(1)).as("span_len"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"), sum($"span_len").as("n_removed"))
    val kept = words
      .select($"doc_id", posexplode($"words"))
      .select($"doc_id", ($"pos" + 1).as("idx"), $"col".as("word"))
      .filter($"word" =!= "")
      .join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy($"doc_id")
      .agg(concat_ws(" ",
        expr("transform(sort_array(collect_list(struct(idx, word))), x -> x.word)"))
        .as("clean_text"))
    Tables.documents(s, dir).select($"doc_id")
      .join(spans, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"n_removed", lit(0L)).as("n_removed"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id")
  }

  /** The span-coverage CTE block (`spw`, `spg`, `spdh`,
    * `cov(doc_id, idx)`) shared by the q94 and q100 oracles so they
    * cannot drift. Names are sp-prefixed because q100 composes this
    * block with the LSH CTEs, which already claim `w`. */
  private def spanCoverageCtes: String = {
    val joins = (0 until SpanN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""spw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
               FROM documents),
       spg AS (SELECT doc_id, i, ${polyHashSql("gram", 31, PolyMod1)} AS h
               FROM (SELECT doc_id, i, $joins AS gram
                     FROM spw, unnest(generate_series(1, len(words) - ${SpanN - 1})) AS u(i)
                     WHERE len(words) >= $SpanN) t),
       spdh AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM spg) gd
                GROUP BY h HAVING COUNT(*) >= 2),
       cov AS (SELECT DISTINCT spg.doc_id, spg.i + k.k AS idx
               FROM spg JOIN spdh USING (h),
                    unnest(generate_series(0, ${SpanN - 1})) AS k(k))"""
  }

  val qDupSpanRemovalSql: String = {
    s"""WITH $spanCoverageCtes,
       spans AS (
         SELECT doc_id, COUNT(*) AS n_spans, CAST(SUM(span_len) AS BIGINT) AS n_removed
         FROM (SELECT doc_id, grp, COUNT(*) AS span_len
               FROM (SELECT doc_id, idx,
                       idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
                     FROM cov) t
               GROUP BY doc_id, grp) sp
         GROUP BY doc_id),
       kept AS (
         SELECT t.doc_id, string_agg(t.word, ' ' ORDER BY t.idx) AS clean_text
         FROM (SELECT spw.doc_id, i.i AS idx, spw.words[i.i] AS word
               FROM spw, unnest(generate_series(1, len(spw.words))) AS i(i)
               WHERE spw.words[i.i] != '') t
         LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.idx = t.idx
         WHERE cov.doc_id IS NULL
         GROUP BY t.doc_id)
       SELECT d.doc_id,
         COALESCE(s.n_spans, 0) AS n_spans,
         COALESCE(s.n_removed, 0) AS n_removed,
         COALESCE(k.clean_text, '') AS clean_text
       FROM documents d
       LEFT JOIN spans s ON s.doc_id = d.doc_id
       LEFT JOIN kept k ON k.doc_id = d.doc_id
       ORDER BY d.doc_id"""
  }

  private val SimBits = 60      // 60-bit simhash from two poly folds
  // ≤ 6 differing bits — private[graft] so the streaming ingest gate
  // defaults to THE q30 threshold instead of a drift-prone copy
  private[graft] val SimHamMax = 6

  /** SimHash signatures (60-bit portable): per-word poly-hash pair
    * combined into one 60-bit value, bit-majority vote weighted by term
    * frequency. The 60 bit votes are agg COLUMNS (map-side combined,
    * one shuffle of #docs × 60 ints) — not an explode to
    * (doc, word) × 60 rows. */
  def simHashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expr.VectorExpressions.register(s)
    // The word hash is computed BEFORE the tf aggregation so the
    // shuffle keys on (doc_id, 8-byte wh) instead of (doc_id, word
    // string) and word bytes never shuffle. Exact by construction:
    // words sharing a wh cast identical bit votes, so folding them
    // into one tf group cannot change any vote sum — the oracle groups
    // by the word string and still hashes to the same signatures.
    // h2 < 2^30 fills bits 0-29, so h1 must start at bit 30 — a 2^31
    // multiplier would leave bit 30 structurally zero (a dead vote
    // that biases hamming distances and doubles band-5 collisions).
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .withColumn("wh",
        expr(polyHashExpr("word", 31, PolyMod1)) * lit(1073741824L) +
          expr(polyHashExpr("word", 131, PolyMod2)))
      .groupBy($"doc_id", $"wh").agg(count(lit(1)).as("tf"))
    // 60 bit-vote agg columns (map-side combined): one shuffle of
    // #docs × 60 ints — NOT an explode to (doc, word) × 60 rows.
    val votes: Seq[Column] = (0 until SimBits).map { j =>
      sum(when(expr(s"(wh >> $j) & 1") === 1, $"tf").otherwise(-$"tf")).as(s"v$j")
    }
    words.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
      .withColumn("simhash", expr(
        (0 until SimBits).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j}L ELSE 0L END")
          .mkString(" + ")))
      .select($"doc_id", $"simhash")
  }

  /** Scalar form of [[simHashSignatures]] for per-row contexts (the
    * streaming ingest gate computes a signature per arriving doc; no
    * relational aggregation is available inside a stream row). Exactly
    * the relational math: whitespace words, portable polyhash pair into
    * a 60-bit value, tf-weighted bit-majority vote. DedupSpec pins
    * per-doc equality with the relational form. */
  def simHash64(text: String): Long = {
    import graft.core.Hashing.polyFold
    val votes = new Array[Long](SimBits)
    text.trim.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
      val wh = polyFold(w, 31, PolyMod1) * 1073741824L + polyFold(w, 131, PolyMod2)
      var j = 0
      while (j < SimBits) {
        votes(j) += (if (((wh >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < SimBits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Banded SimHash pair join — the sparse-regime scale path, on the
    * MINIMAL pigeonhole cover (7 bands of 8-9 bits for 60 bits at
    * hamming ≤ 6): ≤6 differing bits dirty at most 6 of the 7 bands,
    * so every qualifying pair shares ≥1 exact band — EXACTLY
    * equivalent to the all-pairs scan, with candidate volume
    * Σ bucket² per band (256-512 buckets/band here — ~8× the pruning
    * of an equal 10 × 6-bit split). Use when signatures are spread
    * (real-world corpora where near-dups are rare). DedupSpec pins
    * equivalence with the kernel form. */
  private[dedup] val SimBands = Hamming.minimalBands(SimBits, SimHamMax)

  def simHashBandedPairs(sigs: DataFrame): DataFrame =
    Hamming.bandedPairsAt(sigs, "simhash", SimBands, SimHamMax)

  /** Plan census for [[qSimHash]]: `(n_docs, banded_candidates)` where
    * `banded_candidates` is the EXACT same-bucket probe-pair volume the
    * banded join would generate — Σ over (band, bkey) of n·(n−1)/2 —
    * computed in one cheap aggregation over the band-exploded 8-byte
    * rows (same [[SimBands]] geometry as the join it prices). This is
    * the reference's candidate-bounding intent
    * (HNSW caps candidate sets, setup_vector_db.py:148-150) made
    * measurable: the observed signature distribution, not a guess,
    * picks the plan. */
  private[dedup] def simHashCandidateCensus(sigs: DataFrame): (Long, Double) = {
    val s = sigs.sparkSession
    import s.implicits._
    val nBands = SimBands.size
    // The candidate count aggregates in DOUBLE: per-bucket n·(n−1)
    // wraps (or, under ANSI, throws) past n ≈ 3e9 as a Long product,
    // and a cost estimate only needs magnitude, not exactness. n_docs
    // however is presented as exact, so it divides INTEGRALLY (`div`):
    // Σn is a multiple of nBands by construction, and a double detour
    // would lose exactness past 2^53. Both aggregates coalesce so an
    // EMPTY corpus yields (0, 0.0), not a null-unboxing crash.
    val row = sigs
      .select(explode(expr(Hamming.bandStructsExpr("simhash", SimBands))).as("bb"))
      .groupBy($"bb.band", $"bb.bkey").agg(count(lit(1)).as("n"))
      .agg(coalesce(expr(s"sum(n) div $nBands"), lit(0L)).as("n_docs"),
        coalesce(sum($"n".cast("double") * ($"n" - 1).cast("double") / 2.0), lit(0.0))
          .as("cand"))
      .head()
    (row.getLong(0), row.getDouble(1))
  }

  /** A tiled-kernel candidate costs one in-registers `Long.bitCount`;
    * a banded candidate is a shuffled join row — ~this factor more
    * expensive per candidate. Banding must prune the pair space by
    * MORE than this before it wins. */
  private[dedup] val BandedAdvantageMin = 32L

  /** The census decision rule, exposed for spec pinning: band when the
    * observed bucket distribution prunes candidates by over
    * [[BandedAdvantageMin]] vs the all-pairs kernel. Double
    * arithmetic: nDocs·(nDocs−1) overflows Long past ~3e9 docs —
    * exactly the corpus sizes the banded path exists for. */
  private[dedup] def chooseBanded(nDocs: Long, bandedCand: Double): Boolean = {
    val allPairs = nDocs.toDouble * (nDocs - 1).toDouble / 2.0
    bandedCand < allPairs / BandedAdvantageMin
  }

  /** q30: near-dup pairs at hamming ≤ 6. Plan choice is AUTOMATIC and
    * measured per run via [[simHashCandidateCensus]]: the testdata's
    * shared small vocabulary makes signatures CLUSTER (banding
    * generated 27.6M candidate rows at sf0.1 — 2.2× MORE than the
    * 12.5M raw pairs — so the census keeps the kernel there), while a
    * real-world spread-signature corpus census picks
    * [[simHashBandedPairs]], whose Σ bucket² cost is the linear-ish
    * 100 TB path. Both paths are output-identical (pigeonhole,
    * DedupSpec-pinned); only cost differs. */
  /** Signatures per tile: 8-byte (id, hash) rows — 64 K rows/tile is
    * ~1 MB broadcast; driver memory per collect is bounded by the same
    * figure regardless of corpus size. */
  private val SimTileSize = 65536

  def qSimHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simHashPairs(s, dir).orderBy($"d1", $"d2")
  }

  /** Pair-lake registry: corpus dir → materialized pair-lake path.
    * Process-global and concurrent-safe (computeIfAbsent blocks a
    * second asker for the SAME corpus while the first build runs);
    * lifetime = JVM = one harness run, matching the testdata's
    * immutability within a run. At 100 TB this is the corpus-version
    * artifact: the generation pass is ~3× the most expensive
    * computation in the suite, and the sweep/matrix/backfill reports
    * all need the SAME pairs — building it once per version and
    * letting every report scan 20-byte parquet rows is the difference
    * between one expensive pass and one per report (the r5 verdict's
    * next-round item 2). */
  private val pairLakes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Signature-lake registry: corpus dir → materialized (doc_id,
    * simhash) parquet path. Same discipline (and lifetime) as
    * [[pairLakes]], for the layer BELOW the pairs: the signature pass
    * is a full corpus text scan, and three consumers need its output —
    * the census, the pair generation it prices, and the q106 delta
    * admission (which by design runs long after the backfill). Caching
    * (`Resources.persist`) served the first two but was released after
    * every harness run, so q106 re-ran the corpus scan and re-cached
    * 16-byte rows under suite-wide memory pressure — BENCH_r08's q106
    * regression (10.3 s in-suite vs 2.0 s isolated). A 16-byte-row
    * parquet lake makes every later consumer a column-pruned scan
    * costing milliseconds, holds no executor memory between queries,
    * and at 100 TB is exactly the corpus-version artifact the delta
    * ingest joins against each cycle. */
  private val sigLakes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The corpus SimHash signatures, materialized once per corpus dir
    * and read thereafter (see [[sigLakes]]). */
  private def simHashSigLake(s: SparkSession, dir: String): DataFrame = {
    val lake = sigLakes.computeIfAbsent(dir, _ => {
      val path = graft.sink.TempDirs.persistent("graft_simhash_sigs_").toString
      simHashSignatures(s, dir).write.mode("overwrite").parquet(path)
      path
    })
    s.read.parquet(lake).select(col("doc_id"), col("simhash"))
  }

  /** The q30 pair frame `(d1, d2, hamming ≤ SimHamMax)`, materialized
    * ONCE per corpus dir to a hamming-partitioned parquet lake (the
    * q114 round-trip discipline) and READ thereafter: the first family
    * member to ask runs the census-selected generation pass
    * ([[simHashPairsGen]]); q30 re-runs, the q109 sweep, and the q112
    * source matrix are then parquet SCANS with partition pruning on
    * the hamming key — never a corpus re-scan. */
  private def simHashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = pairLakes.computeIfAbsent(dir, _ => {
      val path = graft.sink.TempDirs.persistent("graft_simhash_pairs_").toString
      simHashPairsGen(s, dir)
        // one file per hamming value at this scale; at 100 TB the
        // writer's AQE coalescing sizes files within each partition
        .repartition(col("hamming"))
        .write.mode("overwrite").partitionBy("hamming").parquet(path)
      path
    })
    s.read.parquet(lake).select($"d1", $"d2", $"hamming".cast("int").as("hamming"))
  }

  /** The pair GENERATION pass (unmaterialized) — census-selected
    * banded-vs-tiled plan over the persisted signature frame. */
  private def simHashPairsGen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // AUTOMATIC plan selection (r4 verdict item 4): the census measures
    // the actual bucket distribution and picks banded (sparse, spread
    // signatures — the real-corpus regime, Σ bucket² ≪ N²) vs the
    // tiled kernel (clustered signatures, like this testdata's shared
    // small vocabulary, where banding generates MORE candidate rows
    // than the raw pair count). Signatures come from the once-per-
    // corpus lake ([[sigLakes]]); census, and whichever pair path
    // runs, are column-pruned scans of its 16-byte rows.
    val sigsDf = simHashSigLake(s, dir)
    val (nDocs, cand) = simHashCandidateCensus(sigsDf)
    val pairs =
      if (chooseBanded(nDocs, cand)) simHashBandedPairs(sigsDf)
      else {
        // Tiled kernel: each ≤64 K-row tile is a bounded driver collect
        // + broadcast, probed by the full distributed signature set. No
        // whole-table collect anywhere — the r2 plan's
        // `broadcast(sigs.collect())` was driver-bounded at exactly the
        // scale this operator exists for.
        graft.core.Blocked.tiledPairScan(sigsDf.as[(Long, Long)], SimTileSize)(_._1) {
          case ((id1, h1), arr) =>
            val out = Seq.newBuilder[(Long, Long, Int)]
            var k = 0
            while (k < arr.length) {
              val (id2, h2) = arr(k)
              if (id2 > id1) {
                val ham = java.lang.Long.bitCount(h1 ^ h2)
                if (ham <= SimHamMax) out += ((id1, id2, ham))
              }
              k += 1
            }
            out.result()
        }.toDF("d1", "d2", "hamming")
      }
    pairs
  }

  /** q109 — near-dup THRESHOLD SWEEP, the calibration report behind
    * choosing SimHamMax: for every hamming cutoff t ≤ the maximum, the
    * pair count and the number of documents with at least one partner
    * at ≤ t. The pair LAKE ([[simHashPairs]]) supplies the pairs —
    * generated once per corpus version, a parquet scan here — then two
    * conditional aggregations: the sweep costs two scans of the
    * 20-byte-row PAIR table, never a re-scan of the corpus, which is
    * what makes running it per-corpus-version affordable and is how
    * the cutoff gets chosen from data instead of folklore. */
  def qNearDupSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = simHashPairs(s, dir)
    val ts = 0 to SimHamMax
    val pairCols = ts.map(t => count(when($"hamming" <= t, lit(1))).as(s"p$t"))
    val pairRow = pairs.agg(pairCols.head, pairCols.tail: _*)
    val perDoc = pairs
      .select(explode(array($"d1", $"d2")).as("doc"), $"hamming")
      .groupBy($"doc").agg(min($"hamming").as("mh"))
    val docCols = ts.map(t => count(when($"mh" <= t, lit(1))).as(s"d$t"))
    val docRow = perDoc.agg(docCols.head, docCols.tail: _*)
    val stackArgs = ts.map(t => s"$t, p$t, d$t").mkString(", ")
    pairRow.crossJoin(docRow)
      .select(expr(
        s"stack(${ts.size}, $stackArgs) AS (hamming_max, n_pairs, n_docs)"))
      .orderBy($"hamming_max")
  }

  /** Oracle: brute-force pairs + per-threshold correlated counts. */
  val qNearDupSweepSql: String =
    s"""WITH $simHashSigCtes,
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           bit_count(xor(a.simhash, b.simhash)) AS h
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimHamMax),
       md AS (
         SELECT doc, MIN(h) AS mh FROM (
           SELECT d1 AS doc, h FROM pr UNION ALL SELECT d2, h FROM pr) u
         GROUP BY doc),
       th AS (SELECT unnest(generate_series(0, $SimHamMax)) AS t)
       SELECT CAST(th.t AS INT) AS hamming_max,
         CAST((SELECT COUNT(*) FROM pr WHERE pr.h <= th.t) AS BIGINT) AS n_pairs,
         CAST((SELECT COUNT(*) FROM md WHERE md.mh <= th.t) AS BIGINT) AS n_docs
       FROM th ORDER BY hamming_max"""

  /** q112 — near-dup SOURCE cross-matrix: which sources duplicate into
    * which, at the near-dup (SimHash) level — the q98 exact-gram
    * overlap audit's semantic sibling, and the report that answers
    * "which feeds are mirroring each other" before anyone decides
    * per-source caps. Source pairs are canonicalized (least, greatest)
    * so the matrix is upper-triangular including the diagonal
    * (within-source dup mass). Plan: the pair LAKE ([[simHashPairs]] —
    * a parquet scan once the family has run) joins the narrow
    * (doc_id, source) projection twice on doc_id — pair volume, never
    * corpus², drives the cost. */
  def qNearDupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = simHashPairs(s, dir)
    val src = Tables.documents(s, dir).select($"doc_id", $"source")
    pairs
      .join(src.select($"doc_id".as("d1"), $"source".as("s1")), Seq("d1"))
      .join(src.select($"doc_id".as("d2"), $"source".as("s2")), Seq("d2"))
      .select(least($"s1", $"s2").as("src_a"), greatest($"s1", $"s2").as("src_b"),
        $"hamming")
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_pairs"), min($"hamming").as("min_hamming"))
      .orderBy($"src_a", $"src_b")
  }

  /** Oracle: brute-force pairs + the same canonicalized rollup. */
  val qNearDupSourceMatrixSql: String =
    s"""WITH $simHashSigCtes,
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimHamMax)
       SELECT LEAST(da.source, db.source) AS src_a,
         GREATEST(da.source, db.source) AS src_b,
         COUNT(*) AS n_pairs, CAST(MIN(hamming) AS INT) AS min_hamming
       FROM pr
       JOIN documents da ON da.doc_id = pr.d1
       JOIN documents db ON db.doc_id = pr.d2
       GROUP BY 1, 2 ORDER BY src_a, src_b"""

  /** SimHash signature CTE block (`sigs(doc_id, simhash)`) — shared by
    * the q30 and q106 oracles so they cannot drift. */
  private def simHashSigCtes: String =
    s"""words AS (
         SELECT doc_id, word, COUNT(*) AS tf FROM (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
           FROM documents) t
         WHERE word != '' GROUP BY doc_id, word),
       wh AS (
         SELECT doc_id, tf,
           ${polyHashSql("word", 31, PolyMod1)} * 1073741824 +
           ${polyHashSql("word", 131, PolyMod2)} AS wh
         FROM words),
       bits AS (
         SELECT doc_id, j,
           SUM(CASE WHEN (wh >> CAST(j AS INT)) & 1 = 1 THEN tf ELSE -tf END) AS v
         FROM wh CROSS JOIN (SELECT unnest(generate_series(0, ${SimBits - 1})) AS j) g
         GROUP BY doc_id, j),
       sigs AS (
         SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id)"""

  /** Oracle: all-pairs hamming scan (the oracle needn't be fast; the
    * banded Spark plan is provably equivalent for hamming ≤ 6). */
  val qSimHashSql: String =
    s"""WITH $simHashSigCtes
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimHamMax
       ORDER BY d1, d2"""

  // --- Delta (new-batch vs lake) dedup admission ---------------------

  /** The deterministic stand-in for a date partition: every 4th doc is
    * "the new batch", the rest are "the lake". */
  private val DeltaMod = 4L

  /** q106 — DELTA near-dup admission, the shape a production pipeline
    * actually runs every ingest cycle (q30 is the one-time backfill;
    * day N+1 only needs new×lake, never lake×lake again): each
    * new-batch doc checked against the existing lake's SimHash set,
    * emitting the admission verdict — nearest qualifying lake doc
    * (min (hamming, id)), its distance, and is_dup at the q30
    * threshold.
    *
    * Plan shape: ONE signature pass over the corpus (both sides derive
    * from it — 8-byte rows); the asymmetric BANDED join (the q30
    * minimal 7-band cover: ≤6 differing bits ⇒ ≥1 shared band) keys
    * candidates on (band, bkey) so cost is Σ bucket_new·bucket_lake
    * per band — proportional to the DELTA, not the lake square. The
    * batch form of [[graft.streaming.StreamOps.nearDupGate]]'s
    * broadcast; at a billion-doc lake the band join replaces the
    * broadcast, which is exactly what this operator demonstrates.
    *
    * The signature pass is NOT re-run here: both sides scan the
    * once-per-corpus signature lake ([[sigLakes]]) — the production
    * shape, where day N+1's job joins the delta against the persisted
    * signature artifact rather than recomputing the lake's. */
  def qDeltaDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sigs = simHashSigLake(s, dir)
    def banded(df: DataFrame, side: String): DataFrame =
      df.select(col("doc_id").as(side), col("simhash").as(s"${side}_sig"),
          explode(expr(Hamming.bandStructsExpr("simhash", SimBands))).as("bb"))
        .select(col(side), col(s"${side}_sig"), col("bb.band"), col("bb.bkey"))
    val lake = banded(sigs.filter($"doc_id" % DeltaMod =!= 0), "l")
    val fresh = banded(sigs.filter($"doc_id" % DeltaMod === 0), "n")
    // Hamming is computed and filtered BEFORE the distinct: the sigs
    // already ride on the joined row, so the distinct's shuffle only
    // carries the ≤ SimHamMax survivors (band-collision pairs that
    // fail the cut — the vast majority at scale — never shuffle).
    // distinct on (n, l, hamming) ≡ distinct on (n, l): hamming is a
    // pure function of the pair's two fixed signatures.
    val best = fresh.join(lake, Seq("band", "bkey"))
      .withColumn("hamming", expr("bit_count(n_sig ^ l_sig)").cast("int"))
      .filter($"hamming" <= SimHamMax)
      .select($"n", $"l", $"hamming").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy($"n").orderBy($"hamming", $"l")))
      .filter($"rk" === 1)
      .select($"n".as("doc_id"), $"l".as("dup_of"), $"hamming")
    sigs.filter($"doc_id" % DeltaMod === 0).select($"doc_id")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"dup_of", $"hamming", $"dup_of".isNotNull.as("is_dup"))
      .orderBy($"doc_id")
  }

  /** Oracle: the SHARED signature CTEs + brute-force new×lake hamming
    * (the banded Spark plan is pigeonhole-equivalent at ≤ 6). */
  val qDeltaDedupSql: String =
    s"""WITH $simHashSigCtes,
       fresh AS (SELECT doc_id, simhash FROM sigs WHERE doc_id % $DeltaMod = 0),
       lake AS (SELECT doc_id, simhash FROM sigs WHERE doc_id % $DeltaMod != 0),
       cand AS (
         SELECT f.doc_id, l.doc_id AS dup_of,
           CAST(bit_count(xor(f.simhash, l.simhash)) AS INT) AS hamming
         FROM fresh f JOIN lake l
           ON bit_count(xor(f.simhash, l.simhash)) <= $SimHamMax),
       best AS (
         SELECT doc_id, dup_of, hamming FROM (
           SELECT doc_id, dup_of, hamming,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hamming, dup_of) AS rk
           FROM cand) t
         WHERE rk = 1)
       SELECT f.doc_id, b.dup_of, b.hamming, b.dup_of IS NOT NULL AS is_dup
       FROM fresh f LEFT JOIN best b USING (doc_id)
       ORDER BY f.doc_id"""

  /** q139 — INCREMENTAL pair-lake MAINTENANCE, the day-N+1 update that
    * keeps the q30 artifact current without ever re-running the
    * backfill: the maintained set = day-N pairs (lake×lake, computed
    * once and carried forward — here rebuilt over the lake partition
    * to stand in for the carried artifact) ∪ the delta's two new
    * slices, new×lake (q106's asymmetric banded join) and new×new
    * (banded over the delta alone). Partition algebra makes the union
    * PROVABLY complete — every pair is (old,old), (old,new) or
    * (new,new) — and the 7-band pigeonhole makes each slice exact at
    * hamming ≤ 6, so the maintained lake must equal a from-scratch
    * backfill row-for-row… which is precisely what the oracle checks:
    * q139 shares q30's full-recompute SQL. Cost: the carried slice is
    * a scan; the delta slices are Σ bucket_new·(bucket_lake+bucket_new)
    * — proportional to the delta, never the lake square. */
  def qIncrementalPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = simHashSigLake(s, dir)
    val lakeS = sigs.filter($"doc_id" % DeltaMod =!= 0)
    val newS = sigs.filter($"doc_id" % DeltaMod === 0)
    val dayN = Hamming.bandedPairsAt(lakeS, "simhash", SimBands, SimHamMax)
    // new×lake: the q106 asymmetric banded join, emitted as canonical
    // (min, max) pairs with the same hamming column
    def banded(df: DataFrame, side: String): DataFrame =
      df.select(col("doc_id").as(side), col("simhash").as(s"${side}_sig"),
          explode(expr(Hamming.bandStructsExpr("simhash", SimBands))).as("bb"))
        .select(col(side), col(s"${side}_sig"), col("bb.band"), col("bb.bkey"))
    val crossPairs = banded(newS, "n").join(banded(lakeS, "l"), Seq("band", "bkey"))
      .withColumn("hamming", expr("CAST(bit_count(n_sig ^ l_sig) AS INT)"))
      .filter($"hamming" <= SimHamMax)
      .select(least($"n", $"l").as("d1"), greatest($"n", $"l").as("d2"), $"hamming")
      .distinct()
    val newNew = Hamming.bandedPairsAt(newS, "simhash", SimBands, SimHamMax)
    dayN.unionByName(crossPairs).unionByName(newNew)
      .distinct()
      .orderBy($"d1", $"d2")
  }

  // --- Canonical doc per duplicate cluster ---------------------------

  /** q79 — the dedup DECISION stage: which doc survives each near-dup
    * cluster. q75 keeps min-id; real pipelines keep the BEST copy, so
    * this ranks each cluster's members by the q23 quality score
    * (ties → min doc_id) and keeps the winner; docs outside any
    * cluster are their own canonical. Plan: quality is ONE narrow text
    * pass over the corpus; the component map (a tiny frame — only
    * docs that survived LSH banding) broadcast-joins onto it, so the
    * corpus never shuffles for the join; the winner window then moves
    * only 24-byte (doc_id, component, quality) rows — at 100 TB that
    * is the difference between shuffling metadata and shuffling text.
    * Singleton components ride the same window (their partition is one
    * row) rather than a second corpus scan: text is the expensive
    * thing to read twice, not rows to shuffle. */
  /** The unordered q79 frame (doc_id, component, csize, quality, kept)
    * — shared by q79 and the q100 funnel (which joins it and must not
    * inherit a mid-plan sort). */
  private def clusterCanonicalFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val comp = components(s, dir)
    val q = graft.text.TextAnalysis.qualityScores(s, dir)
      .select($"doc_id", $"quality")
    val labeled = q.join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("component", coalesce($"component", $"doc_id"))
    val w = Window.partitionBy($"component")
    labeled
      .withColumn("csize", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(w.orderBy($"quality".desc, $"doc_id")))
      .select($"doc_id", $"component", $"csize", $"quality", ($"rk" === 1).as("kept"))
  }

  def qClusterCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    clusterCanonicalFrame(s, dir).orderBy($"doc_id")
  }

  /** Oracle: the q75 recursive closure for components + the shared
    * quality CTE + the same winner window. */
  val qClusterCanonicalSql: String =
    s"""WITH RECURSIVE $lshCandidateCtes,
       $closureCtes,
       qual AS (${graft.text.TextAnalysis.qualityScoresSqlCte}),
       lab AS (
         SELECT q.doc_id, COALESCE(c.component, q.doc_id) AS component, q.quality
         FROM qual q LEFT JOIN comp c ON c.doc_id = q.doc_id)
       SELECT doc_id, component,
         COUNT(*) OVER (PARTITION BY component) AS csize,
         quality,
         ROW_NUMBER() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) = 1 AS kept
       FROM lab ORDER BY doc_id"""

  // --- Leakage-safe train/eval split ---------------------------------

  /** Knuth multiplicative-hash constants for the split draw — exact
    * BIGINT arithmetic in both engines (component ≤ ~1e7 here, the
    * product stays far under 2^63; at larger id spaces swap in a
    * modular fold like [[polyHashExpr]]'s). */
  private val SplitMul = 2654435761L
  private val SplitMod = 4294967296L
  private val SplitBuckets = 10L // bucket 9 → eval: a 90/10 split

  /** q137 — LEAKAGE-SAFE train/eval split: the constructive fix for
    * what q92 audits. q70's per-doc hash split leaks whenever two
    * near-duplicate docs land on opposite sides (the eval doc is then
    * effectively in training — q92 exists to measure exactly that);
    * this operator makes the crossing set empty BY CONSTRUCTION by
    * splitting on the near-dup COMPONENT (q75's connected components
    * over LSH pairs), not the doc: side = multiplicative hash of the
    * component id, so cluster members move together and singletons
    * (component = own doc_id) spread uniformly. DedupSpec asserts the
    * q92-style crossing count against THIS split is zero.
    *
    * Plan: the component map is the once-per-corpus lake artifact
    * (tiny — only docs that survived LSH banding); it broadcast-joins
    * onto a doc_id projection, so the corpus never shuffles and no
    * text moves. The split column is one integer expression —
    * exportable as-is into any downstream filter, and the same
    * arithmetic replays exactly in the oracle's RECURSIVE closure.
    * DedupSpec pins the invariant the operator exists for: NO
    * LSH-candidate pair straddles the split. */
  def qLeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comp = components(s, dir)
    Tables.documents(s, dir).select($"doc_id")
      .join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("component", coalesce($"component", $"doc_id"))
      .withColumn("is_eval",
        (($"component" * SplitMul) % SplitMod) % SplitBuckets === (SplitBuckets - 1L))
      .select($"doc_id", $"component", $"is_eval")
      .orderBy($"doc_id")
  }

  /** Oracle: the SHARED recursive closure + the same split arithmetic. */
  val qLeakageSafeSplitSql: String =
    s"""WITH RECURSIVE $lshCandidateCtes,
       $closureCtes
       SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
         ((COALESCE(c.component, d.doc_id) * $SplitMul) % $SplitMod) % $SplitBuckets
           = ${SplitBuckets - 1L} AS is_eval
       FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
       ORDER BY d.doc_id"""

  // --- Bloom-gated decontamination -----------------------------------

  /** False-positive rate for the q80 Bloom gate. Only COST depends on
    * it (how many clean grams reach the verify join); the result never
    * does — the exact join behind the gate kills every false positive. */
  private val BloomFpp = 0.03

  /** q80 — sketch-gated decontamination: q68's semantics (flag
    * training docs sharing an n-gram with a held-out benchmark source,
    * here src18) with the broadcast exact hash set replaced by a BLOOM
    * FILTER gate + an exact verify join behind it. Why this exists as
    * its own operator: q68 broadcasts the exact 8-byte gram set, which
    * at real benchmark-suite sizes (hundreds of millions of grams) is
    * GBs per executor; the Bloom gate is ~1 byte/gram at 3% fpp, two
    * orders smaller, and no-false-negative by construction — the gate
    * passes every true hit plus an fpp-sized trickle of clean grams,
    * and the verify join (now over ~|hits| rows, NOT the corpus) runs
    * as an ordinary shuffle join with NO broadcast of the exact set
    * anywhere. Result is bit-identical to the exact plan for ANY fpp;
    * DedupSpec pins that plus the no-false-negative property. Output
    * counts DISTINCT matched grams per doc, so bloom duplicates can't
    * inflate it. */
  def qBloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.core.Resources
    val grams = gramFrame(s, dir)
    val bench = Resources.persist(grams.filter($"source" === "src18").select($"h").distinct())
    // Benchmark sets are small, so an exact count for sizing is one
    // tiny job; the sketch itself is built distributed (treeAggregate
    // under the hood) — no gram ever reaches the driver.
    val nBench = math.max(bench.count(), 1L)
    val bloom = bench.stat.bloomFilter("h", nBench, BloomFpp)
    val gate = Resources.broadcast(s, bloom)
    val mightContain = udf((h: Long) => gate.value.mightContainLong(h))
    val train = grams.filter($"source" =!= "src18").select($"doc_id", $"h")
    train.filter(mightContain($"h"))            // narrow gate: no shuffle, corpus-side
      .join(bench, Seq("h"))                    // exact verify over survivors only
      .groupBy($"doc_id")
      .agg(count_distinct($"h").as("contaminated_grams"))
      .orderBy($"doc_id")
  }

  /** Oracle: the exact formulation — the Bloom gate is invisible to
    * the result by design. */
  val qBloomDecontaminateSql: String = {
    val joins = (0 until DecontamN).map(k => s"words[i+$k]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS words
                  FROM documents),
       g AS (SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(words) - ${DecontamN - 1}),
                 i -> $joins)) AS gram
             FROM w WHERE len(words) >= $DecontamN),
       gh AS (SELECT doc_id, source, ${polyHashSql("gram", 31, PolyMod1)} AS h FROM g),
       bench AS (SELECT DISTINCT h FROM gh WHERE source = 'src18'),
       train AS (SELECT doc_id, h FROM gh WHERE source != 'src18')
       SELECT doc_id, COUNT(DISTINCT h) AS contaminated_grams
       FROM train JOIN bench USING (h)
       GROUP BY doc_id ORDER BY doc_id"""
  }

  // --- Cluster centroids (fixed-point) -------------------------------

  /** Fixed-point scale for q85: floor(x · 2^20). Floor (not round) on
    * purpose — round's half-way rule differs between engines
    * (HALF_UP vs banker's variants can disagree on exactly-.5
    * products, which float32 values scaled by a power of two CAN
    * produce); floor of an exact double is engine-independent. */
  private val CentroidFp = 1048576L

  /** q85 — duplicate-cluster embedding centroids: a representative
    * vector per near-dup cluster (the input to cluster-level
    * diversity sampling / representative selection). The core trick
    * is DETERMINISTIC distributed float aggregation: naive SUM over
    * doubles is summation-order-dependent, so two engines (or two
    * runs with different partitionings!) disagree in the last ulps.
    * Each element is instead quantized to fixed-point FIRST
    * (floor(x·2^20) — exact, per-element, order-free) and the SUM is
    * then integer-exact and commutative. Output is (component, dim,
    * n_members, fp_sum) — the quotient is left to the consumer
    * because integer-division rounding (trunc vs floor) differs
    * across engines for negative sums. Plan: the component map is
    * tiny and broadcast; embeddings explode to (doc, dim, fp) rows
    * only AFTER the broadcast semi-join prunes to clustered docs, so
    * the per-dim explosion is |clustered docs|·64, not corpus-wide;
    * one keyed aggregation ends it. */
  /** Shared quantized per-doc frame for q85/q89: (doc_id, component,
    * fp array). The quantize transform sits AFTER the broadcast join
    * on purpose: Catalyst doesn't defer projections past joins, so
    * quantizing pre-join would run the 64-element map over every
    * corpus row instead of only the clustered docs (a tiny fraction
    * at the design scale). */
  private def clusterFp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val comp = components(s, dir)
    Tables.embeddings(s, dir)
      .select($"vec_id".as("doc_id"), $"embedding")
      .join(broadcast(comp), Seq("doc_id"))
      .select($"doc_id", $"component",
        expr(s"transform(embedding, x -> cast(floor(cast(x as double) * $CentroidFp) as bigint))")
          .as("fp"))
  }

  /** Shared per-(component, dim) fixed-point sums + member count — ONE
    * definition of the centroid arithmetic so q85 and q89 (and any
    * future fixed-point-scale change) cannot drift. */
  private def clusterFpSums(fpFrame: DataFrame): DataFrame = {
    val s = fpFrame.sparkSession
    import s.implicits._
    fpFrame.select($"component", posexplode($"fp"))
      .groupBy($"component", ($"pos" + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"), sum($"col").as("fp_sum"))
  }

  def qClusterCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    clusterFpSums(clusterFp(s, dir))
      .select($"component", $"dim", $"n_members", $"fp_sum")
      .orderBy($"component", $"dim")
  }

  /** Oracle: the q75 closure + 1-based element indexing + the same
    * floor fixed-point arithmetic (float32 → double is exact in both
    * engines). */
  val qClusterCentroidsSql: String =
    s"""WITH RECURSIVE $lshCandidateCtes,
       $closureCtes,
       fp AS (
         SELECT c.component, j.dim,
           CAST(floor(CAST(e.embedding[j.dim] AS DOUBLE) * $CentroidFp) AS BIGINT) AS fp
         FROM embeddings e
         JOIN comp c ON c.doc_id = e.vec_id
         CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) j)
       SELECT component, dim, COUNT(*) AS n_members, CAST(SUM(fp) AS BIGINT) AS fp_sum
       FROM fp GROUP BY component, dim ORDER BY component, dim"""

  /** q89 — cluster medoid/diversity ranking: order each near-dup
    * cluster's members by distance to the cluster centroid (rank 1 =
    * most central = the medoid-style representative; the tail = the
    * diversity picks — both selection rules a cluster-level curation
    * step needs). Exactness device: comparing to the MEAN needs a
    * division, so compare n²·‖x − μ‖² = Σ_d (n·fp_d − Σfp_d)²
    * instead — every term an integer on q85's fixed-point values, so
    * the distance is EXACT and engine/order-independent, and the
    * per-doc fold runs inside one row-level HOF (no float
    * aggregation anywhere). Overflow bound, honestly: each term is
    * ≤ (2·n·2^20·|x|max)², so dims·(2·n·2^20·|x|max)² < 2^63 caps the
    * cluster size at n ≲ 2^27.5 / (2^20·|x|max) — ~360 members at
    * |x|max = 0.5, ~1.4k at the evenly-spread unit-norm |x|max = 1/8.
    * Past the cap Spark's long WRAPS silently while DuckDB's BIGINT
    * raises — exactly the divergence this family exists to prevent —
    * so larger clusters must drop the fixed-point scale (each bit
    * doubles the n headroom at ~6e-8 quantization loss; the scale is
    * a semantic constant, mirrored in the oracle). Plan: ONE quantize
    * pass (the shared clusterFp frame, persisted — centroid branch
    * and per-doc join both read the cache), centroid sums via the
    * SAME clusterFpSums aggregation q85 ships (n_members rides it —
    * no separate count branch, no third scan); the tiny (component,
    * n, Σfp-array) frame broadcast-joins back; the rank window moves
    * only (doc, component, dist2) rows. */
  def qClusterMedoids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.core.Resources
    val emb = Resources.persist(clusterFp(s, dir))
    val cent = clusterFpSums(emb)
      .groupBy($"component")
      .agg(max($"n_members").as("n"), // constant per component
        expr("transform(sort_array(collect_list(struct(dim, fp_sum))), t -> t.fp_sum)")
          .as("fp_sum"))
    emb.join(broadcast(cent), Seq("component"))
      .withColumn("dist2",
        expr("aggregate(zip_with(fp, fp_sum, (a, b) -> n * a - b), 0L, (acc, d) -> acc + d * d)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"component").orderBy($"dist2", $"doc_id")))
      .select($"doc_id", $"component", $"dist2", $"rank", ($"rank" === 1).as("medoid"))
      .orderBy($"doc_id")
  }

  /** Oracle: the closure + the q85 per-dim sums re-assembled in dim
    * order (`list(… ORDER BY dim)`) + the same integer fold. */
  val qClusterMedoidsSql: String =
    s"""WITH RECURSIVE $lshCandidateCtes,
       $closureCtes,
       fpv AS (
         SELECT c.component, e.vec_id AS doc_id,
           list_transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $CentroidFp) AS BIGINT)) AS fp
         FROM embeddings e JOIN comp c ON c.doc_id = e.vec_id),
       sums AS (
         SELECT component, j.dim AS dim, CAST(SUM(fp[j.dim]) AS BIGINT) AS s
         FROM fpv CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) j
         GROUP BY component, j.dim),
       cent AS (
         SELECT component, list(s ORDER BY dim) AS fp_sum FROM sums GROUP BY component),
       cnt AS (SELECT component, COUNT(*) AS n FROM fpv GROUP BY component),
       d AS (
         SELECT f.doc_id, f.component,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, 64),
               i -> (cnt.n * fp[i] - fp_sum[i]) * (cnt.n * fp[i] - fp_sum[i]))),
             (acc, x) -> acc + x) AS dist2
         FROM fpv f JOIN cent USING (component) JOIN cnt USING (component))
       SELECT doc_id, component, dist2,
         CAST(ROW_NUMBER() OVER (PARTITION BY component ORDER BY dist2, doc_id) AS INT) AS rank,
         ROW_NUMBER() OVER (PARTITION BY component ORDER BY dist2, doc_id) = 1 AS medoid
       FROM d ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_dedup_exact" -> qDedupExact,
    "q28_jaccard_neardup" -> qJaccardNearDup,
    "q29_minhash_lsh" -> qMinHashLsh,
    "q30_simhash_neardup" -> qSimHash,
    "q52_dedup_keep" -> qDedupKeep,
    "q66_lsh_verified" -> qLshVerified,
    "q68_decontaminate" -> qDecontaminate,
    "q74_dup_span_fraction" -> qDupSpanFraction,
    "q94_dup_span_removal" -> qDupSpanRemoval,
    "q98_source_overlap" -> qSourceOverlap,
    "q100_dedup_funnel" -> qDedupFunnel,
    "q106_delta_dedup" -> qDeltaDedup,
    "q108_removal_ledger" -> qRemovalLedger,
    "q109_neardup_sweep" -> qNearDupSweep,
    "q112_neardup_source_matrix" -> qNearDupSourceMatrix,
    "q125_contamination_report" -> qContaminationReport,
    "q75_dup_clusters" -> qDupClusters,
    "q79_cluster_canonical" -> qClusterCanonical,
    "q80_bloom_decontaminate" -> qBloomDecontaminate,
    "q85_cluster_centroids" -> qClusterCentroids,
    "q89_cluster_medoids" -> qClusterMedoids,
    "q92_split_leakage" -> qSplitLeakage,
    "q137_leakage_safe_split" -> qLeakageSafeSplit,
    "q139_incremental_pairs" -> qIncrementalPairs)

  val oracles: Map[String, String] = Map(
    "q27_dedup_exact" -> qDedupExactSql,
    "q28_jaccard_neardup" -> qJaccardNearDupSql,
    "q29_minhash_lsh" -> qMinHashLshSql,
    "q30_simhash_neardup" -> qSimHashSql,
    "q52_dedup_keep" -> qDedupKeepSql,
    "q66_lsh_verified" -> qLshVerifiedSql,
    "q68_decontaminate" -> qDecontaminateSql,
    "q74_dup_span_fraction" -> qDupSpanFractionSql,
    "q94_dup_span_removal" -> qDupSpanRemovalSql,
    "q98_source_overlap" -> qSourceOverlapSql,
    "q100_dedup_funnel" -> qDedupFunnelSql,
    "q106_delta_dedup" -> qDeltaDedupSql,
    "q108_removal_ledger" -> qRemovalLedgerSql,
    "q109_neardup_sweep" -> qNearDupSweepSql,
    "q112_neardup_source_matrix" -> qNearDupSourceMatrixSql,
    "q125_contamination_report" -> qContaminationReportSql,
    "q75_dup_clusters" -> qDupClustersSql,
    "q79_cluster_canonical" -> qClusterCanonicalSql,
    "q80_bloom_decontaminate" -> qBloomDecontaminateSql,
    "q85_cluster_centroids" -> qClusterCentroidsSql,
    "q89_cluster_medoids" -> qClusterMedoidsSql,
    "q92_split_leakage" -> qSplitLeakageSql,
    "q137_leakage_safe_split" -> qLeakageSafeSplitSql,
    // q139's oracle IS q30's full recompute: the incremental union
    // must equal the from-scratch pair set row-for-row
    "q139_incremental_pairs" -> qSimHashSql)
}
