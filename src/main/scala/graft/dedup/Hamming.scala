package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded hamming-distance pair join — the shared scale path behind
  * SimHash near-dup (q30's sparse-regime form) and the multimodal
  * block-hash near-dup (q61). Signatures are single BIGINTs; bands of
  * `bandBits` become equi-join bucket keys.
  *
  * Exactness (pigeonhole): a pair at hamming ≤ `hamMax` has differing
  * bits in at most `hamMax` bands, so it shares at least
  * `bits/bandBits − hamMax` exact bands; as long as that is ≥ 1 the
  * any-band-equality join finds every qualifying pair, and the
  * explicit `bit_count` filter discards the false candidates —
  * provably identical output to the all-pairs scan at Σ bucket²
  * candidate cost.
  */
object Hamming {

  /** Pairs `(d1, d2, hamming)` with hamming ≤ `hamMax`, from a
    * `(doc_id, <sigCol>)` frame. Requires `bits % bandBits == 0` and
    * `bits / bandBits > hamMax` (else the pigeonhole guarantee fails
    * and the join silently under-reports). */
  def bandedPairs(sigs: DataFrame, sigCol: String,
                  bits: Int, bandBits: Int, hamMax: Int): DataFrame = {
    require(bits % bandBits == 0, s"bits=$bits not divisible by bandBits=$bandBits")
    require(bits / bandBits > hamMax,
      s"${bits / bandBits} bands cannot guarantee recall at hamming<=$hamMax")
    val s = sigs.sparkSession
    import s.implicits._
    val banded = sigs.select(col("doc_id"), col(sigCol).as("sig"))
      .select($"doc_id", $"sig", explode(expr(
        s"""transform(sequence(0, ${bits / bandBits - 1}), b ->
              struct(b AS band, shiftright(sig, b * $bandBits) & ${(1 << bandBits) - 1} AS bkey))"""))
        .as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.bkey")
    val a = banded.select($"band", $"bkey", $"doc_id".as("d1"), $"sig".as("s1"))
    val b = banded.select($"band", $"bkey", $"doc_id".as("d2"), $"sig".as("s2"))
    // hamming filter BEFORE the distinct: candidates sharing k bands
    // appear k times, so the cheap two-long bit_count prunes the
    // duplicate-heavy stream ahead of the dedup shuffle.
    a.join(b, Seq("band", "bkey")).filter($"d1" < $"d2")
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
      .filter($"hamming" <= hamMax)
      .select($"d1", $"d2", $"hamming").distinct()
  }
}
