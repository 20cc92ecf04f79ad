package graft.core

/** The portable polynomial string fold — ONE scalar implementation of
  * the hash every portability-critical path shares: the codegen'd
  * [[graft.expr.PolyHash]] expression (its interpreted eval), the
  * deterministic fake embedder ([[graft.service.Service]]), and the
  * scalar SimHash ([[graft.dedup.Dedup.simHash64]]). Steps over CODE
  * POINTS (not UTF-16 units) so surrogate pairs count once, matching
  * `split(s,'')`/`ascii` semantics in both Spark and DuckDB; every
  * intermediate stays < 2^35 so DuckDB BIGINT replays it exactly.
  * Centralized so a future tweak (overflow, surrogate handling) cannot
  * silently diverge the copies.
  */
object Hashing {
  def polyFold(s: String, base: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}
