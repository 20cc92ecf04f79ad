package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{BigramCodes, DotProduct, DotProductRewrite, FindIslandsGenerator, PolyHash, ShingleHashes}

/** Library entry point for `spark.sql.extensions` (SURVEY.md §7.4:
  * custom operators register through SparkSessionExtensions, not
  * per-session imperative calls). Configure once —
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * — and every session (including thrift-server / connect sessions the
  * application never sees being built) gets:
  *
  *  - `graft_dot(a, b)` — codegen'd dot product ([[graft.expr.DotProduct]]);
  *  - `graft_polyhash(s, base, mod)` — portable polynomial string hash
  *    ([[graft.expr.PolyHash]]), the MinHash/SimHash/fingerprint seed;
  *  - `graft_bigram_codes(s)` — packed character-bigram codes
  *    ([[graft.expr.BigramCodes]]), the language-ID profile primitive;
  *  - `graft_shingle_hashes(words, n, base, mod)` — fused n-word
  *    shingle hashing ([[graft.expr.ShingleHashes]]), the MinHash
  *    signature primitive (no shingle strings materialized);
  *  - `find_islands(arr, thr, min_len)` — run-length threshold
  *    segmentation as a Generator ([[graft.expr.FindIslandsGenerator]]);
  *  - [[graft.expr.DotProductRewrite]] — optimizer rule turning the
  *    HOF `aggregate(zip_with(...))` dot-product idiom into the fused
  *    codegen'd loop, so ad-hoc SQL gets the fast path without knowing
  *    the function exists.
  *
  * The imperative `VectorExpressions.register(s)` /
  * `FindIslandsGenerator.register(s)` paths stay for callers embedding
  * the library without control over session construction; both routes
  * install the same builders and are idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], arity: Int,
                 mk: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name takes exactly $arity arguments")
        mk(children)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_dot", classOf[DotProduct], 2,
      c => DotProduct(c.head, c(1))))
    ext.injectFunction(fn("graft_polyhash", classOf[PolyHash], 3,
      c => PolyHash(c.head, c(1), c(2))))
    ext.injectFunction(fn("graft_bigram_codes", classOf[BigramCodes], 1,
      c => BigramCodes(c.head)))
    ext.injectFunction(fn("graft_shingle_hashes", classOf[ShingleHashes], 4,
      c => ShingleHashes(c.head, c(1), c(2), c(3))))
    ext.injectFunction(fn("find_islands", classOf[FindIslandsGenerator], 3,
      c => FindIslandsGenerator(c.head, c(1), c(2))))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
