package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the similarity hot path (SURVEY.md
  * §2.9): `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) ->
  * acc+v)` is semantically right but higher-order functions are
  * CodegenFallback — every pair allocates a zipped array and walks two
  * lambdas interpreted. This expression generates a fused
  * multiply-add loop inside whole-stage codegen: identical
  * left-to-right IEEE summation order (oracle-stable), no per-row
  * allocation. Registered as SQL function `graft_dot` so both the
  * DataFrame and SQL surfaces reach it.
  *
  * Strictness matches the HOF chain exactly — `zip_with` pads the
  * shorter array with nulls and `null*y`/`acc+null` poison the fold —
  * so unequal lengths or a null element yield NULL here too. That
  * equivalence is what lets [[DotProductRewrite]] substitute this
  * expression for the HOF form unconditionally.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Portable polynomial string hash `graft_polyhash(str, base, mod)` —
  * the codegen'd form of the q26 fingerprint fold
  * (`aggregate(transform(split(s,''), c -> ascii(c)), 0L,
  * (acc,x) -> (acc*base + x) % mod)`), which is CodegenFallback and
  * re-walks a per-char array per row. Identical arithmetic (left fold
  * over character code points, every intermediate < 2^35 so the DuckDB
  * BIGINT oracle replays it exactly); one fused loop over the string.
  * This is the seed hash for MinHash signatures, SimHash word hashes,
  * and the deterministic embedder. */
case class PolyHash(str: Expression, base: Expression, mod: Expression)
  extends TernaryExpression with Serializable {

  override def first: Expression = str
  override def second: Expression = base
  override def third: Expression = mod

  override def checkInputDataTypes(): TypeCheckResult =
    (str.dataType, base.dataType, mod.dataType) match {
      case (StringType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, b, m) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_polyhash requires (string, bigint, bigint), got ($s, $b, $m)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  // The fold steps over CODE POINTS, not UTF-16 code units: both the
  // HOF form (split(s,'') never splits inside a surrogate pair; ascii
  // returns the code point) and DuckDB's ascii() see one step per code
  // point, so charAt iteration would diverge on non-BMP text (emoji in
  // a transcript) — two surrogate-half steps instead of one.
  override def nullSafeEval(s: Any, b: Any, m: Any): Any =
    graft.core.Hashing.polyFold(s.toString, b.asInstanceOf[Long], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b, m) => {
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $t = $s.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $t.length()) {
         |  int $cp = $t.codePointAt($i);
         |  $acc = ($acc * $b + $cp) % $m;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(str = newFirst, base = newSecond, mod = newThird)
}

/** `graft_bigram_codes(str)` — character-bigram extraction as ONE fused
  * loop producing packed bigram codes: code = cp1 * 2^21 + cp2 (code
  * points are < 2^21, so the packing is injective — two bigrams are
  * equal iff their codes are). The q24 language-ID pipeline previously
  * materialized `split(t, '')` (one 1-char string per character) and a
  * 2-char string per bigram — ~2 allocated objects per input byte
  * through explode/groupBy/join; this emits a single long[] per row
  * and everything downstream (aggregate keys, join keys, distinct)
  * hashes 8-byte longs. Steps over code points, same as [[PolyHash]],
  * so surrogate pairs count once. Empty/1-char strings yield an empty
  * array (the charBigrams CASE guard, now structural). */
case class BigramCodes(child: Expression)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_codes requires string, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bigram_codes"

  override def nullSafeEval(s: Any): Any = {
    val t = s.toString
    val codes = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    var prev = -1
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (prev >= 0) codes += (prev.toLong << 21) + cp
      prev = cp
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val prev = ctx.freshName("prev")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val k = ctx.freshName("k")
      s"""
         |java.lang.String $t = $s.toString();
         |int $n = $t.codePointCount(0, $t.length());
         |long[] $codes = new long[$n > 1 ? $n - 1 : 0];
         |int $i = 0;
         |int $k = 0;
         |int $prev = -1;
         |while ($i < $t.length()) {
         |  int $cp = $t.codePointAt($i);
         |  if ($prev >= 0) { $codes[$k] = (((long) $prev) << 21) + $cp; $k++; }
         |  $prev = $cp;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingle_hashes(words, n, base, mod)` — the polyhash of every
  * n-word shingle, computed WITHOUT materializing one shingle string
  * per position. `polyhash(concat_ws(' ', w_i..w_{i+n-1}))` satisfies
  * H(a ⧺ b) = (H(a)·base^|b| + H(b)) mod M (|b| in code points), so one
  * pass computes each word's (hash, base^len) pair and each shingle
  * composes in O(n) long ops — the MinHash signature path's
  * explode→concat→hash allocated an ~17-char string per shingle per
  * row before hashing it. Value-identical to the string form by
  * construction (spec-pinned), so the DuckDB oracles are untouched.
  * Returns an empty array when fewer than n words. */
case class ShingleHashes(words: Expression, n: Expression,
                         base: Expression, mod: Expression)
  extends QuaternaryExpression with Serializable {

  override def first: Expression = words
  override def second: Expression = n
  override def third: Expression = base
  override def fourth: Expression = mod

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, n.dataType, base.dataType, mod.dataType) match {
      case (ArrayType(StringType, _), IntegerType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (w, a, b, m) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes requires (array<string>, int, bigint, bigint), got ($w, $a, $b, $m)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  // SQL-surface robustness (the function is injected session-wide):
  // a null array element or a non-positive n yields NULL, mirroring
  // PolyHash's null discipline — never an executor NPE/AIOOBE. Note
  // this intentionally differs from concat_ws, which SKIPS nulls; the
  // shingle contract is positional, so a hole poisons the row.
  override def nullSafeEval(w: Any, nn: Any, b: Any, m: Any): Any = {
    val arr = w.asInstanceOf[ArrayData]
    val n = nn.asInstanceOf[Int]
    val base = b.asInstanceOf[Long]
    val mod = m.asInstanceOf[Long]
    if (n <= 0) return null
    val cnt = arr.numElements()
    var z = 0
    while (z < cnt) { if (arr.isNullAt(z)) return null; z += 1 }
    if (cnt < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](cnt)
    val ps = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val t = arr.getUTF8String(i).toString
      var h = 0L
      var p = 1L
      var j = 0
      while (j < t.length) {
        val cp = t.codePointAt(j)
        h = (h * base + cp) % mod
        p = (p * base) % mod
        j += Character.charCount(cp)
      }
      hs(i) = h; ps(i) = p
      i += 1
    }
    val out = new Array[Long](cnt - n + 1)
    var k = 0
    while (k <= cnt - n) {
      var acc = hs(k)
      var j = 1
      while (j < n) {
        acc = (((acc * base + 32L) % mod) * ps(k + j) + hs(k + j)) % mod
        j += 1
      }
      out(k) = acc
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, nn, b, m) => {
      val cnt = ctx.freshName("cnt")
      val hs = ctx.freshName("hs")
      val ps = ctx.freshName("ps")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $cnt = $w.numElements();
         |long[] $out = null;
         |boolean ${ev.isNull}_guard = ($nn <= 0);
         |for (int $i = 0; !${ev.isNull}_guard && $i < $cnt; $i++) {
         |  if ($w.isNullAt($i)) ${ev.isNull}_guard = true;
         |}
         |if (${ev.isNull}_guard) {
         |  ${ev.isNull} = true;
         |} else if ($cnt < $nn) {
         |  $out = new long[0];
         |} else {
         |  long[] $hs = new long[$cnt];
         |  long[] $ps = new long[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    java.lang.String $t = $w.getUTF8String($i).toString();
         |    long $h = 0L; long $p = 1L;
         |    int $j = 0;
         |    while ($j < $t.length()) {
         |      int $cp = $t.codePointAt($j);
         |      $h = ($h * $b + $cp) % $m;
         |      $p = ($p * $b) % $m;
         |      $j += java.lang.Character.charCount($cp);
         |    }
         |    $hs[$i] = $h; $ps[$i] = $p;
         |  }
         |  $out = new long[$cnt - $nn + 1];
         |  for (int $k = 0; $k <= $cnt - $nn; $k++) {
         |    long $acc = $hs[$k];
         |    for (int $j = 1; $j < $nn; $j++) {
         |      $acc = ((($acc * $b + 32L) % $m) * $ps[$k + $j] + $hs[$k + $j]) % $m;
         |    }
         |    $out[$k] = $acc;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, q: Expression): Expression =
    copy(words = f, n = s, base = t, mod = q)
}

object VectorExpressions {
  private def reg(s: SparkSession, name: String, arity: Int,
                  mk: Seq[Expression] => Expression): Unit =
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotProduct].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name takes exactly $arity arguments")
        mk(children)
      })

  /** Idempotent per-session registration of the graft SQL functions. */
  def register(s: SparkSession): Unit = {
    reg(s, "graft_dot", 2, c => DotProduct(c.head, c(1)))
    reg(s, "graft_polyhash", 3, c => PolyHash(c.head, c(1), c(2)))
    reg(s, "graft_bigram_codes", 1, c => BigramCodes(c.head))
    reg(s, "graft_shingle_hashes", 4, c => ShingleHashes(c.head, c(1), c(2), c(3)))
  }
}
