package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Native graft_dot ≡ the HOF fold it replaces, bit-for-bit, plus
  * codegen/null behavior. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"

  test("graft_dot matches the HOF fold exactly on random vectors") {
    VectorExpressions.register(spark)
    val rnd = new Random(7)
    val rows = (1 to 200).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native", expr("graft_dot(a, b)"))
      .withColumn("fold", expr(hof))
    val bad = df.filter($"native" =!= $"fold").count()
    assert(bad == 0, "IEEE summation order must be identical")
  }

  test("graft_dot survives whole-stage codegen (no interpreter fallback crash)") {
    VectorExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .filter(expr("graft_dot(a, b)") > 0)
    assert(df.count() == 1)
    assert(df.select(expr("graft_dot(a, b)")).head().getDouble(0) == 32.0)
  }

  test("null array -> null result") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(expr("graft_dot(a, b)")).head().isNullAt(0))
  }

  test("graft_polyhash matches the HOF char fold exactly") {
    VectorExpressions.register(spark)
    val rnd = new Random(11)
    val texts = (1 to 100).map(_ =>
      (1 to rnd.nextInt(30) + 1).map(_ => (' ' + rnd.nextInt(94)).toChar).mkString)
    val df = texts.toDF("t")
      .withColumn("native", expr("graft_polyhash(t, 31L, 1000000007L)"))
      .withColumn("fold", expr(
        "aggregate(transform(split(t, ''), c -> ascii(c)), 0L, (acc, x) -> (acc*31 + x) % 1000000007)"))
    assert(df.filter($"native" =!= $"fold").count() == 0)
  }

  test("graft_polyhash folds code points, not UTF-16 units (non-BMP parity)") {
    VectorExpressions.register(spark)
    // emoji = one fold step with the code point (0x1F600), exactly as
    // split('')/ascii sees it — not two surrogate-half steps
    val df = Seq("a😀b", "😀", "héllo ✓ 🎉").toDF("t")
      .withColumn("native", expr("graft_polyhash(t, 31L, 1000000007L)"))
      .withColumn("fold", expr(
        "aggregate(transform(split(t, ''), c -> ascii(c)), 0L, (acc, x) -> (acc*31 + x) % 1000000007)"))
    assert(df.filter($"native" =!= $"fold").count() == 0)
    // and the exact value for the single-emoji case: one step = cp % mod
    val one = df.filter($"t" === "😀").select($"native").head().getLong(0)
    assert(one == 0x1F600L)
  }

  test("graft_shingle_hashes == graft_polyhash of the concat_ws string, every position") {
    VectorExpressions.register(spark)
    val rnd = new Random(7)
    // random word arrays incl. non-BMP words and 1-char words; n = 3
    val rows = (1 to 60).map { _ =>
      val m = rnd.nextInt(8) // 0..7 words: exercises the < n empty case
      (1 to m).map(_ => (1 to rnd.nextInt(6) + 1).map(_ =>
        if (rnd.nextInt(10) == 0) "😀" else ('a' + rnd.nextInt(26)).toChar.toString).mkString)
        .toSeq
    }
    val df = rows.toDF("words")
      .withColumn("fused", expr("graft_shingle_hashes(words, 3, 31L, 1000000007L)"))
      .withColumn("viaStrings", expr(
        """CASE WHEN size(words) >= 3 THEN
             transform(sequence(1, size(words)-2),
               i -> graft_polyhash(concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2)), 31L, 1000000007L))
           ELSE CAST(array() AS array<bigint>) END"""))
    assert(df.filter(expr("fused != viaStrings")).count() == 0)
    assert(df.filter(expr("size(fused) > 0")).count() > 0)
  }

  test("float arrays cast to double arrays then dot") {
    VectorExpressions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, Sf0001)
    val v = emb.select(
      expr("graft_dot(cast(embedding as array<double>), cast(embedding as array<double>))")
        .as("nn")).head().getDouble(0)
    assert(v > 0.0)
  }
}
