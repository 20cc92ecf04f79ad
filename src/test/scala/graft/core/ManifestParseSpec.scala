package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest LINE FORMAT is the lake's durable contract — every
  * capability (stats skipping, bloom lookups, txn high-waters, CDC,
  * schema evolution) rides tab-separated segments of a text file, and
  * a parse regression silently changes what a 100 TB lake believes it
  * contains. This spec pins the parser against hand-crafted manifests
  * (not round-trips through the writer, which would let a matched
  * encode/decode bug cancel out): segment dispatch between numeric
  * stats, base64 string stats, and bloom filters; headers; colons in
  * column and app names; and pre-header legacy lines. */
class ManifestParseSpec extends AnyFunSuite {
  import ManifestLake.{Bound, FileBloom}

  private def lakeWith(lines: Seq[String]): String = {
    val root: Path = Files.createTempDirectory("mparse")
    val mdir = root.resolve("_manifests")
    Files.createDirectories(mdir)
    Files.write(mdir.resolve("v000000000007"), lines.asJava)
    root.toString
  }

  test("mixed stats + bloom segments on one file line parse into their planes") {
    val bloom = FileBloom("doc_id", 7, Array(0x5L, 0x80000000L))
    val b64min = java.util.Base64.getEncoder.encodeToString(
      "ab:c".getBytes("UTF-8"))
    val b64max = java.util.Base64.getEncoder.encodeToString(
      "zz".getBytes("UTF-8"))
    val line = Seq(
      "source=a/f1.parquet",
      "doc_id:10:99",                 // numeric min/max
      s"tag:s64:$b64min:$b64max",     // string min/max (base64)
      bloom.encoded                   // bloom bits
    ).mkString("\t")
    val dir = lakeWith(Seq("#op:append", "#txn:app:x:42", line, "source=a/f2.parquet"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.version == 7L)
    assert(snap.files == Vector("source=a/f1.parquet", "source=a/f2.parquet"))
    assert(snap.op == "append")
    // app ids may contain ':' — the LAST colon splits the batch id
    assert(snap.txns == Map("app:x" -> 42L))
    val sts = snap.stats("source=a/f1.parquet")
    assert(sts.exists(s => s.col == "doc_id" &&
      s.min == Bound.Num(BigDecimal(10)) && s.max == Bound.Num(BigDecimal(99))))
    assert(sts.exists(s => s.col == "tag" &&
      s.min == Bound.Str("ab:c") && s.max == Bound.Str("zz")))
    val bf = snap.blooms("source=a/f1.parquet").find(_.col == "doc_id").get
    assert(bf.k == 7 && bf.bits.sameElements(bloom.bits))
    // the unannotated file carries neither stats nor blooms — and is
    // therefore never pruned
    assert(!snap.stats.contains("source=a/f2.parquet"))
    assert(!snap.blooms.contains("source=a/f2.parquet"))
  }

  test("a parsed bloom answers membership identically to its source") {
    // build a real filter, push it through encode -> manifest -> parse,
    // and compare answers value-by-value (a bit-order regression in
    // either direction flips some answer)
    val values = (0L until 300L).map(v => v * 7 + 1)
    val wanted = math.max(64L, values.length * ManifestLake.BloomBitsPerKey)
    var bits = 64L
    while (bits < wanted) bits <<= 1
    val arr = new Array[Long]((bits / 64).toInt)
    values.foreach { v =>
      val (h1, h2) = ManifestLake.BloomHash.pair(v)
      var i = 0
      while (i < ManifestLake.BloomK) {
        val pos = java.lang.Long.remainderUnsigned(
          h1 + i.toLong * h2, bits).toInt
        arr(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    val src = FileBloom("k", ManifestLake.BloomK, arr)
    val dir = lakeWith(Seq(s"p=x/f.parquet\t${src.encoded}"))
    val back = ManifestLake.latestSnapshot(dir).get.blooms("p=x/f.parquet").head
    (0L until 3000L).foreach { v =>
      assert(back.mightContain(v) == src.mightContain(v),
        s"parsed bloom disagrees with source at $v")
    }
    assert(values.forall(back.mightContain))
  }

  test("legacy pre-header manifests parse with defaults") {
    val dir = lakeWith(Seq("source=a/f1.parquet\tdoc_id:1:2"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.op == "append" && snap.txns.isEmpty && snap.schema.isEmpty
      && snap.blooms.isEmpty)
    assert(snap.stats("source=a/f1.parquet").head.col == "doc_id")
  }

  test("#ts header parses to the commit wall time; malformed degrades to absent") {
    val ok = lakeWith(Seq("#op:append", "#ts:1700000000123", "source=a/f.parquet"))
    assert(ManifestLake.latestSnapshot(ok).get.tsMillis.contains(1700000000123L))
    // hostile/corrupt value: the snapshot stays readable, it just
    // cannot be time-addressed (same rule as zero-word blooms)
    val bad = lakeWith(Seq("#op:append", "#ts:not-a-number", "source=a/f.parquet"))
    val snap = ManifestLake.latestSnapshot(bad).get
    assert(snap.tsMillis.isEmpty && snap.files.nonEmpty)
    assert(ManifestLake.snapshotAsOfTimestamp(bad, Long.MaxValue).isEmpty)
  }

  test("bucket segment parses; a column literally named 'bucket' stays a stats segment") {
    val dir = lakeWith(Seq(
      "#op:append", "#prop:bucketCol=doc_id", "#prop:bucketN=8",
      "source=a/f1.parquet\trows:10\tbucket:3\tdoc_id:1:9",
      "source=a/f2.parquet\tbucket:0",
      // 3-part "bucket:1:2" is a column named bucket with numeric
      // min/max — the 2-part dispatch must NOT swallow it
      "source=a/f3.parquet\tbucket:1:2"))
    val snap = ManifestLake.latestSnapshot(dir).get
    assert(snap.buckets == Map("source=a/f1.parquet" -> 3, "source=a/f2.parquet" -> 0))
    assert(snap.rows("source=a/f1.parquet") == 10L)
    assert(snap.stats("source=a/f3.parquet").head.col == "bucket")
    assert(snap.declaredBucket.contains(("doc_id", 8)))
    // malformed id degrades to absent, never bricks the snapshot
    val bad = lakeWith(Seq("source=a/f.parquet\tbucket:x9"))
    assert(ManifestLake.latestSnapshot(bad).get.buckets.isEmpty)
  }

  test("colon-bearing column names survive every segment kind") {
    val b64 = java.util.Base64.getEncoder.encodeToString("v".getBytes("UTF-8"))
    val bloomSeg = FileBloom("a:b", 7, Array(1L)).encoded
    val dir = lakeWith(Seq(
      s"p=x/f.parquet\ta:b:1:2\tc:d:s64:$b64:$b64\t$bloomSeg"))
    val snap = ManifestLake.latestSnapshot(dir).get
    val sts = snap.stats("p=x/f.parquet")
    assert(sts.exists(_.col == "a:b"))
    assert(sts.exists(_.col == "c:d"))
    assert(snap.blooms("p=x/f.parquet").head.col == "a:b")
  }
}
