package graft.core

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based randomized exercise of the manifest log under the
  * delta encoding: random interleavings of append / MoR delete / MoR
  * update / COW delete / compact / restore are replayed against an
  * in-memory model (`doc_id → n_chars`), and after EVERY commit the
  * lake must read back exactly the model — then three random retained
  * versions must time-travel to exactly their recorded models, and a
  * final vacuum must leave the latest version whole. Hand-picked
  * cases pin known shapes; this pins the interactions a case table
  * can't enumerate (a delta based on a delta based on a restore that
  * re-published DV'd files, a compact that purges mid-chain, …).
  * Seeded, so a failure replays deterministically. */
class ManifestLogModelSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Seq[Long]) =
    ids.toDF("doc_id").select($"doc_id",
      concat(lit("s"), ($"doc_id" % 2).cast("string")).as("source"),
      ($"doc_id" * 10).as("n_chars"))

  private def readModel(dir: String): Map[Long, Long] =
    ManifestLake.read(spark, dir).select($"doc_id", $"n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random op sequences: every commit and travel target reads exactly its model") {
    val rnd = new scala.util.Random(20260815L)
    for (scenario <- 1 to 4) {
      val dir = Files.createTempDirectory(s"mlog_model_$scenario")
        .resolve("lake").toString
      val model = mutable.Map.empty[Long, Long] // doc_id -> n_chars
      val byVersion = mutable.Map.empty[Long, Map[Long, Long]]
      var nextId = 0L

      def commitAndCheck(opName: String): Unit = {
        val v = ManifestLake.latestSnapshot(dir).get.version
        byVersion(v) = model.toMap
        val got = readModel(dir)
        assert(got == model.toMap,
          s"scenario $scenario after $opName at v$v: lake has ${got.size} " +
            s"rows vs model ${model.size}; diff=${(got.keySet -- model.keySet).take(5)}" +
            s"/${(model.keySet -- got.keySet).take(5)}")
      }

      // seed the lake
      ManifestLake.append(spark, dir, df(0L until 40L), "source",
        maxRecordsPerFile = 8L, statsCols = Seq("doc_id"))
      (0L until 40L).foreach(i => model(i) = i * 10)
      nextId = 40L
      commitAndCheck("seed")

      for (step <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 => // append a fresh id run
            val k = 5 + rnd.nextInt(20)
            ManifestLake.append(spark, dir, df(nextId until nextId + k), "source",
              maxRecordsPerFile = 8L, statsCols = Seq("doc_id"))
            (nextId until nextId + k).foreach(i => model(i) = i * 10)
            nextId += k
            commitAndCheck(s"append($k)")
          case 1 => // MoR delete by residue
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            val n = ManifestLake.deleteWhereDv(spark, dir, $"doc_id" % m === r)
            val hit = model.keySet.filter(_ % m == r)
            assert(n == hit.size, s"dvDelete %$m==$r: $n vs model ${hit.size}")
            hit.foreach(model.remove)
            if (n > 0) commitAndCheck(s"dvDelete(%$m==$r)")
          case 2 => // MoR update by range
            val lo = rnd.nextLong(math.max(1L, nextId))
            val hi = lo + 1 + rnd.nextInt(30)
            val n = ManifestLake.updateWhereDv(spark, dir,
              $"doc_id" >= lo && $"doc_id" < hi,
              Seq("n_chars" -> lit(-step.toLong)))
            val hit = model.keySet.filter(i => i >= lo && i < hi)
            assert(n == hit.size, s"dvUpdate [$lo,$hi): $n vs model ${hit.size}")
            hit.foreach(i => model(i) = -step.toLong)
            if (n > 0) commitAndCheck(s"dvUpdate([$lo,$hi))")
          case 3 => // COW delete by range (purges DVs it rewrites through)
            val lo = rnd.nextLong(math.max(1L, nextId))
            val hi = lo + 1 + rnd.nextInt(15)
            val n = ManifestLake.deleteWhere(spark, dir,
              $"doc_id" >= lo && $"doc_id" < hi)
            val hit = model.keySet.filter(i => i >= lo && i < hi)
            assert(n == hit.size, s"cowDelete [$lo,$hi): $n vs model ${hit.size}")
            hit.foreach(model.remove)
            if (n > 0) commitAndCheck(s"cowDelete([$lo,$hi))")
          case 4 => // compact (may no-op: burns no version then)
            ManifestLake.compact(spark, dir, "source",
              targetRecordsPerFile = 64L)
            commitAndCheck("compact")
          case 5 => // restore to a random recorded version
            val targets = byVersion.keys.toVector.sorted
            val t = targets(rnd.nextInt(targets.length))
            ManifestLake.restore(dir, t)
            model.clear(); byVersion(t).foreach { case (k, v) => model(k) = v }
            commitAndCheck(s"restore(v$t)")
        }
      }

      // time travel: three random recorded versions read their models
      val vs = byVersion.keys.toVector.sorted
      for (_ <- 1 to 3) {
        val v = vs(rnd.nextInt(vs.length))
        val snap = ManifestLake.snapshotAt(dir, v).get
        val got = ManifestLake.read(spark, dir, Some(snap))
          .select($"doc_id", $"n_chars")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == byVersion(v), s"scenario $scenario travel to v$v")
      }

      // vacuum with zero grace must keep the latest version whole
      ManifestLake.vacuum(dir, keepVersions = 2, graceMillis = 0L)
      assert(readModel(dir) == model.toMap, s"scenario $scenario post-vacuum")
    }
  }
}
