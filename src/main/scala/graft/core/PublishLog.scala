package graft.core

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-lake atomic publish — snapshot-consistent MULTI-lake reads.
  *
  * A single lake's manifest makes one table's commits atomic; a
  * training pipeline consumes SEVERAL tables whose versions must
  * cohere (the reference's writers update scores, islands and status
  * rows inside one database transaction — consumers never observe a
  * half-updated pair). The lake-side equivalent is a VERSION VECTOR:
  * writers commit each lake independently (normal CAS commits), then
  * publish the vector `{lakeDir -> version}` as one atomic record;
  * consumers who need cross-lake consistency resolve every read
  * through the CURRENT publish and see either the old vector or the
  * new one, never a mix. This is deliberately NOT a cross-lake
  * write-lock or two-phase commit: lakes stay independently writable
  * and readable (single-lake readers are unaffected), coordination
  * costs one tiny file per publish, and the publish itself is the
  * same `link(2)` CAS the manifests ride — no new trust anywhere.
  *
  * Retention contract: a published version pins nothing by itself,
  * BUT a member lake that declares `publish.coord=<coordDir>` (and
  * optionally `publish.retain=K`, default 2) has its `vacuum` protect
  * every version the newest K publish vectors name for it — so
  * automated retention can never make the CURRENT cross-lake snapshot
  * unreadable. A lake that opts out (no property) keeps the bare
  * trade: operate with vacuum retention covering the publish lag; a
  * read through a vector whose version was vacuumed fails LOUDLY
  * naming the lake and version, never serves a silently different
  * snapshot. PublishSpec pins the race, refusal, consistency and
  * retention invariants.
  *
  * Format: `coordDir/_publish/v{N}` — one text file per publish,
  * `#ts:<millis>` header plus `<lakeDir>\t<version>` lines. Like
  * manifests, records are immutable once committed.
  */
object PublishLog {

  private val PublishDir = "_publish"
  private val MaxRetries = 64

  /** How long a member lake's `_vacuum.intent` marker is trusted as
    * "a vacuum is deleting right now": [[publish]] waits for a fresh
    * marker to clear before its post-CAS re-verify; a marker older
    * than this is a crashed vacuum's leftover (no deletes in flight)
    * and is ignored rather than bricking publishes forever. */
  private[core] val VacuumIntentStaleMillis: Long = 15L * 60 * 1000

  private def pubPath(root: Path, v: Long): Path =
    root.resolve(PublishDir).resolve(f"v$v%012d")

  private def tombPath(root: Path, v: Long): Path =
    root.resolve(PublishDir).resolve(f"v$v%012d.retracted")

  /** Every committed publish sequence number, ascending — INCLUDING
    * retracted ones (sequence numbers are never reused; consumers use
    * [[liveVersions]]). */
  def versions(coordDir: String): Vector[Long] = {
    val d = Paths.get(coordDir).resolve(PublishDir)
    if (!Files.isDirectory(d)) Vector.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toLong).toVector.sorted
      finally st.close()
    }
  }

  /** Whether publish `seq` was RETRACTED: its CAS landed but the
    * post-commit re-verify found a member manifest already retired (a
    * racing vacuum) — the vector was tombstoned so no consumer can pin
    * it. */
  def isRetracted(coordDir: String, seq: Long): Boolean =
    Files.exists(tombPath(Paths.get(coordDir), seq))

  /** Sequence numbers consumers may resolve: committed and NOT
    * retracted. */
  def liveVersions(coordDir: String): Vector[Long] =
    versions(coordDir).filterNot(isRetracted(coordDir, _))

  /** Atomically publish a version vector. Each named version must be a
    * COMMITTED, still-retained manifest of its lake at publish time —
    * publishing a version nobody can read would arm a delayed failure.
    * Racing publishers CAS on the sequence number; the loser retries
    * on the next number (publishes are independent records, so unlike
    * manifest commits there is nothing to rebase). Returns the
    * committed sequence number. */
  /** Test seam: runs between the publish CAS and the post-commit
    * re-verify — the window a racing vacuum must be caught in.
    * Production value is a no-op. */
  @volatile private[core] var beforePublishVerify: () => Unit = () => ()

  def publish(coordDir: String, versions0: Map[String, Long]): Long = {
    require(versions0.nonEmpty, "publish needs at least one (lake, version)")
    versions0.foreach { case (dir, v) =>
      require(!dir.contains('\t') && !dir.contains('\n'),
        s"lake path '$dir' cannot ride a publish record")
      require(ManifestLake.snapshotAt(dir, v).isDefined,
        s"cannot publish $dir@v$v: that manifest is gone (retired by " +
          "vacuum) or was never committed")
    }
    val root = Paths.get(coordDir)
    Files.createDirectories(root.resolve(PublishDir))
    val body: java.util.List[String] =
      (Vector(s"#ts:${System.currentTimeMillis()}") ++
        versions0.toVector.sortBy(_._1).map { case (d, v) => s"$d\t$v" }).asJava
    var attempt = 0
    while (attempt < MaxRetries) {
      val next = versions(coordDir).maxOption.getOrElse(0L) + 1L
      val tmp = Files.createTempFile(root, ".pub_", ".tmp")
      Files.write(tmp, body)
      try {
        try {
          Files.createLink(pubPath(root, next), tmp)
          beforePublishVerify()
          // POST-CAS RE-VERIFY — the publisher's half of the
          // vacuum/publish handshake (the vacuum's half is its
          // `_vacuum.intent` marker + pin recheck, ManifestLake.vacuum):
          // the pre-check above ran against a snapshot a concurrent
          // vacuum may have retired between check and CAS. Each side
          // lands its intent record BEFORE checking the other's, so
          // every interleaving is caught by at least one of them:
          // - a vacuum whose deletes finished before this verify →
          //   snapshotAt fails here → the vector is TOMBSTONED and the
          //   publish throws (never returned success);
          // - a vacuum whose intent marker is live here → wait it out
          //   (its pin recheck sees this vector, or its deletes finish
          //   and the verify below catches them);
          // - a vacuum whose marker lands after this verify → its pin
          //   recheck runs later still, sees this vector, and keeps
          //   every version it names.
          // Net: a publish that RETURNS SUCCESS stays serveable forever
          // (modulo the lake's own publish.retain window).
          versions0.foreach { case (dir, v) =>
            if (!awaitNoVacuumIntent(dir)) {
              // deadline expired with the member's marker still FRESH:
              // a long-running vacuum may be mid-delete and its pin
              // read may predate this CAS — verifying under the live
              // marker could pass an instant before the delete, and a
              // success here must stay serveable FOREVER. Fail the
              // publish instead (tombstoned, so no consumer pins it).
              retract(coordDir, next)
              throw new IllegalStateException(
                s"publish v$next of $coordDir RETRACTED: a vacuum on " +
                  s"$dir held its ${ManifestLake.VacuumIntentMarker} " +
                  "marker past the verify deadline — verifying under a " +
                  "live marker could race its deletes; re-publish once " +
                  "the vacuum finishes")
            }
            if (ManifestLake.snapshotAt(dir, v).isEmpty) {
              retract(coordDir, next)
              throw new IllegalStateException(
                s"publish v$next of $coordDir RETRACTED: $dir@v$v was " +
                  "retired by a racing vacuum between the pre-check and " +
                  "the commit — the vector is tombstoned, no consumer " +
                  "can pin it; re-publish against a live version")
            }
          }
          return next
        }
        catch { case _: FileAlreadyExistsException => () }
      } finally Files.deleteIfExists(tmp)
      attempt += 1
    }
    throw new IllegalStateException(
      s"publish on $coordDir lost the CAS race $MaxRetries times")
  }

  /** How long [[publish]]'s post-CAS verify waits for a member's
    * fresh `_vacuum.intent` marker to clear before FAILING the publish
    * (it never verifies under a live marker — see the caller). Test
    * seam: PublishSpec shortens it to pin the refusal. */
  @volatile private[core] var AwaitIntentDeadlineMillis: Long = 30000L

  /** Wait (bounded) for a member lake's fresh `_vacuum.intent` marker
    * to clear: while it stands, an in-flight vacuum may be mid-delete
    * and its pin recheck may predate our CAS — verifying under it
    * could pass an instant before the delete. A marker older than
    * [[VacuumIntentStaleMillis]] is a crashed vacuum's leftover and is
    * ignored. Returns false iff the deadline expired with the marker
    * still fresh — the caller must then FAIL the publish, not verify
    * under it. */
  private def awaitNoVacuumIntent(lakeDir: String): Boolean = {
    val marker = Paths.get(lakeDir).resolve(ManifestLake.VacuumIntentMarker)
    val deadline = System.currentTimeMillis() + AwaitIntentDeadlineMillis
    def fresh(): Boolean = Files.exists(marker) &&
      (try System.currentTimeMillis() -
         Files.getLastModifiedTime(marker).toMillis < VacuumIntentStaleMillis
       catch { case _: java.io.IOException => false })
    while (fresh() && System.currentTimeMillis() < deadline) {
      Thread.sleep(20L)
    }
    !fresh()
  }

  /** Tombstone a committed publish record (idempotent): consumers
    * skip it ([[liveVersions]]/[[current]]) and [[vectorAt]] refuses
    * loudly. Written by the publisher's post-CAS verify and by a
    * vacuum whose post-delete sweep finds a vector naming a version
    * it just retired. */
  private[core] def retract(coordDir: String, seq: Long): Unit = {
    val p = tombPath(Paths.get(coordDir), seq)
    try { Files.createFile(p); () }
    catch { case _: FileAlreadyExistsException => () }
  }

  /** The current (highest LIVE) published vector, or None before the
    * first publish — retracted vectors are skipped. */
  def current(coordDir: String): Option[(Long, Map[String, Long])] =
    liveVersions(coordDir).maxOption.map(v => (v, vectorAt(coordDir, v)))

  /** A specific published vector; fails loudly if that record was
    * never committed or was RETRACTED. */
  def vectorAt(coordDir: String, seq: Long): Map[String, Long] = {
    val p = pubPath(Paths.get(coordDir), seq)
    require(Files.exists(p), s"no publish v$seq in $coordDir")
    if (isRetracted(coordDir, seq))
      throw new IllegalStateException(
        s"publish v$seq of $coordDir was RETRACTED: a member manifest " +
          "died mid-flight (racing vacuum) — resolve current() instead")
    Files.readAllLines(p).asScala.iterator
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        val i = l.lastIndexOf('\t')
        l.take(i) -> l.drop(i + 1).toLong
      }.toMap
  }

  /** Read `lakeDir` AT the current published vector — the consistent
    * multi-lake read. Two `readPublished` calls against the same
    * publish sequence observe one coherent vector regardless of
    * concurrent lake commits or newer publishes. Fails loudly when
    * the lake is not in the vector, or when its published manifest
    * was vacuumed (retention must cover the publish lag). */
  def readPublished(s: SparkSession, coordDir: String,
                    lakeDir: String): DataFrame = {
    val (seq, vec) = current(coordDir).getOrElse(
      throw new IllegalStateException(s"nothing published in $coordDir"))
    readAt(s, coordDir, seq, vec, lakeDir)
  }

  /** [[readPublished]] pinned to an explicit publish sequence — the
    * form a multi-read consumer uses: resolve `current` once, then
    * read every member lake at that one sequence. */
  def readPublishedAt(s: SparkSession, coordDir: String, seq: Long,
                      lakeDir: String): DataFrame =
    readAt(s, coordDir, seq, vectorAt(coordDir, seq), lakeDir)

  private def readAt(s: SparkSession, coordDir: String, seq: Long,
                     vec: Map[String, Long], lakeDir: String): DataFrame = {
    val v = vec.getOrElse(lakeDir, throw new IllegalArgumentException(
      s"lake $lakeDir is not in publish v$seq of $coordDir " +
        s"(members: ${vec.keys.toVector.sorted.mkString(", ")})"))
    val snap = ManifestLake.snapshotAt(lakeDir, v).getOrElse(
      throw new IllegalStateException(
        s"publish v$seq of $coordDir names $lakeDir@v$v, but that " +
          "manifest was retired by vacuum — raise vacuum retention to " +
          "cover the publish lag"))
    ManifestLake.read(s, lakeDir, Some(snap))
  }
}
