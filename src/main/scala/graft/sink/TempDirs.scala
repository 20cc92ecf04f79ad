package graft.sink

import java.nio.file.{Files, Path}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import scala.jdk.CollectionConverters._

/** Temp-dir lifecycle for the round-trip fixtures, two layers deep:
  *
  *  - [[fresh]] (the query-facing entry point) keys dirs by prefix and
  *    deletes the PREVIOUS dir created under the same prefix in this
  *    JVM — so a long-lived session that re-invokes q63–q65/q67
  *    (PlanAuditSpec's loop + Verify + Bench in one process, or a
  *    notebook) holds at most ONE live lake per query instead of one
  *    per invocation. Same single-threaded build-run discipline as
  *    [[graft.core.Resources]]: the previous invocation's action must
  *    have completed before the query is re-built, because its plan
  *    reads the dir being reclaimed.
  *  - A shutdown hook walks whatever is still registered at JVM exit.
  *    `File.deleteOnExit` silently no-ops on non-empty directories, so
  *    a populated temp lake registered that way survives every JVM
  *    exit and /tmp grows run over run.
  */
object TempDirs {
  private val dirs = new ConcurrentLinkedQueue[Path]()
  // Keyed per (thread, prefix), matching Resources' per-thread
  // registry scope: under concurrent harnesses (each thread doing its
  // own build→run→release), one thread's fresh() must never reclaim a
  // dir another thread's still-running query reads.
  private val latestByPrefix = new ConcurrentHashMap[(Long, String), Path]()

  private def deleteTree(p: Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { try Files.deleteIfExists(q) catch { case _: Throwable => () }; () })
    } catch { case _: Throwable => () }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.iterator().asScala.foreach(deleteTree)
  }, "graft-tempdir-cleanup"))

  /** Register an externally created dir for shutdown-hook cleanup only. */
  def register(p: Path): Path = { dirs.add(p); p }

  /** Create a temp dir under `prefix` WITHOUT [[fresh]]'s per-prefix
    * reclamation — for corpus-version artifact lakes cached in a
    * process-global registry keyed by corpus dir (the Dedup signature/
    * pair/component lakes): fresh() would delete corpus A's lake the
    * moment corpus B builds under the same prefix, leaving A's
    * registry entry pointing at a vanished directory. Lifetime = JVM
    * (shutdown hook); the caller's registry bounds the count at one
    * per (prefix, corpus dir). */
  def persistent(prefix: String): Path =
    register(Files.createTempDirectory(prefix))

  /** Hard-link-copy a whole directory tree (r17): the generic
    * fixture-template clone for round-trip rows whose operator needs
    * the template's FULL manifest history (restore / CDF / SCD2 /
    * incremental-append rows — `ManifestLake.clone` links one snapshot
    * only, by design). Every regular file in `src` is `link(2)`'d into
    * the same relative position under `dst` — O(files) metadata, zero
    * data bytes — so a per-pass mutable lake stands up from a
    * per-(JVM, sf) template in milliseconds and the timed region
    * measures the operator, not fixture construction (the
    * q173/q174/q186 discipline, generalized). Safe because the engine
    * never mutates a committed file in place: commits ADD manifests,
    * DV/CDF sidecars are immutable, deletes only unlink — a clone's
    * mutation can never leak into the template through the shared
    * inodes. */
  def linkTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val out = dst.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(out)
      else if (Files.isRegularFile(p)) {
        try Files.createLink(out, p)
        catch { case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException =>
          Files.copy(p, out) // cross-device or no-hardlink FS: degrade
        }
      }
      ()
    }
  }

  /** Create a temp dir under `prefix`, reclaiming the previous dir
    * created under the same prefix in this JVM (see class doc). */
  def fresh(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    val prev = latestByPrefix.put((Thread.currentThread().getId, prefix), p)
    if (prev != null) { dirs.remove(prev); deleteTree(prev) }
    p
  }
}
