package graft.sink

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Recursive shutdown-hook cleanup for the round-trip fixtures.
  * `File.deleteOnExit` silently no-ops on non-empty directories, so a
  * populated temp lake registered that way survives every JVM exit and
  * /tmp grows run over run. Registered paths here are walked
  * depth-first and deleted when the JVM stops. */
object TempDirs {
  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.iterator().asScala.foreach { p =>
      try {
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(q => { try Files.deleteIfExists(q) catch { case _: Throwable => () }; () })
      } catch { case _: Throwable => () }
    }
  }, "graft-tempdir-cleanup"))

  def register(p: Path): Path = { dirs.add(p); p }
}
