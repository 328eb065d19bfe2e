package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Process-wide registry of temp directories to delete at JVM exit.
  *
  * One shutdown hook drains the whole registry, however many temp stores a
  * long-lived multi-session process accumulates — registering a hook per
  * (session, dir) entry (the previous scheme) grows the JVM's hook set
  * without bound.
  */
object TempDirs {

  private val registry = new ConcurrentLinkedQueue[Path]()

  // lazily install exactly one hook, on first registration
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var dir = registry.poll()
      while (dir != null) {
        try Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach { p => Files.deleteIfExists(p); () }
        catch { case _: Throwable => () } // best-effort temp cleanup
        dir = registry.poll()
      }
    }))

  /** Mark `dir` (and everything under it) for deletion at JVM exit. */
  def deleteOnExit(dir: Path): Unit = {
    hookInstalled
    registry.add(dir)
    ()
  }
}
