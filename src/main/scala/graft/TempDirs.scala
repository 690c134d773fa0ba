package graft

import java.io.File
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Process-lifetime scratch directories.
  *
  * Callers that keep a stable per-process path (so repeated passes within one
  * run reuse one copy instead of leaking a new one per invocation — e.g. the
  * q49 persisted IVF index) register it here; a single JVM shutdown hook
  * deletes every registered tree recursively on exit. Registration is
  * idempotent, so per-query code can register on every call.
  */
object TempDirs {

  private val registered = ConcurrentHashMap.newKeySet[String]()

  @volatile private var hookInstalled = false

  def register(path: String): String = {
    if (registered.add(path)) ensureHook()
    path
  }

  private def ensureHook(): Unit = synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach(p => deleteRecursively(new File(p)))
      }, "graft-tempdir-cleanup"))
      hookInstalled = true
    }
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
