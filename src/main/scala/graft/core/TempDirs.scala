package graft.core

import java.nio.file.{Files, Path}

/** Registry of process-scoped temp dirs, all recursively deleted on JVM
  * exit. The bench reruns each driver query 3+ times per round, and the
  * streaming queries need a checkpoint + result dir per run — without a
  * registry those accumulate in /tmp across rounds. Dirs stay alive for
  * the whole process (returned DataFrames read them lazily); the shutdown
  * hook reaps them.
  */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(deleteRecursively)
  }))

  /** Create a temp dir that will be recursively deleted at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Recursive delete; symlinks are removed, never followed. Best-effort:
    * a cleanup failure at shutdown must not mask the real exit status. */
  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(q => Files.deleteIfExists(q))
      catch { case _: java.io.IOException => () }
      finally s.close()
    }
}
