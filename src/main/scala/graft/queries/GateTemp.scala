package graft.queries

import java.nio.file.{Files, Path}

/** Temp-dir factory for driver gates that stage input/checkpoint/sink
  * files on local disk (streaming-restart and state-lookup gates).
  *
  * Gates hand their result back as a LAZY DataFrame over these dirs, so
  * deletion cannot happen inside the gate — a single JVM shutdown hook
  * walks and removes every registered root instead, so repeated
  * bench/verify runs stop accumulating `/tmp` garbage while the data
  * stays readable for the whole driver process lifetime.
  */
object GateTemp {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { root =>
        try deleteRecursively(root)
        catch { case _: Throwable => () } // best-effort: never block exit
      }
    }, "graft-gate-temp-cleanup"))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Create a temp directory removed recursively at JVM exit. */
  def dir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
