package graft.util

/** Session-scratch temp directories that actually get cleaned up.
  *
  * Several queries stage state on local disk (the versioned-store
  * demos, the streaming replay harnesses, canary legs). Their result
  * DataFrames read that state LAZILY — the caller materializes after
  * the query builder returns — so an eager `finally`-delete would pull
  * the files out from under the plan. Instead every scratch dir is
  * registered with one JVM shutdown hook and deleted recursively at
  * exit: the plan stays valid for the whole session, and repeated
  * bench/verify invocations stop permanently leaking parquet copies
  * into /tmp. */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private val hookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
      finally stream.close()
    }
  }

  /** Create a temp directory deleted recursively at JVM exit. */
  def scratch(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(dir)
    if (hookArmed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach { d =>
          try deleteRecursively(d)
          catch { case _: java.io.IOException => () }
        }
      }, "graft-tempdir-cleanup"))
    dir.toString
  }
}
