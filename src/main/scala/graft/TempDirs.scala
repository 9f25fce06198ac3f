package graft

/** Process-lifetime temp-dir registry (round-5 verdict #4: pid-scoped
  * durable-index and stream-replay dirs accumulated in /tmp, ~100 MB per
  * Verify/Bench invocation). Registered dirs are deleted by a JVM
  * shutdown hook — NOT earlier, because the DataFrames returned to
  * callers read them lazily for the rest of the process. */
object TempDirs {
  private val dirs = scala.collection.mutable.LinkedHashSet.empty[String]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.synchronized { dirs.foreach(d => deleteRec(new java.io.File(d))) }))

  def register(dir: String): Unit = {
    hookInstalled
    dirs.synchronized { dirs += dir }
    ()
  }

  private def deleteRec(f: java.io.File): Unit =
    try {
      if (f.isDirectory) {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(deleteRec)
      }
      f.delete()
      ()
    } catch { case _: Throwable => () }
}
