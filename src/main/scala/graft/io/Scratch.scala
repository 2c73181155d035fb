package graft.io

/** Session-scoped scratch directories: created under `java.io.tmpdir` and
  * recursively deleted at JVM exit. Operators and bench rungs that
  * materialize a full bucketed index on disk (q104's store, the
  * store_merge rungs) must not leak one per run — a round of bench
  * iteration otherwise accumulates gigabytes of orphaned stores.
  */
object Scratch {

  /** A fresh temp directory whose whole tree is deleted on JVM exit. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }
}
