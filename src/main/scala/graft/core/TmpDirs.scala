package graft.core

/** Per-JVM-namespaced scratch directories for queries that round-trip
  * through the filesystem (S1 CSV/JSON/ORC round-trips, the rollup temp
  * sink). A fixed shared path would let two concurrent processes (bench +
  * verify, parallel test JVMs) overwrite each other's files between a
  * write and the lazy read; one random token per JVM isolates processes
  * while keeping re-runs within a process overwrite-cheap (no new copy per
  * invocation). The shutdown hook removes whatever this JVM created.
  */
object TmpDirs {

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"),
    s"graft-${java.util.UUID.randomUUID().toString.take(8)}")

  Runtime.getRuntime.addShutdownHook(new Thread(() => delete(root)))

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }

  /** Absolute path for a named scratch dir, unique to this JVM. */
  def scoped(name: String): String = {
    root.mkdirs()
    new java.io.File(root, name).getPath
  }
}
