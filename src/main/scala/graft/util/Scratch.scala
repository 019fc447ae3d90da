package graft.util

import java.io.File

/** Scratch directories for the bench/probe mains.
  *
  * Every creation registers a JVM shutdown hook as a backstop, but callers
  * still delete eagerly (try/finally) once the JSON is emitted: a long soak
  * session runs many child JVMs, and leaked `/tmp/graft-*` roots (~GBs/day)
  * can fill /tmp and fail unrelated runs (VERDICT r6 defect #1).
  */
object Scratch {

  def deleteRecursively(path: String): Unit = deleteRecursively(new File(path))

  def deleteRecursively(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Create a temp dir under java.io.tmpdir, deleted at JVM exit. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    sys.addShutdownHook(deleteRecursively(d))
    d.getPath
  }
}
