package graft

/** The one recursive temp-dir delete (review finding, round 16): six
  * private copies of the same helper had accumulated across the gate
  * harnesses and probes — and each was null-unsafe (`listFiles()`
  * returns null on an I/O error or a race with another deleter, which
  * the copies would NPE on instead of proceeding to delete). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }
}
