package graft

/** Small filesystem helpers shared by the Verify main and gate fixtures. */
object IoUtil {
  /** Recursive delete of a directory tree (no-op if absent). */
  def rmTree(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
