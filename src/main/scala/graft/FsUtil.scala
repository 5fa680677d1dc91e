package graft

/** Recursive file-tree deletion — the one copy of the helper the tmp-path
  * and staging lifecycles share (QDef fixture roots, streaming staging and
  * checkpoint dirs, V2 sink staging). Best-effort by design: concurrent
  * deleters and already-gone entries are fine. */
object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
