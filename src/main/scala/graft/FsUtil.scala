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

  /** Best-effort GC of STALE same-prefix entries under `java.io.tmpdir` —
    * dead JVMs' leftovers (> `maxAgeMs` old; a live concurrent run's dirs
    * are minutes old and untouched, preserving concurrent-run isolation).
    * The one copy of the sweep every tmp-dir lifecycle calls (QDef fixture
    * roots, streaming staging/checkpoints, V2 sink staging) — without it a
    * long dev loop monotonically fills the tmpdir with orphaned dirs.
    * `exclude`: entries whose NAME contains this token are never swept —
    * callers whose dirs stay referenced for the life of their JVM (the V2
    * sink's committed staging) pass their applicationId token so age alone
    * can never select a live dir of THIS app. */
  def sweepStaleTmp(prefix: String, maxAgeMs: Long = 3600L * 1000L,
      exclude: String = ""): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.lastModified() < cutoff
        && (exclude.isEmpty || !f.getName.contains(exclude)))
      .foreach(deleteRecursively)
  }
}
