package graft.sources

/** Per-source-dir cache roots for engine-built derived tables (the IVF
  * centroid index, lakehouse rewrites of the testdata tables).
  *
  * Roots are keyed by the source file's (path, size, mtime) AND the
  * builder's parameter stamp, so neither a regenerated corpus nor changed
  * build parameters can ever pair with a stale table — either simply
  * triggers a fresh build in a new root.
  *
  * Lives under the repo's own target dir (user-owned), NOT /tmp: a
  * predictable world-writable /tmp path can be pre-created (or left stale)
  * by another user, silently poisoning every query that trusts an existing
  * table there. Override with GRAFT_CACHE_DIR when a deployment has a
  * dedicated scratch volume.
  */
object TableCache {
  def baseDir: String =
    sys.env.getOrElse("GRAFT_CACHE_DIR",
      sys.props("user.dir") + "/target/graft_tables")

  // Per-root build lock: derived-table builders are multi-step (create →
  // merge → vacuum …), and several suites/queries can cold-build the same
  // root concurrently in one JVM (a regenerated corpus invalidates every
  // cached root at once). The manifest CAS already makes cross-process
  // races safe; this makes in-process builds atomic, so a reader never
  // observes a half-built version history (the CAS alone cannot stop
  // builder B reading version 1 while builder A is still committing 2).
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def locked[T](root: String)(body: => T): T =
    buildLocks.computeIfAbsent(root, _ => new Object).synchronized(body)

  def root(sourceDir: String, sourceTable: String, stamp: String): String = {
    val f = java.nio.file.Paths.get(sourceDir, s"$sourceTable.parquet")
    val id =
      if (java.nio.file.Files.exists(f))
        s"$sourceDir:${java.nio.file.Files.size(f)}:${java.nio.file.Files.getLastModifiedTime(f).toMillis}"
      else sourceDir
    val h = graft.plans.TextExpressions.md5Hex(s"$id:$stamp").take(12)
    s"$baseDir/${sourceTable}_$h"
  }
}
