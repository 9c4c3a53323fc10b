package graft.analytics

import scala.collection.concurrent.TrieMap

/** Registry of the per-dir BATCH store memos. The incremental-store
  * queries (d9/d6b/q23/q25/ov1b/knn1b/...) persist their base store in
  * a java.nio temp directory on first call and memoize the path per sf
  * dir, so repeated calls measure the steady-state delta merge — the
  * store's entire point. That memoization has two session-lifetime
  * costs this registry pays down, mirroring
  * StreamQueries.resetStreamCaches on the batch side:
  *
  *  - a long-lived session (the bench) can never COLD-measure store
  *    initialization;
  *  - the temp directories accumulate until process exit.
  *
  * [[resetBatchStoreCaches]] forgets every memo AND deletes the
  * backing temp trees (values always live under a `graft_*`
  * createTempDirectory root — local by construction, these caches
  * exist for the in-process gate/bench, not production stores, so
  * java.nio deletion is the symmetric teardown). The next call to any
  * store query re-initializes from scratch.
  */
object StoreCaches {

  // a plain list, NOT a map keyed by the memo maps: Scala maps compare
  // structurally, so two empty memos would collide as keys
  private val registered =
    new java.util.concurrent.CopyOnWriteArrayList[(TrieMap[String, String], Set[String])]

  /** Create + register a memo map, tagging the registered query names
    * that serve from it (reported via [[cachedStoreQueries]] so the
    * bench's cold-store pass knows which queries to re-run). */
  def register(queryNames: String*): TrieMap[String, String] = {
    val m = TrieMap.empty[String, String]
    registered.add((m, queryNames.toSet))
    m
  }

  /** Names of registered queries whose result depends on a memoized
    * batch store (their first call per dir pays initialization). */
  def cachedStoreQueries: Set[String] = {
    import scala.jdk.CollectionConverters._
    registered.asScala.flatMap(_._2).toSet
  }

  /** Forget every memo and delete its temp tree. */
  def resetBatchStoreCaches(): Unit = {
    import scala.jdk.CollectionConverters._
    registered.asScala.foreach { case (m, _) =>
      m.values.foreach(p => deleteRecursively(tempRoot(p)))
      m.clear()
    }
  }

  /** The NEAREST `graft_*` createTempDirectory ancestor of a memoized
    * store path (stores are written UNDER the temp root, e.g.
    * `<tmp>/cells`). Nearest, not topmost: a graft_*-named SHARED
    * ancestor (e.g. java.io.tmpdir itself pointed at a graft_-prefixed
    * scratch dir) must never become the delete target — the blast
    * radius stays one store's own temp tree. Falls back to the path
    * itself so a miss can never walk up to a shared directory. */
  private def tempRoot(p: String): java.io.File = {
    var cur = java.nio.file.Paths.get(p)
    var found: java.nio.file.Path = null
    while (cur != null && found == null) {
      if (cur.getFileName != null &&
          cur.getFileName.toString.startsWith("graft_")) found = cur
      cur = cur.getParent
    }
    (if (found != null) found else java.nio.file.Paths.get(p)).toFile
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
