package graft

import java.nio.file.Files
import graft.analytics.{SketchQueries, StoreCaches}

/** The batch store-cache registry: reset must forget every memo AND
  * delete the backing `graft_*` temp tree (so a long-lived session can
  * cold-measure store initialization and temp space never accumulates),
  * and a store query must transparently re-initialize afterwards. */
class StoreCachesSpec extends SparkSpec {

  test("reset forgets memos and deletes the graft_* temp tree") {
    val m = StoreCaches.register("fake_store_query")
    assert(StoreCaches.cachedStoreQueries.contains("fake_store_query"))
    val root = Files.createTempDirectory("graft_spec_store")
    val leaf = root.resolve("cells")
    Files.createDirectories(leaf)
    Files.writeString(leaf.resolve("part-0.parquet"), "x")
    m.put("somedir", leaf.toString) // memo points at the INNER store dir
    StoreCaches.resetBatchStoreCaches()
    assert(m.isEmpty, "memo must be cleared")
    assert(!Files.exists(root),
      "the whole graft_* temp root must be deleted, not just the leaf")
  }

  test("a path without a graft_* ancestor deletes only itself") {
    val m = StoreCaches.register()
    val dir = Files.createTempDirectory("other_spec_store")
    val leaf = dir.resolve("inner")
    Files.createDirectories(leaf)
    m.put("d", leaf.toString)
    StoreCaches.resetBatchStoreCaches()
    assert(!Files.exists(leaf) && Files.exists(dir),
      "no graft_* ancestor -> delete the memoized path only")
    Files.delete(dir)
  }

  test("a store query re-initializes identically after reset") {
    val before = SketchQueries.countMinStore(spark, sfDir).collect().toSeq
    StoreCaches.resetBatchStoreCaches()
    val after = SketchQueries.countMinStore(spark, sfDir).collect().toSeq
    assert(after === before)
  }
}
