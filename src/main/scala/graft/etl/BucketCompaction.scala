package graft.etl

import org.apache.spark.sql.SparkSession

/** In-place small-file compaction for the append-only parquet stores
  * (BM25 `postings/` term buckets, the triangle `edges/` endpoint
  * buckets, flat sidecars like the BM25 `docs/` table): every append
  * lands a new file-set inside its target dir and never rewrites
  * stored rows — exactly the property that makes the appends
  * idempotent and crash-safe, and exactly what accumulates one
  * file-set per batch forever. After 10⁴ appends a bucket read opens
  * 10⁴ footers; this folds a dir back to ONE file without changing a
  * row.
  *
  * Protocol per directory (the rebuildKnnEdges staged-swap, applied
  * dir-wise):
  *
  *  1. read the dir, write it as a single file to a staged
  *     `<name>__compact_tmp` sibling;
  *  2. park the live dir as `<name>__compact_old`;
  *  3. publish: rename tmp over the live name;
  *  4. sweep the parked dir.
  *
  * Every crash window heals on the next [[heal]]/compact call: a
  * leftover tmp with the live dir present is a stale artifact
  * (swept, recomputed); a parked dir with NO live dir is a crash
  * between park and publish — the tmp, which was fully written
  * before the park, publishes; a parked dir WITH a live dir is a
  * crash before the sweep (swept). Like rebuildKnnEdges, the
  * park→publish window is not atomic for concurrent READERS — run
  * compaction as the store's owner (the maintenance slot between
  * batches), not racing queries.
  *
  * Compaction is row-preserving by construction — one scan, one
  * write, no dedup or reorder semantics — so every store face that
  * gates on a batch oracle still gates VERBATIM over a compacted
  * store (r1c registers exactly that; CompactionSpec asserts
  * row-identity and the 1-file bound dir by dir). Partition-valued
  * dirs (`tb=5`, `eb=12`) keep their value from the DIR NAME, which
  * the swap preserves; `_graft_meta` and other root sidecars are
  * never touched, and a sidecar INSIDE a flat store dir (the
  * parameter pins of the signature/token stores) is copied into the
  * staged replacement so the pin survives the swap.
  */
object BucketCompaction {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def isData(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".") && !n.contains("__compact_")

  /** Data-file count of one dir (0 if absent) — the compaction
    * trigger and the spec's bound. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s => s.isFile && isData(s.getPath.getName))
  }

  /** Sweep/complete any crashed compaction under `parent` — called on
    * entry by [[compactDirs]] so a retry always starts from a
    * consistent store. */
  def heal(spark: SparkSession, parent: String): Unit = {
    val pp = new org.apache.hadoop.fs.Path(parent)
    val fs = fsOf(spark, pp)
    if (!fs.exists(pp)) return
    val names = fs.listStatus(pp).map(_.getPath.getName)
    names.filter(_.endsWith("__compact_old")).foreach { o =>
      val live = new org.apache.hadoop.fs.Path(pp,
        o.stripSuffix("__compact_old"))
      val tmp = new org.apache.hadoop.fs.Path(pp,
        o.stripSuffix("__compact_old") + "__compact_tmp")
      if (!fs.exists(live)) {
        // crash between park and publish: the tmp was complete before
        // the park, so publish it; if even the tmp is gone (manual
        // cleanup), restore the parked original instead
        val src = if (fs.exists(tmp)) tmp else new org.apache.hadoop.fs.Path(pp, o)
        require(fs.rename(src, live),
          s"BucketCompaction: heal publish $src -> $live failed")
      }
      val oldP = new org.apache.hadoop.fs.Path(pp, o)
      if (fs.exists(oldP)) fs.delete(oldP, true): Unit
    }
    names.filter(_.endsWith("__compact_tmp")).foreach { t =>
      // live dir present (or just restored): the tmp is stale
      val tp = new org.apache.hadoop.fs.Path(pp, t)
      if (fs.exists(new org.apache.hadoop.fs.Path(pp,
          t.stripSuffix("__compact_tmp"))) && fs.exists(tp))
        fs.delete(tp, true): Unit
    }
  }

  /** [[heal]] for a FLAT store path (a [[compactFlatStore]] target):
    * heals the store's PARENT dir, where the staged swap parks its
    * artifacts. Call at the TOP of every maintained foreachBatch body,
    * BEFORE any `fs.exists` bootstrap check or store read: a crash
    * between the swap's park and publish renames leaves the live dir
    * absent, and a body that bootstraps a fresh empty store there
    * makes the NEXT slot's heal sweep the parked full store — the
    * entire prior corpus/token/index/log state silently lost. Healing
    * first republishes the parked store, so the bootstrap check sees
    * it. Driver-side listing of one dir — per-batch noise. */
  def healAround(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (p.getParent != null) heal(spark, p.getParent.toString)
  }

  /** Compact the named child dirs of `parent` (each to one file) if
    * they hold more than `maxFiles` data files. Returns the dirs
    * actually rewritten. */
  def compactDirs(spark: SparkSession, parent: String, dirs: Seq[String],
                  maxFiles: Int = 1): Seq[String] = {
    heal(spark, parent)
    val pp = new org.apache.hadoop.fs.Path(parent)
    val fs = fsOf(spark, pp)
    dirs.filter { d =>
      dataFileCount(spark, s"$parent/$d") > maxFiles
    }.map { d =>
      val live = new org.apache.hadoop.fs.Path(pp, d)
      val tmp = new org.apache.hadoop.fs.Path(pp, s"${d}__compact_tmp")
      val old = new org.apache.hadoop.fs.Path(pp, s"${d}__compact_old")
      // 1. stage: one task per dir — a bucket is read-task-sized by
      //    the stores' data-sized bucket contract, so coalesce(1)
      //    bounds memory at one bucket, never the store
      spark.read.parquet(live.toString).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      // carry IN-DIR sidecars/markers into the staged copy (a FLAT
      // store's `_graft_meta` parameter pin lives inside the dir being
      // swapped; losing it would turn the next probe's pre-pin
      // fail-fast against the store's own owner). COPY, not move: the
      // live dir stays complete until the publish, so every crash
      // window still holds a pinned store.
      fs.listStatus(live).map(_.getPath).filter { q =>
        val n = q.getName
        n.startsWith("_graft_meta") || n == "_GRAFT_DONE"
      }.foreach { q =>
        val in = fs.open(q)
        val bytes = try in.readAllBytes() finally in.close()
        val out = fs.create(new org.apache.hadoop.fs.Path(tmp, q.getName), true)
        try out.write(bytes) finally out.close()
      }
      // 2./3./4. park, publish, sweep
      require(fs.rename(live, old),
        s"BucketCompaction: park $live -> $old failed")
      require(fs.rename(tmp, live),
        s"BucketCompaction: publish $tmp -> $live failed")
      fs.delete(old, true): Unit
      d
    }
  }

  /** Fold a FLAT append-only parquet store — a
    * [[graft.etl.Sinks.idempotentAppend]] target such as the MinHash
    * signature stores or near-dup pair logs, which land one file-set
    * per micro-batch forever — to one file, via the same staged swap
    * applied to the dir itself (parent = its enclosing dir). Returns
    * true when a rewrite happened. Row-preserving; run as the store's
    * owner between appends. */
  def compactFlatStore(spark: SparkSession, path: String,
                       maxFiles: Int = 1): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    require(p.getParent != null, s"compactFlatStore: no parent for $path")
    compactDirs(spark, p.getParent.toString, Seq(p.getName), maxFiles).nonEmpty
  }

  /** Compact every partition dir (`<partPrefix>=<value>`) of a
    * bucket-partitioned store holding more than `maxFiles` data
    * files. The dir listing is one driver-side metadata call bounded
    * by the store's bucket count (≤ 2¹⁴ by the stores' sizing caps).
    *
    * BATCHED (r16, verdict #4): the r15 pricing showed the slot cost
    * is ~0.1-0.2 s FIXED per folded dir — one Spark job each (st20:
    * ~35 dirs ≈ 6 s, 3-5× a normal batch). Here ONE job folds every
    * needing dir: a partition-pruned read of exactly those dirs,
    * clustered one output task per partition value, written to a
    * staged `__batchfold_tmp` store (1 file per dir by construction);
    * the per-dir park→publish→sweep renames are driver-side metadata
    * ops. Crash windows are the SAME per-dir windows as before — the
    * staged dir renames into the `<dir>__compact_tmp` position the
    * swap protocol (and [[heal]]) already owns, and an orphaned
    * `__batchfold_tmp` is invisible to readers (underscore-prefixed,
    * no `=`) and swept on the next call. Falls back to the per-dir
    * path for non-integer partition values (none in this codebase). */
  def compactStore(spark: SparkSession, path: String, partPrefix: String,
                   maxFiles: Int = 1): Seq[String] = {
    val pp = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, pp)
    if (!fs.exists(pp)) return Seq.empty
    heal(spark, path)
    val names = fs.listStatus(pp).map(_.getPath.getName)
      .filter(n => n.startsWith(s"$partPrefix=") && !n.contains("__compact_"))
      .toSeq.sorted
    val need = names.filter(d => dataFileCount(spark, s"$path/$d") > maxFiles)
    if (need.isEmpty) return Seq.empty
    val vals = scala.util.Try(
      need.map(_.stripPrefix(s"$partPrefix=").toInt)).toOption
    if (vals.isEmpty) return compactDirs(spark, path, need, maxFiles)
    val tmpRoot = new org.apache.hadoop.fs.Path(pp, "__batchfold_tmp")
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true): Unit
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .filter(col(partPrefix).isin(vals.get: _*))
      .repartition(col(partPrefix)) // one output task per value → 1 file/dir
      .write.mode("overwrite").partitionBy(partPrefix)
      .parquet(tmpRoot.toString)
    need.foreach { d =>
      val staged = new org.apache.hadoop.fs.Path(tmpRoot, d)
      if (fs.exists(staged)) {
        val live = new org.apache.hadoop.fs.Path(pp, d)
        val tmp = new org.apache.hadoop.fs.Path(pp, s"${d}__compact_tmp")
        val old = new org.apache.hadoop.fs.Path(pp, s"${d}__compact_old")
        // move the staged fold into the swap protocol's tmp slot, then
        // the same park→publish→sweep (and crash windows) as compactDirs
        require(fs.rename(staged, tmp),
          s"BucketCompaction: stage $staged -> $tmp failed")
        fs.listStatus(live).map(_.getPath).filter { q =>
          val n = q.getName
          n.startsWith("_graft_meta") || n == "_GRAFT_DONE"
        }.foreach { q =>
          val in = fs.open(q)
          val bytes = try in.readAllBytes() finally in.close()
          val out = fs.create(new org.apache.hadoop.fs.Path(tmp, q.getName), true)
          try out.write(bytes) finally out.close()
        }
        require(fs.rename(live, old),
          s"BucketCompaction: park $live -> $old failed")
        require(fs.rename(tmp, live),
          s"BucketCompaction: publish $tmp -> $live failed")
        fs.delete(old, true): Unit
      }
    }
    fs.delete(tmpRoot, true): Unit
    need
  }
}
