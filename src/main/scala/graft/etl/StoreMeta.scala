package graft.etl

import org.apache.spark.sql.SparkSession

/** The `_graft_meta` sidecar shared by every bucket-partitioned store
  * (component labels, triangle edges): an integer — the bucket count —
  * frozen into the directory layout at write time. Readers/mergers
  * resolve their modulus from this file instead of trusting a caller
  * parameter, because pruning with a mismatched N silently reads the
  * wrong directories. Underscore-prefixed so parquet scans ignore it;
  * written staged + rename so a half-written sidecar can never parse
  * as a different N (the atomic-publish discipline every marker in
  * this codebase uses). */
object StoreMeta {

  private def paths(dir: String) = (
    new org.apache.hadoop.fs.Path(s"$dir/_graft_meta"),
    new org.apache.hadoop.fs.Path(s"$dir/_graft_meta.tmp"))

  /** The single-int face's value. Delegates to [[readParams]] so a
    * family-tagged sidecar that carries an `n` key still reads — and a
    * sidecar WITHOUT one fail-fasts with the map in the message instead
    * of a bare NumberFormatException. */
  def read(spark: SparkSession, dir: String): Option[Int] =
    readParams(spark, dir).map { m =>
      require(m.contains("n"),
        s"_graft_meta under $dir pins no 'n' — sidecar: $m")
      m("n").toInt
    }

  def write(spark: SparkSession, dir: String, n: Int): Unit =
    writeRaw(spark, dir, n.toString)

  private def writeRaw(spark: SparkSession, dir: String, body: String): Unit = {
    val (p, tmp) = paths(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false): Unit
    require(fs.rename(tmp, p), s"StoreMeta: publish failed under $dir")
  }

  private def readRaw(spark: SparkSession, dir: String): Option[String] = {
    val (p, tmp) = paths(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = if (fs.exists(p)) Some(p)
      else if (fs.exists(tmp)) Some(tmp) else None
    src.map { f =>
      val in = fs.open(f)
      try new String(in.readAllBytes(), "UTF-8").trim
      finally in.close()
    }
  }

  // ===== multi-parameter sidecar (the sketch-store families) =====
  //
  // The single-int face pins a layout's ONE parameter (a bucket
  // modulus, a fingerprint). The sketch stores freeze SEVERAL values
  // into their persisted artifacts at write time — KMV's k, CMS's
  // width×depth, HLL's register count + limb lane, the histogram's
  // bin width, the weighted sample's k + salt — and merging with any
  // other values silently corrupts the estimates (the exact bug class
  // the bucket-modulus pin eradicated). Serialized as sorted
  // `key=value` lines under the SAME `_graft_meta` name with the same
  // staged-publish discipline; a `family` tag stops a CMS delta from
  // merging into a KMV dir.

  /** The store's parameter map, None if no sidecar. A bare-int
    * sidecar (the single-int face) parses as Map("n" -> it), so the
    * two faces never silently shadow each other. */
  def readParams(spark: SparkSession, dir: String): Option[Map[String, String]] =
    readRaw(spark, dir).map { body =>
      body.linesIterator.filter(_.nonEmpty).map { line =>
        line.split("=", 2) match {
          case Array(k, v) => k.trim -> v.trim
          case Array(n) => "n" -> n.trim
        }
      }.toMap
    }

  def writeParams(spark: SparkSession, dir: String,
                  params: Map[String, String]): Unit = {
    require(params.nonEmpty, "StoreMeta.writeParams: empty parameter map")
    params.foreach { case (k, v) =>
      require(!k.contains("=") && !k.contains("\n") && !v.contains("\n"),
        s"StoreMeta.writeParams: unserializable entry $k=$v") }
    writeRaw(spark, dir,
      params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n"))
  }

  /** True when `dir` holds anything beyond sidecars/markers — the
    * "has data, so a missing sidecar is a pre-meta layout" probe.
    * A partition directory whose COLUMN starts with an underscore
    * (`__cb=5`) is data, not a marker — the `=` discriminates it from
    * every sidecar/marker name in this codebase (`_graft_meta`,
    * `_GRAFT_DONE`, `_SUCCESS` carry none). */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      (!n.startsWith("_") && !n.startsWith(".")) ||
        (n.contains("=") && !n.contains("__compact_"))
    }
  }

  /** Sweep the zero-row data FILES a pre-r16 (or crashed data-then-pin)
    * bootstrap left at a store root. The bucketed-novelty layout
    * (`__kb=` partition dirs) cannot coexist with root-level data files
    * — Spark's partition discovery rejects leaves at mixed depths — so
    * a day-zero path that is about to pin a bucketed store first clears
    * the stale flat schema frame. Refuses to touch a store that holds
    * actual rows: only a frame that reads as ZERO rows (pure schema,
    * no frozen state) is safe to drop. No-op when the root holds no
    * data files. */
  def sweepZeroRowBootstrap(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val dataFiles = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (dataFiles.isEmpty) return
    require(scala.util.Try(spark.read.parquet(dir).isEmpty).getOrElse(false),
      s"sweepZeroRowBootstrap: store at $dir holds rows — refusing to sweep")
    dataFiles.foreach(s => fs.delete(s.getPath, false): Unit)
  }

  /** Pin a family-tagged parameter map on a freshly-written store
    * (call it AFTER the data lands: an overwrite deletes the target
    * dir, so a leading sidecar would be wiped). */
  def pinFamily(spark: SparkSession, dir: String, family: String,
                params: Map[String, String]): Unit =
    writeParams(spark, dir, params + ("family" -> family))

  /** Resolve a family-tagged store's pinned parameters. Fail-fast on:
    * a sidecar tagged with ANOTHER family (merging across families
    * silently corrupts both), or data with no sidecar (a pre-pin
    * layout — stamp or rebuild rather than guess). An absent/empty
    * store resolves to None: the caller's parameters apply and the
    * caller pins them. */
  def requireFamily(spark: SparkSession, dir: String,
                    family: String): Option[Map[String, String]] =
    readParams(spark, dir) match {
      case Some(m) =>
        require(m.get("family").contains(family),
          s"store at $dir is pinned to family '${m.getOrElse("family", "?")}'" +
            s" but this operation expects '$family' — refusing to merge " +
            "across sketch families")
        Some(m)
      case None =>
        // A data-bearing dir can still be DAY ZERO: the empty-store
        // bootstrap (write a limit(0) parquet frame, then pin) is two
        // non-atomic steps, and a crash between them leaves zero-ROW
        // parquet files with no sidecar. Rows are the discriminator —
        // zero rows carry no frozen parameters, so re-pinning is safe
        // and the stream's own bootstrap crash window self-heals
        // instead of permanently fail-fasting against its own store.
        // The probe runs only on this (rare) path, never per call; a
        // dir whose files don't even read as parquet stays a fail.
        if (hasData(spark, dir)) {
          val zeroRows = scala.util.Try(
            spark.read.parquet(dir).isEmpty).getOrElse(false)
          require(zeroRows,
            s"$family store at $dir has data but no _graft_meta sidecar " +
              "(pre-pin layout): rebuild through its write-store face, or " +
              "stamp the sidecar with the parameters it was built with")
        }
        None
    }
}
