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

  def read(spark: SparkSession, dir: String): Option[Int] = {
    val (p, tmp) = paths(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the staged tmp is the crash fallback: a crash between the old
    // meta's delete and the rename publish must not read as absent
    val src = if (fs.exists(p)) Some(p)
      else if (fs.exists(tmp)) Some(tmp) else None
    src.map { f =>
      val in = fs.open(f)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
  }

  def write(spark: SparkSession, dir: String, n: Int): Unit = {
    val (p, tmp) = paths(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false): Unit
    require(fs.rename(tmp, p), s"StoreMeta: publish failed under $dir")
  }
}
