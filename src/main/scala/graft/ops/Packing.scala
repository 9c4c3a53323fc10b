package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Sequence packing: lay documents end-to-end and chop the stream into
  * fixed-capacity training windows — concat-then-chop, the packing
  * LLM pretraining actually uses (documents split at window
  * boundaries; no padding waste, no bin-packing heuristics).
  *
  * Distributed shape: a global concatenation order would serialize the
  * corpus, so the stream is sharded into `buckets` deterministic
  * PolyHash shards first; each shard packs independently under ONE
  * partitioned window (running char offset per shard), and every
  * document explodes into the 1..few pack-slices its span covers —
  * pure arithmetic after the one window sort. Pack ids are
  * (bucket, pack_in_bucket): stable across runs, retries and engines,
  * so a resumed job never re-packs differently. ~C chars fill every
  * pack except each shard's last.
  */
object Packing {

  /** Data-size the shard count: one shard per `docsPerShard` input
    * documents (ceil), so each shard's running-offset window sorts a
    * bounded slice of the corpus no matter the input scale — a fixed
    * shard count would make each shard's cumulative sum ONE task over
    * 1/k of ALL documents at 100× the data. The count is a cheap
    * metadata-only action (parquet row counts); determinism holds
    * because the shard count is a pure function of input size, and
    * (bucket, pack) ids stay stable for a given (input, docsPerShard).
    *
    * The production default targets ~4M metadata rows (~64 MB of
    * (id, len) pairs) per shard sort; exemplars pass a small value so
    * multi-shard behavior is exercised at test scale. */
  def sizedBuckets(df: DataFrame, docsPerShard: Long = 4000000L): Int = {
    require(docsPerShard > 0)
    val n = df.count()
    math.max(1L, (n + docsPerShard - 1) / docsPerShard).toInt
  }

  /** Assign each document's span to its covering packs.
    * Emits one row per (doc, pack) slice:
    * bucket, pack_id (within bucket), slice_start (offset in doc),
    * slice_len; a doc shorter than `capacity` usually lands in one
    * pack, docs straddling a boundary split. Zero-length docs emit
    * one zero-length slice (kept: every doc must appear in the
    * manifest).
    *
    * `buckets` must be sized to the input — use [[sizedBuckets]]
    * (there is deliberately no fixed default: a constant shard count
    * doesn't survive a 100× scale-up, see PERFORMANCE.md). */
  def packSlices(df: DataFrame, idCol: String, lenCol: String,
                 capacity: Int, buckets: Int,
                 salt: String = "p1"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val bucket = pmod(
      PolyHash.polyHash(concat(col(idCol).cast("string"), lit(salt))),
      lit(buckets))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSpan = df
      .withColumn("bucket", bucket)
      .withColumn("__end", sum(col(lenCol)).over(w))
      .withColumn("__start", col("__end") - col(lenCol))
    // floor, not cast: double→long CAST truncates in Spark but ROUNDS
    // in DuckDB — floor first makes both engines agree exactly
    val firstPack = floor(col("__start") / capacity)
    // a zero-length doc still occupies "position __start": one slice
    val lastPack = greatest(firstPack, floor((col("__end") - 1) / capacity))
    withSpan
      .withColumn("pack_id", explode(sequence(firstPack, lastPack)))
      .withColumn("slice_start",
        greatest(col("pack_id") * capacity, col("__start")) - col("__start"))
      .withColumn("slice_len",
        least((col("pack_id") + 1) * capacity, col("__end"))
          - greatest(col("pack_id") * capacity, col("__start")))
      .drop("__start", "__end")
  }

  /** Overlapping fixed-window chunker — the RAG-ingest counterpart of
    * [[packSlices]]'s concat-then-chop: each document independently
    * yields chunks of `chunkChars` starting every `strideChars`
    * (stride < chunk ⇒ the overlap that keeps a retrieval hit's
    * context intact across a boundary). Chunk count is
    * ceil(max(n − chunk, 0) / stride) + 1 — the minimal covering set —
    * and ids/offsets are pure per-doc arithmetic: no window, no
    * shuffle, chunks inherit the document partitioning (at 100 TB this
    * is a map-only explode whose output feeds the embedding stage
    * directly). Returns (id, chunk_id, chunk_start, chunk_len,
    * chunk_text); offsets 0-based, text via 1-based substring. */
  def overlappingChunks(df: DataFrame, idCol: String, textCol: String,
                        chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars >= 1 && strideChars >= 1 && strideChars <= chunkChars,
      s"need 1 <= stride <= chunk, got chunk=$chunkChars stride=$strideChars")
    df.select(col(idCol), col(textCol).as("__t"),
        length(col(textCol)).cast("long").as("__n"))
      .filter(col("__n") >= 1)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        ceil(greatest(col("__n") - chunkChars, lit(0L)).cast("double")
          / strideChars).cast("long"))))
      .withColumn("chunk_start", col("chunk_id") * strideChars)
      .withColumn("chunk_len",
        least(lit(chunkChars.toLong), col("__n") - col("chunk_start")))
      .withColumn("chunk_text",
        substring(col("__t"), (col("chunk_start") + 1).cast("int"),
          lit(chunkChars)))
      .drop("__t", "__n")
  }
}
