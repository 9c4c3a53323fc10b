package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build from a series of
  * keyed snapshots — the warehouse-side complement of [[Cdc]]: where
  * `snapshotDiff` emits the delta BETWEEN two versions, `scd2` folds K
  * versions into the validity-interval table (`valid_from`/`valid_to`)
  * that point-in-time joins ([[TemporalJoins.asOf]]) consume. This is
  * how a training-data pipeline keeps document/license/consent
  * metadata point-in-time correct across recrawls: join each example
  * to the metadata row whose interval contains its snapshot date.
  *
  * Semantics: one output row per maximal run of consecutive versions
  * in which the key is present with unchanged values. A key absent
  * from version v has no interval covering v — deletion closes the
  * interval (`valid_to` = first absent version), and a later
  * reappearance opens a new one even if the values came back
  * identical. `valid_to` is null on rows alive in the last snapshot.
  *
  * Scale shape: snapshots union into (key, ver, values) rows — K·n
  * rows where K is the snapshot count, the input's own size, never a
  * blowup. Change detection is a 64-bit `xxhash64` digest compared to
  * its lag over one keyed window (one shuffle on the key, linear
  * per-key scan); segment fold is a groupBy on (key, segment) whose
  * clustering the window's HashPartitioning(key) already satisfies —
  * no second exchange. The digest is NULL-DISCRIMINATING: Spark's
  * hash functions silently skip null arguments, so a bare
  * `xxhash64(values)` would merge tuples that differ only in which
  * column is null ((x, null) vs (null, x)); each value column is
  * therefore preceded by its own is-null indicator in the hash
  * argument list, making the fold sequence prefix-decodable — the
  * indicator always contributes, the value only when present, so
  * distinct null patterns hash distinct (ScdSpec pins the shifted-null
  * case). Digest-equality caveat is [[Cdc]]'s verbatim: collision odds
  * ~K·n²/2⁶⁵ per key-version, and callers needing certainty re-verify
  * merged runs against payloads.
  */
object Scd {

  /** The null-discriminating value digest shared by the batch fold
    * and the streaming face ([[graft.streaming.EventStreams.scd2Stream]]):
    * each column contributes its is-null indicator ALWAYS and its
    * value only when present, so distinct null patterns hash
    * distinct (Spark's hash functions silently skip null args). */
  private[graft] def valueDigest(valueCols: Seq[String]): Column =
    xxhash64(valueCols.flatMap(c =>
      Seq(col(c).isNull.cast("int"), col(c))): _*)

  /** Fold `snapshots` (ordered oldest → newest, versions 0..K-1) into
    * an SCD2 interval table: `keyCols ++ valueCols ++ (valid_from,
    * valid_to)`. All snapshots must contain `keyCols ++ valueCols`. */
  def scd2(snapshots: Seq[DataFrame], keyCols: Seq[String],
           valueCols: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "at least one snapshot required")
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val k = snapshots.size
    val tagged = snapshots.zipWithIndex.map { case (df, i) =>
      df.select(keyCols.map(col) ++ valueCols.map(col) :+
        lit(i).as("__ver"): _*)
    }.reduce(_ unionByName _)
    val keyC: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keyC: _*).orderBy(col("__ver"))
    val prevVer = lag(col("__ver"), 1).over(w)
    val prevH = lag(col("__h"), 1).over(w)
    // a new segment starts at the key's first version, after a gap
    // (deletion + reappearance), or on a value change
    val isNew = when(prevVer.isNull, 1)
      .when(prevVer =!= col("__ver") - 1, 1)
      .when(prevH =!= col("__h"), 1)
      .otherwise(0)
    tagged
      .withColumn("__h", valueDigest(valueCols))
      .withColumn("__new", isNew)
      .withColumn("__seg",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(keyC :+ col("__seg"): _*)
      .agg(min(col("__ver")).as("valid_from"),
        max(col("__ver")).as("__last") +:
          valueCols.map(c => min(col(c)).as(c)): _*)
      .select(keyC ++ valueCols.map(col) :+ col("valid_from") :+
        when(col("__last") === k - 1, lit(null).cast("int"))
          .otherwise(col("__last") + 1).as("valid_to"): _*)
  }

  /** Point-in-time (effective-dated) join of a fact frame against an
    * SCD2 dimension: each fact row matches the dim row — at most one
    * by SCD2's non-overlapping-interval invariant — whose validity
    * interval contains the fact's version, i.e. `valid_from <= ver`
    * and (`valid_to` is null or `ver < valid_to`). LEFT join: facts
    * whose key had no interval at their version (deleted, or not yet
    * born) keep null dim columns — exactly the semantics a training
    * pipeline needs to ask "what were this document's license terms
    * AT THE CRAWL that produced this example".
    *
    * Scale shape: an equi-join on the key columns (ONE shuffle each
    * side, dim side bounded by segments-per-key — a handful, never
    * the snapshot count) with the interval containment as residual
    * join predicates, so Catalyst keeps the hash-join strategy; no
    * range explosion, no broadcast requirement, no window. */
  def pointInTimeJoin(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
                      verCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keys required")
    val d = dim.columns.foldLeft(dim)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    val keyEq = keyCols.map(k => fact(k) === d(s"__d_$k")).reduce(_ && _)
    val contains = d(s"__d_valid_from") <= fact(verCol) &&
      (d(s"__d_valid_to").isNull || fact(verCol) < d(s"__d_valid_to"))
    val dimPayload = dim.columns
      .filterNot(c => keyCols.contains(c) || c == "valid_from" || c == "valid_to")
    fact.join(d, keyEq && contains, "left")
      .select(fact.columns.map(fact(_)) ++
        dimPayload.map(c => d(s"__d_$c").as(c)): _*)
  }
}
