package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Salted equi-join — the manual skew-split for hot join keys
  * (SURVEY §6 scale path; the technique the prompt-level design calls
  * "salting for skew").
  *
  * A hash equi-join sends every row of a key to ONE reducer, so a hot
  * key (a viral document's near-dup cluster, a mega-customer's orders)
  * turns into one straggler task that dominates the stage. Salting
  * splits it: the FACT side appends a deterministic salt in
  * [0, salts) — derived by PolyHash from a row-unique column, so
  * retries and engines agree — and the DIM side replicates each row
  * once per salt value (an explode of a literal sequence: |dim|·salts
  * rows, the knowing trade). The join key becomes (key, salt); a hot
  * key's rows now spread across `salts` reducers, and the result
  * multiset is EXACTLY the plain join's (each fact row meets its dim
  * row in exactly one salt lane — SkewJoinSpec proves set equality and
  * the ≤1/salts-per-lane split on a planted 90%-hot-key fixture).
  *
  * When to reach for this instead of AQE's skew-join: AQE splits skewed
  * SORT-MERGE partitions at runtime, which covers most cases — but it
  * cannot split a skewed BROADCAST-ineligible hash aggregation feeding
  * the join, does nothing for deterministic-plan requirements (tests,
  * oracle replay), and its thresholds are cluster-tuned. Manual salting
  * is the declarative, engine-portable form of the same idea.
  */
object SkewJoin {

  /** Deterministic salt in [0, salts) from a row-unique column. */
  def saltOf(rowKey: Column, salts: Int): Column =
    pmod(PolyHash.polyHash(concat(rowKey.cast("string"), lit("skewjoin"))),
      lit(salts))

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * `rowKey` should be a fact column that is distinct-per-row (an
    * id) — a non-unique rowKey stays CORRECT (each fact row still meets
    * its dim row in exactly one lane) but concentrates a hot key's rows
    * into the few lanes its rowKey values hash to, defeating the split;
    * lane balance, not correctness, depends on rowKey uniqueness.
    * Output columns = fact ++ dim (minus dim's join key), like a plain
    * `join(dim, key)`. Neither input may already carry a `__salt`
    * column (withColumn would silently replace the fact's and the dim
    * explode would duplicate the name — checked). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 rowKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the input first")
    val f = fact.withColumn("__salt", saltOf(col(rowKey), salts))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
