package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling / pipeline-operations operators: distribution
  * drift between two slices, key-skew profiling ahead of a join, and
  * small-file compaction planning. These are the "run BEFORE you run
  * the pipeline" ops a 100 TB training-data build needs — all of them
  * reduce the full corpus to a bounded metadata frame in ONE partial-
  * aggregated pass, then do the actual analysis on that frame (bins /
  * distinct keys / file listings — orders of magnitude smaller than
  * the data by construction).
  */
object Profiling {

  /** Binned distribution drift between slice A (`isA`) and slice B
    * (the rest): Population Stability Index and the binned
    * Kolmogorov-Smirnov statistic (max |cdfA − cdfB| at bin
    * boundaries) over fixed-width bins of `valueCol`.
    *
    * Fixed bins (width `binWidth`, ids 0..nBins−1, last bin open) are
    * the scale choice: exact KS needs a global sort of both slices,
    * while binned KS/PSI is ONE groupBy over ≤ nBins keys with
    * map-side partial aggregation — the standard production drift
    * monitor. Zero-count bins are clamped to `eps` share so PSI stays
    * finite (the usual convention). Bin ids are clamped on BOTH ends
    * (`greatest(least(⌊v/w⌋, nBins−1), 0)` — values below 0 land in
    * bin 0, not a negative id outside the CDF frame), and NULL values
    * are counted EXPLICITLY rather than binned: a NULL bin key would
    * enter the totals but drop out of the bin≤bin CDF join, silently
    * biasing ks/psi. Returns one row:
    * (n_a, n_b, ks_stat, psi, n_null_a, n_null_b) — n_a/n_b and the
    * statistics cover non-NULL values only. */
  def binnedDrift(df: DataFrame, valueCol: String, isA: Column,
                  binWidth: Double, nBins: Int,
                  eps: Double = 1e-6): DataFrame =
    driftFromBins(driftBins(df, valueCol, isA, binWidth, nBins), eps)

  /** The corpus-touching HALF of [[binnedDrift]]: the one partial-
    * aggregated pass that reduces the data to ≤ nBins+1 (bin, cnt_a,
    * cnt_b) rows (the +1 is the NULL-value bin, split out by the
    * readout). Counts merge by ADDITION, so bins from slices — or
    * from streaming micro-batches held in the state store (st16) —
    * fold losslessly into the full-corpus frame, and the streaming
    * face shares ks1's oracle verbatim. */
  def driftBins(df: DataFrame, valueCol: String, isA: Column,
                binWidth: Double, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 1, "need binWidth > 0, nBins > 1")
    // Spark's least/greatest SKIP nulls (they return the extreme of
    // the non-null operands), so a bare clamp would quietly route
    // NULL values into bin nBins-1 — gate on null explicitly
    val raw = floor(col(valueCol) / binWidth)
    val bin = when(raw.isNull, lit(null).cast("long"))
      .otherwise(greatest(least(raw, lit(nBins - 1L)), lit(0L)))
    // one pass: NULL values keep their NULL bin key through the same
    // aggregate (no second scan of the data), then split by the readout
    df.select(bin.as("bin"), when(isA, 1L).otherwise(0L).as("in_a"))
      .groupBy(col("bin"))
      .agg(sum(col("in_a")).as("cnt_a"),
        sum(lit(1L) - col("in_a")).as("cnt_b"))
  }

  /** The analysis HALF of [[binnedDrift]]: KS/PSI readout over an
    * already-bounded bin frame (≤ nBins+1 rows). */
  def driftFromBins(binned0: DataFrame, eps: Double = 1e-6): DataFrame = {
    val nulls = binned0.filter(col("bin").isNull)
      .agg(coalesce(sum(col("cnt_a")), lit(0L)).as("n_null_a"),
        coalesce(sum(col("cnt_b")), lit(0L)).as("n_null_b"))
    val binned = binned0.filter(col("bin").isNotNull)
    // everything below runs on ≤ nBins rows. The prefix sums for the
    // CDFs ride a bin≤bin self-join (≤ nBins² pairs, both sides the
    // SAME aggregate subtree so the shuffle is planned once and
    // reused) — never a global window, which would route rows through
    // one partition and trip the repo-wide no-global-window audit.
    val tot = binned.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"))
    val cums = binned.select(col("bin"))
      .join(binned.select(col("bin").as("b2"), col("cnt_a"), col("cnt_b")),
        col("b2") <= col("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt_a")).as("cum_ca"), sum(col("cnt_b")).as("cum_cb"))
    binned.join(cums, "bin").crossJoin(tot)
      .withColumn("share_a",
        greatest(col("cnt_a") / col("n_a"), lit(eps)))
      .withColumn("share_b",
        greatest(col("cnt_b") / col("n_b"), lit(eps)))
      .withColumn("cum_a", col("cum_ca") / col("n_a"))
      .withColumn("cum_b", col("cum_cb") / col("n_b"))
      .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
        max(abs(col("cum_a") - col("cum_b"))).as("ks_stat"),
        sum((col("share_a") - col("share_b")) *
          log(col("share_a") / col("share_b"))).as("psi"))
      .crossJoin(nulls)
  }

  /** Key-skew profile of `keyCol` — the "look before you shuffle"
    * diagnostic that decides whether a join needs [[SkewJoin]]'s salt
    * or AQE skew handling. One groupBy-count over the data (partial
    * agg, distinct keys ≪ rows), then the summary over the key frame:
    * distinct keys, total rows, the hottest key and its share, the
    * top-`topN` keys' combined share, and the normalized key entropy
    * (1.0 = perfectly uniform; → 0 as one key dominates). Returns one
    * row: (n_keys, n_rows, hot_key, hot_share, topn_share,
    * norm_entropy). */
  def keySkewProfile(df: DataFrame, keyCol: String,
                     topN: Int = 10): DataFrame = {
    require(topN >= 1)
    val counts = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    // one pass over the key frame: key count, total rows, and the raw
    // entropy moment Σ c·ln c (H = ln N − Σ c·ln c / N — no per-key
    // share division, so no second pass and no window)
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      sum(col("c") * log(col("c"))).as("clnc"))
    // top-N keys via the bounded-heap TopKPerGroup (single group):
    // each partition keeps ≤ topN rows map-side, the final merge sees
    // partitions × topN rows — never a global row_number sort of the
    // whole key frame (corpus-sized key domains are common)
    val top = TopK.perGroup(counts.withColumn("__g", lit(1)), Seq("__g"),
      Seq(("c", true), ("k", false)), k = topN, rankName = "rnk")
    top.agg(min(when(col("rnk") === 1, col("k"))).as("hot_key"),
        max(col("c")).as("hot_cnt"),
        sum(col("c")).as("top_cnt"))
      .crossJoin(tot)
      .select(col("n_keys"), col("n_rows"), col("hot_key"),
        (col("hot_cnt") / col("n_rows")).as("hot_share"),
        (col("top_cnt") / col("n_rows")).as("topn_share"),
        when(col("n_keys") > 1,
          (log(col("n_rows")) - col("clnc") / col("n_rows")) /
            log(col("n_keys")))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Small-file compaction plan: given a FILE-METADATA frame (one row
    * per file with `partCol`, `fileCol`, `sizeCol`), assign each file
    * to a target-sized compaction bin WITHIN its partition, preserving
    * file order (so sort/cluster keys survive the rewrite): bin =
    * ⌊exclusive-prefix-sum(size) / target⌋. Each bin lands in
    * [target − maxFile, target + maxFile) bytes — the sorted-coalesce
    * plan every table-format compactor (Iceberg/Delta OPTIMIZE) uses.
    * The window runs over file METADATA (≪ data; one planner row per
    * file), partitioned by `partCol` — no global sort. */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     sizeCol: String, target: Long): DataFrame = {
    require(target > 0)
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(sizeCol)) / lit(target.toDouble)))
      .drop("__cum")
  }

  // --------------------------------------------------------------
  // Pearson-correlation MOMENT store: the classic additive
  // sufficient-statistics sketch. Inputs are exact 2-decimal doubles
  // (the testdata money/ratio columns), so DECIMAL sums make every
  // moment EXACT and order-independent: the store face's add-merge
  // and the streaming face's state-store sum are both lossless by
  // arithmetic, and the final correlation is a deterministic double
  // formula over identical exact inputs on any engine.
  // --------------------------------------------------------------

  /** One-row moment table over `cols`: n, per-column Σx and per-pair
    * (i ≤ j) Σx·y — 1 + k + k(k+1)/2 values, all DECIMAL-exact
    * (values cast to DECIMAL(18,2); products carry scale 4; sums stay
    * inside DECIMAL(38,4) through ~10¹⁶ rows at these magnitudes).
    * This is the ONE corpus pass; everything downstream — merge,
    * correlation readout — runs on this bounded frame. */
  def corrMoments(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = df.select(cols.map(c =>
      col(c).cast(DecimalType(18, 2)).as(s"__$c")): _*)
    val aggs = (cols.map(c => sum(col(s"__$c")).as(s"s_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i <= j }
        yield sum(col(s"__${cols(i)}") * col(s"__${cols(j)}"))
          .as(s"q_${cols(i)}__${cols(j)}")))
    base.agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Lossless moment merge: element-wise ADDITION of the one-row
    * frames (counts and decimal sums are exact and associative, so
    * store + delta ≡ full rebuild bit-for-bit — the q24/q27 additive
    * law applied to second-order statistics). */
  def cmAddMoments(a: DataFrame, b: DataFrame): DataFrame = {
    val colsAll = a.columns.toSeq
    require(colsAll == b.columns.toSeq,
      s"moment schemas differ: $colsAll vs ${b.columns.toSeq}")
    a.unionByName(b).agg(
      sum(col(colsAll.head)).as(colsAll.head),
      colsAll.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Pearson matrix from a moment row: for each pair,
    * corr = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)·(n·Syy − Sy²)) — the
    * moments cast to double ONCE (identical exact decimals round to
    * identical doubles on any engine) and the formula evaluated in a
    * fixed association order, so an SQL oracle reproduces the doubles
    * bit-for-bit. Returns (col_a, col_b, corr_raw) rows. */
  def corrFromMoments(moments: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val n = col("n").cast("double")
    def d(name: String) = col(name).cast("double")
    val exprs = pairs.map { case (a, b) =>
      val num = n * d(s"q_${a}__$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"q_${a}__$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"q_${b}__$b") - d(s"s_$b") * d(s"s_$b")
      (num / sqrt(va * vb)).as(s"${a}__$b")
    }
    val one = moments.select(exprs: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', `${a}__$b`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr_raw)")
  }
}
