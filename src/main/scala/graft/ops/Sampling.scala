package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * `rand()`-based sampling is the wrong tool at scale: membership
  * changes across task retries, partitionings and engines, so
  * incremental runs resample and train/val splits leak. The standard
  * substitute is hashing a stable row key — membership becomes a pure
  * function of (key, salt), so every retry, every engine, and every
  * later pipeline run agrees row-for-row. The hash is the portable
  * [[graft.functions.PolyHash]] (native codegen; exactly reproducible
  * in the DuckDB oracle), bucketed to 1/10000 resolution.
  *
  * The salt is the experiment handle: a new salt is a fresh,
  * independent split; a fixed salt pins the split forever (what a
  * dataset card should record).
  */
object Sampling {

  val Buckets = 10000

  /** Stable bucket in [0, Buckets) from the key's string form + salt. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(PolyHash.polyHash(concat(key.cast("string"), lit(salt))), lit(Buckets))

  /** Keep a deterministic `fraction` of rows, keyed on `key`. */
  def sampleByKey(df: DataFrame, key: String, fraction: Double,
                  salt: String = "v1"): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(hashBucket(col(key), salt) < math.round(fraction * Buckets).toInt)
  }

  /** Train/val/test-style split label from cumulative fractions
    * (must sum to ≤ 1; remainder, if any, falls into the last label). */
  def splitLabel(key: Column, fractions: Seq[(String, Double)],
                 salt: String = "v1"): Column = {
    require(fractions.nonEmpty && math.round(fractions.map(_._2).sum * Buckets) <= Buckets)
    val bucket = hashBucket(key, salt)
    val cuts = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail
    val labeled = fractions.map(_._1).zip(cuts).dropRight(1)
      .foldLeft(when(lit(false), lit(null: String))) {
        case (w, (label, cut)) => w.when(bucket < cut, label)
      }
    labeled.otherwise(fractions.last._1)
  }

  /** Stratified deterministic sample: per-stratum keep fraction;
    * strata absent from the map are dropped. */
  def stratifiedSample(df: DataFrame, key: String, strataCol: String,
                       fractions: Map[String, Double],
                       salt: String = "v1"): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0))) { case (w, (stratum, f)) =>
        w.when(col(strataCol) === stratum, math.round(f * Buckets).toInt)
      }.otherwise(lit(0))
    df.filter(hashBucket(col(key), salt) < threshold)
  }

  /** Deterministic uniform draw u ∈ (0,1) from (key, salt), usable as
    * an ORDERING value. A polynomial hash of a short key is locally
    * ~linear in the trailing characters — harmless for BUCKETING
    * (everything above uses it mod 10000), fatal for ordering: u would
    * increase almost monotonically with a numeric key, and a salt
    * change would shift every row equally, leaving the order (and so
    * any top-k sample) unchanged. The quadratic finalizer
    * `(lo² + hi) mod P1` over the hash's two independent 30-bit halves
    * restores avalanche where it matters: a one-character change moves
    * `lo` by δ and the square by ~2·lo·δ mod P1 — wrapping the modulus
    * a per-row-varying number of times. lo² ≤ 2^60, exact under ANSI
    * longs and DuckDB BIGINTs alike; numerator + 0.5 and the P1
    * divisor round once in IEEE, so both engines see bit-identical u.
    */
  def uniform01(key: Column, salt: String): Column = {
    val h = PolyHash.polyHash(concat(key.cast("string"), lit(salt)))
    val lo = h.bitwiseAND(lit(PolyHash.Pack - 1))
    val hi = shiftright(h, 30)
    val mixed = pmod(lo * lo + hi, lit(PolyHash.P1))
    (mixed.cast("double") + 0.5) / PolyHash.P1.toDouble
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * exponential race, deterministic form): each row draws u from
    * [[uniform01]] and the k smallest `-ln(u)/weight` values win. Win
    * probability is proportional to weight, yet membership is exactly
    * reproducible across retries, partitionings and engines — the
    * oracle replays the identical race in SQL.
    *
    * Scale shape: no shuffle of the corpus — `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject, a bounded per-partition heap
    * plus a k·numPartitions driver merge. Weights must be
    * strictly positive (caller clamps).
    */
  def weightedSample(df: DataFrame, key: String, weight: Column, k: Int,
                     salt: String = "v1"): DataFrame = {
    require(k > 0)
    df.withColumn("__race", -log(uniform01(col(key), salt)) / weight)
      .orderBy(col("__race"), col(key))
      .limit(k)
      .drop("__race")
  }

  /** Seed a PINNED weighted-sample store (the `_graft_meta` sketch-
    * store discipline applied to the sampling family): the bottom-k
    * rows persist with k and the race salt frozen in a family-tagged
    * sidecar. The weight is a Column over the rows' own columns —
    * re-derived identically on every merge, so it needs no pin — but
    * k and salt are exactly the two parameters whose silent drift
    * corrupts a refold: a different salt is a DIFFERENT total order
    * over races (the "lossless min-k fold" argument evaporates), and
    * a different k folds into the wrong bound. Data first: the
    * overwrite deletes the target dir. */
  def writeWeightedSampleStore(df: DataFrame, key: String, weight: Column,
                               path: String, k: Int,
                               salt: String = "v1"): Unit = {
    weightedSample(df, key, weight, k, salt)
      .write.mode("overwrite").parquet(path)
    graft.etl.StoreMeta.pinFamily(df.sparkSession, path, "wsample",
      Map("k" -> k.toString, "salt" -> salt))
  }

  /** The store's pinned (k, salt) — fail-fast on a pre-pin or
    * foreign-family store. */
  def weightedSampleStoreParams(spark: org.apache.spark.sql.SparkSession,
                                path: String): (Int, String) = {
    val m = graft.etl.StoreMeta.requireFamily(spark, path, "wsample")
      .getOrElse(sys.error(s"no weighted-sample store at $path"))
    require(m.contains("k") && m.contains("salt"),
      s"weighted-sample store at $path pins no k/salt — sidecar: $m")
    (m("k").toInt, m("salt"))
  }

  /** Merge delta ROWS into the pinned store's sample: stored ∪ delta
    * re-races under the STORE's pinned (k, salt) — a foreign pin is
    * honored end to end — and explicit caller expectations that
    * disagree fail-fast instead of silently folding under the wrong
    * order. Read-only (the caller owns when the merged sample
    * replaces the stored one). */
  def mergeWeightedSampleStore(spark: org.apache.spark.sql.SparkSession,
                               path: String, deltaRows: DataFrame,
                               key: String, weight: Column,
                               expectK: Int = 0,
                               expectSalt: String = null): DataFrame = {
    val (k, salt) = weightedSampleStoreParams(spark, path)
    require(expectK <= 0 || expectK == k,
      s"weighted-sample store at $path is pinned to k=$k but the caller " +
        s"expects k=$expectK — folding mismatched sample sizes corrupts " +
        "the draw")
    require(expectSalt == null || expectSalt == salt,
      s"weighted-sample store at $path is pinned to salt='$salt' but the " +
        s"caller expects '$expectSalt' — two salts are two different race " +
        "orders; their bottom-k folds share nothing")
    weightedSample(spark.read.parquet(path).unionByName(deltaRows),
      key, weight, k, salt)
  }

  /** Token-budget mixture selection: per stratum (source/domain),
    * take documents in priority order until the cumulative token count
    * reaches the stratum's budget — the building block of a "sample N
    * tokens per domain" training-data mix (the knob published recipes
    * express in tokens, not rows). The document that CROSSES the budget
    * is included, so any non-empty stratum yields at least one row and
    * every budget is met, matching the greedy recipes.
    *
    * Scale shape: strata are FEW (domains/sources), so a bare
    * per-stratum cum-sum window is one task sorting a whole stratum —
    * measured 112× at 100× data. The fix rides [[graft.ops.TopK]]'s
    * bounded-heap operator: when every row carries ≥1 token (callers
    * filter zero-token rows; the exemplar does), the budget can cross
    * at most `budget` rows deep, so the stratum is first pruned to its
    * top-`budget` rows with MAP-SIDE heaps (no stratum-wide sort or
    * shuffle), and the window then cum-sums ≤ budget rows per stratum
    * regardless of corpus size — re-measured ~flat at 100×. Set
    * `pruneToBudgetRows = false` only if zero-token rows must be
    * selectable.
    *
    * When `idCol` is given, the prune/cum-sum pass runs METADATA-ONLY:
    * the heaps and the window see just (id, stratum, tokens, priority
    * columns) — tens of bytes per row — and the selected ids join the
    * full rows back afterwards, so map-side heap memory is
    * budget × ~32 B instead of budget × document size. Always pass it
    * when `df` carries text/payload columns (the same
    * survivors-join-back trick the corpus-build flagship uses).
    *
    * DETERMINISM CONTRACT: `priority` must be a TOTAL order of each
    * stratum (include a unique tiebreaker such as the doc id, exactly
    * as with any window spec). The cum-sum runs over a ROWS frame, so
    * with ties left undeclared both the per-row cum_tokens and the
    * heap prune's retained subset would be nondeterministic. */
  def tokenBudgetSelect(df: DataFrame, stratumCol: String, tokenCol: String,
                        priority: Seq[(String, Boolean)], budget: Long,
                        pruneToBudgetRows: Boolean = true,
                        idCol: Option[String] = None): DataFrame = {
    require(budget > 0 && budget <= Int.MaxValue && priority.nonEmpty)
    val metaCols = (idCol.toSeq ++ Seq(stratumCol, tokenCol) ++ priority.map(_._1)).distinct
    val slim = idCol match {
      case Some(_) => df.select(metaCols.map(col): _*)
      case None => df
    }
    val base =
      if (pruneToBudgetRows)
        graft.ops.TopK.perGroup(slim, Seq(stratumCol), priority,
          budget.toInt, rankName = "__bp").drop("__bp")
      else slim
    val ord = priority.map { case (n, desc) => if (desc) col(n).desc else col(n).asc }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val selected = base.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") - col(tokenCol) < budget)
    idCol match {
      case Some(id) =>
        df.join(selected.select(col(id), col("cum_tokens")), Seq(id))
      case None => selected
    }
  }

  /** Deterministic global TRAINING-ORDER shuffle + shard assignment:
    * shard = hash(key, salt) mod nShards, position within the shard =
    * rank by (hash, key). Training order is then (shard, shard_pos) —
    * reproducible across retries/engines (same PolyHash contract as
    * the splits above), with no global sort: one exchange on the shard
    * id and an independent per-shard sort, which is exactly how a
    * 1000-executor job wants to lay out epochs. A new salt is a fresh
    * epoch permutation. */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int,
                    salt: String = "v1"): DataFrame = {
    require(nShards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), key)
    df.withColumn("__h", PolyHash.polyHash(concat(key.cast("string"), lit(salt))))
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .withColumn("shard_pos", row_number().over(w) - 1)
      .drop("__h")
  }

  /** Domain-mixture balancing: per stratum (source/domain/language),
    * the keep fraction that equalizes expected counts at the size of
    * the smallest stratum — the rate table a mixture-controlled
    * training-data build feeds into [[stratifiedSample]]. One tiny
    * aggregate; the min is a broadcast scalar, never a global window. */
  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET distribution than under the RAW distribution, then
    * keep the top-k. Features are hashed n-grams exactly as in the
    * paper — here unigrams → `nBuckets` buckets via the portable
    * [[PolyHash]] (so the DuckDB oracle replays bucket assignment
    * bit-for-bit); both distributions are add-1-smoothed over the
    * bucket vocabulary.
    *
    * Scale shape (the reason this composes to 100 TB):
    *  - ONE corpus-wide exchange: words hash map-side and partially
    *    aggregate to (doc, bucket) counts inside the scan partition
    *    before the doc_id shuffle.
    *  - The two distribution tables are ≤ `nBuckets` rows each —
    *    broadcast; totals ride along as literal-free scalar columns of
    *    the same broadcast frames (no driver collect).
    *  - The final top-k is TakeOrdered (per-partition heaps), never a
    *    global sort.
    *
    * `targetPred` marks the target slice (e.g. `col("lang") === "en"`:
    * select raw docs that look most like the English slice). Weight =
    * Σ_buckets c_doc,b · [log p_target(b) − log p_raw(b)].
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, k: Int,
                 nBuckets: Int = 512): DataFrame = {
    val words = df
      .select(col(idCol).as("__id"), targetPred.as("__tgt"),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("__id"), col("__tgt"),
        pmod(PolyHash.polyHash(col("__w")), lit(nBuckets.toLong)).as("__b"))
    // one shuffle: (doc, bucket) counts with map-side partial agg;
    // carries __tgt (functional on __id) so both distributions derive
    // from this one pass
    val perDocB = words.groupBy(col("__id"), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // reused 3x below; avoids re-scanning the corpus
    // BOTH distributions in one pass over the checkpointed counts: one
    // exchange keyed on the bucket, conditional sum for the target lane
    // (absent buckets get tc=0 for free - no left join, no null fill).
    // localCheckpoint (<= nBuckets rows) so the totals aggregate below
    // reads these 512 rows instead of re-planning the corpus pass.
    val dist = perDocB.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__rc"),
        sum(when(col("__tgt"), col("__c")).otherwise(0L)).as("__tc"))
      .localCheckpoint()
    // corpus-constant totals: a 1-row aggregate of the 512-row table,
    // broadcast-cross-joined onto the scored docs (no driver collect)
    val totals = dist.agg(sum(col("__rc")).as("__rtot"), sum(col("__tc")).as("__ttot"))
    perDocB
      .join(broadcast(dist), Seq("__b"))
      .groupBy(col("__id"))
      .agg(
        sum(col("__c")).as("n_tokens"),
        sum(col("__c").cast("double") *
          (log((col("__tc") + 1).cast("double")) - log((col("__rc") + 1).cast("double"))))
          .as("__s"))
      .crossJoin(broadcast(totals))
      // the smoothing denominators log(T+B) − log(R+B) are constant
      // per corpus; fold them in once per doc (× token count) instead
      // of per bucket
      .withColumn("weight",
        col("__s") - col("n_tokens").cast("double") *
          (log((col("__ttot") + nBuckets).cast("double")) -
           log((col("__rtot") + nBuckets).cast("double"))))
      .select(col("__id").as(idCol), col("n_tokens"), col("weight"))
      .orderBy(col("weight").desc, col(idCol))
      .limit(k)
  }

  /** Leakage-free (duplicate-aware) train/val/test split: every row is
    * assigned by the hash bucket of its duplicate-GROUP root, not its
    * own id, so near-duplicates can never straddle splits — the
    * classic eval-contamination path (a test doc whose near-copy sits
    * in train inflates the metric exactly like test-set leakage).
    *
    * `components` is (node, component) from
    * [[Dedup.connectedComponents]] over VERIFIED near-dup pairs; rows
    * absent from it (singletons) root at their own id, so the split
    * degenerates to [[splitLabel]] on a dup-free corpus.
    *
    * Scale: one id-keyed left join (components only carries docs that
    * HAVE a near-dup — a small fraction of the corpus, and AQE
    * broadcast-converts when it fits) + the map-side hash label. The
    * expensive part is the near-dup pass itself, which a pipeline has
    * already run for dedup — this op REUSES its output rather than
    * re-discovering pairs. */
  def leakageFreeSplit(df: DataFrame, idCol: String, components: DataFrame,
                       fractions: Seq[(String, Double)],
                       salt: String = "v1",
                       nodeCol: String = "node",
                       componentCol: String = "component"): DataFrame = {
    val comps = components.select(col(nodeCol).as(idCol),
      col(componentCol).as("__comp"))
    df.join(comps, Seq(idCol), "left")
      .withColumn("split_root", coalesce(col("__comp"), col(idCol)))
      .withColumn("in_dup_group", col("__comp").isNotNull)
      .withColumn("split", splitLabel(col("split_root"), fractions, salt))
      .drop("__comp")
  }

  /** Distributed exact NTILE: adds `bucketCol` = the bucket (1..k)
    * that `ntile(k) OVER (ORDER BY scoreCol, idCol)` would assign —
    * WITHOUT the global single-partition sort the window formulation
    * executes (every row through one task: the canonical scale
    * killer; this is the equal-MASS bucketing CCNet-style quality
    * tiering needs, where approximate percentile thresholds would
    * break oracle-exactness).
    *
    * Construction: (1) score histogram (distinct-score-sized — for
    * rounded quality scores, thousands of rows where the corpus has
    * billions); (2) exclusive prefix counts over the histogram via
    * RANGE-partitioned per-partition windows + driver-cumulated
    * partition offsets (one bounded nParts-row collect — the same
    * broadcast-offset layout as q12; NO unpartitioned window even at
    * histogram size, so the op survives a score cardinality that
    * rivals the corpus); (3) rows rank within their score group by
    * `idCol` (a PARTITIONED window — per-score groups, bounded);
    * global rank = prefix + group rank, and the bucket falls out of
    * ntile's integer size rule (first n % k buckets take one extra
    * row). Ties across a boundary split exactly as the total order
    * (score, id) dictates — bit-identical to the SQL window on any
    * engine. */
  /** Winsorized robust scaling — the outlier clamp quality-score
    * pipelines apply before averaging/thresholding (a single
    * garbage-extreme document must not drag a source's mean): scores
    * clamp to the inner edges of the extreme 1/k-tails, with the tails
    * cut EXACTLY by [[exactNtile]] under the (score, id) total order —
    * no approximate percentiles, so the bounds (and therefore every
    * clamped value) replay bit-for-bit on any engine. lo = max score
    * of bucket 1, hi = min score of bucket k, both broadcast scalars.
    * Returns the input plus `outCol`. */
  def winsorize(df: DataFrame, scoreCol: String, idCol: String,
                k: Int = 20, outCol: String = "winsorized"): DataFrame = {
    require(k >= 3, s"k >= 3 (two tails + interior), got $k")
    val b = exactNtile(df, scoreCol, idCol, k)
    val bounds = b.agg(
      max(when(col("bucket") === 1, col(scoreCol))).as("__lo"),
      min(when(col("bucket") === k, col(scoreCol))).as("__hi"))
    b.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        least(greatest(col(scoreCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi", "bucket")
  }

  def exactNtile(df: DataFrame, scoreCol: String, idCol: String, k: Int,
                 bucketCol: String = "bucket"): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint pins the range partitioning so the offset collect
    // and the final join read ONE materialization with stable pids
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__cnt"))
      .repartitionByRange(nParts, col(scoreCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // bounded collect: one (pid, mass) row per partition
    val parts = hist.groupBy(col("__pid")).agg(sum(col("__cnt")).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = parts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__poff")
    val wp = Window.partitionBy(col("__pid")).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.join(broadcast(offDf), Seq("__pid"))
      .select(col(scoreCol),
        (coalesce(sum(col("__cnt")).over(wp), lit(0L)) + col("__poff"))
          .as("__before"))
    val total = hist.agg(sum(col("__cnt")).as("__n"))
    val grpRank = row_number().over(
      Window.partitionBy(col(scoreCol)).orderBy(col(idCol)))
    df.join(cum, Seq(scoreCol))
      .crossJoin(broadcast(total))
      .withColumn("__r", col("__before") + grpRank)
      // ntile's rule in integer arithmetic: sizes are base+1 for the
      // first rem buckets, base after; base = 0 (n < k) keeps every
      // row in the first branch, so the base-divisor lane never runs
      .withColumn(bucketCol, expr(s"""
        CASE WHEN __r <= (__n % $k) * (__n DIV $k + 1)
             THEN (__r + __n DIV $k) DIV (__n DIV $k + 1)
             ELSE __n % $k + (__r - (__n % $k) * (__n DIV $k + 1)
                              + __n DIV $k - 1) DIV (__n DIV $k)
        END"""))
      .drop("__before", "__n", "__r")
  }

  /** Temperature-scaled mixture allocation (the multilingual /
    * source-balancing sampler of mT5/XLM-R-style pipelines): each
    * stratum gets budget share ∝ count^alpha — alpha = 1 reproduces
    * natural proportions, alpha → 0 uniform; alpha ≈ 0.7 is the
    * published sweet spot that up-weights tails without drowning
    * heads. Fractional quotas become INTEGER allocations by largest-
    * remainder apportionment (floor everything, hand the leftover
    * seats to the largest fractional parts, ties by stratum value) —
    * allocations sum to exactly `budget` and the whole computation is
    * stratum-table-sized (one aggregate + broadcast scalars + one
    * tiny window). Quotas are 6dp-gridded before flooring so the
    * pow() in the weights cannot flip a seat across engines. */
  def temperatureAllocation(df: DataFrame, stratumCol: String,
                            budget: Long, alpha: Double): DataFrame = {
    require(budget > 0 && alpha > 0.0 && alpha <= 1.0)
    import graft.functions.Rounding.exactRound
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(pow(col("n_docs"), lit(alpha))).as("__z"))
    val quota = counts.crossJoin(broadcast(tot))
      .withColumn("quota",
        exactRound(pow(col("n_docs"), lit(alpha)) / col("__z") * lit(budget), 6))
      .drop("__z")
    largestRemainder(quota, stratumCol, budget)
  }

  /** Largest-remainder seat assignment over a (stratum, n_docs, quota)
    * table: floor every quota, hand leftover seats to the largest
    * fractional parts (ties by stratum value). Because the 6dp quota
    * grid can push a quota that sits within 5e-7 BELOW an integer up
    * across the boundary, the floors can in principle OVERSHOOT the
    * budget by a seat; then leftover is negative and the same rank
    * logic runs in REVERSE — seats come back from the smallest
    * fractional parts (only strata with floor >= 1, so no allocation
    * goes negative; every overshooting stratum has floor >= 1 by
    * construction, so eligible strata always cover the overshoot).
    * Either way allocations sum to exactly `budget`.
    *
    * Leftover is a broadcast scalar; both remainder RANKS are one
    * bounded broadcast self-join count over the stratum table (strata
    * are dozens-to-thousands; quadratic there is nothing) —
    * deliberately NOT a global window, which the plan guard bans
    * everywhere regardless of input size. */
  def largestRemainder(quotas: DataFrame, stratumCol: String,
                       budget: Long): DataFrame = {
    val quota = quotas
      .withColumn("__floor", floor(col("quota")).cast("long"))
      .withColumn("__frac", col("quota") - col("__floor"))
    val left = quota.agg((lit(budget) - sum(col("__floor"))).as("__left"))
    val other = broadcast(quota.select(col("__frac").as("__f2"),
      col(stratumCol).as("__s2"), col("__floor").as("__fl2")))
    quota
      .join(other, col("__s2") =!= col(stratumCol), "left")
      .groupBy(col(stratumCol), col("n_docs"), col("quota"),
        col("__floor"), col("__frac"))
      .agg(
        sum(when(col("__f2") > col("__frac") ||
            (col("__f2") === col("__frac") && col("__s2") < col(stratumCol)),
          1L).otherwise(0L)).as("__ahead"),
        sum(when(col("__fl2") >= 1L && (col("__f2") < col("__frac") ||
            (col("__f2") === col("__frac") && col("__s2") < col(stratumCol))),
          1L).otherwise(0L)).as("__take"))
      .crossJoin(broadcast(left))
      .withColumn("alloc",
        when(col("__left") >= 0L,
          col("__floor") +
            when(col("__ahead") < col("__left"), 1L).otherwise(0L))
        .otherwise(col("__floor") -
          when(col("__floor") >= 1L && col("__take") < -col("__left"), 1L)
            .otherwise(0L)))
      .select(col(stratumCol), col("n_docs"), col("quota"), col("alloc"))
  }

  def balancedRates(df: DataFrame, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val minc = counts.agg(min(col("n_docs")).as("__min"))
    counts.crossJoin(broadcast(minc))
      .withColumn("rate", col("__min").cast("double") / col("n_docs"))
      .drop("__min")
  }
}
