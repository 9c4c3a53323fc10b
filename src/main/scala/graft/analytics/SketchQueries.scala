package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Sketches

/** Sketch exemplars (ops.Sketches) with accuracy-CONTRACT oracles: the
  * sketch value itself is engine-specific (HLL++/KLL internals), so
  * the registered output carries the exact value plus the boolean
  * "approximation met its promised bound", and the oracle recomputes
  * the exact side expecting every boolean true. A false anywhere
  * breaks the hash compare — the contract is what's gated. */
object SketchQueries {

  /** q17 — approximate distinct suppliers per return flag, 3-sigma
    * HLL++ bound checked against the exact count. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Sketches.distinctWithContract(
      Tables.lineitem(spark, dir), "l_returnflag", "l_suppkey")
      .select(col("l_returnflag"), col("exact_distinct"), col("within_bound"))
      .orderBy(col("l_returnflag"))

  /** q18 — approximate median quantity per return flag, rank-tolerance
    * bound checked against exact percentiles. */
  def approxMedian(spark: SparkSession, dir: String): DataFrame =
    Sketches.medianWithContract(
      Tables.lineitem(spark, dir), "l_returnflag", "l_quantity")
      .select(col("l_returnflag"), col("within_bound"))
      .orderBy(col("l_returnflag"))

  /** q21 — count-min sketch point queries (ops.Sketches.countMin) for
    * per-user event counts: the estimate from a 4×64 sketch next to
    * the exact count. Unlike q17/q18's contract-style oracles, the
    * PolyHash-family hash rows make the ENTIRE sketch replayable in
    * SQL — the oracle rebuilds counter cells, point-query minima and
    * all, so the hash gate proves the sketch arithmetic end-to-end
    * through real shuffled partials (width 64 over ~150+ users forces
    * genuine collisions: est > exact on real rows). */
  def countMinUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val est = Sketches.countMinEstimates(ev, "user_id")
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("est"), col("exact"))
      .orderBy(col("user_id"))
  }

  /** q27 — INCREMENTAL count-min STORE (ops.Sketches.countMin/
    * cmMergeCells): the CMS family's store face, completing the
    * mergeable-store symmetry (HLL max-merge q23, histogram add-merge
    * q24, KMV min-merge q25 — and now CMS add-merge). Events outside
    * the delta slice (event_id % 10 == 3) fold their counter cells
    * ONCE; the delta's cells then ADD into the store — counts are
    * linear, so the merged table equals a full rebuild BIT-FOR-BIT
    * and q27 shares q21's full-replay oracle VERBATIM (counter cells,
    * point-query minima and all, in exact integer SQL). State is
    * ≤ depth·width rows regardless of corpus size. */
  def countMinStore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_id"))
    val store = cmsStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_cms_store").toString
      Sketches.writeCmsStore(ev.filter(col("event_id") % 10 =!= 3),
        "user_id", s"$p/cells")
      s"$p/cells"
    })
    // width/depth resolve FROM the store's pinned sidecar (r14): the
    // delta's cells and the point-query probes both use the pinned
    // geometry, so a store built at any width×depth is honored
    val (merged, w, d) = Sketches.mergeCmsStoreDelta(
      spark, store, ev.filter(col("event_id") % 10 === 3), "user_id")
    val est = Sketches.countMinEstimatesFrom(merged, ev, "user_id", w, d)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("est"), col("exact"))
      .orderBy(col("user_id"))
  }

  private val cmsStoreCache = StoreCaches.register("q27_cms_store")

  /** q23 — INCREMENTAL HLL register store
    * (ops.Sketches.hllRegisters/hllMergeRegisters): lineitems outside
    * the delta slice (l_orderkey % 10 == 3) fold their distinct
    * suppliers per return flag into a persisted register table ONCE;
    * the delta's registers then MERGE with the store — groupBy-max
    * over sketch-sized rows, the base data never rescanned (the d9/
    * d3c/j11b incremental discipline, for distinct counts). Because
    * the register merge is lossless (max is idempotent), the merged
    * store equals a full rebuild EXACTLY, so the oracle replays the
    * full-corpus register build — PolyHash, bucket split and the
    * trailing-zeros CASE ladder all in exact integer SQL — and the
    * hash gate proves the incremental path bit-for-bit. The float
    * estimate is checked via the q17-style within_bound contract
    * (3-sigma of HLL's 1.04/sqrt(m), linear-counting switch). */
  def hllRegisterStore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_suppkey"), col("l_orderkey"))
    val store = hllStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_hll_store").toString
      Sketches.writeHllStore(li.filter(col("l_orderkey") % 10 =!= 3),
        "l_returnflag", "l_suppkey", s"$p/regs", lane = 32)
      s"$p/regs"
    })
    // the delta's registers build with the store's pinned limb lane;
    // the explicit expectation guards against this face ever pointing
    // at q23b's 64-bit store (max-merging across mixes is meaningless)
    val (merged, _) = Sketches.mergeHllStoreDelta(spark, store,
      li.filter(col("l_orderkey") % 10 === 3), "l_returnflag", "l_suppkey",
      expectLane = 32)
    hllContractReadout(merged, li)
  }

  /** q23b — the TWO-LIMB 62-bit HLL lane's incremental register
    * store (ops.Sketches.hllRegisters64): same base/delta split,
    * same lossless max-merge and same contract readout as q23, but
    * the mixed value carries 56 geometric bits, lifting the 31-bit
    * lane's ~2·10^9 per-group ceiling to ~4.6·10^18 while every
    * intermediate stays < 2^62 — so the oracle still replays the
    * whole pipeline (both limbs, the ladder to rho 56) in ANSI
    * BIGINT. */
  def hllRegisterStore64(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_suppkey"), col("l_orderkey"))
    val store = hll64StoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_hll64_store").toString
      Sketches.writeHllStore(li.filter(col("l_orderkey") % 10 =!= 3),
        "l_returnflag", "l_suppkey", s"$p/regs", lane = 64)
      s"$p/regs"
    })
    val (merged, _) = Sketches.mergeHllStoreDelta(spark, store,
      li.filter(col("l_orderkey") % 10 === 3), "l_returnflag", "l_suppkey",
      expectLane = 64)
    hllContractReadout(merged, li)
  }

  private val hll64StoreCache =
    StoreCaches.register("q23b_hll64_register_store")

  /** Shared q23/q23b/st13 readout: integer register stats
    * (oracle-exact) next to the float estimate's 3-sigma contract
    * boolean. */
  private[graft] def hllContractReadout(registers: DataFrame,
                                        li: DataFrame): DataFrame = {
    // one aggregate pass over the registers (stats + the estimate's
    // harmonic sum together — a second scan of a streaming memory
    // sink would also trip Spark's self-join reference resolution);
    // the estimator itself is Sketches.hllEstimate, the SAME
    // expression hllEstimates uses — one home for the constants
    val m = Sketches.HllM.toDouble
    val stats = registers.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_regs"), sum(col("reg")).as("sum_rho"),
        max(col("reg")).as("max_rho"),
        sum(pow(lit(2.0), -col("reg"))).as("__z"))
      .withColumn("estimate",
        Sketches.hllEstimate(col("n_regs"), col("__z")))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("exact_distinct"))
    val rsd = 1.04 / math.sqrt(m)
    stats.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_regs"), col("sum_rho"),
        col("max_rho"), col("exact_distinct"),
        (abs(col("estimate") - col("exact_distinct")) <=
          col("exact_distinct") * lit(3.0 * rsd) + lit(1.0)).as("within_bound"))
      .orderBy(col("l_returnflag"))
  }

  private val hllStoreCache = StoreCaches.register("q23_hll_register_store")

  /** q24 — INCREMENTAL histogram-quantile store
    * (ops.Sketches.histBins/histMerge/histMedianBin): extended-price
    * bin counts per return flag persist once for the base slice; the
    * delta's histogram MERGES by addition (lossless, like q23's
    * max-merge), and the median reads off the cumulative bins. The
    * oracle replays the full-rebuild histogram + the same integer
    * window arithmetic, and the bracket check — count of raw values
    * below the bin's edges versus the lower-median rank k — is
    * computed from RAW rows on both engines, so a store that drifted
    * from the data would fail the gate even though bins and readout
    * agree with each other. */
  def histQuantileStore(spark: SparkSession, dir: String): DataFrame = {
    val w = 1000.0
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
    val store = histStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_hist_store").toString
      Sketches.writeHistStore(li.filter(col("l_orderkey") % 10 =!= 3),
        "l_returnflag", "l_extendedprice", s"$p/bins", w)
      s"$p/bins"
    })
    // the delta's bins build at the store's pinned width; the explicit
    // expectation pins this face's readout constant to the store's
    val (merged, wPinned) = Sketches.mergeHistStoreDelta(spark, store,
      li.filter(col("l_orderkey") % 10 === 3),
      "l_returnflag", "l_extendedprice", expectWidth = w)
    histContractReadout(merged, li, wPinned)
  }

  /** Shared q24/st14 readout: median bin off the cumulative bins plus
    * the bracket booleans recomputed from RAW rows — a store that
    * drifted from the data fails even though bins and readout agree
    * with each other. */
  private[graft] def histContractReadout(bins: DataFrame, li: DataFrame,
                                         w: Double): DataFrame = {
    val med = Sketches.histMedianBin(bins, "l_returnflag")
      .select(col("l_returnflag"), col("median_bin"), col("n"), col("k"),
        (col("median_bin") * w).as("bin_lo"),
        ((col("median_bin") + 1) * w).as("bin_hi"))
    li.join(med, "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("median_bin")).as("median_bin"),
        min(col("bin_lo")).as("bin_lo"), min(col("bin_hi")).as("bin_hi"),
        min(col("n")).as("n"),
        // bracket check from RAW rows: fewer than k values below the
        // bin's lower edge, at least k below its upper edge
        ((count(when(col("l_extendedprice") < col("bin_lo"), 1)) < min(col("k"))) &&
          (count(when(col("l_extendedprice") < col("bin_hi"), 1)) >= min(col("k"))))
          .as("brackets_median"))
      .orderBy(col("l_returnflag"))
  }

  private val histStoreCache =
    StoreCaches.register("q24_hist_quantile_store")

  /** q25 — INCREMENTAL KMV distinct-sketch store
    * (ops.Sketches.kmvSketch/kmvMergeSketches): the third mergeable
    * sketch family next to q23's HLL registers and q24's additive
    * histogram. Same base/delta split (l_orderkey % 10 == 3) and the
    * same lossless-merge argument: minK is idempotent/commutative/
    * associative, so the merged store equals a full rebuild
    * BIT-FOR-BIT and the oracle replays the full-corpus bottom-k —
    * the 62-bit two-limb mix (shared with q23b) and the per-group
    * rank in exact integer SQL. The float estimate (Beyer et al.
    * (k−1)/U(k), RSD 1/√(k−2)) rides the within_bound contract. */
  def kmvStore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_suppkey"), col("l_orderkey"))
    val store = kmvStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_kmv_store").toString
      Sketches.writeKmvStore(li.filter(col("l_orderkey") % 10 =!= 3),
        "l_returnflag", "l_suppkey", s"$p/sk")
      s"$p/sk"
    })
    // the delta sketches at the store's pinned k and the estimator
    // reads out at that k — a store pinned at any k is honored
    val (merged, k) = Sketches.mergeKmvStoreDelta(spark, store,
      li.filter(col("l_orderkey") % 10 === 3), "l_returnflag", "l_suppkey")
    kmvContractReadout(merged, li, k)
  }

  private val kmvStoreCache = StoreCaches.register("q25_kmv_store")

  /** Shared q25/st15 readout: exact-integer sketch stats (count,
    * min/max hash — oracle-replayed bit-for-bit) next to the
    * estimator's 3σ contract boolean (σ = exact/√(k−2); +1 absorbs
    * the sub-k exact regime's rounding). */
  private[graft] def kmvContractReadout(sketch: DataFrame, li: DataFrame,
                                        k: Int = Sketches.KmvK): DataFrame = {
    val stats = sketch.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_vals"), min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))
      .withColumn("estimate",
        Sketches.kmvEstimate(col("n_vals"), col("max_h"), k))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("exact_distinct"))
    val rsd = 1.0 / math.sqrt((k - 2).toDouble)
    stats.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_vals"), col("min_h"),
        col("max_h"), col("exact_distinct"),
        (abs(col("estimate") - col("exact_distinct")) <=
          col("exact_distinct") * lit(3.0 * rsd) + lit(1.0)).as("within_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** q26 — KMV set-intersection estimate (ops.Sketches.kmvIntersect):
    * the capability HLL registers don't have, and the reason KMV
    * earns its place as a third sketch family. Two "corpus snapshot"
    * part sets — parts shipped in 1994 vs parts shipped in 1995 —
    * are sketched independently (k = 32 longs each, built in one
    * bounded-buffer pass per side); their overlap is then estimated
    * from SKETCHES ALONE: L = minK(kmv(A) ∪ kmv(B)) is the KMV sketch
    * of A ∪ B, a uniform bottom-k hash sample of the union, so the
    * fraction of L present in both input sketches estimates Jaccard
    * and ρ̂·D̂(A∪B) estimates |A ∩ B| — the 100 TB train/eval
    * contamination pattern (c1 does it exactly with a join; this is
    * the O(k)-state screen you run FIRST, per slice pair). The oracle
    * replays sketches and intersection counts in exact integer SQL;
    * the exact intersection/union come from a distinct-key replay and
    * the Jaccard estimate rides a 3σ binomial contract. */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val k = Sketches.KmvK
    // r16: ONE year-tagged corpus aggregate builds BOTH sketches (the
    // q26c discipline), checkpointed at ≤ 2k rows — the per-side form
    // re-ran its corpus aggregate for every kmvIntersect consumer of
    // the lazy sketch frame (union + two membership joins). The exact
    // replay likewise folds its union-distinct + recount into one
    // grouped scan with per-year flags: same union/intersection
    // counts, one corpus pass instead of two.
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"))
      .filter(col("yr").isin(1994, 1995))
    val sk = Sketches.kmvSketch(li, "yr", "l_partkey").localCheckpoint()
    val skA = sk.filter(col("yr") === 1994).drop("yr")
    val skB = sk.filter(col("yr") === 1995).drop("yr")
    val est = Sketches.kmvIntersect(skA, skB, k)
    val exact = li.groupBy(col("l_partkey"))
      .agg(max(when(col("yr") === 1994, 1).otherwise(0)).as("__a"),
        max(when(col("yr") === 1995, 1).otherwise(0)).as("__b"))
      .agg(count(lit(1)).as("exact_union"),
        count(when(col("__a") === 1 && col("__b") === 1, 1)).as("exact_inter"))
    val sigma = 3.0 * math.sqrt(0.25 / k)
    est.crossJoin(exact)
      .select(col("n_l"), col("max_h_l"), col("n_inter"),
        col("exact_inter"), col("exact_union"),
        (abs(col("jaccard_est") - col("exact_inter") / col("exact_union"))
          <= lit(sigma)).as("within_bound"))
  }

  /** q26b — KMV set-DIFFERENCE estimate (ops.Sketches.kmvDifference):
    * q26's snapshot slices asked the asymmetric question — how many
    * 1994 parts did NOT ship in 1995, and vice versa (the
    * training-snapshot "what's genuinely new" screen). Same sketches,
    * same bottom-k union sample; membership counted one-sided, each
    * direction riding its own 3σ binomial contract against the exact
    * distinct-key replay. */
  def kmvDelta(spark: SparkSession, dir: String): DataFrame = {
    val k = Sketches.KmvK
    // r16: same one-pass sketch + one-pass exact restructure as q26.
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"))
      .filter(col("yr").isin(1994, 1995))
    val sk = Sketches.kmvSketch(li, "yr", "l_partkey").localCheckpoint()
    val skA = sk.filter(col("yr") === 1994).drop("yr")
    val skB = sk.filter(col("yr") === 1995).drop("yr")
    val est = Sketches.kmvDifference(skA, skB, k)
    val exact = li.groupBy(col("l_partkey"))
      .agg(max(when(col("yr") === 1994, 1).otherwise(0)).as("__a"),
        max(when(col("yr") === 1995, 1).otherwise(0)).as("__b"))
      .agg(count(lit(1)).as("exact_union"),
        count(when(col("__a") === 1 && col("__b") === 0, 1)).as("exact_a_only"),
        count(when(col("__b") === 1 && col("__a") === 0, 1)).as("exact_b_only"))
    val sigma = 3.0 * math.sqrt(0.25 / k)
    est.crossJoin(exact)
      .select(col("n_l"), col("max_h_l"), col("n_a_only"), col("n_b_only"),
        col("exact_a_only"), col("exact_b_only"), col("exact_union"),
        (abs(col("n_a_only") / col("n_l") -
            col("exact_a_only") / col("exact_union")) <= lit(sigma) &&
          abs(col("n_b_only") / col("n_l") -
            col("exact_b_only") / col("exact_union")) <= lit(sigma))
          .as("within_bound"))
  }

  /** q26c — the FINE-GRAINED overlap regime at k = 256
    * (ops.Sketches.kmvIntersect with an explicit k): the decision
    * boundary pinned in ops.Sketches' scaladoc and KmvSpec's k-sweep,
    * demonstrated at the query surface. The default k = 32 separates
    * "disjoint" from J ≳ 0.2 but canNOT tell J = 0.01 from J = 0.1
    * (both inside its binomial noise band); that boundary needs
    * se = √(J(1−J)/k) ≲ 0.03, i.e. k ≳ 200. Here two snapshot pairs
    * with TRUE Jaccard 0.1 and 0.01 by construction — 55%-wide
    * o_orderkey key-space bands overlapping by a 10% vs a 1% churn
    * band, the "how much of snapshot B is really new" screen — are
    * estimated at BOTH k: the k = 32 membership counts (n_inter32,
    * expected ~3 vs ~0 — indistinguishable) sit next to the k = 256
    * counts (~26 vs ~3), and each pair's k = 256 estimate rides a
    * J-aware 3σ contract tight enough that the two bands cannot
    * overlap: |Ĵ−J| ≤ 3√(J(1−J)/256) gives Ĵ₁ ≥ 0.044 > 0.029 ≥ Ĵ₂.
    * Cost stays sketch-bounded — 256 longs per slice instead of 32;
    * the corpus passes are unchanged. The oracle replays sketches and
    * both membership counts in exact integer SQL. */
  def kmvFineOverlap(spark: SparkSession, dir: String): DataFrame = {
    val kFine = 256
    val kCoarse = Sketches.KmvK
    val keys = Tables.orders(spark, dir)
      .select(col("o_orderkey"), pmod(col("o_orderkey"), lit(1000L)).as("__m"))
    // ONE corpus pass builds all three slice sketches: each key emits
    // a row per band it belongs to (snapshot A = first 55% of the key
    // space; b10/b01 overlap it by a 10%/1% churn band and run to the
    // end), and the k = 32 sketch of a slice is the RANK-≤32 PREFIX
    // of its k = 256 sketch (bottom-k nests in k), so both regimes
    // read from the same ≤ 3·256-row checkpointed table.
    val tagged = keys.select(col("o_orderkey"), explode(array(
        when(col("__m") < 550, lit("a")),
        when(col("__m") >= 450, lit("b10")),
        when(col("__m") >= 540, lit("b01")))).as("__s"))
      .filter(col("__s").isNotNull)
    val sk = Sketches.kmvSketch(tagged, "__s", "o_orderkey", kFine)
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__s")).orderBy(col("h"))))
      .localCheckpoint() // ≤ 768 rows, probed 4× per pair below
    def side(s: String, k: Int) =
      sk.filter(col("__s") === s && col("__r") <= k).select(col("h"))
    def pairRow(name: String, sb: String) = {
      val fine = Sketches.kmvIntersect(side("a", kFine), side(sb, kFine), kFine)
      val coarse = Sketches.kmvIntersect(side("a", kCoarse), side(sb, kCoarse),
          kCoarse)
        .select(col("n_l").as("n_l32"), col("n_inter").as("n_inter32"))
      fine.crossJoin(coarse).withColumn("pair", lit(name))
    }
    // ONE exact scan serves both pairs (A ∪ B = the whole key space
    // for both — the bands cover [0, 550) ∪ [lo, 1000) with lo < 550;
    // A ∩ B = the churn band)
    val exact = keys.agg(
      countDistinct(col("o_orderkey")).as("exact_union"),
      countDistinct(when(col("__m") >= 450 && col("__m") < 550,
        col("o_orderkey"))).as("__inter_b10"),
      countDistinct(when(col("__m") >= 540 && col("__m") < 550,
        col("o_orderkey"))).as("__inter_b01"))
    val rows = pairRow("snap_j01", "b01").unionByName(pairRow("snap_j10", "b10"))
      .crossJoin(broadcast(exact))
      .withColumn("exact_inter", when(col("pair") === "snap_j01",
        col("__inter_b01")).otherwise(col("__inter_b10")))
    val jex = col("exact_inter").cast("double") / col("exact_union")
    val band = lit(3.0) *
      sqrt(greatest(jex * (lit(1.0) - jex), lit(1.0 / kFine)) /
        lit(kFine.toDouble))
    rows.select(col("pair"), col("n_l"), col("max_h_l"), col("n_inter"),
        col("n_l32"), col("n_inter32"), col("exact_inter"), col("exact_union"),
        (abs(col("n_inter") / col("n_l") - jex) <= band).as("within_bound"))
      .orderBy(col("pair"))
  }

  /** ov1 — KMV shingle-overlap MATRIX across the 20 document sources
    * (ops.Sketches.kmvOverlapMatrix): the S-slice contamination
    * screen. Each source's distinct word-3-shingle set (the d2/d4
    * contamination unit, built by the native WordNGrams slicer) is
    * KMV-sketched in ONE corpus pass — ≤ k longs of state per source —
    * and every pair's Jaccard/intersection is then estimated from
    * sketches alone: pair frames are ≤ S² rows, per-pair unions ≤ 2k
    * rows, bottom-k on the bounded-heap TopKPerGroup. At 100 TB this
    * is the screen that decides WHICH slice pairs are worth c1's exact
    * contamination join — S² pairwise exact joins would each rescan
    * two slices; the matrix costs one scan + O(S²·k). The oracle
    * replays sketches, per-pair bottom-k and membership counts in
    * exact integer SQL; exact per-pair intersection/union come from a
    * distinct-shingle replay, and the Jaccard estimate rides a 3σ
    * binomial contract per pair. */
  def kmvOverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("source"), col("text"))
    val sh = docs.select(col("source"),
      explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
    // exact sides of the gate run on the distinct (source, shingle)
    // frame — the gate-scale replay of what the sketch matrix avoids
    // at corpus scale; raw strings so the oracle's string replay is
    // literally the same computation
    matrixContractReadout(spark, Sketches.kmvSketch(sh, "source", "sh"), sh)
  }

  /** ov1b — the overlap matrix over an INCREMENTALLY-MAINTAINED
    * sketch store (the d9/q23 discipline applied to the screen):
    * sources' shingle sketches for the base corpus slice
    * (doc_id % 10 != 3) persist ONCE; the delta's sketches min-k-merge
    * with the store, and the matrix reads the MERGED STORE only —
    * after day one the corpus is never rescanned, which is how the
    * screen stays cheap enough to run per-snapshot at 100 TB. Because
    * the minK merge is lossless the merged store equals the
    * full-corpus sketch bit-for-bit, so ov1b gates on ov1's oracle
    * VERBATIM (the exact sides recompute from raw rows either way —
    * a drifted store fails the gate). */
  def kmvOverlapMatrixIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text"), col("doc_id"))
    def shingled(df: org.apache.spark.sql.DataFrame) =
      df.select(col("source"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
    val store = kmvMatrixStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_ovm_store").toString
      Sketches.writeKmvStore(shingled(docs.filter(col("doc_id") % 10 =!= 3)),
        "source", "sh", s"$p/sk")
      s"$p/sk"
    })
    val (merged, _) = Sketches.mergeKmvStoreDelta(spark, store,
      shingled(docs.filter(col("doc_id") % 10 === 3)), "source", "sh",
      expectK = Sketches.KmvK) // the matrix readout's σ assumes this k
    matrixContractReadout(spark, merged, shingled(docs))
  }

  private val kmvMatrixStoreCache =
    StoreCaches.register("ov1b_overlap_store")

  /** Shared ov1/ov1b readout: the sketch-pair matrix next to the
    * exact pairwise intersection/union recomputed from RAW shingle
    * rows (so a store that drifted from the data fails even though
    * the matrix is internally consistent), and the per-pair 3σ
    * binomial Jaccard contract. */
  private[graft] def matrixContractReadout(spark: SparkSession,
      sk: org.apache.spark.sql.DataFrame,
      sh: org.apache.spark.sql.DataFrame): DataFrame =
    matrixReadoutFrom(Sketches.kmvOverlapMatrix(sk, "source"), sh)

  /** ov2 — the overlap matrix's SPARSE face
    * (ops.Sketches.kmvOverlapMatrixSparse): the bottom-k-hash
    * prescreen (one equi-join on sketch hash — only pairs sharing a
    * bottom-k value can have n_inter > 0) restricts the matrix to
    * candidate pairs, keeping the pair frame output-sized at large S
    * instead of S²/2. Same sketches, same exact per-pair integers as
    * ov1 — ov2's rows are ov1's filtered to shared-hash pairs, and
    * the oracle is ov1's with the matching EXISTS filter on its pair
    * CTE. SketchesSpec pins the disjoint-fixture contract (candidate
    * frame ≪ S²). */
  def kmvOverlapMatrixSparse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("source"), col("text"))
    val sh = docs.select(col("source"),
      explode(graft.ops.Dedup.shingles(col("text"), 3)).as("sh"))
    matrixReadoutFrom(
      Sketches.kmvOverlapMatrixSparse(Sketches.kmvSketch(sh, "source", "sh"),
        "source"), sh)
  }

  private def matrixReadoutFrom(est: org.apache.spark.sql.DataFrame,
      sh: org.apache.spark.sql.DataFrame): DataFrame = {
    val k = Sketches.KmvK
    // r16: the exact sides are set-SIZE counts, which 64-bit digest
    // sets preserve exactly up to a within-source collision (the d2
    // verify-set argument, ~|set|²/2^65 — never at any real size), so
    // the distinct exchange and the pairwise intersection join move
    // 8-byte longs instead of shingle strings. The oracle keeps
    // counting strings: equal set sizes ⇒ equal integers.
    val d = sh.select(col("source"), xxhash64(col("sh")).as("__d")).distinct()
    val sizes = d.groupBy(col("source")).agg(count(lit(1)).as("__n"))
    val inter = d.select(col("source").as("__ga"), col("__d"))
      .join(d.select(col("source").as("__gb"), col("__d")), Seq("__d"))
      .filter(col("__ga") < col("__gb"))
      .groupBy(col("__ga"), col("__gb"))
      .agg(count(lit(1)).as("exact_inter"))
    val sigma = 3.0 * math.sqrt(0.25 / k)
    est
      .join(inter, Seq("__ga", "__gb"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .join(sizes.select(col("source").as("__ga"), col("__n").as("__na")), "__ga")
      .join(sizes.select(col("source").as("__gb"), col("__n").as("__nb")), "__gb")
      .withColumn("exact_union", col("__na") + col("__nb") - col("exact_inter"))
      .select(col("__ga").as("src_a"), col("__gb").as("src_b"),
        col("n_l"), col("max_h_l"), col("n_inter"),
        col("exact_inter"), col("exact_union"),
        (abs(col("n_inter") / col("n_l") -
          col("exact_inter") / col("exact_union")) <= lit(sigma))
          .as("within_bound"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** q19 — Misra-Gries heavy hitters per order status
    * (functions.MisraGries, the custom mergeable Aggregator). The
    * priority domain (5 values) sits under k = 8, the regime where MG
    * is provably exact — so the oracle checks the sketch's merge
    * arithmetic end-to-end through real shuffled partials against a
    * plain GROUP BY count. MisraGriesSpec covers the approximate
    * regime (bounded state, n/(k+1) deficit) that SQL can't. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val mg = graft.functions.MisraGries.heavyHitters(8)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(mg(col("o_orderpriority")).as("hh"))
      .select(col("o_orderstatus"),
        explode(col("hh")).as(Seq("priority", "est")))
      .orderBy(col("o_orderstatus"), col("priority"))
  }
}
