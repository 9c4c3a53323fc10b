package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches — the 100 TB substitutes for exact
  * distinct counts and exact quantiles (both of which need a full
  * shuffle of the key space; the sketches are fixed-size map-side
  * state merged associatively).
  *
  * Spark ships the algorithms (HyperLogLog++ behind
  * `approx_count_distinct`, KLL-style quantile summaries behind
  * `percentile_approx`); this module's contribution is the CONTRACT
  * surface: each operator returns the approximation NEXT TO its exact
  * counterpart and a boolean that the promised error bound holds, so
  * the result is oracle-checkable — the DuckDB oracle recomputes the
  * exact side and asserts the same booleans. An approximation whose
  * value can't be cross-checked is unverifiable; an approximation
  * whose error CONTRACT is checked row-by-row is a first-class
  * operator in a hash-compared engine. (At production scale one drops
  * the exact column and keeps the sketch — the contract is what the
  * tests pin.)
  */
object Sketches {

  /** Per-group approximate + exact distinct counts with the bound
    * check. `rsd` is HLL++'s target relative standard deviation; the
    * check allows `tolFactor` × rsd (default 3 sigma — generous but
    * the point is catching gross regressions, not shaving sigmas). */
  def distinctWithContract(df: DataFrame, groupCol: String, keyCol: String,
                           rsd: Double = 0.05,
                           tolFactor: Double = 3.0): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        countDistinct(col(keyCol)).as("exact_distinct"),
        approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))
      .withColumn("within_bound",
        abs(col("approx_distinct") - col("exact_distinct"))
          <= col("exact_distinct") * (rsd * tolFactor) + lit(1.0))

  /** Count-min sketch (Cormode & Muthukrishnan '05) — bounded-state
    * frequency estimation where even Misra-Gries is too big: `depth`
    * counter rows of `width` cells each, a few KB of associatively
    * mergeable state regardless of key cardinality, overestimate-only
    * error ≤ e·n/width with probability 1−e^−depth.
    *
    * Unlike q17/q18's engine-internal sketches (HLL++/KLL), this one
    * is built from the portable [[graft.functions.PolyHash]] family,
    * so the WHOLE sketch — hash rows, cell counts, point-query minima
    * — replays bit-for-bit in ANSI SQL: the row hashes are
    * `((h mod P) · a_j + b_j) mod P mod width` with P = 2^31−1 and
    * fixed odd constants, every product < 2^62 (no BIGINT overflow on
    * either engine).
    *
    * Scale shape: the counter table is built in ONE map-side
    * explode(depth) + aggregate over (j, bucket) — at most
    * depth·width distinct groups, so partial aggregation collapses
    * each task's contribution to sketch size before the exchange
    * (that collapse IS the sketch's merge property, exercised through
    * real shuffled partials). Point queries join the counter table —
    * sketch-sized, broadcastable — not the corpus. */
  val CmP: Long = 2147483647L // 2^31 − 1 (Mersenne)
  val CmA: Seq[Long] = Seq(1664525L, 69069L, 22695477L, 1103515245L)
  val CmB: Seq[Long] = Seq(1013904223L, 362437L, 1L, 12345L)

  private def cmBucket(h: Column, j: Int, width: Int): Column =
    pmod(pmod(pmod(h, lit(CmP)) * lit(CmA(j)) + lit(CmB(j)), lit(CmP)), lit(width))

  /** One (j, bucket) row per input row per hash row — the map-side
    * projection both the batch counter build and the STREAMING
    * aggregation (st8) run; its groupBy-count partials collapse to
    * sketch size, which is the merge property. */
  def cmBucketPairs(df: DataFrame, keyCol: String, width: Int = 64,
                    depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= CmA.size, s"depth must be 1..${CmA.size}")
    val h = graft.functions.PolyHash.polyHash(col(keyCol))
    df.select(posexplode(array((0 until depth).map(j => cmBucket(h, j, width)): _*))
      .as(Seq("j", "bucket")))
  }

  /** The counter table (j, bucket, cnt) over every row of `df`. */
  def countMin(df: DataFrame, keyCol: String, width: Int = 64,
               depth: Int = 4): DataFrame =
    cmBucketPairs(df, keyCol, width, depth)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Lossless counter-cell merge: cells ADD —
    * merge(cm(A), cm(B)) == cm(A ⊎ B) exactly (counts are linear), the
    * additive-merge law the histogram store (q24) uses, applied to the
    * CMS family: a persisted base counter table plus a delta's
    * counters equals the full rebuild bit-for-bit, ≤ depth·width rows
    * of state at any corpus size. */
  def cmMergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point-query estimates against a PRE-BUILT counter table (cols
    * j, bucket, cnt — e.g. the final state of the streaming build):
    * est(k) = min over rows j of cnt[j][h_j(k)]. */
  def countMinEstimatesFrom(counters: DataFrame, keys: DataFrame,
                            keyCol: String, width: Int = 64,
                            depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= CmA.size, s"depth must be 1..${CmA.size}")
    val h = graft.functions.PolyHash.polyHash(col(keyCol))
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol),
        posexplode(array((0 until depth).map(j => cmBucket(h, j, width)): _*))
          .as(Seq("j", "bucket")))
      .join(counters, Seq("j", "bucket"))
      .groupBy(col(keyCol)).agg(min(col("cnt")).as("est"))
  }

  /** Point-query estimates for every DISTINCT key in `df`:
    * est(k) = min over rows j of cnt[j][h_j(k)] — the CMS guarantee
    * est >= true count always, with the e·n/width overshoot bound. */
  def countMinEstimates(df: DataFrame, keyCol: String, width: Int = 64,
                        depth: Int = 4): DataFrame =
    countMinEstimatesFrom(countMin(df, keyCol, width, depth), df,
      keyCol, width, depth)

  /** Per-group approximate median vs the exact median, bounded by a
    * RANK tolerance: the approx median must sit between the exact
    * p(0.5-eps) and p(0.5+eps) quantiles — the guarantee
    * percentile_approx actually makes (rank error ≤ 1/accuracy), as
    * opposed to a value-space bound it doesn't. */
  def medianWithContract(df: DataFrame, groupCol: String, valCol: String,
                         accuracy: Int = 100): DataFrame = {
    val eps = 1.0 / accuracy
    df.groupBy(col(groupCol))
      .agg(
        percentile_approx(col(valCol), lit(0.5), lit(accuracy)).as("approx_median"),
        expr(s"percentile($valCol, ${0.5 - 2 * eps})").as("lo"),
        expr(s"percentile($valCol, ${0.5 + 2 * eps})").as("hi"))
      .withColumn("within_bound",
        col("approx_median") >= col("lo") && col("approx_median") <= col("hi"))
      .drop("lo", "hi")
  }

  /** Portable HyperLogLog (Flajolet et al. '07) built on the
    * cross-engine [[graft.functions.PolyHash]] — the MERGEABLE
    * distinct-count sketch STORE that `approx_count_distinct` (q17)
    * can't be: Spark's HLL++ registers live inside an opaque
    * aggregation buffer, so they can't be persisted per group,
    * unioned with a delta's registers, or replayed by the SQL oracle.
    * These registers are plain (group, bucket, reg) rows:
    *
    *  - bucket = h mod m, reg = max over the group's keys of
    *    rho(h div m), where rho = trailing-zeros + 1 — a geometric
    *    variable over the hash's uniform low bits, computed by an
    *    EXACT integer CASE ladder (no float log anywhere), so the
    *    whole register table replays bit-for-bit in ANSI SQL;
    *  - merge(base, delta) = groupBy max of the unioned rows — the
    *    HLL merge law. Because max is idempotent/commutative/
    *    associative, merge(registers(A), registers(B)) ==
    *    registers(A ∪ B) EXACTLY (not approximately): an incremental
    *    store never drifts from a full rebuild, which is the property
    *    HllSpec pins and the q23 oracle (a full-rebuild replay)
    *    gates.
    *
    * Scale shape: registers are bounded by m rows per group
    * regardless of key cardinality; the map-side partial max
    * collapses each task's contribution to ≤ m rows before the
    * exchange, and the store holds m·groups rows total — the
    * fixed-size daily-delta distinct-count pattern (count distinct
    * users/domains/shingles per slice over 10¹¹ rows without ever
    * rescanning history). */
  val HllM: Int = 64
  /** rho cap of the 31-bit lane: the mixed value is < 2^31, so
    * suffix = g div 64 is < 2^25 and a trailing-zero run can't exceed
    * 24; suffix == 0 also maps here. The 25-bit geometric range
    * CEILING is this lane's honest regime: rho saturates once
    * per-group cardinality approaches 64·2^25 ≈ 2·10^9 — in practice
    * the estimate starts compressing in the 10^7–10^8/group decade,
    * where saturated registers stop growing. Past that, use the
    * two-limb 62-bit lane ([[hllRegisters64]], q23b — same store/
    * merge laws, ceiling ≈ 64·2^56) or Spark's built-in HLL++
    * (`approx_count_distinct`, q17) when per-group registers don't
    * need to be persisted/merged/replayed. This lane stays 31-bit so
    * every product is < 2^62 and the WHOLE pipeline replays under
    * ANSI BIGINT on both engines. */
  val HllRhoCap: Int = 26
  /** rho cap of the two-limb lane: g < 2^62, suffix = g div 64
    * < 2^56, so a nonzero suffix's trailing-zero run caps at 55
    * (rho 56); suffix == 0 maps to 57. */
  val HllRhoCap64: Int = 57

  /** 31-bit xorshift-multiply finalizer constants + shifts, shared
    * with the generated oracle SQL. PolyHash alone does NOT avalanche
    * short keys (a 5-digit id never wraps the 2^30 modulus, so its
    * low bits are nearly affine in the id and trailing-zeros is not
    * geometric — measured 78% HLL error on sequential ids); three
    * multiply-mod-2^31 / xor-shift rounds restore bit independence
    * (measured ≤ 15% at n = 10^2..3·10^5, well under the 3σ = 39%
    * contract). */
  val HllMixA: Seq[Long] = Seq(1597334677L, 1321536463L, 458845019L)
  val HllMixShift: Seq[Int] = Seq(15, 13, 16)
  private val M31 = 1L << 31

  /** The finalizer over the packed 60-bit PolyHash: fold the two
    * 30-bit lanes into 31 bits, then xorshift-multiply. All exact
    * long arithmetic (`(h - h mod 2^30) / 2^30` is a double division
    * of a 30-bit-ALIGNED value — exact where a direct `h / 2^30`
    * on a > 2^53 hash would not be). */
  private[graft] def hllMix(h: Column): Column = {
    val lane = lit(1L << 30)
    val h1 = ((h - pmod(h, lane)) / lane).cast("long")
    val h2 = pmod(h, lane)
    val x0 = pmod(h1 * lit(HllMixA.head) + h2, lit(M31))
    val x2 = HllMixA.tail.zip(HllMixShift).foldLeft(x0) { case (x, (a, s)) =>
      pmod(x.bitwiseXOR(shiftright(x, s)) * lit(a), lit(M31))
    }
    x2.bitwiseXOR(shiftright(x2, HllMixShift.last))
  }

  /** Exact trailing-zeros + 1 of a non-negative long column: an
    * integer CASE ladder (tz = j-1  ⟺  x mod 2^j = 2^(j-1)),
    * mirrored verbatim by the generated oracle SQL. */
  private[graft] def hllRho(suffix: Column, cap: Int = HllRhoCap): Column =
    (1 until cap).foldLeft(
      when(suffix === 0, lit(cap))) { (acc, j) =>
      acc.when(pmod(suffix, lit(1L << j)) === lit(1L << (j - 1)), lit(j))
    }.otherwise(lit(cap))

  /** 62-bit two-limb mix: limb1 = [[hllMix]](h), limb2 =
    * hllMix(h XOR limb1) — the CHAINED construction: feeding the
    * first limb back into the second's input decorrelates the limbs
    * even where the raw hash's lanes carry structure (the lane-SWAP
    * variant measured 49% error at n=10^5 on sequential ids because
    * short keys leave the high PolyHash lane low-entropy; the chain
    * measures ≤ 19% across n=10^3..3·10^5, inside the 3σ = 39%
    * contract). g = limb1·2^31 + limb2; every intermediate stays
    * < 2^62 — so the two-limb pipeline STILL replays exactly under
    * ANSI BIGINT on both engines, which is the whole point: the
    * 31-bit lane's ~2·10^9 ceiling lifts to ~64·2^56 ≈ 4.6·10^18
    * without giving up the oracle. */
  private[graft] def hllMix64(h: Column): Column = {
    val l1 = hllMix(h)
    l1 * lit(M31) + hllMix(h.bitwiseXOR(l1))
  }

  /** The register table (groupCol, bucket, reg) of `df`'s `keyCol`
    * values per group — ≤ [[HllM]] rows per group, built in one
    * map-collapsed aggregate. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val h = graft.functions.PolyHash.polyHash(col(keyCol).cast("string"))
    df.select(col(groupCol), hllMix(h).as("__g"))
      .select(col(groupCol), pmod(col("__g"), lit(HllM.toLong)).as("bucket"),
        // suffix via exact arithmetic: __g < 2^31, so the plain
        // integer-valued double division by 64 would already be
        // exact, but keep the aligned-subtract form for uniformity
        hllRho(((col("__g") - pmod(col("__g"), lit(HllM.toLong))) /
          lit(HllM.toLong)).cast("long")).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).cast("int").as("reg"))
  }

  /** The register table of the TWO-LIMB 62-bit lane — same shape,
    * same [[hllMergeRegisters]] merge law and same [[hllEstimate]]
    * readout as the 31-bit lane; only the geometric range differs
    * (rho ≤ [[HllRhoCap64]]). The suffix is extracted with an exact
    * integer shift (g < 2^62 does NOT survive a double division the
    * way the 31-bit lane's aligned value does). */
  def hllRegisters64(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val h = graft.functions.PolyHash.polyHash(col(keyCol).cast("string"))
    df.select(col(groupCol), hllMix64(h).as("__g"))
      .select(col(groupCol), pmod(col("__g"), lit(HllM.toLong)).as("bucket"),
        hllRho(shiftright(col("__g"), 6), HllRhoCap64).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).cast("int").as("reg"))
  }

  /** Lossless register merge: groupBy-max over the unioned tables.
    * merge(registers(A), registers(B)) == registers(A ∪ B) exactly. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("reg")).cast("int").as("reg"))

  /** Fixed-width integer-bin histogram — the mergeable QUANTILE store
    * (the q23 register store's counterpart for order statistics):
    * counts per (group, floor(value / binWidth)) merge by ADDITION,
    * so a persisted base histogram plus a delta's histogram equals
    * the full rebuild exactly, and any quantile reads off the
    * cumulative bins with error ≤ one binWidth — the warehouse
    * pattern for percentiles over 10¹¹ rows without a value-space
    * shuffle (bins are bounded by the value domain, not the row
    * count). Bin ids are exact on both engines: both compute the
    * same IEEE double division on the same parquet doubles. */
  def histBins(df: DataFrame, groupCol: String, valCol: String,
               binWidth: Double): DataFrame =
    df.groupBy(col(groupCol),
        floor(col(valCol) / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Additive histogram merge: merge(hist(A), hist(B)) == hist(A ∪ B)
    * exactly. */
  def histMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Median bin per group: the first bin whose cumulative count
    * reaches the lower-median rank k = (n+1) div 2 — exact integer
    * window arithmetic, replayable in SQL. State per group is the
    * bin count, never the row count. */
  def histMedianBin(bins: DataFrame, groupCol: String): DataFrame = {
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val cumW = byGroup.orderBy(col("bin"))
    bins
      .withColumn("__cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byGroup))
      .withColumn("__k", expr("(n + 1) div 2"))
      .filter(col("__cum") >= col("__k"))
      .groupBy(col(groupCol))
      .agg(min(col("bin")).as("median_bin"), min(col("n")).as("n"),
        min(col("__k")).as("k"))
  }

  /** The HLL cardinality estimator as a single Column over a register
    * aggregate's (n_regs, z = Σ 2^-reg) pair: alpha_64-corrected
    * harmonic mean with the small-range linear-counting switch at
    * 2.5·m (absent buckets contribute 2^0 = 1 each to the
    * denominator). THE one home of the estimator constants — both
    * [[hllEstimates]] and SketchQueries' contract readout use this
    * expression, so the formula cannot drift between the store API
    * and the q23/st13 gates. Float arithmetic lives only here; the
    * oracle checks the integer registers exactly and this estimate
    * via the within_bound contract. */
  private[graft] def hllEstimate(nRegs: Column, z: Column): Column = {
    val m = HllM.toDouble
    val alpha = 0.709 // alpha_64
    val raw = lit(alpha * m * m) / (z + (lit(m) - nRegs))
    val v = lit(m) - nRegs
    when(raw <= lit(2.5 * m) && v > 0, lit(m) * log(lit(m) / v)) // linear counting
      .otherwise(raw)
  }

  /** Cardinality estimate per group from a register table (see
    * [[hllEstimate]] for the estimator itself). */
  def hllEstimates(registers: DataFrame, groupCol: String): DataFrame =
    registers
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_regs"),
        sum(pow(lit(2.0), -col("reg"))).as("__z"))
      .withColumn("estimate", hllEstimate(col("n_regs"), col("__z")))
      .select(col(groupCol), col("n_regs"), col("estimate"))

  // --------------------------------------------------------------
  // KMV: the k-minimum-values distinct sketch (functions.KmvSketch) —
  // the third mergeable store next to the HLL register table (q23)
  // and the additive histogram (q24), and the only one of the three
  // that also estimates SET INTERSECTIONS (q26). Sketch rows are
  // plain (group, h) longs built on the SAME 62-bit two-limb mix as
  // the q23b HLL lane, so the whole pipeline — hash, bottom-k, merge,
  // intersection counts — replays in exact ANSI BIGINT SQL.
  // --------------------------------------------------------------

  /** Sketch size: RSD of the distinct estimate ≈ 1/√(k−2) ≈ 18%.
    * Sets with < k distinct keys are counted EXACTLY.
    *
    * DECISION BOUNDARY for the intersection screen: the Jaccard
    * estimate is binomial — J_est is the fraction of the |L| ≤ k
    * union samples present in both sketches, so se(J_est) ≈
    * √(J(1−J)/k). k = 32 separates "disjoint" from J ≳ 0.2 at 3σ —
    * the near-dup / contamination regime ov1's screen serves, where
    * any contaminated slice pair sits far above the band. It can NOT
    * tell J = 0.01 from J = 0.1 (both within noise): that boundary
    * needs se ≲ 0.03, i.e. k ≳ 200. Pass k explicitly for
    * finer-grained screens; KmvSpec's k-sweep row (32/128/512) pins
    * the √k error shrink empirically. */
  val KmvK: Int = 32
  /** Size of [[hllMix64]]'s hash space: g = limb1·2^31 + limb2 with
    * both limbs < 2^31, so g ∈ [0, 2^62). */
  val KmvSpace: Double = math.pow(2.0, 62)

  /** The uniform 62-bit key hash shared with the q23b HLL lane —
    * one mix, two sketches, one oracle-SQL fragment. */
  def kmvHash(keyCol: Column): Column =
    hllMix64(graft.functions.PolyHash.polyHash(keyCol.cast("string")))

  /** The sketch table (groupCol, h): the ≤ [[KmvK]] smallest distinct
    * key hashes per group, in one ObjectHashAggregate whose map-side
    * partial buffers are ≤ k longs — never a distinct-before-sketch
    * shuffle of the full key space. */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
                k: Int = KmvK): DataFrame =
    df.select(col(groupCol), kmvHash(col(keyCol)).as("__h"))
      .groupBy(col(groupCol))
      .agg(graft.functions.KmvSketch.kmv(k)(col("__h")).as("__sk"))
      .select(col(groupCol), explode(col("__sk")).as("h"))

  /** Lossless sketch merge: minK over the unioned sketch rows —
    * merge(kmv(A), kmv(B)) == kmv(A ∪ B) exactly (minK is idempotent,
    * commutative, associative), so an incremental store never drifts
    * from a full rebuild. Runs the same aggregator over sketch-sized
    * input (≤ 2k rows per group). */
  def kmvMergeSketches(a: DataFrame, b: DataFrame, groupCol: String,
                       k: Int = KmvK): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol))
      .agg(graft.functions.KmvSketch.kmv(k)(col("h")).as("__sk"))
      .select(col(groupCol), explode(col("__sk")).as("h"))

  /** The Beyer et al. unbiased estimator as a Column over a sketch
    * aggregate's (n_vals, max_h): exact count below k, else
    * (k−1)·|space|/h_(k). */
  def kmvEstimate(nVals: Column, maxH: Column, k: Int = KmvK): Column =
    when(nVals < k, nVals.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) / maxH.cast("double"))

  /** Intersection / Jaccard estimate from two SINGLE-SET sketch tables
    * (each: rows of distinct `h`, ≤ k of them). L = the k smallest of
    * the union is itself the KMV sketch of A ∪ B, hence a uniform
    * bottom-k sample of the union's hash space; the fraction of L
    * present in BOTH input sketches estimates Jaccard, and
    * ρ̂ · D̂(A ∪ B) estimates |A ∩ B| (Beyer et al. §4). Everything is
    * sketch-sized: the union frame is ≤ 2k rows, the membership joins
    * are ≤ k-row equi-joins. Returns one row of exact-integer sketch
    * evidence (n_l, max_h_l, n_inter) plus the float estimates. */
  /** All-pairs overlap matrix from ONE grouped sketch table
    * (groupCol, h): for every group pair (a < b), the [[kmvIntersect]]
    * statistics — L = minK(kmv(A) ∪ kmv(B)), |L ∩ kmv(A) ∩ kmv(B)| —
    * computed wholesale. This is the S-slice contamination SCREEN: the
    * corpus is touched ONCE (by the sketch build); everything here
    * runs on sketch-sized frames — the pair frame is ≤ S² rows (one
    * equi-join per side, never slice data), the per-pair union is
    * ≤ 2k rows, and the bottom-k per pair rides the bounded-heap
    * TopKPerGroup, so the matrix costs O(S²·k) regardless of corpus
    * size. Returns (groupA, groupB, n_l, max_h_l, n_inter) exact
    * integers per pair. */
  def kmvOverlapMatrix(sketch: DataFrame, groupCol: String,
                       k: Int = KmvK): DataFrame = {
    val grouped = groupedSketch(sketch, groupCol)
    pairStats(grouped.select(col(groupCol).as("__ga"), col("__hs").as("__ha"))
      .join(grouped.select(col(groupCol).as("__gb"), col("__hs").as("__hb")),
        col("__ga") < col("__gb")), k)
  }

  /** One row per group, its sketch as a SORTED array (≤ k longs) —
    * the S-row frame every pair computation should join against
    * instead of re-exploding S·k hash rows. */
  private def groupedSketch(sketch: DataFrame, groupCol: String): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("__hs"))

  /** Per-pair KMV stats as pure SCALAR array math over a
    * (__ga, __gb, __ha, __hb) pair frame: L = the k smallest of the
    * distinct union (both inputs carry distinct hashes, so
    * slice(sort(distinct(concat)))), n_l = |L|, max_h_l = L's last
    * element, n_inter = |L ∩ A ∩ B|. O(k log k) per row in
    * whole-stage codegen — no per-hash explosion, no union shuffle,
    * no per-pair TopK heap; the EXACT same integers as the exploded
    * formulation (asserted in SketchesSpec). */
  private def pairStats(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("__l", // sort_array, not array_sort: no comparator lambda
        slice(sort_array(array_distinct(concat(col("__ha"), col("__hb")))), 1, k))
      .select(col("__ga"), col("__gb"),
        size(col("__l")).cast("long").as("n_l"),
        element_at(col("__l"), size(col("__l"))).as("max_h_l"),
        size(array_intersect(array_intersect(col("__l"), col("__ha")),
          col("__hb"))).cast("long").as("n_inter"))

  /** The bottom-k-hash PRESCREEN: group pairs sharing at least one
    * sketch hash, via ONE equi-join on h. Sound with no false
    * negatives for overlap: n_inter > 0 requires a hash present in
    * both sketches, so a pair absent here has n_inter = 0 exactly.
    * This is what keeps the matrix OUTPUT-SIZED at large S — the
    * join's frame is the candidate pairs themselves, never the S²/2
    * cross frame (disjoint sources never meet; spec'd on a
    * many-source disjoint fixture in SketchesSpec). */
  def kmvOverlapCandidates(sketch: DataFrame, groupCol: String): DataFrame =
    sketch.select(col(groupCol).as("__ga"), col("h"))
      .join(sketch.select(col(groupCol).as("__gb"), col("h")), Seq("h"))
      .filter(col("__ga") < col("__gb"))
      .select(col("__ga"), col("__gb")).distinct()

  /** [[kmvOverlapMatrix]] restricted to the prescreen's candidate
    * pairs — the 100 TB face of the contamination screen. The dense
    * matrix is right for small S (every pair's union stats, including
    * provably-disjoint ones); at S = 10⁴ sources its S²/2-pair frame
    * is 5·10⁷ rows of which almost all are disjoint noise a screen
    * never acts on. Here the pair frame is the candidates alone
    * (output-sized), each pair's stats the same exact scalar array
    * math — the sparse result equals the dense matrix filtered to
    * pairs sharing ≥ 1 bottom-k hash (a superset of n_inter > 0). */
  def kmvOverlapMatrixSparse(sketch: DataFrame, groupCol: String,
                             k: Int = KmvK): DataFrame = {
    val grouped = groupedSketch(sketch, groupCol)
    pairStats(kmvOverlapCandidates(sketch, groupCol)
      .join(grouped.select(col(groupCol).as("__ga"), col("__hs").as("__ha")),
        Seq("__ga"))
      .join(grouped.select(col(groupCol).as("__gb"), col("__hs").as("__hb")),
        Seq("__gb")), k)
  }

  /** Set-DIFFERENCE estimates from two single-set sketch tables — the
    * SNAPSHOT-DELTA screen the intersection alone can't answer
    * asymmetrically ("how much of slice A is NOT already in B", e.g.
    * genuinely-new corpus mass between two training snapshots): the
    * same bottom-k union sample L as [[kmvIntersect]], membership
    * counted ONE-SIDED. L is a uniform sample of A ∪ B's hash space,
    * so |L ∩ A∖B| / |L| estimates |A∖B| / |A∪B| with q26's binomial
    * error, and ρ̂ · D̂(A∪B) estimates |A∖B|. Everything sketch-sized;
    * exact-integer evidence (n_l, max_h_l, n_a_only, n_b_only) rides
    * ahead of the float estimates for the oracle. */
  def kmvDifference(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame = {
    val l = a.select(col("h")).unionByName(b.select(col("h")))
      .distinct().orderBy(col("h")).limit(k)
    l.join(a.select(col("h"), lit(1).as("__ina")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1).as("__inb")), Seq("h"), "left")
      .agg(count(lit(1)).as("n_l"), max(col("h")).as("max_h_l"),
        count(when(col("__ina") === 1 && col("__inb").isNull, 1)).as("n_a_only"),
        count(when(col("__inb") === 1 && col("__ina").isNull, 1)).as("n_b_only"))
      .withColumn("union_est", kmvEstimate(col("n_l"), col("max_h_l"), k))
      .withColumn("a_minus_b_est",
        col("n_a_only") / col("n_l") * col("union_est"))
      .withColumn("b_minus_a_est",
        col("n_b_only") / col("n_l") * col("union_est"))
  }

  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame = {
    val l = a.select(col("h")).unionByName(b.select(col("h")))
      .distinct().orderBy(col("h")).limit(k)
    l.join(a.select(col("h"), lit(1).as("__ina")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1).as("__inb")), Seq("h"), "left")
      .agg(count(lit(1)).as("n_l"), max(col("h")).as("max_h_l"),
        count(when(col("__ina") === 1 && col("__inb") === 1, 1)).as("n_inter"))
      .withColumn("jaccard_est", col("n_inter") / col("n_l"))
      .withColumn("union_est", kmvEstimate(col("n_l"), col("max_h_l"), k))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  // ===== parameter-pinned sketch stores =====
  //
  // The `_graft_meta` discipline (component/edge/BM25/LSH stores)
  // applied to the SKETCH families — the r13 verdict's ask #2. Every
  // persisted sketch freezes its parameters into the artifact at
  // write time: a KMV store built at k=32 merged with a k=64 delta,
  // a CMS cell table probed with a different width, an HLL register
  // table max-merged across limb lanes, a histogram added across bin
  // widths, or a weighted sample refolded under a different salt all
  // produce PLAUSIBLE-LOOKING, silently-wrong estimates — no schema
  // mismatch, no exception, just corrupt numbers. These faces pin the
  // parameters in a family-tagged sidecar (etl.StoreMeta.pinFamily)
  // and every merge resolves them FROM THE STORE, failing fast when a
  // caller's explicit expectation disagrees — so the foreign-parameter
  // case is honored end-to-end (the delta is sketched at the store's
  // pinned parameters, not the caller's default) and the mismatch case
  // is an error, never a corruption. Write order is data-then-pin:
  // these writes are `overwrite` (which deletes the target dir), so
  // the sidecar must FOLLOW the data; the crash window (data, no
  // sidecar) fail-fasts on the next merge and heals by re-running the
  // unconditional overwrite write.

  private def metaInt(m: Map[String, String], path: String, key: String): Int = {
    require(m.contains(key),
      s"sketch store at $path pins no '$key' — sidecar: $m")
    m(key).toInt
  }

  /** Seed a pinned KMV store: the ≤k-smallest-hash sketch of `df`,
    * with k frozen in the sidecar. */
  def writeKmvStore(df: DataFrame, groupCol: String, keyCol: String,
                    path: String, k: Int = KmvK): Unit = {
    val spark = df.sparkSession
    kmvSketch(df, groupCol, keyCol, k).write.mode("overwrite").parquet(path)
    graft.etl.StoreMeta.pinFamily(spark, path, "kmv", Map("k" -> k.toString))
  }

  /** The store's pinned k (fail-fast on a pre-pin or foreign-family
    * store). */
  def kmvStoreK(spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val m = graft.etl.StoreMeta.requireFamily(spark, path, "kmv")
      .getOrElse(sys.error(s"no KMV store at $path"))
    metaInt(m, path, "k")
  }

  /** Merge delta ROWS into the pinned store's sketch: the delta is
    * sketched at the STORE's k — a foreign pinned k is honored end to
    * end — and an explicit caller expectation (expectK > 0) that
    * disagrees fail-fasts instead of corrupting the bottom-k. Returns
    * (merged sketch, the pinned k) so readouts estimate at the k the
    * store was built with. */
  def mergeKmvStoreDelta(spark: org.apache.spark.sql.SparkSession,
                         path: String, deltaRows: DataFrame,
                         groupCol: String, keyCol: String,
                         expectK: Int = 0): (DataFrame, Int) = {
    val k = kmvStoreK(spark, path)
    require(expectK <= 0 || expectK == k,
      s"KMV store at $path is pinned to k=$k but the caller expects " +
        s"k=$expectK — merging mismatched bottom-k sketches silently " +
        "corrupts the estimate")
    (kmvMergeSketches(spark.read.parquet(path),
      kmvSketch(deltaRows, groupCol, keyCol, k), groupCol, k), k)
  }

  /** Seed a pinned CMS store: the (j, bucket, cnt) counter table with
    * width×depth frozen in the sidecar (the PolyHash family constants
    * are part of the code's contract — a `hash` version tag pins them
    * so a future family change can't silently add cells across
    * incompatible hashes). */
  def writeCmsStore(df: DataFrame, keyCol: String, path: String,
                    width: Int = 64, depth: Int = 4): Unit = {
    val spark = df.sparkSession
    countMin(df, keyCol, width, depth).write.mode("overwrite").parquet(path)
    graft.etl.StoreMeta.pinFamily(spark, path, "cms", Map(
      "width" -> width.toString, "depth" -> depth.toString, "hash" -> "poly1"))
  }

  /** The store's pinned (width, depth). */
  def cmsStoreParams(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Int, Int) = {
    val m = graft.etl.StoreMeta.requireFamily(spark, path, "cms")
      .getOrElse(sys.error(s"no CMS store at $path"))
    require(m.get("hash").forall(_ == "poly1"),
      s"CMS store at $path was built with hash family ${m.get("hash")} — " +
        "this build sketches with poly1; adding cells across hash " +
        "families is meaningless")
    (metaInt(m, path, "width"), metaInt(m, path, "depth"))
  }

  /** Merge delta ROWS into the pinned CMS store's cells at the
    * store's own width×depth; an explicit caller expectation that
    * disagrees fail-fasts. Returns (merged cells, width, depth) so
    * point queries probe with the pinned geometry. */
  def mergeCmsStoreDelta(spark: org.apache.spark.sql.SparkSession,
                         path: String, deltaRows: DataFrame, keyCol: String,
                         expectWidth: Int = 0, expectDepth: Int = 0)
      : (DataFrame, Int, Int) = {
    val (w, d) = cmsStoreParams(spark, path)
    require((expectWidth <= 0 || expectWidth == w) &&
        (expectDepth <= 0 || expectDepth == d),
      s"CMS store at $path is pinned to width=$w depth=$d but the caller " +
        s"expects width=$expectWidth depth=$expectDepth — adding counter " +
        "cells across geometries silently corrupts every estimate")
    (cmMergeCells(spark.read.parquet(path), countMin(deltaRows, keyCol, w, d)),
      w, d)
  }

  /** Seed a pinned HLL register store. `lane` picks the mix: 32 =
    * [[hllRegisters]] (31-bit, ~2·10^9 ceiling), 64 =
    * [[hllRegisters64]] (two-limb 62-bit). The register count m and
    * the lane are both frozen: max-merging registers built from
    * DIFFERENT mixes is meaningless even at the same m. */
  def writeHllStore(df: DataFrame, groupCol: String, keyCol: String,
                    path: String, lane: Int = 32): Unit = {
    require(lane == 32 || lane == 64, s"unknown HLL lane $lane")
    val spark = df.sparkSession
    val regs = if (lane == 64) hllRegisters64(df, groupCol, keyCol)
               else hllRegisters(df, groupCol, keyCol)
    regs.write.mode("overwrite").parquet(path)
    graft.etl.StoreMeta.pinFamily(spark, path, "hll", Map(
      "m" -> HllM.toString, "lane" -> lane.toString))
  }

  /** Merge delta ROWS into the pinned HLL store: the delta's
    * registers are built with the STORE's pinned lane, and a caller
    * expectation (expectLane > 0) that disagrees fail-fasts. The
    * pinned m must equal this build's [[HllM]] — the register count
    * is a code constant here, so a store from a different-m build
    * cannot be merged, only re-sketched. Returns (merged registers,
    * lane). */
  def mergeHllStoreDelta(spark: org.apache.spark.sql.SparkSession,
                         path: String, deltaRows: DataFrame,
                         groupCol: String, keyCol: String,
                         expectLane: Int = 0): (DataFrame, Int) = {
    val m = graft.etl.StoreMeta.requireFamily(spark, path, "hll")
      .getOrElse(sys.error(s"no HLL store at $path"))
    val pinnedM = metaInt(m, path, "m")
    require(pinnedM == HllM,
      s"HLL store at $path is pinned to m=$pinnedM registers but this " +
        s"build sketches at m=$HllM — max-merging across register counts " +
        "silently corrupts the harmonic estimate; rebuild the store")
    val lane = metaInt(m, path, "lane")
    require(expectLane <= 0 || expectLane == lane,
      s"HLL store at $path is pinned to the $lane-bit limb lane but the " +
        s"caller expects $expectLane — the two mixes share nothing; " +
        "max-merging them is meaningless")
    val deltaRegs = if (lane == 64) hllRegisters64(deltaRows, groupCol, keyCol)
                    else hllRegisters(deltaRows, groupCol, keyCol)
    (hllMergeRegisters(spark.read.parquet(path), deltaRegs, groupCol), lane)
  }

  /** Seed a pinned histogram store with the bin width frozen (bins
    * are floor(v / w): adding counts across widths mixes
    * incompatible bin ids that happen to collide numerically). The
    * width round-trips through the sidecar as its exact Java double
    * string. */
  def writeHistStore(df: DataFrame, groupCol: String, valCol: String,
                     path: String, binWidth: Double): Unit = {
    val spark = df.sparkSession
    histBins(df, groupCol, valCol, binWidth)
      .write.mode("overwrite").parquet(path)
    graft.etl.StoreMeta.pinFamily(spark, path, "hist", Map(
      "bin_width" -> binWidth.toString))
  }

  /** Merge delta ROWS into the pinned histogram store at the store's
    * own bin width; a caller expectation (expectWidth, NaN = none)
    * that disagrees fail-fasts. Returns (merged bins, width). */
  def mergeHistStoreDelta(spark: org.apache.spark.sql.SparkSession,
                          path: String, deltaRows: DataFrame,
                          groupCol: String, valCol: String,
                          expectWidth: Double = Double.NaN)
      : (DataFrame, Double) = {
    val m = graft.etl.StoreMeta.requireFamily(spark, path, "hist")
      .getOrElse(sys.error(s"no histogram store at $path"))
    require(m.contains("bin_width"),
      s"histogram store at $path pins no 'bin_width' — sidecar: $m")
    val w = m("bin_width").toDouble
    require(expectWidth.isNaN || expectWidth == w,
      s"histogram store at $path is pinned to bin_width=$w but the " +
        s"caller expects $expectWidth — adding counts across bin widths " +
        "silently corrupts every quantile")
    (histMerge(spark.read.parquet(path),
      histBins(deltaRows, groupCol, valCol, w), groupCol), w)
  }
}
