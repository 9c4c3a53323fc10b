package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.exactRound
import graft.ops.Profiling

/** Profiling / pipeline-operations exemplars (ops.Profiling) plus the
  * event-sequence pattern face: the "inspect before you run" ops a
  * 100 TB pipeline runs against its own inputs — drift monitoring
  * between snapshots, key-skew profiling ahead of joins, compaction
  * planning over file metadata, feature correlation screens, and
  * MATCH_RECOGNIZE-style sequence detection. */
object ProfileQueries {

  /** ks1 — distribution drift of o_totalprice between the pre-1998
    * orders (slice A) and the rest (slice B): binned KS statistic and
    * PSI over 20 fixed-width price bins. One partial-aggregated
    * groupBy over ≤ 20 keys; the cumulative/log analysis runs on the
    * bin frame. PSI ≥ 0.2 is the conventional "investigate" line. */
  def priceDrift(spark: SparkSession, dir: String): DataFrame =
    driftReadout(Profiling.driftBins(Tables.orders(spark, dir),
      "o_totalprice", isA = priceDriftIsA, binWidth = 25000.0, nBins = 20))

  /** ks1's slice predicate, shared with the streaming face (st16) so
    * both build the SAME bin frame and gate on the SAME oracle. */
  private[graft] val priceDriftIsA =
    col("o_orderdate") < lit("1998-01-01").cast("timestamp")

  /** Shared ks1/st16 readout over a (bin, cnt_a, cnt_b) frame —
    * additive bin counts make the streaming state ≡ the batch frame,
    * so the two faces differ only in where the bins came from. */
  private[graft] def driftReadout(bins: DataFrame): DataFrame =
    Profiling.driftFromBins(bins)
      .select(col("n_a"), col("n_b"),
        exactRound(col("ks_stat"), 6).as("ks_stat"),
        exactRound(col("psi"), 6).as("psi"),
        col("n_null_a"), col("n_null_b"))

  /** pf1 — key-skew profile of orders.o_custkey (the decide-before-
    * you-join diagnostic feeding j12's salt choice): distinct keys,
    * hottest key + share, top-10 share, normalized key entropy. */
  def custkeySkewProfile(spark: SparkSession, dir: String): DataFrame =
    Profiling.keySkewProfile(Tables.orders(spark, dir), "o_custkey",
        topN = 10)
      .select(col("n_keys"), col("n_rows"), col("hot_key"),
        exactRound(col("hot_share"), 6).as("hot_share"),
        exactRound(col("topn_share"), 6).as("topn_share"),
        exactRound(col("norm_entropy"), 6).as("norm_entropy"))

  /** fp1 — compaction plan over the events table's (event_type, day)
    * "files" (row counts stand in for bytes): target-sized bins that
    * preserve day order within each event_type partition, so the
    * rewrite keeps time-clustering. The plan itself is a window over
    * the ~150-row file-metadata frame — the data is touched once, by
    * the metadata aggregation. */
  def eventCompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("size_rows"))
    Profiling.compactionPlan(files, "event_type", "day", "size_rows",
        target = 300L)
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("size_rows"), col("bin"))
      .orderBy(col("event_type"), col("day"))
  }

  /** cm1 — Pearson correlation screen over lineitem's numeric
    * columns, every pair in ONE partial-aggregated pass (six corr
    * aggregates share the scan), unpivoted to (col_a, col_b, corr)
    * rows for the gate. The feature-redundancy screen a training
    * pipeline runs before fitting anything. */
  def featureCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      corr(col(a), col(b)).as(s"${a}__$b")
    }
    val one = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'$a', '$b', `${a}__$b`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr_raw)")
      .select(col("col_a"), col("col_b"),
        exactRound(col("corr_raw"), 6).as("corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** The cm1b/st22 feature set: exact 2-decimal columns, so DECIMAL
    * moment sums are exact and the store face merges losslessly. */
  val CorrCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** cm1b — the correlation matrix from an INCREMENTALLY-maintained
    * MOMENT store (ops.Profiling.corrMoments/cmAddMoments): the
    * classic additive sufficient-statistics sketch as a store face.
    * The base slice's one-row moment table (n, Σx, Σx·y in exact
    * DECIMAL) persists once; the delta's moments ADD — decimal sums
    * are exact and associative, so store + delta equals the full
    * rebuild bit-for-bit — and the Pearson readout is a deterministic
    * double formula over the exact moments, replayed verbatim by the
    * oracle. The 100 TB shape: correlation freshness costs one
    * delta-sized pass + an O(k²)-value merge; the corpus is never
    * rescanned. (cm1's DuckDB-corr oracle stays: this face carries
    * its own moment-replay oracle because the two accumulate
    * differently at the last double digit.) */
  def corrMatrixStore(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val store = momentStoreCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_cm_store").toString
      Profiling.corrMoments(
          li.filter(col("l_orderkey") % 10 =!= 3), CorrCols)
        .write.parquet(s"$p/m")
      s"$p/m"
    })
    val merged = Profiling.cmAddMoments(
      spark.read.parquet(store),
      Profiling.corrMoments(li.filter(col("l_orderkey") % 10 === 3), CorrCols))
    Profiling.corrFromMoments(merged, CorrCols)
      .select(col("col_a"), col("col_b"),
        exactRound(col("corr_raw"), 6).as("corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  private val momentStoreCache = StoreCaches.register("cm1b_corr_store")

  /** seq1 — MATCH_RECOGNIZE-style event-sequence detection per user:
    * each user's event history becomes an ordered code string (one
    * char per event type), then pattern hits are plain regex/substring
    * algebra on that string — `V.*C.*P` (viewed, later clicked, later
    * purchased, any gaps) and the count of immediate click→purchase
    * bigrams. ONE shuffle by user_id; per-user state is that user's
    * own history (the sessionization-scale assumption; a pathological
    * hot user is st2/w11's salting problem, not this operator's).
    * String building is the native ordered-aggregate
    * `listagg … WITHIN GROUP (ORDER BY ts, event_id)` — no interpreted
    * array lambda, and the (ts, event_id) order key is total, so the
    * code string is engine-independent. */
  def sequencePatterns(spark: SparkSession, dir: String): DataFrame =
    sequencePatternsOf(Tables.events(spark, dir))

  /** [[sequencePatterns]] over an explicit events frame (spec seam). */
  private[graft] def sequencePatternsOf(events: DataFrame): DataFrame = {
    val code = when(col("event_type") === "signup", "S")
      .when(col("event_type") === "view", "V")
      .when(col("event_type") === "click", "C")
      .when(col("event_type") === "purchase", "P")
      .otherwise("E")
    val seqs = events
      .select(col("user_id"), col("ts"), col("event_id"), code.as("code"))
      .groupBy(col("user_id"))
      .agg(expr("listagg(code, '') WITHIN GROUP (ORDER BY ts, event_id)")
        .as("seq"))
    seqs.select(col("user_id"), length(col("seq")).as("n_events"),
        col("seq").rlike("V.*C.*P").cast("int").as("matched_vcp"),
        ((length(col("seq")) - length(regexp_replace(col("seq"), "CP", "")))
          / 2).cast("long").as("n_cp_bigrams"))
      .orderBy(col("user_id"))
  }
}
