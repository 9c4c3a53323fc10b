package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank — the link-graph quality signal used to weight
  * web-crawl pretraining corpora since the original use case (page
  * quality ranking; crawl pipelines still rank hosts/documents by
  * centrality before sampling). Plain power iteration on the sparse
  * transition matrix.
  *
  * Scale shape per round: ONE join (ranks ⋈ edges on src — both sides
  * hash-partitioned on the node key, and the rank side carries 16
  * bytes/row) and ONE groupBy(dst) aggregate with map-side partials.
  * Degrees are computed once and live WITH the rank table (joined into
  * it), so the per-round join is rank-table-sized, never edge-count
  * re-derivation. Nothing is ever collected to the driver; `iters` is
  * a small constant, so the lineage stays shallow (each round is
  * localCheckpointed to keep job DAGs flat, the d6/d7 pointer-jumping
  * discipline).
  *
  * Engine-portable determinism (the km1/svd1 quantization recipe, third
  * instance): every round's ranks are quantized to the 1e-9 grid —
  * 1e9 is binary-exact and ranks are ≤ 1, so floor(x·1e9+0.5) stays
  * within 2^53 and both engines compute identical grids; the next
  * round's contributions then divide and sum bit-identical inputs.
  * Dangling nodes (no out-edges) are supported: their mass
  * redistributes uniformly — the aggregate-then-broadcast pattern, one
  * scalar row. */
object PageRank {

  /** floor(x·1e9+0.5)/1e9 as a column — 9-digit grid (exactRound's
    * helper caps at 6; ranks are ≤ 1 so the product stays exact). */
  private def r9(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000000L) + lit(0.5)) / lit(1000000000L)

  /** Synchronous label propagation — community detection over an
    * undirected graph (Raghavan et al. 2007): every node starts as its
    * own label; each round it adopts the most frequent label among its
    * neighbors (ties to the smallest label; isolated semantics never
    * arise on an edge-derived node set). Communities are the
    * coarse-grained sibling of connected components (d6): CC merges
    * everything reachable, LPA splits a component along its dense
    * cores — the corpus-organization view dedup families feed on.
    *
    * Scale shape per round: one labels⋈edges join (labels carry 16
    * bytes/row) + one (dst, label) count aggregate + one per-dst
    * argmax — all map-side-partial'd, the same edge-linear budget as
    * [[ranks]]. Entirely INTEGER arithmetic: no quantization needed,
    * every round replays exactly in SQL by construction. Deterministic
    * synchronous updates (classic LPA is randomized-asynchronous; the
    * synchronous min-tie variant trades oscillation-resistance for
    * exact reproducibility — oscillation is bounded out by the fixed
    * round count). Returns (node, label) after `iters` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): DataFrame = {
    require(iters >= 1)
    // undirected: propagate along both directions
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
      .repartition(col("src")).localCheckpoint()
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label")).localCheckpoint()
    for (_ <- 1 to iters) {
      val counts = labels.join(e, col("node") === col("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("__c"))
      // per-dst argmax as a HASH AGGREGATE, not a window (r16): the
      // window paid a third exchange + full sort per round; max over
      // the (count, -label) struct is the same (count desc, label asc)
      // rank-1 pick — lexicographic struct max takes the largest count,
      // then the largest -label = the SMALLEST label — with map-side
      // partials and no sort. Labels are node ids from an edge-derived
      // node set (never MinValue), so the negation is exact.
      labels = counts
        .groupBy(col("dst"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("dst").as("node"), (-col("__m.__nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Personalized PageRank (topic-sensitive; Haveliwala 2002): the
    * restart distribution concentrates on a SEED set instead of being
    * uniform — rank(v) = (1-d)·s(v) + d·(Σ in-mass + dangling·s(v)),
    * with s = 1/|S∩V| on seeds present in the graph and 0 elsewhere.
    * Dangling mass teleports BACK TO THE SEEDS (the standard PPR
    * convention), so total mass stays 1 and scores read as
    * "importance relative to the seed neighborhood" — how a corpus
    * build ranks hosts/documents against a trusted domain whitelist
    * rather than global centrality.
    *
    * Same per-round budget and 1e-9 quantization recipe as [[ranks]]
    * (one nodes-sized join against the once-partitioned edge table +
    * one aggregate; the seed column rides in the rank table, 8 more
    * bytes/row). Seeds not present in the graph are ignored and the
    * seed mass renormalizes over the survivors. */
  def personalizedRanks(edges: DataFrame, srcCol: String, dstCol: String,
                        seeds: DataFrame, seedCol: String,
                        iters: Int = 3, damping: Double = 0.85,
                        assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1)
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .repartition(col("src")).localCheckpoint()
    val base = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("isrc")),
        struct(col("dst").as("node"), lit(0L).as("isrc")))).as("x"))
      .select(col("x.node").as("node"), col("x.isrc").as("isrc"))
      .groupBy(col("node")).agg(sum(col("isrc")).as("deg"))
      .localCheckpoint()
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
    val seedNodes = base.join(sd, Seq("node"), "left_semi")
      .select(col("node")).localCheckpoint()
    val m = seedNodes.count() // one bounded action; reused as a literal
    require(m > 0, "no seed is a node of the graph")
    val based = base
      .join(seedNodes.withColumn("__is", lit(1)), Seq("node"), "left")
      .select(col("node"), col("deg"),
        r9(when(col("__is").isNotNull, lit(1.0) / m)
          .otherwise(lit(0.0))).as("s"))
      .localCheckpoint()
    var ranks = based.select(col("node"), col("deg"), col("s"),
      col("s").as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = ranks.filter(col("deg") > 0)
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("in_mass"))
      val dangling = ranks.filter(col("deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      ranks = based
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("deg"), col("s"),
          r9(lit(1.0 - damping) * col("s") +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("dmass") * col("s"))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }

  /** PageRank over a directed edge list (srcCol, dstCol). Returns
    * (node, rank) with rank on the 1e-9 grid.
    *
    * @param assumeDistinct callers that KNOW the edge list is already
    *   deduplicated (e.g. built from a distinct projection) skip the
    *   defensive distinct — one corpus-sized exchange saved. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 3, damping: Double = 0.85,
            assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1)
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // hash-partition the (checkpointed) edge table on src ONCE:
    // localCheckpoint preserves outputPartitioning, so every round's
    // ranks⋈edges join exchanges only the rank table (nodes-sized) —
    // the edge table, the corpus-sized side, never moves again. This
    // is what turned the sf10 measurement from ~linear to sub-linear.
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .repartition(col("src")).localCheckpoint()
    // node table with out-degree (0 = dangling) in ONE exchange: each
    // edge contributes its src (deg 1) and dst (deg 0) endpoint rows,
    // aggregated per node — replaces two distincts + a groupBy + a join
    val base = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("isrc")),
        struct(col("dst").as("node"), lit(0L).as("isrc")))).as("x"))
      .select(col("x.node").as("node"), col("x.isrc").as("isrc"))
      .groupBy(col("node")).agg(sum(col("isrc")).as("deg"))
      .localCheckpoint()
    val n = base.count() // one bounded action; reused as a literal
    var ranks = base.select(col("node"), col("deg"),
      r9(lit(1.0) / n).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = ranks.filter(col("deg") > 0)
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("in_mass"))
      // dangling mass: one scalar row, broadcast into every node
      val dangling = ranks.filter(col("deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      ranks = ranks.select(col("node"), col("deg"))
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("deg"),
          r9(lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("dmass") / n)).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }
}
