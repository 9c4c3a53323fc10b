package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree orientation — the graph
  * third leg next to PageRank (pr1) and label propagation (lp1):
  * clustering-structure measurement over a similarity/co-occurrence
  * graph (triangle-dense neighborhoods = tight near-dup or community
  * cores; triangle-free hubs = spam-like link patterns).
  *
  * The naive wedge join explodes on hubs: a degree-d node contributes
  * d² wedges. Degree orientation (Suri & Vassilvitskii WWW'11 shape)
  * fixes the bound structurally: orient every undirected edge from the
  * endpoint with the smaller (degree, id) to the larger, making the
  * graph a DAG where every node's OUT-degree is O(√m) — a node of
  * out-degree k must have k neighbors of degree ≥ its own. Each
  * triangle {a ≺ b ≺ c} then exists exactly once as wedges a→b, a→c
  * closed by b→c, so:
  *  - wedges = oriented ⋈ oriented on the source (out-degree-bounded
  *    fan-out, Σ out² = O(m^1.5) worst case instead of Σ deg²);
  *  - closure = one equi-join of the wedge list against the oriented
  *    edge list on (b, c) — no membership broadcast, no driver state;
  *  - per-node counts = explode the 3 corners + one aggregate.
  *
  * Every exchange carries (long, long) node pairs — 16 bytes/row.
  * Input edges may be directed/duplicated/self-looped; normalization
  * (id-ordering + distinct) happens here unless `assumeDistinct`
  * promises id-ordered distinct loop-free edges.
  *
  * Returns (node, n_tri) for every node in at least one triangle.
  */
object Triangles {

  def perNode(edges: DataFrame, srcCol: String, dstCol: String,
              assumeDistinct: Boolean = false): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val und =
      if (assumeDistinct) e0
      else e0.filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct()
    // Undirected degree per node (each edge touches both endpoints).
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient by the (degree, id) total order; keep the head's order key
    // so the wedge join can order its two endpoints the same way.
    val oriented = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
          .otherwise(
            struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    // Wedges from each source, endpoints ordered by the SAME
    // (degree, id) order the orientation used — the closure edge
    // between them, if present, is then oriented b -> c exactly.
    val w1 = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val w2 = oriented.select(col("s"), col("t").as("c"), col("dt").as("dc"))
    val wedges = w1.join(w2, "s")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("s").as("a"), col("b"), col("c"))
    val closure = oriented.select(col("s").as("b"), col("t").as("c"))
    val tris = wedges.join(closure, Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** INCREMENTAL per-node triangle counts — the graph family's store
    * face (the d6b root-contraction discipline applied to triangle
    * structure): absorb a batch of new edges into stored (node, n_tri)
    * counts WITHOUT re-running the O(m^1.5) orientation pass over the
    * accumulated graph.
    *
    * Exactness: triangles(E ∪ D) = triangles(E) ⊎ {triangles with ≥ 1
    * D edge} — the increments enumerate exactly the second set, so
    * stored counts plus increments equal a full recount bit-for-bit
    * (tc2 gates on tc1's oracle VERBATIM on this identity).
    * Enumeration probes from each novel edge's LOWER-degree endpoint
    * (the Suri-Vassilvitskii orientation applied to the delta alone),
    * so candidate wedges are Σ_{(u,v)∈D} min(deg u, deg v) — never a
    * hub's full d² fan-out — closed by one equi-join against the
    * updated edge set and DEDUPED by sorted triple (a triangle with 2
    * or 3 novel edges is found once per novel edge and must count
    * once). Replay-idempotent: already-stored delta edges anti-join
    * away, an empty novel set adds nothing. */
  def mergeTriangleCounts(storedCounts: DataFrame, storedEdges: DataFrame,
                          deltaEdges: DataFrame, srcCol: String,
                          dstCol: String,
                          assumeNovel: Boolean = false): DataFrame = {
    // assumeNovel: the caller promises id-ordered distinct loop-free
    // edges ALREADY anti-joined against the store (triangleCountStream
    // runs that join itself) — skipping it here avoids paying the
    // store-sized scan twice per micro-batch
    val novel =
      if (assumeNovel)
        // the caller checkpointed its novel frame already — the narrow
        // rename-select below re-plans for free over that RDD
        deltaEdges.select(col(srcCol).cast("long").as("u"),
          col(dstCol).cast("long").as("v"))
      else {
        val e0 = deltaEdges.select(col(srcCol).cast("long").as("u"),
          col(dstCol).cast("long").as("v"))
        e0.filter(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("u"),
            greatest(col("u"), col("v")).as("v"))
          .distinct()
          .join(storedEdges.select(col("u"), col("v")),
            Seq("u", "v"), "left_anti")
          .localCheckpoint() // feeds the union, the orient, the probe
      }
    val full = storedEdges.select(col("u"), col("v")).unionByName(novel)
      .localCheckpoint() // feeds adjacency, degrees and the closure join
    val adj = full.select(col("u").as("a"), col("v").as("b"))
      .unionByName(full.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy(col("a").as("n")).agg(count(lit(1)).as("d"))
    // orient each novel edge: probe from the lower-(degree, id) side
    val orientedD = novel
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val cand = orientedD
      .join(adj.select(col("a").as("s"), col("b").as("w")), Seq("s"))
      .filter(col("w") =!= col("t"))
    val closed = cand.join(
      full.select(col("u").as("__cu"), col("v").as("__cv")),
      least(col("t"), col("w")) === col("__cu") &&
        greatest(col("t"), col("w")) === col("__cv"),
      "left_semi")
    val inc = closed
      // sort_array, not array_sort: the latter plans a comparator lambda
      .select(sort_array(array(col("s"), col("t"), col("w"))).as("__tri"))
      .distinct()
      .select(explode(col("__tri")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("__inc"))
    storedCounts.select(col("node"), col("n_tri"))
      .join(inc, Seq("node"), "full_outer")
      .select(col("node"),
        (coalesce(col("n_tri"), lit(0L)) + coalesce(col("__inc"), lit(0L)))
          .as("n_tri"))
  }
}
