package graft

import graft.analytics.{CoreQueries, DedupQueries, ScalarQueries}

/** Physical-plan shape checks: the optimizations the engine depends on
  * at scale must actually appear in the executed plan — filter/column
  * pushdown into the parquet scan, broadcast joins for dimensions,
  * partial aggregation, whole-stage codegen around the hot expressions.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (p3 source range)") {
    val p = plan(ScalarQueries.sourceRangeFilter(spark, sfDir))
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("GreaterThanOrEqual(source,src2)"), p.take(2000))
  }

  test("column pruning: scan reads only the projected columns") {
    val p = plan(ScalarQueries.sourceRangeFilter(spark, sfDir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"), p.take(2000))
  }

  test("dimension joins broadcast (q3 region rollup)") {
    val p = plan(CoreQueries.regionRollup(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"), "small dims must not sort-merge")
  }

  test("anti/semi joins plan as hash joins with pushed-down right filter") {
    val p = plan(CoreQueries.customersWithoutOrders(spark, sfDir))
    assert(p.contains("LeftAnti"), p.take(1000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]")
      || p.contains("EqualTo(o_orderpriority,1-URGENT)"), "right-side filter must push down")
  }

  test("aggregation is partial+final (map-side combine)") {
    val p = plan(CoreQueries.pricingSummary(spark, sfDir))
    assert(p.contains("partial_"), "expected partial aggregation")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("native dot product used and threshold pushed into the pair join") {
    val df = DedupQueries.embeddingNearDups(spark, sfDir)
    val p = plan(df)
    assert(p.contains("dotproduct"), p.take(2000))
    // Catalyst must fold the cosine threshold INTO the join condition so
    // sub-threshold pairs never materialize as rows
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains(">= 0.45"),
      p.take(2000))
    assert(df.count() >= 0)
  }

  test("no single-partition window anywhere in the query surface") {
    // A Window with an empty partitionSpec routes every row through ONE
    // partition — the engine must never plan one, on any registered query.
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      plan.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty =>
          fail(s"$name plans a global (unpartitioned) window: ${w.simpleString(100)}")
        case _ =>
      }
    }
  }

  test("interpreted array lambdas only where whitelisted") {
    // HigherOrderFunction lambdas evaluate interpreted (CodegenFallback).
    // Corpus-wide text paths must use the native expressions (WordStats,
    // PolyHash, ShapeFingerprint, DotProduct). The whitelist names every
    // acceptable remaining site — bounded verification baselines and
    // per-row SMALL-array transforms — so a new interpreted lambda in a
    // full-scan hot path fails here.
    val whitelist = Set(
      "v2_quantized_cosine", // 64-element per-row quantize transforms
      "f10_json_extract",    // 5-row JSON exemplar
      "m1_binary_meta", "m2_frame_sample", // small per-row meta arrays
      "g2_ordered_reassembly", // bounded (doc_id < 100) roundtrip check;
                               // transform projects the per-doc sorted array
      "g3_transcript_flatten", // bounded (doc_id < 40) NESTED-FIXTURE
                               // construction uses transform to assemble the
                               // 3-level struct; the production operator under
                               // test (Transcripts.flatten) is lambda-free
      "k6_xml",                // per-transcript serializer: transform projects
                               // each group's sorted utterance array once —
                               // the work is the collect_list agg, not the
                               // lambda; output is one string per transcript
      "m4_resize_pipeline",    // bounded (doc_id < 120) decode→resize gate:
                               // transform/aggregate run over the fixed
                               // 256-element resized tensor per row (the
                               // nearest-neighbor index map + byte-sum fold);
                               // the corpus-side work is the batched
                               // mapPartitions decode, not a lambda
      "m5_image_neardup")      // same class: the aHash signature's
                               // transform/aggregate run over the fixed
                               // 64-element resized tensor per row; the
                               // band join and bit_count verify are
                               // lambda-free, and the fixture is bounded
                               // (200 base docs + planted copies)
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.optimizedPlan.toString
      if (p.contains("lambdafunction") && !whitelist(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected interpreted lambdas in: ${offenders.toSeq.sorted}")
  }

  test("q12 plan: range exchange + broadcast offsets, no sort-merge") {
    val p = plan(CoreQueries.orderGaps(spark, sfDir))
    // the tiny per-partition offset table must broadcast, never SMJ
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "offset join must broadcast")
  }

  test("q12 distributed ntile matches the global-window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = CoreQueries.orderGaps(spark, sfDir)
      .select("o_orderkey", "value_quartile")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val ref = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        ntile(4).over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
          .as("vq"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == ref, s"diff=${got.toSet.diff(ref.toSet).take(5)}")
  }

  test("s1 ANN plan has no interpreted higher-order functions") {
    // Array-lambda HOFs (aggregate/zip_with/transform) evaluate
    // interpreted in Spark; the corpus-side signature must use the
    // native codegen DotProduct instead.
    val p = plan(graft.analytics.VectorQueries.annTopK(spark, sfDir))
    assert(!p.contains("zip_with") && !p.contains("aggregate(lambdafunction"),
      p.take(2000))
    assert(p.contains("dotproduct"), p.take(2000))
  }

  test("t4 fingerprint runs the native expression, no interpreted HOF") {
    // the HOF `aggregate(split(...))` fold evaluates its lambda
    // interpreted per word — corpus-wide cost at scale; the plan must
    // carry the codegen ShapeFingerprint expression instead
    val p = plan(graft.analytics.TextQueries.fingerprint(spark, sfDir))
    assert(!p.contains("aggregate(lambdafunction"), p.take(2000))
    assert(p.toLowerCase.contains("shapefingerprint"), p.take(2000))
  }

  test("d1 exact dedup groups by an 8-byte digest, not the raw text") {
    // at 100 TB the group key IS the shuffle row: xxhash64(text) moves
    // 8 bytes/doc where the raw text key would move the corpus
    val opt = DedupQueries.exactDedup(spark, sfDir).queryExecution.optimizedPlan
    assert(opt.toString.toLowerCase.contains("xxhash64"),
      s"expected an xxhash64 digest key: ${opt.toString.take(2000)}")
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty, "expected an Aggregate in the d1 plan")
    // the digest key is a LONG; a raw-text key would group by a string
    aggs.foreach(a => a.groupingExpressions.foreach(k =>
      assert(k.dataType != org.apache.spark.sql.types.StringType,
        s"string group key shuffles the corpus text: ${k.sql}")))
  }

  test("sql2 (TPC-H Q9 shape): part filter pushes down and the filtered dim broadcasts") {
    // pins the 5-way join plan so a future Catalyst upgrade (or a noisy
    // bench reading like BENCH_r02's 14.6s sql2) is diagnosable at a
    // glance: the selective part side must scan with the LIKE filter
    // pushed and join as a broadcast, never sort-merge against lineitem
    val p = plan(graft.analytics.SqlQueries.nationProfitSql(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(p_name), StringContains(p_name,red)]")
      || p.contains("StringContains(p_name,red)"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    val partScanIdx = p.indexOf("p_partkey")
    assert(partScanIdx >= 0, "expected the part scan in the plan")
    assert(!p.contains("SortMergeJoin"),
      "the filtered part dimension must broadcast, not sort-merge")
  }

  test("sql1 (TPC-H Q5 shape): dimension sides broadcast") {
    val p = plan(graft.analytics.SqlQueries.regionRevenueSql(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("revenue query pre-aggregates lineitem before the join") {
    val p = plan(CoreQueries.revenueByStatusMonth(spark, sfDir))
    // the aggregate on l_orderkey must appear below the join
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      "expected aggregate below the join in the plan tree")
  }

  test("d10 span strip: gram-frequency keys are 8-byte hashes, never the gram text") {
    val opt = graft.analytics.DedupQueries.spanStrip(spark, sfDir)
      .queryExecution.optimizedPlan
    val aggs = opt.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty)
    // the corpus-wide doc-frequency aggregate must group on the PolyHash
    // long (8 bytes/gram through the exchange), and the final per-doc
    // reassembly on the doc id — no aggregate may key on gram STRINGS
    // (only the per-doc reassembly groups strings it already holds)
    val dfAggs = aggs.filter(_.groupingExpressions.exists(_.references
      .exists(_.name == "__g")))
    assert(dfAggs.nonEmpty, "expected the gram doc-frequency aggregate on __g")
    dfAggs.foreach(_.groupingExpressions.foreach(k =>
      assert(k.dataType == org.apache.spark.sql.types.LongType,
        s"gram key must be the 8-byte hash: ${k.sql}")))
  }

  test("d11 semantic dedup: assignment is a pure map; pairs join on the cluster key, no cartesian") {
    val p = plan(graft.analytics.DedupQueries.semanticDedup(spark, sfDir))
    // round 6: the quantizer no longer broadcasts as a JOIN side — the
    // √n centroid matrix rides the NearestCentroid expression, so the
    // assignment stage materializes no candidate rows at all
    assert(p.toLowerCase.contains("nearestcentroid"),
      "assignment must run inside the NearestCentroid expression: " + p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "no crossJoin-based assignment may remain")
    // the within-cluster pair join must be keyed on cluster_id — a
    // cartesian over the corpus would be the n^2 mistake the clusters
    // exist to prevent
    val afterAssign = p.substring(p.indexOf("cluster_id"))
    assert(!afterAssign.contains("CartesianProduct"),
      "within-cluster pairs must hash-join on cluster_id")
  }

  test("gram paths are map-side: no window shuffle in t20/c1/d2/t8 assembly") {
    // the round-6 native expressions replaced every doc-key window /
    // posexplode gram assembly; a Window reappearing in these plans is
    // the 100×-sweep regression coming back
    val t20 = plan(graft.analytics.TextQueries.boilerplate(spark, sfDir))
    assert(t20.toLowerCase.contains("wordngrams"), t20.take(800))
    assert(!t20.contains("Window"), "t20 gram assembly must not window-shuffle")
    val c1 = plan(graft.analytics.TextQueries.contamination(spark, sfDir))
    assert(c1.toLowerCase.contains("wordngrams"), c1.take(800))
    assert(!c1.contains("Window"), "c1 gram assembly must not window-shuffle")
    val t8 = plan(graft.analytics.TextQueries.repetition(spark, sfDir))
    assert(t8.toLowerCase.contains("wordngrams"), t8.take(800))
    assert(!t8.contains("Window"), "t8 gram assembly must not window-shuffle")
    // d2's full query checkpoints + truncates its plan string, so
    // assert on the signature stage directly: WordNGrams present, and
    // the ONLY exchange is the final per-doc aggregate's
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val d2sig = plan(graft.ops.Dedup.minHashPerDoc(docs, "doc_id", "text", 8, 3))
    assert(d2sig.toLowerCase.contains("wordngrams"), d2sig.take(800))
    assert(!d2sig.contains("Window"), "d2 shingling must not window-shuffle")
    assert("Exchange".r.findAllIn(d2sig).size == 1,
      "signature aggregate must be the only exchange: " + d2sig.take(1500))
  }

  test("d3 signature stage is a pure projection: SimHashSig, zero exchanges") {
    // the full query checkpoints the signatures, so assert on the
    // stage itself: one generated call per document, NO explode, NO
    // aggregate, NO exchange anywhere
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val p = plan(graft.ops.Dedup.simHashSignatures(docs, "doc_id", "text"))
    assert(p.toLowerCase.contains("simhashsig"), p.take(800))
    assert(!p.contains("Exchange") && !p.contains("HashAggregate"),
      "signature stage must be map-only: " + p.take(1500))
  }
}
