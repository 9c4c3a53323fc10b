package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("split labels partition every row deterministically") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = docs.withColumn("split",
      Sampling.splitLabel($"doc_id", fracs, "v1"))
    assert(labeled.filter($"split".isNull).count() == 0)
    val a = labeled.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = docs.repartition(13) // different partitioning, same membership
      .withColumn("split", Sampling.splitLabel($"doc_id", fracs, "v1"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
    // rough proportions hold (hash uniformity, generous tolerance)
    val n = a.size.toDouble
    val trainFrac = a.values.count(_ == "train") / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train=$trainFrac")
  }

  test("different salts give independent splits; same salt is stable") {
    val s1 = Sampling.sampleByKey(docs, "doc_id", 0.5, "a")
      .select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleByKey(docs, "doc_id", 0.5, "a")
      .select($"doc_id").as[Long].collect().toSet
    val s3 = Sampling.sampleByKey(docs, "doc_id", 0.5, "b")
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1 != s3, "different salt must resample")
  }

  test("stratified sample keeps only mapped strata at their fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), "s")
    val langs = sampled.select($"lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // zh at 0.0 and unmapped strata dropped
    assert(sampled.count() == docs.filter($"lang" === "en").count())
  }

  test("balanced rates equalize expected stratum counts at the min") {
    val docs = Tables.documents(spark, sfDir)
    val rates = graft.ops.Sampling.balancedRates(docs, "lang")
      .as[(String, Long, Double)].collect()
    val minN = rates.map(_._2).min
    rates.foreach { case (_, n, r) =>
      assert(math.abs(n * r - minN) < 1e-9)   // n * (min/n) == min
      assert(r > 0 && r <= 1.0)
    }
    assert(rates.exists(_._3 == 1.0))          // the smallest stratum keeps all
  }

  test("oov stats: head-vocab docs score 0, garble scores 1") {
    val docs = Seq(
      (1L, "a a a b b c"),     // all words in top-3 vocab
      (2L, "zz qq ww a"),      // 3 of 4 outside
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.oovStats(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // vocab = top-3 by count desc, word asc: a(5), b(3), c(2)
    assert(got(0) == ((1L, 6L, 0L, 0.0)))
    assert(got(1)._3 == 3L && got(1)._4 == 0.75)
    assert(got(2) == ((3L, 3L, 0L, 0.0)))
  }

  test("token budget: priority order, crossing doc included, budget respected") {
    val rows = Seq(
      (1L, "a", 100L, 9L), (2L, "a", 90L, 9L), (3L, "a", 80L, 9L),
      (4L, "b", 50L, 30L), (5L, "b", 40L, 1L)
    ).toDF("doc_id", "source", "n_chars", "n_tokens")
    val got = Sampling.tokenBudgetSelect(rows, "source", "n_tokens",
        Seq(("n_chars", true), ("doc_id", false)), budget = 20L)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
    // pruned and unpruned paths agree when every row has >= 1 token
    val unpruned = Sampling.tokenBudgetSelect(rows, "source", "n_tokens",
        Seq(("n_chars", true), ("doc_id", false)), budget = 20L,
        pruneToBudgetRows = false)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == unpruned)
    // source a: 9, 18, 27 — doc 3 crosses the 20-token budget and is kept
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(3L) == 27L)
    // source b: doc 4 (30 tokens) crosses immediately; doc 5 starts past it
    assert(got(4L) == 30L && !got.contains(5L))
  }

  test("shuffle shards: complete, deterministic, salt-sensitive") {
    val d = docs.select($"doc_id").limit(200)
    val s1 = Sampling.shuffleShards(d, $"doc_id", 8, "e0")
    val s2 = Sampling.shuffleShards(d, $"doc_id", 8, "e0")
    val s3 = Sampling.shuffleShards(d, $"doc_id", 8, "e1")
    val k1 = s1.select($"doc_id", $"shard", $"shard_pos").collect().toSet
    assert(k1 == s2.select($"doc_id", $"shard", $"shard_pos").collect().toSet)
    assert(k1 != s3.select($"doc_id", $"shard", $"shard_pos").collect().toSet)
    // every row exactly once; positions contiguous from 0 per shard
    assert(s1.count() == d.count())
    val pos = s1.groupBy($"shard")
      .agg(min($"shard_pos").as("mn"), max($"shard_pos").as("mx"),
        count(lit(1)).as("n"))
      .as[(Int, Int, Int, Long)].collect()
    pos.foreach { case (_, mn, mx, n) => assert(mn == 0 && mx == n - 1) }
  }

  test("semanticDedupEvery equals the explicit mod-rule seed list") {
    val e = Tables.embeddings(spark, sfDir)
    val seeds = e.filter($"vec_id" % 64 === 0)
      .select($"vec_id").as[Long].collect().toSeq
    val a = graft.ops.Similarity.semanticDedupEvery(e, 64, 0.45)
      .collect().map(_.toString).toSet
    val b = graft.ops.Similarity.semanticDedup(e, seeds, 0.45)
      .collect().map(_.toString).toSet
    assert(a == b && a.nonEmpty)
  }
  test("dsirSelect: target-looking docs outrank off-target, deterministic, k rows") {
    import graft.ops.Sampling
    // two disjoint vocabularies: target docs speak "alpha beta gamma",
    // off-target "zeta eta theta"; candidates mix them
    val rows = Seq(
      (1L, "t", "alpha beta gamma alpha beta"),
      (2L, "t", "beta gamma alpha gamma"),
      (3L, "r", "zeta eta theta zeta eta"),
      (4L, "r", "theta zeta eta theta"),
      (5L, "r", "alpha beta gamma beta alpha"), // raw doc that LOOKS target
      (6L, "r", "zeta zeta eta eta theta")
    ).toDF("doc_id", "kind", "text")
    val out = Sampling.dsirSelect(rows, "doc_id", "text",
      col("kind") === "t", k = 3).collect()
    assert(out.length == 3)
    // the target-vocabulary docs (1, 2, 5) carry the top weights
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 5L))
    // weights strictly above the off-target docs'
    val all = Sampling.dsirSelect(rows, "doc_id", "text",
      col("kind") === "t", k = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Set(1L, 2L, 5L).map(all).min > Set(3L, 4L, 6L).map(all).max)
    // deterministic across partitionings
    val again = Sampling.dsirSelect(rows.repartition(7), "doc_id", "text",
      col("kind") === "t", k = 3).collect().map(_.getLong(0)).toSet
    assert(again == Set(1L, 2L, 5L))
  }

  test("temperature allocation: sums to budget, monotone, tail-up-weighted") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val out = graft.ops.Sampling.temperatureAllocation(docs, "source", 10000L, 0.7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).sum === 10000L, "largest remainder must hit the budget exactly")
    // alloc within 1 of quota
    assert(out.forall { case (_, _, q, a) => math.abs(a - q) < 1.0 })
    // bigger stratum never gets FEWER seats (alpha <= 1 keeps monotonicity)
    val byN = out.sortBy(_._2)
    assert(byN.zip(byN.tail).forall { case ((_, n1, _, a1), (_, n2, _, a2)) =>
      n1 > n2 || a1 <= a2 + 1 })
    // temperature flattens: the biggest stratum's share shrinks vs natural
    val nTot = out.map(_._2).sum.toDouble
    val big = out.maxBy(_._2)
    assert(big._4.toDouble / 10000.0 < big._2 / nTot + 1e-9,
      s"alpha<1 must shrink the head share: $big")
  }

  test("largest remainder takes seats back when gridded floors overshoot the budget") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Quotas already integer-gridded (the 5e-7-below-an-integer round-up
    // pathology lands here: fracs are 0 but floors sum past the budget).
    // floors sum to 10 against budget 9 → one seat must come BACK, from
    // the smallest-frac eligible (floor >= 1) stratum, ties by stratum.
    val quotas = Seq(("a", 50L, 5.0), ("b", 20L, 2.0), ("c", 30L, 3.0))
      .toDF("source", "n_docs", "quota")
    val out = graft.ops.Sampling.largestRemainder(quotas, "source", 9L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(out.values.sum === 9L, "allocations must sum to the budget")
    assert(out === Map("a" -> 4L, "b" -> 2L, "c" -> 3L),
      "the tie-broken smallest-frac stratum loses the seat")
    // floor-0 strata are never driven negative even when they hold the
    // smallest fracs: seats come back only from floor >= 1 strata
    val q2 = Seq(("a", 1L, 0.0), ("b", 40L, 4.0), ("c", 60L, 6.0))
      .toDF("source", "n_docs", "quota")
    val out2 = graft.ops.Sampling.largestRemainder(q2, "source", 9L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(out2.values.sum === 9L)
    assert(out2("a") === 0L, "floor-0 stratum keeps 0, never -1")
    assert(out2 === Map("a" -> 0L, "b" -> 3L, "c" -> 6L))
  }

  test("temperature allocation at alpha=1 reproduces natural proportions") {
    val docs = Tables.documents(spark, sfDir)
    val out = graft.ops.Sampling.temperatureAllocation(docs, "source", 10000L, 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val nTot = out.map(_._2).sum.toDouble
    assert(out.map(_._3).sum === 10000L)
    assert(out.forall { case (_, n, a) => math.abs(a - 10000.0 * n / nTot) <= 1.0 })
  }
}
