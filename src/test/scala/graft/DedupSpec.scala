package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("shingles: short texts yield empty arrays, others distinct n-grams") {
    val df = Seq((1, "one two"), (2, "a b c d"), (3, "x x x x x")).toDF("id", "t")
    val got = df.select($"id", Dedup.shingles($"t", 3).as("sh"))
      .select($"id", size($"sh")).as[(Int, Int)].collect().toMap
    assert(got(1) == 0)      // too short
    assert(got(2) == 2)      // "a b c", "b c d"
    assert(got(3) == 1)      // all identical → distinct
  }

  test("LSH near-dups match brute force on the planted duplicates") {
    val lsh = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"LSH=${lsh.size} brute=${brute.size}")
    assert(brute.nonEmpty) // planted near-dups exist at sf0.001
  }

  test("incremental near-dups: delta vs persisted store equals full re-run") {
    val store = java.nio.file.Files.createTempDirectory("mh_store").toString
    Dedup.writeMinHashSignatures(docs, "doc_id", "text", store)
    // delta: near-copies of 3 existing docs (id-shifted) + 1 unique doc
    val delta = docs.filter($"doc_id" < 3)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
      .unionByName(Seq((999999L,
        "zyx wvu tsr qpo nml kji hgf edc ba completely unlike anything"))
        .toDF("doc_id", "text"))
    val deltaIds = Set(900000L, 900001L, 900002L, 999999L)
    val inc = Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store)
    val got = inc.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: full re-dedup of corpus+delta, restricted to pairs
    // touching the delta (corpus-corpus pairs are old news by design)
    val full = Dedup.minHashNearDups(
      docs.select($"doc_id", $"text").unionByName(delta), "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(got == full, s"inc=${got.size} full-restricted=${full.size}")
    assert(got.nonEmpty, "id-shifted copies must pair with their originals")
    // the delta path must read SIGNATURES from the store, never the
    // corpus text: the only parquet scan in the plan is the store
    val p = inc.queryExecution.executedPlan.toString
    assert(p.contains(store), s"expected a store scan:\n${p.take(1500)}")
    assert(!p.contains("documents.parquet"),
      "incremental plan must not re-scan the corpus text")
  }

  test("simhash: identical texts collide at hamming 0") {
    val df = docs.limit(5).select($"doc_id", $"text")
      .unionByName(docs.limit(5).select(($"doc_id" + 500000).as("doc_id"), $"text"))
    val pairs = Dedup.simHashNearDups(df, "doc_id", "text", 0)
      .as[(Long, Long, Int)].collect()
    assert(pairs.count { case (a, b, h) => b - a == 500000 && h == 0 } == 5)
  }

  test("band width rule: integer-exact ceil(log2 n) + slack, capped use at 30") {
    // bitLength(n-1) == ceil(log2 n) for every n ≥ 2, including exact
    // powers of two where floating-point log2 could round either way
    assert(Dedup.simHashBandWidthFor(2) == 1 + 5)
    assert(Dedup.simHashBandWidthFor(1024) == 10 + 5)
    assert(Dedup.simHashBandWidthFor(1025) == 11 + 5)
    assert(Dedup.simHashBandWidthFor(1L << 25) == 30)
    assert(Dedup.simHashBandWidthFor(300000) == 19 + 5)
    // the SQL replay: length(bin(n-1)) + 5
    val ns = Seq(2L, 1000L, 1024L, 1025L, 300000L, 1L << 25)
    val sql = ns.toDF("n")
      .select((length(bin($"n" - 1)) + 5).cast("int")).as[Int].collect()
    assert(sql.toSeq == ns.map(n => Dedup.simHashBandWidthFor(n)))
  }

  test("wide simhash: finds EVERY pair within hamming 3 (pigeonhole) and no false positives") {
    val df = docs.limit(200).select($"doc_id", $"text")
      .unionByName(docs.limit(8).select(($"doc_id" + 700000).as("doc_id"), $"text"))
    // ground truth: brute-force 120-bit Hamming over the wide signatures
    val sigs = Dedup.simHashSignaturesWide(df, "doc_id", "text")
      .select($"__id", $"__sig0", $"__sig1").as[(Long, Long, Long)].collect()
    val brute = (for {
      (a, a0, a1) <- sigs; (b, b0, b1) <- sigs if a < b
      h = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if h <= 3
    } yield (a, b, h)).toSet
    val got = Dedup.simHashNearDupsWide(df, "doc_id", "text", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"wide=${got.size} brute=${brute.size}")
    assert(brute.exists { case (a, b, h) => b - a == 700000 && h == 0 },
      "planted identical copies must collide at hamming 0")
  }

  test("wide simhash: second lane is independent (catches 60-bit lane-0 collisions)") {
    import graft.functions.{PolyHash, PolyHashB}
    // different strings, so near-identical docs differing in them are
    // distinguished by SOME bit even if one lane's word hashes collide
    val ws = Seq("alpha", "beta", "gamma", "delta")
    val l0 = ws.map(PolyHash.hash)
    val l1 = ws.map(PolyHashB.hash)
    assert(l0.distinct.size == ws.size && l1.distinct.size == ws.size)
    assert(l0.zip(l1).forall { case (a, b) => a != b })
    // codegen agrees with driver-side fold for the B lane too
    val got = ws.toDF("w").select(PolyHash.polyHashB($"w")).as[Long].collect()
    assert(got.toSeq == l1)
  }

  test("incremental simhash: delta vs persisted store equals full re-run; store-only scan") {
    val store = java.nio.file.Files.createTempDirectory("sh_store").toString
    Dedup.writeSimHashSignatures(docs, "doc_id", "text", store)
    val delta = docs.filter($"doc_id" < 3)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
      .unionByName(Seq((999999L,
        "zyx wvu tsr qpo nml kji hgf edc ba completely unlike anything"))
        .toDF("doc_id", "text"))
    val deltaIds = Set(900000L, 900001L, 900002L, 999999L)
    val inc = Dedup.incrementalSimHashNearDups(delta, "doc_id", "text", store, 3)
    val got = inc.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.simHashNearDups(
      docs.select($"doc_id", $"text").unionByName(delta), "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(got == full, s"inc=${got.size} full-restricted=${full.size}")
    assert(got.nonEmpty, "id-shifted copies must pair with their originals")
    val p = inc.queryExecution.executedPlan.toString
    assert(p.contains(store), s"expected a store scan:\n${p.take(1500)}")
    assert(!p.contains("documents.parquet"),
      "incremental plan must not re-scan the corpus text")
  }

  test("PolyHash matches the DuckDB oracle formulation bit-for-bit") {
    import graft.functions.PolyHash
    // pinned values computed with DuckDB's list_reduce reproduction
    assert(PolyHash.hash("hello") == 99162322L * (1L << 30) + 200180656L)
    assert(PolyHash.hash("world") == 113318802L * (1L << 30) + 228807804L)
    assert(PolyHash.hash("") == 0L)
    assert(PolyHash.hash("a") == 97L * (1L << 30) + 97L)
    // codegen path (DataFrame) agrees with the driver-side fold
    val got = Seq("hello", "world", "", "a").toDF("w")
      .select(PolyHash.polyHash($"w")).as[Long].collect().toSeq
    assert(got == Seq("hello", "world", "", "a").map(PolyHash.hash))
  }

  test("exact dedup keeps min id and counts duplicates") {
    val df = Seq((10L, "same text"), (3L, "same text"), (7L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 2L), (7L, 1L)))
  }

  test("connected components: chains, stars, and separate groups resolve") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // star 10-{11,12,13}, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long chain converges in O(log diameter) rounds, one action each") {
    // path graph 0-1-2-...-30 (diameter 30): with pointer jumping the
    // min label's reach doubles-plus-one per round (1, 3, 7, 15, 31) →
    // 5 rounds to label the far end + 1 quiet round to detect
    // convergence. Convergence detection rides the
    // round's materialization (accumulator), so each round is exactly
    // one Spark action — asserted by counting scheduler jobs with
    // AQE/broadcast disabled (with them on, sub-jobs would inflate the
    // count without changing the action count).
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val bcast = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      @volatile var jobs = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val (labels, rounds) =
          Dedup.connectedComponentsWithRounds(chain, "id_a", "id_b", maxIter = 40)
        val got = labels.as[(Long, Long)].collect().toMap
        assert(got == (0L to 30L).map(_ -> 0L).toMap)
        assert(rounds <= 8, s"expected ~log2(30)+2 rounds, got $rounds")
        // listener delivery is async — poll until the count settles
        var last = -1
        var spins = 0
        while (jobs != last && spins < 50) {
          last = jobs; Thread.sleep(100); spins += 1
        }
        // 1 action per round + a small setup constant (und/labels
        // checkpoints). A per-round convergence job (the old
        // join+isEmpty formulation) would read ~2x rounds and fail.
        assert(jobs <= rounds + 4, s"expected ≤${rounds + 4} jobs, saw $jobs")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("connected components: adversarial 10k-node path stays in logarithmic rounds") {
    // the boilerplate-heavy-corpus worst case: one giant chained
    // component. Pure min-label propagation would need 10,000 rounds
    // (10,000 joins — a stalled job at scale); pointer jumping bounds
    // it at ~log2(10k) + 2. Labels must still all resolve to node 0.
    val n = 10000L
    val chain = spark.range(n - 1)
      .select($"id".as("id_a"), ($"id" + 1L).as("id_b"))
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(chain, "id_a", "id_b", maxIter = 25)
    assert(rounds <= 17, s"expected ~log2(10k)+2 rounds, got $rounds")
    val bad = labels.filter($"component" =!= 0L).count()
    assert(bad == 0, s"$bad nodes not labeled 0")
    assert(labels.count() == n)
  }

  test("survivors: best quality wins per group, ties to smallest id") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", 10L),
      (2L, "alpha beta gamma delta epsilon", 99L), // same text, higher quality
      (3L, "alpha beta gamma delta epsilon", 99L), // tie with 2 → 2 wins
      (7L, "completely different words here now", 5L))
      .toDF("doc_id", "text", "n_chars")
    val got = Dedup.survivors(docs, "doc_id", "text", "n_chars", 0.8)
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, 2L, 3L))) // component 1, keep doc 2, 3 members
  }

  test("contamination: planted eval overlap flagged, clean docs survive") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
      (2L, "totally unrelated content about spark catalyst expression codegen here"),
      (3L, "another clean document with completely different eight gram windows inside"))
      .toDF("doc_id", "text")
    val hits = graft.ops.Contamination.overlaps(
      train, "doc_id", "text", eval, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toList
    assert(hits.map(h => (h._1, h._2)) == List((1L, 100L)))
    assert(hits.head._3 >= 3) // the 10-word overlap yields 3 shared 8-grams
    val clean = graft.ops.Contamination.decontaminate(
      train, "doc_id", "text", eval, "doc_id", "text", n = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
  }

  test("repetition stats: degenerate repeated text scores near 1.0") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.repetitionStats(df, "doc_id", "text", 2)
      .select($"doc_id", $"top_gram_count", $"n_grams", $"top_gram_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(got(1L) == ((5L, 5L, 1.0)))       // "spam spam" x5 of 5
    assert(got(2L)._1 == 1L && got(2L)._3 < 0.2)
  }

  test("embedding near-dups are symmetric-free and thresholded") {
    val pairs = Dedup.embeddingNearDups(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0.45)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, c) => assert(a < b); assert(c >= 0.45 && c <= 1.0) }
  }

  test("duplicated-gram stats: shared spans counted, short/unique docs zeroed") {
    val docs = Seq(
      (1L, "a b c d e f g h unique tail one"),   // 8-gram "a b c d e f g h" shared with doc 2
      (2L, "a b c d e f g h other ending two"),
      (3L, "completely different words through entire span here yes"),
      (4L, "short doc")                          // < 8 words → zero grams
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicatedGramStats(docs, "doc_id", "text", 8)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Option[Double])].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1: 4 grams (positions 0-3), exactly one shared (the leading 8-gram)
    assert(byId(1L)._2 == 4 && byId(1L)._3 == 1)
    assert(byId(2L)._3 == 1)
    assert(byId(3L)._3 == 0 && byId(3L)._2 > 0)
    assert(byId(4L) == ((4L, 0L, 0L, None)))
    assert(byId(1L)._4.contains(0.25))
  }

  test("repeated-span strip: removes exactly the tokens covered by shared 8-grams") {
    val docs = Seq(
      (1L, "a b c d e f g h unique tail one"),   // leading 8-gram shared with doc 2
      (2L, "prefix a b c d e f g h other end"),
      (3L, "completely different words through entire span here yes"),
      (4L, "short doc")                          // < 8 words → untouched
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.repeatedSpanStrip(docs, "doc_id", "text", n = 8, minDf = 2)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // docs 1/2: the shared 8 tokens go, the rest stays in order
    assert(byId(1L)._5 == "unique tail one" && byId(1L)._4 == 8)
    assert(byId(2L)._5 == "prefix other end" && byId(2L)._4 == 8)
    // doc 3: nothing shared → intact
    assert(byId(3L)._5 == "completely different words through entire span here yes")
    assert(byId(3L)._4 == 0)
    // doc 4: too short for any gram → intact
    assert(byId(4L) == ((4L, 2L, 2L, 0L, "short doc")))
  }

  test("minhash store pin: foreign (numHashes, shingleN) honored; mismatch and pre-pin fail fast") {
    val store = java.nio.file.Files.createTempDirectory("mh_pin").toString
    // a FOREIGN geometry: not the writer defaults
    Dedup.writeMinHashSignatures(docs, "doc_id", "text", store,
      numHashes = 16, shingleN = 2)
    val delta = docs.filter($"doc_id" < 3)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
    // default probe (0 = resolve from the pin) must equal a probe whose
    // delta was EXPLICITLY signed at the pinned geometry — bit-for-bit
    val got = Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val exp = Dedup.incrementalMinHashNearDupsFromSigs(
        Dedup.minHashPerDoc(delta, "doc_id", "text", 16, 2),
        store, 0.8, 16, 8, 1)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got === exp)
    assert(got.nonEmpty, "id-shifted copies must pair with their originals")
    // an explicit disagreeing expectation fail-fasts
    val e1 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store,
        numHashes = 32)
    }
    assert(e1.getMessage.contains("numHashes=16"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store,
        shingleN = 3)
    }
    assert(e2.getMessage.contains("shingleN=2"))
    // a pre-pin store (data, no sidecar) fail-fasts
    assert(new java.io.File(store, "_graft_meta").delete())
    val e3 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store)
    }
    assert(e3.getMessage.contains("_graft_meta"))
    // a foreign FAMILY fail-fasts (a KMV pin is not a signature store)
    graft.etl.StoreMeta.pinFamily(spark, store, "kmv", Map("k" -> "64"))
    val e4 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHashNearDups(delta, "doc_id", "text", store)
    }
    assert(e4.getMessage.contains("family"))
  }

  test("simhash store pin: geometry is build-constant; foreign bits and pre-pin fail fast") {
    val store = java.nio.file.Files.createTempDirectory("sh_pin").toString
    Dedup.writeSimHashSignatures(docs, "doc_id", "text", store)
    val m = graft.etl.StoreMeta.readParams(spark, store)
    assert(m.exists(_.get("family").contains("simhash_signatures")))
    assert(m.exists(_.get("bits").contains("60")))
    val delta = docs.filter($"doc_id" < 2)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
    // pinned store probes fine
    assert(Dedup.incrementalSimHashNearDups(delta, "doc_id", "text", store, 0)
      .count() >= 2L)
    // a store signed by a different-geometry build cannot be probed
    graft.etl.StoreMeta.pinFamily(spark, store, "simhash_signatures",
      Map("bits" -> "48", "hash" -> "poly1"))
    val e1 = intercept[IllegalArgumentException] {
      Dedup.incrementalSimHashNearDups(delta, "doc_id", "text", store, 3)
    }
    assert(e1.getMessage.contains("bits=48"))
    // pre-pin (data, no sidecar) fail-fasts
    assert(new java.io.File(store, "_graft_meta").delete())
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalSimHashNearDups(delta, "doc_id", "text", store, 3)
    }
    assert(e2.getMessage.contains("_graft_meta"))
  }

  test("append faces: signatures land once at the pinned geometry; replay inserts nothing") {
    // MinHash: a foreign-geometry store's append signs at ITS pin
    val mh = java.nio.file.Files.createTempDirectory("mh_app").toString
    Dedup.writeMinHashSignatures(docs.filter($"doc_id" >= 3),
      "doc_id", "text", mh, numHashes = 16, shingleN = 2)
    val delta = docs.filter($"doc_id" < 3)
    val n1 = Dedup.appendMinHashSignatures(delta, "doc_id", "text", mh)
    assert(n1 === 3)
    assert(Dedup.appendMinHashSignatures(delta, "doc_id", "text", mh) === 0)
    // appended rows carry the pinned 16-hash schema (m0..m15, no m16)
    val cols = spark.read.parquet(mh).columns.toSet
    assert(cols.contains("m15") && !cols.contains("m16"))
    // and the appended docs are now prior art for the next probe
    val rep = docs.filter($"doc_id" < 1)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
    assert(Dedup.incrementalMinHashNearDups(rep, "doc_id", "text", mh)
      .filter($"id_a" === 0L && $"id_b" === 900000L).count() === 1L)
    // SimHash: same discipline
    val sh = java.nio.file.Files.createTempDirectory("sh_app").toString
    Dedup.writeSimHashSignatures(docs.filter($"doc_id" >= 3),
      "doc_id", "text", sh)
    assert(Dedup.appendSimHashSignatures(delta, "doc_id", "text", sh) === 3)
    assert(Dedup.appendSimHashSignatures(delta, "doc_id", "text", sh) === 0)
  }
}
