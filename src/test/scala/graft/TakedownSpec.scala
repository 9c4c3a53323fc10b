package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Takedown}

/** The r16 deletion/retraction verb (ops.Takedown): keyed stores,
  * pair logs and the component store all support "remove these doc
  * ids" as a bucket-local rewrite — post-delete state equals a full
  * rebuild over the survivors (the del1/del2/del3 oracles gate the
  * real corpus; this spec pins the engineered edges: untouched buckets
  * byte-identical, component split/relabel/stranger cases, replay
  * idempotency, pre-r16 fail-fast). */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fileSig(path: String): Map[String, Seq[(String, Long)]] =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.contains("="))
      .map(d => d.getName ->
        d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.length()).toSeq.sortBy(_._1))
      .toMap

  private lazy val docs = Tables.documents(spark, sfDir)
    .select($"doc_id", $"text")

  test("deleteKeys: post-delete signature store equals a rebuild; untouched buckets byte-identical") {
    val p = tmp("td-mh") + "/sigs"
    Dedup.writeMinHashSignatures(docs, "doc_id", "text", p)
    val del = docs.filter($"doc_id" % 10 === 3).select($"doc_id")
    val sigBefore = fileSig(p)
    val removed = Takedown.deleteKeys(spark, p, "__id", del)
    assert(removed === del.count())
    // replay removes nothing
    assert(Takedown.deleteKeys(spark, p, "__id", del) === 0)
    // remaining ids = survivors exactly
    val got = spark.read.parquet(p).select($"__id").as[Long].collect().toSet
    val want = docs.filter($"doc_id" % 10 =!= 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === want)
    // buckets holding no deleted id were never rewritten
    val hit = del
      .select(graft.etl.Sinks.keyBucket(Seq("doc_id"), 64).as("b"))
      .distinct().as[Int].collect().map(b => s"__kb=$b").toSet
    val sigAfter = fileSig(p)
    sigBefore.keys.filterNot(hit).foreach { d =>
      assert(sigAfter(d) === sigBefore(d), s"untouched bucket $d rewritten")
    }
    assert(hit.exists(sigBefore.contains), "fixture must hit stored buckets")
    // ids absent from the store: no-op
    assert(Takedown.deleteKeys(spark, p, "__id",
      Seq(999999999L).toDF("doc_id")) === 0)
  }

  test("deletePairsTouching: only hit buckets rewrite; both-side pairs vanish") {
    val p = tmp("td-pl") + "/pairs"
    val pairs = (0L until 300L).map(i => (i, i + 1000L, 0.9)).toDF("id_a", "id_b", "jaccard")
    graft.etl.Sinks.idempotentAppendBucketed(pairs, p, Seq("id_a", "id_b"))
    val sigBefore = fileSig(p)
    // delete ids hitting id_a on some rows and id_b on others
    val del = Seq(5L, 7L, 1009L).toDF("doc_id")
    val removed = Takedown.deletePairsTouching(spark, p, del)
    assert(removed === 3) // (5,1005), (7,1007), (9,1009)
    assert(Takedown.deletePairsTouching(spark, p, del) === 0)
    val left = spark.read.parquet(p).select($"id_a", $"id_b")
      .as[(Long, Long)].collect().toSet
    assert(!left.exists { case (a, b) =>
      Set(5L, 7L, 1009L).contains(a) || Set(5L, 7L, 1009L).contains(b) })
    assert(left.size === 297)
    // the hit set is the DOOMED ROWS' buckets (pair-hash), so compare
    // after-the-fact: every dir that changed must have held a doomed row
    val doomedB = pairs.filter($"id_a".isin(5L, 7L) || $"id_b" === 1009L)
      .select(graft.etl.Sinks.keyBucket(Seq("id_a", "id_b"), 64).as("b"))
      .distinct().as[Int].collect().map(b => s"__kb=$b").toSet
    val sigAfter = fileSig(p)
    sigBefore.foreach { case (d, sig) =>
      if (!doomedB(d)) assert(sigAfter(d) === sig, s"untouched $d rewritten")
    }
  }

  test("component takedown: split, relabel, stranger-in-new-bucket and untouched components") {
    val p = tmp("td-cc") + "/labels"
    // components: {1,2,3} (triangle), {10,11}, {20,21} under nBuckets=8
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    Dedup.writeComponentStore(
      Dedup.connectedComponents(pairs, "id_a", "id_b"), p, nBuckets = 8)
    val before = fileSig(p)
    // delete node 1: {2,3} survives via its own pair and relabels to 2
    // (old bucket cb=1, new bucket cb=2 — which ALREADY holds component
    // 10: the stranger must ride through the rewrite untouched)
    val touched = Takedown.deleteFromComponentStore(
      spark, p, pairs, "id_a", "id_b", Seq(1L).toDF("node"))
    assert(touched.toSet === Set(1L, 2L))
    val got = Dedup.readComponentStore(spark, p)
      .select($"node", $"component").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)))
    // the emptied old bucket is gone; the fully-untouched component's
    // bucket (20 mod 8 = 4) is byte-identical
    assert(!new java.io.File(s"$p/cb=1").exists())
    assert(fileSig(p)("cb=4") === before("cb=4"))
    // replay: node 1 is no longer stored — no-op
    assert(Takedown.deleteFromComponentStore(
      spark, p, pairs, "id_a", "id_b", Seq(1L).toDF("node")).isEmpty)
    // now delete 2: 3 has no surviving pair and leaves the store (a
    // rebuild's CC would never see it)
    Takedown.deleteFromComponentStore(
      spark, p, pairs, "id_a", "id_b", Seq(2L).toDF("node")): Unit
    val got2 = Dedup.readComponentStore(spark, p)
      .select($"node", $"component").as[(Long, Long)].collect().toSet
    assert(got2 === Set((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)))
  }

  test("component takedown equals the full rebuild on the real corpus") {
    val p = tmp("td-cc2") + "/labels"
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b").localCheckpoint()
    Dedup.writeComponentStore(
      Dedup.connectedComponents(pairs, "id_a", "id_b"), p)
    val del = docs.filter($"doc_id" % 10 === 3).select($"doc_id")
    Takedown.deleteFromComponentStore(
      spark, p, pairs, "id_a", "id_b", del): Unit
    val got = Dedup.readComponentStore(spark, p)
      .select($"node", $"component").as[(Long, Long)].collect().toSet
    val surviving = pairs
      .filter($"id_a" % 10 =!= 3 && $"id_b" % 10 =!= 3)
    val want = Dedup.connectedComponents(surviving, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bm25 index takedown: scores equal an index never containing the docs") {
    import graft.ops.Retrieval
    val p = tmp("td-bm25")
    Retrieval.appendBm25Index(docs, "doc_id", "text", p)
    val del = docs.filter($"doc_id" % 10 === 3).select($"doc_id")
    val removed = Takedown.deleteFromBm25Index(spark, p, del)
    assert(removed > 0)
    assert(Takedown.deleteFromBm25Index(spark, p, del) === 0)
    // a fresh index over the survivors scores IDENTICALLY — including
    // the N / Σdl statistics shift a true rebuild sees
    val rebuilt = tmp("td-bm25-rb")
    Retrieval.appendBm25Index(
      docs.filter($"doc_id" % 10 =!= 3), "doc_id", "text", rebuilt)
    def scores(path: String) = Retrieval
      .bm25FromIndex(spark, path, graft.analytics.TextQueries.BmTerms)
      .collect().map(_.toString).sorted.toSeq
    assert(scores(p) === scores(rebuilt))
    assert(scores(p).nonEmpty)
  }

  test("ann index takedown: probes serve exactly the surviving vectors") {
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(dim = 8, nBits = 4)
    def unit(i: Int): Array[Double] = {
      val a = Array.fill(8)(0.0); a(i % 8) = 1.0; a(1 + i % 4) += 0.3 * (i / 8); a
    }
    val vecs = (0L until 48L).map(i => (i, unit(i.toInt))).toDF("vec_id", "embedding")
    val p = tmp("td-ann") + "/idx"
    lsh.writeIndex(vecs, p)
    val del = (0L until 48L by 5L).toDF("vec_id")
    val removed = Takedown.deleteFromAnnIndex(spark, p, del)
    assert(removed === 10)
    assert(Takedown.deleteFromAnnIndex(spark, p, del) === 0)
    val left = spark.read.parquet(p).select($"cand_id").as[Long].collect().toSet
    assert(left === (0L until 48L).toSet -- (0L until 48L by 5L))
    // a probe against the post-takedown index equals one against a
    // fresh index of the survivors (the partition scheme IS the
    // signature, so delete ≡ rebuild the way append ≡ rebuild)
    val rebuilt = tmp("td-ann-rb") + "/idx"
    lsh.writeIndex(vecs.join(del, Seq("vec_id"), "left_anti"), rebuilt)
    val queries = vecs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding")
    def topk(path: String) = lsh
      .annTopKFromIndex(spark, path, queries, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(topk(p) === topk(rebuilt))
    assert(topk(p).nonEmpty)
  }

  test("knn graph takedown equals a fresh rebuild over the survivors") {
    import graft.ops.Similarity
    def vec(i: Int): Array[Double] = {
      val a = Array.fill(6)(0.0); a(i % 6) = 1.0; a((i + 1) % 6) = 0.2 + 0.01 * i; a
    }
    val corpus = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val seeds = Seq(0L, 7L, 14L, 21L)
    val p = tmp("td-knn") + "/graph"
    Similarity.writeKnnGraphStore(corpus, p, seeds, k = 3)
    val del = Seq(5L, 11L, 29L).toDF("vec_id")
    val (removed, rederived) = graft.ops.Takedown.deleteFromKnnGraph(spark, p, del)
    assert(removed === 3)
    assert(rederived > 0, "fixture must force some anchors to re-rank")
    // replay: nothing left to remove
    assert(graft.ops.Takedown.deleteFromKnnGraph(spark, p, del) === ((0L, 0L)))
    // the post-takedown store equals a FRESH build over the survivors
    val rebuilt = tmp("td-knn-rb") + "/graph"
    Similarity.writeKnnGraphStore(
      corpus.join(del, Seq("vec_id"), "left_anti"), rebuilt, seeds, k = 3)
    def edges(path: String) = spark.read.parquet(s"$path/edges")
      .select($"vec_id", $"nbr_id", $"rank").collect()
      .map(_.toString).sorted.toSeq
    assert(edges(p) === edges(rebuilt))
    assert(edges(p).nonEmpty)
    def memberIds(path: String) = spark.read.parquet(s"$path/members")
      .select($"cand_id").as[Long].collect().toSet
    assert(memberIds(p) === memberIds(rebuilt))
    // deleting a quantizer seed fail-fasts with the rebuild recipe
    val e = intercept[IllegalArgumentException] {
      graft.ops.Takedown.deleteFromKnnGraph(spark, p, Seq(7L).toDF("vec_id"))
    }
    assert(e.getMessage.contains("seed"))
  }

  test("semantic store takedown: deleted ids stop being prior art; assignments gone") {
    import graft.ops.Similarity
    def unit(i: Int): Seq[Double] = (0 until 8).map(j => if (j == i) 1.0 else 0.0)
    val base = (0L until 8L).map(i => (i, unit(i.toInt))).toDF("vec_id", "embedding")
    val store = tmp("td-sem") + "/store"
    Similarity.writeSemanticDedupStore(base, store)
    // a delta identical to stored vector 3 is DROPPED: prior art wins
    val clone = Seq((100L, unit(3))).toDF("vec_id", "embedding")
    assert(Similarity.incrementalSemanticDedup(
      clone, store, 0.95, "vec_id", "embedding").count() === 0)
    // takedown vector 3: its assignment row leaves the store
    val removed = Takedown.deleteFromSemanticStore(
      spark, store, Seq(3L).toDF("vec_id"))
    assert(removed === 1)
    assert(Takedown.deleteFromSemanticStore(
      spark, store, Seq(3L).toDF("vec_id")) === 0)
    assert(spark.read.parquet(s"$store/assignments")
      .filter($"__vid" === 3L).count() === 0)
    // the forward guarantee a compliance delete needs: the deleted id
    // is no longer prior art — the identical delta now SURVIVES
    val survivors = Similarity.incrementalSemanticDedup(
      clone, store, 0.95, "vec_id", "embedding")
    assert(survivors.count() === 1)
  }

  test("takedown fail-fasts on a pre-r16 flat store instead of guessing") {
    val p = tmp("td-flat") + "/store"
    Seq((1L, "x")).toDF("__id", "v").write.parquet(p)
    val e = intercept[RuntimeException] {
      Takedown.deleteKeys(spark, p, "__id", Seq(1L).toDF("__id"))
    }
    assert(e.getMessage.contains("sidecar") || e.getMessage.contains("kb"))
  }
}
