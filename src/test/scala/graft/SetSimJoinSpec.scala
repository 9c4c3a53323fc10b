package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.ops.{Dedup, SetSimJoin}

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("prefix-filter join equals the brute-force quadratic join") {
    for (t <- Seq(0.7, 0.8, 0.9)) {
      val fast = SetSimJoin.jaccardJoin(docs, "doc_id", "text", t)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", t)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast === brute, s"threshold $t")
      assert(fast.nonEmpty, s"fixture has planted near-dups at $t")
    }
  }

  test("exact duplicates on distinct ids pair at jaccard 1.0") {
    val dup = docs.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 5000000L)
    val out = SetSimJoin.jaccardJoin(docs.unionByName(dup), "doc_id", "text", 0.99)
      .filter($"id_b" >= 5000000L && $"id_a" === $"id_b" - 5000000L)
    assert(out.count() === 5)
    assert(out.filter($"jaccard" < 1.0).count() === 0)
  }

  test("plan has no cartesian or nested-loop join") {
    val plan = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.8)
      .queryExecution.executedPlan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(all)
    val bad = all(plan).filter(n =>
      n.isInstanceOf[CartesianProductExec] || n.isInstanceOf[BroadcastNestedLoopJoinExec])
    assert(bad.isEmpty, s"quadratic join in plan:\n$plan")
  }

  test("incremental face equals the batch join restricted to delta pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss_spec").toString
    val delta = docs.filter($"doc_id" % 10 === 3)
    SetSimJoin.writeTokenStore(docs.filter($"doc_id" % 10 =!= 3),
      "doc_id", "text", tmp)
    val inc = SetSimJoin.incrementalJaccardJoin(delta, "doc_id", "text", tmp, 0.7)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.7)
      .filter($"id_a" % 10 === 3 || $"id_b" % 10 === 3)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "delta split must hit planted near-dups")
  }

  test("bucketed store face: same result as the path store, zero-exchange freq scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val delta = docs.filter($"doc_id" % 10 === 3)
    val rest = docs.filter($"doc_id" % 10 =!= 3)
    SetSimJoin.writeBucketedTokenStore(rest, "doc_id", "text",
      "ss_spec_store", buckets = 4)
    val bucketed = SetSimJoin.incrementalJaccardJoinBucketed(
        delta, "doc_id", "text", "ss_spec_store", 0.7)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss_spec2").toString
    SetSimJoin.writeTokenStore(rest, "doc_id", "text", tmp)
    val plain = SetSimJoin.incrementalJaccardJoin(delta, "doc_id", "text", tmp, 0.7)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed === plain)
    assert(bucketed.nonEmpty)
    // the store-side document-frequency aggregate must read the bucket
    // layout with NO shuffle below it
    val freqPlan = spark.table("ss_spec_store")
      .groupBy($"__tok").count().queryExecution.executedPlan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(all)
    assert(!all(freqPlan).exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"bucketed freq aggregate must not shuffle:\n$freqPlan")
  }

  test("candidate-restricted verification equals the unrestricted path") {
    val a = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.7)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.7,
        restrictVerify = true)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("a corpus-wide hot shingle never enters prefixes (no candidate blowup)") {
    // plant one identical 3-gram at the END of every doc: its df = n,
    // so rarest-first ordering pushes it past every prefix — the
    // candidate count must not grow quadratically, and results must
    // still equal brute force on the polluted corpus
    val polluted = docs.withColumn("text",
      concat($"text", lit(" zz zz zz")))
    val fast = SetSimJoin.jaccardJoin(polluted, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Dedup.ngramJaccardPairs(polluted, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === brute)
  }

  test("containment join: subsets found, direction honored, brute-equal") {
    // planted subset: doc 90001's shingles are a strict subset of 90000's
    val df = Seq(
      (90000L, "a b c d e f g h i j k l"),
      (90001L, "a b c d e f"),               // contiguous prefix excerpt
      (90002L, "x y z w v u"),               // unrelated
      (90003L, "a b c d e f")                // exact dup of 90001
    ).toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoin(df, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // excerpt -> source at containment 1.0; NOT source -> excerpt
    assert(got.contains((90001L, 90000L, 1.0)))
    assert(!got.exists(p => p._1 == 90000L && p._2 == 90001L),
      "containment is directed: the big doc is not contained in its excerpt")
    // exact dups are mutually contained
    assert(got.contains((90001L, 90003L, 1.0)) && got.contains((90003L, 90001L, 1.0)))
    assert(!got.exists(p => p._1 == 90002L || p._2 == 90002L))
    // and the symmetric Jaccard join at the same threshold MISSES the
    // excerpt pair (J = 4/10 = 0.4) — the operator's reason to exist
    val jac = SetSimJoin.jaccardJoin(df, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((90000L, 90001L)) && !jac.contains((90001L, 90000L)))
    // brute-force equality on the real corpus fixture
    val fixture = docs.filter($"doc_id" < 120)
    val fast = SetSimJoin.containmentJoin(fixture, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b", round($"containment", 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = fixture.select($"doc_id",
        array_distinct(graft.ops.Dedup.shingles($"text", 3)).as("s"))
      .filter(size($"s") > 0)
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") / size($"a.s")).as("c"))
      .filter($"c" >= 0.8)
      .select($"id_a", $"id_b", round($"c", 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === brute)
  }

  test("short and empty documents are handled") {
    val tiny = Seq((1L, "a b"), (2L, ""), (3L, "x y z"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(tiny, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1 and 2 have no 3-shingles; 3 and 4 are identical
    assert(out === Set((3L, 4L)))
  }

  test("token store pin: foreign shingleN honored; mismatch and pre-pin fail fast") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ss_pin").toString
    val delta = docs.filter($"doc_id" % 10 === 3)
    // a FOREIGN shingle width (2, not the default 3)
    SetSimJoin.writeTokenStore(docs.filter($"doc_id" % 10 =!= 3),
      "doc_id", "text", tmp, shingleN = 2)
    // default probe (0 = resolve from the pin) equals the explicitly
    // matching probe bit-for-bit
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", round($"jaccard", 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairs(SetSimJoin.incrementalJaccardJoin(
      delta, "doc_id", "text", tmp, 0.7))
    val exp = pairs(SetSimJoin.incrementalJaccardJoin(
      delta, "doc_id", "text", tmp, 0.7, shingleN = 2))
    assert(got === exp)
    assert(got.nonEmpty, "planted near-dups must pair at shingleN=2 too")
    // a disagreeing explicit width fail-fasts
    val e1 = intercept[IllegalArgumentException] {
      SetSimJoin.incrementalJaccardJoin(delta, "doc_id", "text", tmp, 0.7,
        shingleN = 3)
    }
    assert(e1.getMessage.contains("shingleN=2"))
    // pre-pin (data, no sidecar) fail-fasts
    assert(new java.io.File(tmp, "_graft_meta").delete())
    val e2 = intercept[IllegalArgumentException] {
      SetSimJoin.incrementalJaccardJoin(delta, "doc_id", "text", tmp, 0.7)
    }
    assert(e2.getMessage.contains("_graft_meta"))
  }

  test("bucketed token store pin: shingleN + bucket count frozen in the table dir") {
    val table = "graft_ss_pin_tbl"
    SetSimJoin.writeBucketedTokenStore(docs.filter($"doc_id" % 10 =!= 3),
      "doc_id", "text", table, buckets = 4, shingleN = 2)
    val loc = java.net.URI.create(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location.toString).getPath
    val m = graft.etl.StoreMeta.readParams(spark, loc)
    assert(m.exists(_.get("shingle_n").contains("2")))
    assert(m.exists(_.get("buckets").contains("4")))
    val delta = docs.filter($"doc_id" % 10 === 3)
    // default probe resolves the pinned width and matches an explicit one
    val got = SetSimJoin.incrementalJaccardJoinBucketed(
      delta, "doc_id", "text", table, 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exp = SetSimJoin.incrementalJaccardJoinBucketed(
      delta, "doc_id", "text", table, 0.7, shingleN = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got === exp && got.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      SetSimJoin.incrementalJaccardJoinBucketed(delta, "doc_id", "text",
        table, 0.7, shingleN = 3)
    }
    assert(e.getMessage.contains("shingleN=2"))
  }
}
