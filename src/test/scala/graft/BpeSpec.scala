package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent leftmost-first non-overlapping merge (NOT the
    * engine's mergePair — the reference must not share code with the
    * thing it checks). */
  private def mergeRef(syms: Vector[String], a: String,
                       b: String): Vector[String] =
    // a fold is safe: within one round the only new token is a+b, and
    // a+b == a is impossible (b nonempty), so acc.last == a always
    // means an unconsumed original `a`
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  /** Single-node reference BPE trainer (Sennrich algorithm, naive):
    * word frequencies in a Map, full pair recount each round, argmax
    * by (count desc, pair asc), leftmost-first non-overlapping merge. */
  private def referenceTrain(docs: Seq[String], numMerges: Int,
                             minFreq: Long): Seq[((String, String), Long)] = {
    var vocab: Map[Vector[String], Long] = docs
      .flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.size.toLong)
      }
    val merges = scala.collection.mutable.ListBuffer.empty[((String, String), Long)]
    var continue = true
    var round = 0
    while (round < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minFreq =>
          merges += (((a, b), n))
          vocab = vocab.toSeq
            .map { case (syms, f) => (mergeRef(syms, a, b), f) }
            .groupBy(_._1).map { case (m, g) => (m, g.map(_._2).sum) }
        case _ => continue = false
      }
      round += 1
    }
    merges.toList
  }

  private val corpus = Seq(
    "low low low low low", "lower lower newest newest",
    "newest newest newest newest", "widest widest widest",
    "low lower newest widest", "the the the the the the")

  test("train matches the single-node reference merge-for-merge") {
    val df = corpus.toDF("text")
    val got = Bpe.train(df, "text", numMerges = 8, minFreq = 2)
    val want = referenceTrain(corpus, numMerges = 8, minFreq = 2)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("deterministic across partitionings") {
    val a = Bpe.train(corpus.toDF("text"), "text", 5)
    val b = Bpe.train(corpus.toDF("text").repartition(7), "text", 5)
    assert(a == b)
  }

  test("merged symbols keep merging (multi-char pairs in later rounds)") {
    val docs = Seq("aaaa aaaa aaaa") // aa+aa -> aaaa expected by round 2
    val got = Bpe.train(docs.toDF("text"), "text", 2)
    assert(got.map(_._1) == Seq(("a", "a"), ("aa", "aa")), got.toString)
  }

  test("early-stop when no pair reaches minFreq") {
    val got = Bpe.train(Seq("ab cd ef").toDF("text"), "text", 10, minFreq = 2)
    assert(got.isEmpty)
  }

  test("pairCounts: weighted-by-word-frequency equals per-instance counting") {
    val df = Seq("ab ab ab", "abc ab").toDF("text")
    val got = Bpe.pairCounts(df, "text").as[(String, Long)].collect().toMap
    // 'ab' appears in: 4x "ab" + 1x "abc"; 'bc' in 1x "abc"
    assert(got == Map("ab" -> 5L, "bc" -> 1L))
  }

  test("replace-chain encode equals the symbol-array merge reference") {
    // random words over a tiny alphabet force dense merge collisions
    // (aaa-style overlaps) — exactly where replace semantics could slip
    val rnd = new scala.util.Random(23)
    val words = (0 until 120).map(_ =>
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val docs = words.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6).map(_._1)
    val got = Bpe.wordTokenCounts(docs, "text", merges)
      .as[(String, Long)].collect().toMap
    val want = words.distinct.map { w =>
      val syms = merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => mergeRef(s, a, b)
      }
      w -> syms.length.toLong
    }.toMap
    assert(got === want)
  }

  test("encode with zero merges counts characters; with merges it compresses") {
    val docs = Seq((1L, "low low lowest"), (2L, "ab")).toDF("doc_id", "text")
    val plain = Bpe.encodedTokenCounts(docs, "doc_id", "text", Nil)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plain === Map(1L -> (3L, 12L), 2L -> (1L, 2L)))
    val merges = Bpe.train(docs, "text", numMerges = 4).map(_._1)
    val enc = Bpe.encodedTokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(enc(1L) < 12L, s"merges must compress: $enc")
  }

  test("corpus pass is codegen (split+explode), no HOF before the word agg") {
    val plan = Bpe.wordFrequencies(
      Seq("a b").toDF("text"), "text").queryExecution.executedPlan.toString
    assert(!plan.contains("transform"), plan)
  }
}
