package graft

import org.apache.spark.sql.functions._
import graft.functions.{PolyHash, SimHashSig}

/** The native [[graft.functions.SimHashSig]] one-pass signature must be
  * bit-identical to the explode + 60-vote-aggregate formulation it
  * replaces — the d3/d3b/d3c oracles replay that formulation in SQL,
  * so any divergence is a correctness bug. */
class SimHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 60

  /** The reference formulation, reconstructed: explode words, PolyHash
    * each, ±1 vote per bit, sign-pack. */
  private def aggSigs(texts: Seq[String], lane1: Boolean) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val hashed = df
      .select(col("id"), explode(split(col("text"), " ")).as("__w"))
      .select(col("id"),
        PolyHash.polyHash(col("__w")).as("__h0"),
        PolyHash.polyHashB(col("__w")).as("__h1"))
    val h = if (lane1) "__h1" else "__h0"
    val votes = hashed.groupBy(col("id")).agg(
      sum(when(shiftright(col(h), 0).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as("v0"),
      (1 until Bits).map(i =>
        sum(when(shiftright(col(h), i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
          .as(s"v$i")): _*)
    val sig = (0 until Bits)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def nativeSigs(texts: Seq[String]) = {
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), SimHashSig.sigWide(col("text")).as("w"))
      .select(col("id"), col("w.sig0"), col("w.sig1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private val cases = Seq(
    "", " ", "  ", "a", "a b", "a a a b",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog again and again and again",
    " leading", "trailing ", "double  space", "a  ", "  a",
    "café naïve 日本語 テキスト", "a😀b c", "語 語 語 x",
    "repetition repetition repetition repetition repetition distinct")

  test("both lanes bit-identical to the explode+aggregate formulation") {
    val native = nativeSigs(cases)
    val agg0 = aggSigs(cases, lane1 = false)
    val agg1 = aggSigs(cases, lane1 = true)
    cases.indices.foreach { i =>
      assert(native(i.toLong)._1 == agg0(i.toLong),
        s"lane0 mismatch on '${cases(i)}'")
      assert(native(i.toLong)._2 == agg1(i.toLong),
        s"lane1 mismatch on '${cases(i)}'")
    }
  }

  test("narrow column equals wide lane 0") {
    val rows = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(SimHashSig.sig(col("text")).as("narrow"),
        col("text"))
      .collect()
    val native = nativeSigs(cases)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == native(i.toLong)._1)
    }
  }

  /** Plain-Scala reference for any lane's (multA/primeA, multB/primeB)
    * constants — independent of the production while-loop. */
  private def refSig(text: String, lane: Int): Long = {
    import SimHashSig.{MultA, MultB, PrimeA, PrimeB}
    val words = text.split(" ", -1)
    val votes = new Array[Int](Bits)
    words.foreach { w =>
      var ha = 0L; var hb = 0L
      w.codePoints().toArray.foreach { cp =>
        ha = (ha * MultA(lane) + cp) % PrimeA(lane)
        hb = (hb * MultB(lane) + cp) % PrimeB(lane)
      }
      val p = ha * PolyHash.Pack + hb
      (0 until Bits).foreach(b =>
        votes(b) += (if (((p >>> b) & 1L) == 1L) 1 else -1))
    }
    (0 until Bits).foldLeft(0L)((acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc)
  }

  test("four-lane signature: every lane matches the plain-Scala reference") {
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), SimHashSig.sigWide4(col("text")).as("w"))
      .select(col("id") +: (0 to 3).map(l => col(s"w.sig$l")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    cases.indices.foreach { i =>
      (0 to 3).foreach { l =>
        assert(got(i.toLong)(l) == refSig(cases(i), l),
          s"lane $l mismatch on '${cases(i)}'")
      }
    }
  }

  test("wide4 lanes 0-1 equal the two-lane signature (same constants)") {
    val w2 = nativeSigs(cases)
    val w4 = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), SimHashSig.sigWide4(col("text")).as("w"))
      .collect().map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    cases.indices.foreach(i => assert(w4(i.toLong) == w2(i.toLong)))
  }

  test("operator path: simHashSignatures matches on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .select(col("doc_id"), col("text"))
    val viaOp = graft.ops.Dedup.simHashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val agg = aggSigs(texts.map(_._2), lane1 = false)
    texts.zipWithIndex.foreach { case ((id, _), i) =>
      assert(viaOp(id) == agg(i.toLong), s"doc $id signature mismatch")
    }
  }
}
