package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TokenCount}

/** The native [[TokenCount]] loop must be EXACTLY the regex it
  * replaces: `size(regexp_extract_all(text, TokenPattern))`. The
  * property here drives both formulations over adversarial strings —
  * apostrophes, every regex-`\s` char, non-ASCII symbols, astral-plane
  * codepoints (surrogate pairs), empties — and demands equality; the
  * oracle hashes of t3/t22/c2 are the independent cross-check against
  * DuckDB's RE2 on real data. */
class TokenCountSpec extends SparkSpec {
  import spark.implicits._

  private def regexCount = size(
    regexp_extract_all(col("text"), lit(TextFunctions.TokenPattern), lit(0)))

  private def assertAgree(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        TextFunctions.tokenCount(col("text")).as("native"),
        regexCount.as("regex"))
    val bad = df.filter(col("native") =!= col("regex") ||
        col("native").isNull =!= col("regex").isNull)
      .collect()
    assert(bad.isEmpty, s"native != regex for: ${bad.mkString("; ")}")
  }

  test("hand-picked adversarial cases agree with the regex formulation") {
    assertAgree(Seq(
      "", " ", "   ", "a", "don't", "'", "''", "don''t",
      "a b", "a  b", "a\tb", "a\nb", "ab", "a\fb", "a\rb",
      "a,b", ",,", "a, b.", "hello, world!",
      "__x__ y_z", "3.14 costs $2", "a-b", "--",
      "café", "naïve", "日本語テキスト", "a€b",
      "😀", "a😀b", "😀😁",
      "word word", // NBSP is NOT regex \s → symbol token
      "tab\tand\nnewline\f\r mix",
      "e'tait l'avocat qu'il"))
  }

  test("null input stays null like the regex formulation") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("id", "text")
      .select(TextFunctions.tokenCount(col("text")).as("native"),
        regexCount.as("regex"))
    val rows = df.collect()
    assert(rows.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getInt(0) == r.getInt(1))))
  }

  test("property: random strings over a hostile alphabet agree") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet = Gen.oneOf(
      Seq("a", "Z", "9", "_", "'", " ", "\t", "\n", "", "\f", "\r",
        ",", ".", "!", "-", "é", "€", " ", "語", "😀"))
    val strGen = for {
      n <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(n, alphabet)
    } yield cs.mkString
    val texts = (0 until 500).flatMap { i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(texts.size >= 450) // the generator rarely fails; keep coverage honest
    assertAgree(texts)
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    // expression.eval() exercises nullSafeEval directly
    val cases = Seq("", "a b", "don't stop", "x y", "😀!",
      "ab", "'''", "fin")
    cases.foreach { s =>
      val e = graft.functions.TokenCount(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      val viaDf = Seq(Tuple1(s)).toDF("text")
        .select(TextFunctions.tokenCount(col("text"))).head.getInt(0)
      assert(e.eval(null).asInstanceOf[Int] == viaDf, s"mismatch on '$s'")
    }
  }
}
