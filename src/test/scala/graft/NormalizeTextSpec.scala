package graft

import org.apache.spark.sql.functions._
import graft.functions.NormalizeText

/** The native [[graft.functions.NormalizeText]] automaton must agree
  * byte-for-byte with the regex composition it replaces — the SQL
  * oracle replays that composition, so any divergence is a correctness
  * bug, not a style choice. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def regexNorm = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""),
    "\\s+", " "))

  private def assertAgree(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        NormalizeText.normalize(col("text")).as("native"),
        regexNorm.as("regex"))
    val bad = df.filter(col("native") =!= col("regex") ||
        col("native").isNull =!= col("regex").isNull)
      .collect()
    assert(bad.isEmpty, s"native != regex for: ${bad.mkString("; ")}")
  }

  test("hand-picked adversarial cases agree with the regex composition") {
    assertAgree(Seq(
      "", " ", "   ", "\t\n\f\r", "a", "A", "aA", "Hello, World!",
      "a b", "a  b", "a\tb", "a\nb", "ab", "a\fb", "a\rb",
      " a", "a ", "  a  ", "\ta\t",
      "a.b", "a . b", "a..b", "a.\t.b", ". a", "a .",
      "3.14 costs $2", "UPPER lower MiXeD",
      "café", "naïve", "ÀÉÎÕÜ", "İstanbul", "İ", "ẞß",
      "日本語テキスト", "a€b", "😀", "a😀b", "😀 😀",
      "word word", // NBSP is NOT regex \s → removed, no separator
      "KKelvin", // U+212A KELVIN SIGN lowercases to 'k'
      "ⅠⅡ", // Roman numerals: lowercase forms stay non-ASCII
      "tab\tand\nnewline\f\r mix",
      "--- ___ !!!", "a---b", "x_y z'w"))
  }

  test("null input stays null like the regex composition") {
    val rows = Seq((1L, Option.empty[String]), (2L, Some("A b!")))
      .toDF("id", "text")
      .select(NormalizeText.normalize(col("text")).as("native"),
        regexNorm.as("regex"))
      .collect()
    assert(rows.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getString(0) == r.getString(1))))
  }

  test("property: random strings over a hostile alphabet agree") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alphabet = Gen.oneOf(
      Seq("a", "Z", "9", "_", "'", " ", "\t", "\n", "", "\f", "\r",
        ",", ".", "!", "-", "é", "€", " ", "語", "😀", "İ",
        "K", "Q", "0"))
    val strGen = for {
      n <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(n, alphabet)
    } yield cs.mkString
    val texts = (0 until 500).flatMap { i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(texts.size >= 450)
    assertAgree(texts)
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    val cases = Seq("", "A b!", "  x  ", "a.\t.b", "😀 ok", "İ", "ÀbC")
    cases.foreach { s =>
      val e = graft.functions.NormalizeText(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      val viaDf = Seq(Tuple1(s)).toDF("text")
        .select(NormalizeText.normalize(col("text"))).head.getString(0)
      assert(e.eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString == viaDf, s"mismatch on '$s'")
    }
  }
}
