package graft

import org.apache.spark.sql.functions._
import graft.functions.WordNGrams

/** The native [[graft.functions.WordNGrams]] byte-slicer must agree
  * element-for-element (values AND first-occurrence order) with the HOF
  * composition it replaces — the t20/t21 oracle replays that
  * composition in SQL, so any divergence is a correctness bug. */
class WordNGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formulation: array_distinct over transformed slices
    * of split(text, " "), guarded by the size >= n filter the operator
    * used to apply (fewer words -> no rows, i.e. empty array here). */
  private def hofGrams(n: Int) = {
    val ws = split(col("text"), " ")
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  private def assertAgree(texts: Seq[String], n: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        WordNGrams.grams(col("text"), n).as("native"),
        hofGrams(n).as("hof"))
    val bad = df.filter(not(col("native") <=> col("hof"))).collect()
    assert(bad.isEmpty, s"native != hof (n=$n) for: ${bad.mkString("; ")}")
  }

  test("hand-picked cases agree with the HOF composition, n=3") {
    assertAgree(Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d",
      "a b c a b c", // repeated grams -> distinct keeps first
      "a  b c d", // double space -> empty word rides into grams
      " a b c", "a b c ", "  a b c  ",
      "x x x x x x x", // all-identical words, overlapping identical grams
      "café naïve 日本 語 テキスト ok", "a😀b c d e",
      "one two three four five six seven eight nine ten"), 3)
  }

  test("agreement across widths n=1,2,5") {
    val texts = Seq("", "a", "a b", "w x y z w x y z", "a  b  c  d",
      "solo", "p q r s t u v")
    Seq(1, 2, 5).foreach(assertAgree(texts, _))
  }

  test("null input stays null like the HOF composition") {
    val rows = Seq((1L, Option.empty[String]), (2L, Some("a b c d")))
      .toDF("id", "text")
      .select(WordNGrams.grams(col("text"), 3).as("native"))
      .collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
  }

  test("property: random word sequences over a small vocab agree") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab forces heavy gram repetition (the distinct path);
    // empty word + unicode words cover separator edge cases
    val word = Gen.oneOf(Seq("a", "b", "ab", "", "語", "x😀", "k"))
    val strGen = for {
      n <- Gen.chooseNum(0, 12)
      wsList <- Gen.listOfN(n, word)
    } yield wsList.mkString(" ")
    val texts = (0 until 400).flatMap { i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(texts.size >= 350)
    Seq(2, 3).foreach(assertAgree(texts, _))
  }

  test("allGrams keeps multiplicity and document order (vs HOF transform)") {
    val texts = Seq("", "a", "a b c a b c", "x x x x", "a  b  a  b",
      "p q r s p q r s p q")
    Seq(2, 3).foreach { n =>
      val ws = split(col("text"), " ")
      val hofAll = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))
      val bad = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(graft.functions.WordNGrams.allGrams(col("text"), n).as("native"),
          hofAll.as("hof"))
        .filter(not(col("native") <=> col("hof"))).collect()
      assert(bad.isEmpty, s"allGrams != hof (n=$n): ${bad.mkString("; ")}")
    }
  }

  test("interpreted eval path (nullSafeEval) matches the DF path") {
    val cases = Seq("", "a b c d", "a  b c", "x x x x", "語 a 語 a 語")
    cases.foreach { s =>
      val e = WordNGrams(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)), 3)
      val direct = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val viaDf = Seq(Tuple1(s)).toDF("text")
        .select(WordNGrams.grams(col("text"), 3)).head.getSeq[String](0)
      assert(direct == viaDf, s"mismatch on '$s'")
    }
  }
}
