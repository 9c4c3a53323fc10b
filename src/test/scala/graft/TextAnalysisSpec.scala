package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("novelty: first doc scores 1, exact copy scores 0, overlap is fractional") {
    val df = Seq(
      (1L, "a b c d e"),        // 3 shingles, all first-seen here
      (2L, "a b c d e"),        // exact copy → 0 novel
      (3L, "a b c x y z"),      // shares "a b c"; 3 of 4 novel
      (4L, "p q"))              // too short for a 3-shingle → absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScores(df, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 3L, 3L, 1.0),
      (2L, 3L, 0L, 0.0),
      (3L, 4L, 3L, 0.75)))
  }

  test("novelty: novel counts sum to the corpus's distinct shingle count") {
    // every distinct shingle is first-seen exactly once, so the novel
    // column is a partition of the global distinct-shingle set
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.noveltyScores(docs, "doc_id", "text")
    val sumNovel = got.agg(sum($"n_novel")).as[Long].head()
    val distinctShingles = graft.ops.Dedup
      .shingleRows(docs, "doc_id", "text", 3)
      .select($"__s").distinct().count()
    assert(sumNovel == distinctShingles)
    // repeated shingles WITHIN one doc count once (distinct semantics)
    val within = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val w = TextAnalysis.noveltyScores(within, "doc_id", "text")
      .as[(Long, Long, Long, Double)].head()
    assert(w == ((1L, 2L, 2L, 1.0))) // "a b a" and "b a b" only
  }

  test("char entropy: degenerate, binary, and uniform alphabets hit exact values") {
    val df = Seq(
      (1L, "aaaa"),       // one symbol → 0 bits
      (2L, "abab"),       // two equiprobable → 1 bit
      (3L, "abcd"),       // four equiprobable → 2 bits
      (4L, "a"))          // single char → 0 bits
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(df, "doc_id", "text")
      .select($"doc_id", $"n_chars", $"entropy")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, e) => id -> ((n, math.rint(e * 1e9) / 1e9)) }.toMap
    assert(got == Map(
      1L -> ((4L, 0.0)), 2L -> ((4L, 1.0)), 3L -> ((4L, 2.0)), 4L -> ((1L, 0.0))))
  }

  test("unigram surprisal: uniform corpus distribution gives log2(V) per word") {
    // 4 distinct words, each appearing twice → p(w) = 1/4 everywhere,
    // so every doc's mean surprisal is exactly 2 bits
    val df = Seq((1L, "a b c d"), (2L, "d c b a")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .select($"doc_id", $"n_words", $"mean_surprisal")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, math.rint(s * 1e9) / 1e9)) }.toMap
    assert(got == Map(1L -> ((4L, 2.0)), 2L -> ((4L, 2.0))))
  }

  test("unigram surprisal: rare words score higher than common ones") {
    val df = Seq(
      (1L, "the the the the the the the rare"),
      (2L, "the the the the the the the the"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .select($"doc_id", $"mean_surprisal").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
  }

  test("surprisal and entropy plans: no UDFs, no global windows") {
    val docs = Tables.documents(spark, sfDir)
    Seq(TextAnalysis.unigramSurprisal(docs, "doc_id", "text"),
      TextAnalysis.charEntropy(docs, "doc_id", "text")).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(1000))
      df.queryExecution.optimizedPlan.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => fail("global window")
        case _ =>
      }
    }
  }

  test("chunking reconstructs the original text and is a shuffle-free projection") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", size = 200, overlap = 40)
    // chunk 0 + each later chunk's suffix after `overlap` chars == text
    val rebuilt = chunks
      .withColumn("piece", when(col("chunk_idx") === 0, col("chunk_text"))
        .otherwise(col("chunk_text").substr(lit(41), lit(200))))
      .groupBy(col("doc_id"))
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("chunk_idx"), col("piece")))).getField("piece")).as("rebuilt"))
    val bad = rebuilt.join(docs, Seq("doc_id"))
      .filter(col("rebuilt") =!= col("text")).count()
    assert(bad == 0)
    // projection only: no Exchange in the chunk plan
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    // every doc chunked, empty-safe
    assert(chunks.select("doc_id").distinct().count() == docs.count())
  }

  test("native WordStats equals the HOF formulation on adversarial inputs") {
    import org.apache.spark.sql.functions._
    val stopwords = TextAnalysis.Markers.values.flatten.toSeq
    val rows = Seq(
      "", " ", "  ", "the", "the the the", " the ", "a  b", "x",
      "der die das und zu el la de y en", "supercalifragilistic word",
      "of  of   of", "tiny to the zoo", "trailing space ", " leading",
      "exactly7 chars12 seventy", "ab abc abcd", "éléphant café the")
      .toDF("text")
    // HOF formulation (the executable spec)
    val ws = split(col("text"), " ")
    val hof = rows.select(
      size(ws).as("w"),
      size(filter(ws, w => w.isin(stopwords: _*))).as("stop"),
      size(filter(ws, w => length(w) >= 7)).as("long"),
      size(filter(ws, w => length(w) <= 2)).as("short"))
      .as[(Int, Int, Int, Int)].collect().toSeq
    val st = graft.functions.WordStats.wordStats(col("text"), Seq(stopwords))
    val native = rows.select(
      st.getField("n_words"), st.getField("set_counts").getItem(0),
      st.getField("n_long"), st.getField("n_short"))
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(native == hof)
  }

  test("quality and lang-id plans carry the native word_stats, not interpreted lambdas") {
    import org.apache.spark.sql.functions._
    val df = Tables.documents(spark, sfDir)
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("wordstats") || plan.contains("WordStats"), plan.take(2000))
    assert(!plan.contains("lambdafunction"), plan.take(2000))
  }
  test("gopherRules: signals, per-rule flags and conjunctive keep") {
    val df = Seq(
      // 31 words, mean len (3+2+29*5)/31 ≈ 4.84, stopwords the+of,
      // all-alpha -> keep
      (1L, (Seq("the", "of") ++ Seq.fill(29)("abcde")).mkString(" ")),
      (2L, "the of tiny"),                        // fails word count
      (3L, (Seq.fill(31)("abcdefghijkl")).mkString(" ")) // long words, no stopwords
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.gopherRules(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("word_count") == 31)
    assert(math.abs(r1.getAs[Double]("mean_word_len") - (3 + 2 + 29 * 5) / 31.0) < 1e-9)
    assert(r1.getAs[Int]("stopword_hits") == 2)
    assert(r1.getAs[Double]("alpha_ratio") == 1.0)
    assert(r1.getAs[Boolean]("keep"))
    val r2 = out(1)
    assert(!r2.getAs[Boolean]("r_word_count") && !r2.getAs[Boolean]("keep"))
    assert(r2.getAs[Boolean]("r_stopwords")) // the + of present
    val r3 = out(2)
    assert(r3.getAs[Boolean]("r_word_count"))
    assert(!r3.getAs[Boolean]("r_mean_word_len")) // mean 12 > 5
    assert(!r3.getAs[Boolean]("r_stopwords"))
    assert(!r3.getAs[Boolean]("keep"))
  }
}
