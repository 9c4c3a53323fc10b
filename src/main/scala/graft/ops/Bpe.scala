package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer training — the
  * "train a tokenizer on the corpus" step of a training-data pipeline
  * (Sennrich et al. 2016 algorithm shape; reference tokenizes with a
  * pretrained model, `/root/reference/services/transformers/helpers.py`
  * — training one is the capability a data engine adds on top).
  *
  * Scale shape (the whole point of the design): the corpus is touched
  * EXACTLY ONCE — one split+explode+count pass to a word-frequency
  * table. Everything after runs on that table, which Heaps' law keeps
  * around |corpus|^~0.5 (a 100 TB crawl has ~10^8–10^9 distinct
  * tokens, not 10^13): each merge round is a vocab-sized pair-count
  * aggregate, ONE argmax row collected to the driver, and a vocab
  * rewrite. Nothing corpus-sized is ever shuffled again, and the
  * driver never holds the vocabulary.
  *
  * The word-count exchange carries the word STRINGS (not digests):
  * unlike t12's count-join, the downstream pair extraction needs the
  * characters themselves, and a word string is digest-scale (~8 bytes)
  * anyway. Pair extraction is codegen'd position-explode + substring
  * (no interpreted HOF lambda); the corpus pass is pure codegen
  * split+explode.
  */
object Bpe {

  /** One corpus pass → (word, freq). Empty split segments are dropped:
    * they carry no pairs and would bloat the vocab table. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Corpus-weighted counts of adjacent character pairs inside words —
    * the merge-candidate table of BPE round 1, and a corpus statistic
    * in its own right (the t26 oracle query). Weighting via the
    * word-frequency table is exactly equal to counting over every word
    * instance (the formulation the DuckDB oracle replays).
    *
    * Pair extraction is `explode(sequence) + substring` — position
    * rows, not an interpreted `transform` lambda: same row count
    * either way (one per pair), but every expression stays inside
    * whole-stage codegen (the t26 PlanSpec lambda guard). */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    wordFrequencies(df, textCol)
      .where(length(col("word")) >= 2)
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word) - 1)")).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))

  /** Merge every non-overlapping (a, b) occurrence left-to-right —
    * the standard BPE apply rule. */
  private[ops] def mergePair(syms: IndexedSeq[String], a: String,
                             b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Separator for the delimited-symbol string encoding of a symbol
    * sequence: every symbol is wrapped on BOTH sides,
    * `["a","bc"] -> "␁a␁␁bc␁"` (␁ = U+0001). Applying one merge
    * (a, b) is then literally
    * `replace(s, "␁a␁␁b␁", "␁ab␁")` — java/DuckDB `replace` scans
    * left-to-right non-overlapping, which IS the BPE apply rule
    * ([[mergePair]]). Both anchors matter: the LEADING ␁ stops the
    * pattern matching a suffix of a longer symbol ("␁xa␁␁b␁" must not
    * match merge (a, b) — a trailing-only encoding does, wrongly),
    * and wrapping each symbol individually (doubled ␁␁ between
    * neighbors) means consecutive matches share no characters, so
    * "a a a a" still merges leftmost-first to "aa aa" exactly like
    * the array form. Token count = separator count / 2. Precondition:
    * input text must not contain U+0001 (and symbols are code UNITS
    * here — BMP text only; the corpus tables are ASCII). */
  val Sep = "\u0001"

  /** Vocab-scale BPE encode: the learned merges applied to every
    * DISTINCT word exactly once — the shape real tokenizer pipelines
    * use (encode the vocab, join counts), so the corpus is never
    * re-scanned per merge. The whole chain (regexp explode to
    * delimited symbols, one literal `replace` per merge, separator
    * count = token count) is codegen'd string ops, no UDF, and
    * replays verbatim in SQL. Returns (word, wtok). */
  def wordTokenCounts(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1)
      .distinct()
    val seq0 = regexp_replace(col("word"), "(.)", Sep + "$1" + Sep)
    val seqN = merges.foldLeft(seq0) { case (s, (a, b)) =>
      call_function("replace", s,
        lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
    words.select(col("word"),
      ((length(seqN) -
        length(call_function("replace", seqN, lit(Sep), lit("")))) / 2)
        .cast("long").as("wtok"))
  }

  /** Per-document BPE token counts under the learned merges:
    * explode word occurrences, join the encoded vocab (word-string
    * keys — the [[wordFrequencies]] exchange argument), aggregate.
    * Returns (id, n_words, n_tokens). */
  def encodedTokenCounts(df: DataFrame, idCol: String, textCol: String,
                         merges: Seq[(String, String)]): DataFrame = {
    val occ = df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1)
    occ.join(wordTokenCounts(df, textCol, merges), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("wtok")).as("n_tokens"))
  }

  /** Learn `numMerges` merges. Each round: distributed pair-count over
    * the vocab table, argmax by (count desc, pair asc — deterministic
    * across partitionings), driver receives ONE row, vocab symbol
    * arrays are rewritten and localCheckpointed (so round k+1's
    * lineage starts at the vocab table, not the corpus). Stops early
    * when no pair reaches `minFreq`. Returns merges in learned order
    * with their counts. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L): Seq[((String, String), Long)] = {
    require(numMerges >= 1 && minFreq >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    var vocab: Dataset[(IndexedSeq[String], Long)] =
      wordFrequencies(df, textCol)
        .where(length(col("word")) >= 2)
        .as[(String, Long)]
        .map { case (w, f) =>
          // initial symbols = code points (not UTF-16 units)
          val syms = w.codePoints().toArray.map(cp =>
            new String(Character.toChars(cp))).toIndexedSeq
          (syms, f)
        }
        .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[((String, String), Long)]
    var rounds = 0
    var done = false
    while (rounds < numMerges && !done) {
      val best = vocab.flatMap { case (syms, f) =>
          (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), f))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(1).collect()
      if (best.isEmpty || best.head._3 < minFreq) done = true
      else {
        val (a, b, n) = best.head
        merges += (((a, b), n))
        val prev = vocab
        vocab = vocab.map { case (syms, f) => (mergePair(syms, a, b), f) }
          .localCheckpoint()
        prev.unpersist()
      }
      rounds += 1
    }
    vocab.unpersist()
    merges.toList
  }
}
