package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram assembly: the one-pass replacement for
  *
  * {{{ array_distinct(transform(sequence(0, size(ws) - n),
  *       i => concat_ws(" ", slice(ws, i + 1, n)))) }}}
  *
  * over `ws = split(text, " ")` — the per-document gram table behind
  * boilerplate detection (t20/t21). The HOF formulation is correct but
  * slow twice over: Spark's array higher-order functions are
  * CodegenFallback, so every `slice`+`concat_ws` lambda element
  * evaluates INTERPRETED (measured 46 s to assemble 26M grams at sf10,
  * DiagT20), and `array_distinct` over a string array is a quadratic
  * pairwise scan.
  *
  * This expression exploits the split-on-single-space algebra: every
  * 0x20 byte is a word boundary (0x20 never occurs inside a UTF-8
  * multi-byte sequence), and n consecutive words re-joined with single
  * spaces are EXACTLY the contiguous byte span of the original text
  * from the first word's start to the last word's end. So each gram is
  * a zero-decode byte-slice `UTF8String` over the input's bytes — no
  * split array, no String decode, no per-element interpretation — and
  * the per-doc distinct is one hash probe per gram (LinkedHashSet,
  * first-occurrence order, matching `array_distinct`). Documents with
  * fewer than n words yield an empty array, which `explode` drops —
  * the same rows the old `size(ws) >= n` pre-filter removed.
  *
  * Empty segments behave exactly like the HOF formulation: k
  * consecutive spaces produce k−1 empty words whose grams keep their
  * doubled separators (`concat_ws` keeps empty strings), which the
  * byte-span construction reproduces verbatim. WordNGramsSpec
  * property-checks equivalence against the HOF composition; the
  * t20/t21 oracle hashes cross-check it against DuckDB's list
  * comprehension on real data.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGrams.grams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"${ev.value} = graft.functions.WordNGrams$$.MODULE$$.grams($sVar, $n, $distinct);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {

  /** n-grams of `u`'s single-space-separated words as byte-slices of
    * the input — distinct in first-occurrence order (matching
    * `array_distinct`), or ALL positioned grams in document order when
    * `distinct = false` (the multiplicity consumers: repetition stats,
    * bigram surprisal). Called once per row from eval and generated
    * code. */
  def grams(u: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // The gram UTF8Strings are byte-slices over `bytes`, so we must own
    // it: getBytes copies whenever the string is a slice of a larger
    // buffer (UnsafeRow field, column-vector page), but returns the
    // base array itself when the string spans it exactly — clone in
    // that case so no gram aliases a buffer the caller may reuse.
    val raw = u.getBytes
    val bytes =
      if (raw.asInstanceOf[AnyRef] eq u.getBaseObject) raw.clone() else raw
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nWords += 1; i += 1 }
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    // starts(w) = byte offset where word w begins; word w ends at
    // starts(w+1)-1 (the separating space) or len for the last word
    val starts = new Array[Int](nWords)
    var w = 1; i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val last = nWords - n
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var g = 0
      while (g <= last) {
        val from = starts(g)
        val until = if (g + n < nWords) starts(g + n) - 1 else len
        seen.add(UTF8String.fromBytes(bytes, from, until - from))
        g += 1
      }
      val arr = new Array[Any](seen.size)
      val it = seen.iterator(); var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      new GenericArrayData(arr)
    } else {
      val arr = new Array[Any](last + 1)
      var g = 0
      while (g <= last) {
        val from = starts(g)
        val until = if (g + n < nWords) starts(g + n) - 1 else len
        arr(g) = UTF8String.fromBytes(bytes, from, until - from)
        g += 1
      }
      new GenericArrayData(arr)
    }
  }

  /** Distinct word n-grams of a text column (see class scaladoc). */
  def grams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordNGrams(
      GraftColumnBridge.expression(text.cast("string")), n))
  }

  /** ALL positioned word n-grams (multiplicity kept, document order). */
  def allGrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordNGrams(
      GraftColumnBridge.expression(text.cast("string")), n,
      distinct = false))
  }
}
