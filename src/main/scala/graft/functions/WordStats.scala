package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word statistics over a space-separated string: word count,
  * short/long word counts, and per-word-set membership counts — the
  * counters behind language-ID marker scores and quality ratios.
  *
  * Replaces the `size(filter(split(text, " "), lambda))` formulation:
  * Spark's array higher-order functions evaluate their lambdas
  * INTERPRETED (HigherOrderFunction is CodegenFallback), so the
  * quality/lang-id path cost 4+ interpreted array passes per document
  * plus the materialized split array. This expression is one tight
  * generated loop per row — no array materializes, each set lookup is
  * a hash probe — and keeps the whole stage in codegen.
  *
  * Semantics EXACTLY match `split(text, " ", -1)` (single-space
  * separator, empty segments kept, so k spaces → k+1 words and ""
  * counts one empty word): word lengths are code-point counts like
  * Spark's `length`, short = len ≤ shortMax (empties included, as
  * `length(w) <= 2` was true for ""), long = len ≥ longMin, and set
  * membership is exact string equality (empties match nothing). The
  * oracle SQL keeps using the list_filter formulation — the hash
  * equality of every quality/lang-id query is the cross-check that
  * this loop IS that semantics.
  */
case class WordStats(child: Expression, sets: Seq[Seq[String]],
                     shortMax: Int, longMin: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_short", IntegerType, nullable = false),
    StructField("n_long", IntegerType, nullable = false),
    StructField("set_counts", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  @transient private lazy val setArr: Array[java.util.HashSet[String]] =
    WordStats.toSetArray(sets)
  @transient private lazy val maxSetWordChars: Int =
    if (sets.isEmpty) 0 else sets.flatten.map(_.length).foldLeft(0)(math.max)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var nW = 0; var nS = 0; var nL = 0
    val counts = new Array[Int](setArr.length)
    var start = 0; var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        val charLen = i - start
        val cpLen = s.codePointCount(start, i)
        nW += 1
        if (cpLen <= shortMax) nS += 1
        if (cpLen >= longMin) nL += 1
        if (charLen > 0 && charLen <= maxSetWordChars) {
          val w = s.substring(start, i)
          var j = 0
          while (j < counts.length) {
            if (setArr(j).contains(w)) counts(j) += 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nW, nS, nL,
      UnsafeArrayData.fromPrimitiveArray(counts)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      val setsRef = ctx.addReferenceObj("wordSets", setArr,
        "java.util.HashSet[]")
      val str = ctx.freshName("str")
      val nW = ctx.freshName("nW")
      val nS = ctx.freshName("nS")
      val nL = ctx.freshName("nL")
      val counts = ctx.freshName("counts")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val cpLen = ctx.freshName("cpLen")
      val charLen = ctx.freshName("charLen")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      s"""
         |java.lang.String $str = $sVar.toString();
         |int $nW = 0; int $nS = 0; int $nL = 0;
         |int[] $counts = new int[${setArr.length}];
         |int $start = 0; int $i = 0;
         |int $len = $str.length();
         |while ($i <= $len) {
         |  if ($i == $len || $str.charAt($i) == ' ') {
         |    int $charLen = $i - $start;
         |    int $cpLen = $str.codePointCount($start, $i);
         |    $nW++;
         |    if ($cpLen <= $shortMax) $nS++;
         |    if ($cpLen >= $longMin) $nL++;
         |    if ($charLen > 0 && $charLen <= $maxSetWordChars) {
         |      java.lang.String $w = $str.substring($start, $i);
         |      for (int $j = 0; $j < ${setArr.length}; $j++) {
         |        if ($setsRef[$j].contains($w)) $counts[$j]++;
         |      }
         |    }
         |    $start = $i + 1;
         |  }
         |  $i++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$nW, $nS, $nL,
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordStats {
  private[functions] def toSetArray(sets: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[String]()
      s.foreach(hs.add)
      hs
    }.toArray

  /** Column API: struct(n_words, n_short, n_long, set_counts). */
  def wordStats(text: Column, sets: Seq[Seq[String]],
                shortMax: Int = 2, longMin: Int = 7): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WordStats(
      GraftColumnBridge.expression(text.cast("string")), sets, shortMax, longMin))
  }
}
