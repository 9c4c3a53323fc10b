package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native deletion-neighborhood keys for edit-distance blocking (the
  * FastSS / SymSpell family): the 64-bit hashes of the string itself
  * and of every variant with up to `maxDeletes` code points deleted.
  *
  * Completeness (why joining on these keys finds every close pair):
  * if lev(a, b) <= d, take an optimal alignment and delete from `a`
  * every substituted/inserted position and from `b` every
  * substituted/deleted position — at most d deletions each side — and
  * the two residues are EQUAL. So del_<=d(a) ∩ del_<=d(b) != ∅, and a
  * self-join on the neighborhood keys has 100% recall for lev <= d.
  * Precision is restored by verifying candidates with `levenshtein`
  * (shared keys can arise from lev > d pairs — e.g. deleting at two
  * DIFFERENT positions reaches the same residue — and, harmlessly,
  * from hash collisions).
  *
  * The keys are emitted as 64-bit polynomial hashes, never the variant
  * strings: the blocking join shuffles 8-byte longs, and a collision
  * only adds a candidate that verification removes — correctness never
  * depends on the hash (which is why this is NOT [[PolyHash]]'s
  * oracle-portable fold; the oracle for an operator built on this
  * verifies end results by brute-force levenshtein instead).
  *
  * Cost is O(len · C(len, maxDeletes)) per row — built for SHORT join
  * keys (names, titles, codes; tens of code points). For long strings
  * use content blocks (n-gram / chunk keys) instead: the neighborhood
  * of a document-sized string is astronomically wide.
  */
case class DeletionHoods(child: Expression, maxDeletes: Int)
  extends UnaryExpression {
  require(maxDeletes >= 0 && maxDeletes <= 2,
    s"maxDeletes must be 0, 1 or 2, got $maxDeletes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DeletionHoods.hoodHashes(input.asInstanceOf[UTF8String], maxDeletes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"${ev.value} = graft.functions.DeletionHoods$$.MODULE$$.hoodHashes($sVar, $maxDeletes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeletionHoods {

  // Two independent 31-bit-prime folds packed into one long: same
  // construction as PolyHash (collision odds ~ |block|^2 / 2^60 per
  // key) but NOT cross-engine portable — doesn't need to be, see
  // scaladoc above.
  private val PA = 2147483629L
  private val PB = 2147483587L

  private def pack(cps: Array[Int], skip1: Int, skip2: Int): Long = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < cps.length) {
      if (i != skip1 && i != skip2) {
        h1 = (h1 * 31L + cps(i)) % PA
        h2 = (h2 * 37L + cps(i)) % PB
      }
      i += 1
    }
    h1 * (1L << 31) + h2
  }

  /** Distinct neighborhood hashes of `u` with up to `d` deletions, the
    * identity variant first. Called once per row from eval and
    * generated code. */
  def hoodHashes(u: UTF8String, d: Int): ArrayData = {
    val s = u.toString
    // code points, so deletion positions are character positions in
    // any script (names here are ASCII; the contract shouldn't be)
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    seen.add(pack(cps, -1, -1))
    if (d >= 1) {
      var a = 0
      while (a < n) {
        seen.add(pack(cps, a, -1))
        a += 1
      }
    }
    if (d >= 2) {
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n) {
          seen.add(pack(cps, a, b))
          b += 1
        }
        a += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** POSITION-TAGGED single-deletion keys (r16, the FastSS position
    * refinement for maxDist = 1): element a = mix(pack(del_a), a).
    * Two same-length strings share a tagged key iff their residues
    * after deleting the SAME position are equal — i.e. they differ at
    * exactly that position (a substitution, lev = 1) — so a self-join
    * on these keys emits (modulo 60-bit hash collisions, which the
    * levenshtein verify removes) ONLY true substitution pairs: the
    * cross-position meets that made the untagged candidate stream
    * ~3.6× the true pair count are structurally excluded. Insertion/
    * deletion pairs are caught by the second lane (identity key vs
    * untagged deletion keys — see FuzzyJoin.editDistanceJoin). */
  def taggedHoodHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](n)
    var a = 0
    while (a < n) {
      out(a) = pack(cps, a, -1) * 1000003L + a
      a += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array of neighborhood key hashes. */
  def hoods(str: Column, maxDeletes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DeletionHoods(
      GraftColumnBridge.expression(str.cast("string")), maxDeletes))
  }

  /** Column API: position-tagged single-deletion keys. */
  def taggedHoods(str: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DeletionHoodsTagged(
      GraftColumnBridge.expression(str.cast("string"))))
  }
}

/** Native position-tagged single-deletion keys — see
  * [[DeletionHoods.taggedHoodHashes]]. */
case class DeletionHoodsTagged(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DeletionHoods.taggedHoodHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"${ev.value} = graft.functions.DeletionHoods$$.MODULE$$.taggedHoodHashes($sVar);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
