package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash signature: for a space-separated document,
  * every word votes ±1 on each of 60 bit positions of its
  * [[PolyHash]] (and, in the wide variant, a second independent lane
  * of [[PolyHashB]] bits); bit i of the signature is set when the vote
  * sum is positive. Exactly the semantics of the explode+aggregate
  * formulation it replaces:
  *
  * {{{ df.select(id, explode(split(text, " ")).as("w"))
  *      .select(id, polyHash(col("w")).as("h"))
  *      .groupBy(id).agg(<60 × sum(when(bit(h,i)===1, 1L).otherwise(-1L))>) }}}
  *
  * That formulation materializes every word as a row and pushes 150M+
  * rows (at sf10) through a 60-column (120 for wide) conditional-sum
  * aggregate — and the wide generated aggregate alone cost ~5 s of
  * Janino/JIT compilation per session (round-5 profile). Here the
  * whole signature is ONE generated call per document: the word hash
  * folds roll over the string's codepoints in place (a space finalizes
  * the word and votes its bits), so no split array, no word rows, no
  * wide aggregate buffer — the signature stage becomes a pure map.
  *
  * Semantics match `split(text, " ")` + explode exactly: empty
  * segments (consecutive/leading/trailing spaces, or an empty
  * document) are words too, hash to 0, and vote −1 on every bit —
  * identical to the exploded rows. Vote sums are exact integers, so
  * the result is bit-identical to the aggregate and to the SQL
  * oracle's replay of it. */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashSig.narrow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"${ev.value} = graft.functions.SimHashSig$$.MODULE$$.narrow($sVar);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-lane (120-bit) variant: `struct(sig0, sig1)` with lane 0 voting
  * on [[PolyHash]] bits and lane 1 on [[PolyHashB]] bits; each word
  * hashes ONCE for both lanes in the same scan. */
case class SimHashSigWide(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("sig0", LongType, nullable = false),
    StructField("sig1", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    SimHashSig.wide(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow)
         |  graft.functions.SimHashSig$$.MODULE$$.wide($sVar);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  private val Bits = 60

  /** Lane hash constants: lane i folds its words with
    * (MultA(i), PrimeA(i)) and (MultB(i), PrimeB(i)), packed as
    * `hA * PolyHash.Pack + hB`. Lanes 0-1 are the historical
    * PolyHash/PolyHashB pairs (oracle-pinned); lanes 2-3 extend the
    * signature to 240 bits for the fourth-decade band widths. */
  val MultA: Array[Long] = Array(31L, 41L, 47L, 59L)
  val MultB: Array[Long] = Array(37L, 43L, 53L, 61L)
  val PrimeA: Array[Long] =
    Array(1073741789L, 1073741741L, 1073741719L, 1073741689L)
  val PrimeB: Array[Long] =
    Array(1073741783L, 1073741723L, 1073741717L, 1073741671L)

  def narrow(u: UTF8String): Long = sigs(u.toString, lanes = 1)(0)

  def wide(u: UTF8String): GenericInternalRow = {
    val s = sigs(u.toString, lanes = 2)
    new GenericInternalRow(Array[Any](s(0), s(1)))
  }

  def wide4(u: UTF8String): GenericInternalRow = {
    val s = sigs(u.toString, lanes = 4)
    new GenericInternalRow(Array[Any](s(0), s(1), s(2), s(3)))
  }

  private def sigs(str: String, lanes: Int): Array[Long] = {
    val votes = Array.ofDim[Int](lanes, Bits)
    val ha = new Array[Long](lanes)
    val hb = new Array[Long](lanes)
    val len = str.length
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        // finalize the current word: vote its packed hash bits per lane
        var l = 0
        while (l < lanes) {
          val p = ha(l) * PolyHash.Pack + hb(l)
          val v = votes(l)
          var b = 0
          while (b < Bits) {
            v(b) += ((((p >>> b) & 1L).toInt) << 1) - 1
            b += 1
          }
          ha(l) = 0L; hb(l) = 0L
          l += 1
        }
        i += 1
      } else {
        val cp = str.codePointAt(i)
        var l = 0
        while (l < lanes) {
          ha(l) = (ha(l) * MultA(l) + cp) % PrimeA(l)
          hb(l) = (hb(l) * MultB(l) + cp) % PrimeB(l)
          l += 1
        }
        i += Character.charCount(cp)
      }
    }
    val out = new Array[Long](lanes)
    var l = 0
    while (l < lanes) {
      var b = 0
      while (b < Bits) {
        if (votes(l)(b) > 0) out(l) |= 1L << b
        b += 1
      }
      l += 1
    }
    out
  }

  /** Column API: the 60-bit lane-0 signature. */
  def sig(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHashSig(
      GraftColumnBridge.expression(text.cast("string"))))
  }

  /** Column API: `struct(sig0, sig1)` of the two-lane signature. */
  def sigWide(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHashSigWide(
      GraftColumnBridge.expression(text.cast("string"))))
  }

  /** Column API: `struct(sig0..sig3)` of the four-lane (240-bit)
    * signature — the fourth-decade variant: band width can grow to a
    * whole 60-bit lane, holding the collision-slack rule to
    * n ≈ 2^55 docs where the two-lane layout saturates at 2^25. */
  def sigWide4(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHashSigWide4(
      GraftColumnBridge.expression(text.cast("string"))))
  }
}

/** Four-lane (240-bit) variant: `struct(sig0..sig3)`, lanes hashed
  * with the [[SimHashSig.MultA]]/[[SimHashSig.PrimeA]] constant rows;
  * every word still hashes once per lane inside the same scan. */
case class SimHashSigWide4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType((0 to 3).map(i =>
    StructField(s"sig$i", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    SimHashSig.wide4(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sVar => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow)
         |  graft.functions.SimHashSig$$.MODULE$$.wide4($sVar);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
