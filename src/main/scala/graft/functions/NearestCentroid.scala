package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Nearest-centroid assignment as ONE expression pass: for an
  * embedding column and a driver-collected centroid matrix, returns
  * `struct(cluster_id, sim)` — the argmax-cosine centroid with ties to
  * the smallest cluster_id and zero-norm similarities treated as NULL,
  * exactly the semantics of the crossJoin + `row_number()` (or
  * `max_by`) formulation it replaces:
  *
  * {{{ crossJoin(broadcast(seeds))
  *       .withColumn("sim", dot(v, sv) / nullif(norm(v) * norm(sv), 0))
  *       .withColumn("r", row_number().over(
  *          partitionBy(id).orderBy(sim.desc, cluster_id))).filter(r === 1) }}}
  *
  * That formulation materializes n·nlist candidate ROWS (vector
  * payloads included) and then needs an argmax per vector — as a window
  * it shuffles and sorts all n·nlist rows; as a `max_by` the struct
  * aggregation buffer is not UnsafeRow-mutable, so Spark falls back to
  * a partial SortAggregate over the same n·nlist rows (the 100× sweep
  * measured the d11 assignment stage dominated by exactly this). Here
  * the argmax runs INSIDE the row — one generated call per vector, a
  * tight double loop over the broadcast-as-reference-object centroid
  * matrix — so the assignment stage materializes nothing and shuffles
  * nothing.
  *
  * Arithmetic reproduces the SQL-oracle replay bit-for-bit: dot
  * products accumulate in index order (as [[DotProduct]] does), norms
  * are `sqrt` of the same index-order self-dot (centroid norms are
  * precomputed once at construction with the identical fold), the
  * similarity is `dot / (nv * nc)` with a NULL when the denominator is
  * exactly 0.0, and candidates are scanned in ascending cluster_id
  * with strict `>` replacement — so equal sims keep the smaller id and
  * an all-NULL row (zero-norm input) falls back to the smallest
  * cluster_id with NULL sim, matching `sim DESC NULLS LAST,
  * cluster_id ASC`.
  *
  * Centroid counts here follow the balanced √n rule
  * (graft.ops.Similarity.semanticDedupBalanced), so the driver-side
  * matrix is √n rows — the same bounded-collect class as the persisted
  * ANN probe signatures, ~16 MB at a billion documents. */
case class NearestCentroid(child: Expression, ids: Array[Long],
                           cents: Array[Array[Double]])
  extends UnaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    "centroid ids and vectors must align and be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = true)))

  @transient private lazy val norms: Array[Double] =
    cents.map(NearestCentroid.selfNorm)

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], ids, cents, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("centVecs", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, vVar => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.expressions.GenericInternalRow)
         |  graft.functions.NearestCentroid$$.MODULE$$.assign(
         |    $vVar, $idsRef, $centsRef, $normsRef);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-n nearest centroids as ONE expression pass — the PROBE-LIST
  * generalization of [[NearestCentroid]]: `array<long>` of the n best
  * cluster_ids ordered exactly as the window formulation it replaces
  * (`row_number() OVER (PARTITION BY id ORDER BY sim DESC, cluster_id)
  * <= n`, Spark DESC = NULLS LAST): descending cosine, ties to the
  * smaller id, zero-norm (null) similarities after every real one.
  * Returns min(n, k) ids.
  *
  * This is what lets an IVF probe side be a pure map: the old
  * `crossJoin(broadcast(seeds))` + window materialized queries×k rows
  * (full vector payloads) and shuffled them through a row_number sort
  * — a full exchange of the ×k-expanded frame. Here the top-nProbe
  * selection is an n-slot insertion scan over the same driver-collected
  * centroid matrix [[NearestCentroid]] carries (n = nProbe is O(1) by
  * construction, k bounded by the quantizer size), inside whole-stage
  * codegen, exchanging nothing. */
case class NearestCentroidsTopN(child: Expression, ids: Array[Long],
                                cents: Array[Array[Double]], n: Int)
  extends UnaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    "centroid ids and vectors must align and be non-empty")
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  @transient private lazy val norms: Array[Double] =
    cents.map(NearestCentroid.selfNorm)

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.assignTopN(input.asInstanceOf[ArrayData], ids, cents,
      norms, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("centVecs", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, vVar => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.NearestCentroid$$.MODULE$$.assignTopN(
         |    $vVar, $idsRef, $centsRef, $normsRef, $n);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** sqrt of the index-order self-dot — the exact `norm(v)` fold the
    * SQL oracle computes. */
  def selfNorm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** One argmax scan; called per row from eval and generated code. */
  def assign(vec: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
             norms: Array[Double]): GenericInternalRow = {
    val v = vec.toDoubleArray()
    val nv = selfNorm(v)
    var bestId = ids(0)
    var bestSim = -2.0          // real cosines are >= -1; -2 = "null"
    var bestNull = true
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val denom = nv * norms(c)
      if (denom != 0.0) {
        var dot = 0.0; var i = 0
        val d = math.min(v.length, cent.length)
        while (i < d) { dot += v(i) * cent(i); i += 1 }
        val sim = dot / denom
        // strict > keeps the smaller cluster_id on ties (ascending
        // scan); any real sim (>= -1 up to rounding) beats the -2
        // all-null sentinel
        if (sim > bestSim) { bestSim = sim; bestId = ids(c); bestNull = false }
      }
      c += 1
    }
    if (bestNull) new GenericInternalRow(Array[Any](bestId, null))
    else new GenericInternalRow(Array[Any](bestId, bestSim))
  }

  /** n-slot insertion scan over centroids in ascending-id order; the
    * strict `>` comparisons keep equal sims in scan (= id) order and
    * rank the -2.0 null sentinel (zero-norm denominators; real cosines
    * are ≥ -1) after every real similarity — byte-for-byte the
    * `sim DESC NULLS LAST, cluster_id ASC` window order. Called per
    * row from eval and generated code. */
  def assignTopN(vec: ArrayData, ids: Array[Long],
                 cents: Array[Array[Double]], norms: Array[Double],
                 n: Int): ArrayData = {
    val v = vec.toDoubleArray()
    val nv = selfNorm(v)
    val m = math.min(n, cents.length)
    val bestIds = new Array[Long](m)
    val bestSims = new Array[Double](m)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val denom = nv * norms(c)
      var sim = -2.0
      if (denom != 0.0) {
        var dot = 0.0; var i = 0
        val cent = cents(c)
        val d = math.min(v.length, cent.length)
        while (i < d) { dot += v(i) * cent(i); i += 1 }
        sim = dot / denom
      }
      val insertAt =
        if (filled < m) filled
        else if (sim > bestSims(m - 1)) m - 1
        else -1
      if (insertAt >= 0) {
        var pos = insertAt
        while (pos > 0 && sim > bestSims(pos - 1)) {
          bestSims(pos) = bestSims(pos - 1); bestIds(pos) = bestIds(pos - 1)
          pos -= 1
        }
        bestSims(pos) = sim; bestIds(pos) = ids(c)
        if (filled < m) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIds)
  }

  /** Column API: `struct(cluster_id, sim)` of the nearest centroid.
    * `seeds` must be driver-side (bounded: √n under the balanced
    * rule); they are sorted by cluster_id here so the tie-break is
    * positional. */
  def nearest(vec: Column, seeds: Seq[(Long, Array[Double])]): Column = {
    val sorted = seeds.sortBy(_._1)
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(vec.cast("array<double>")),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }

  /** Column API: `array<long>` of the top-n nearest centroid ids
    * (sim DESC NULLS LAST, id ASC), min(n, k) elements. */
  def nearestN(vec: Column, seeds: Seq[(Long, Array[Double])], n: Int): Column = {
    val sorted = seeds.sortBy(_._1)
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCentroidsTopN(
      GraftColumnBridge.expression(vec.cast("array<double>")),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, n))
  }
}
