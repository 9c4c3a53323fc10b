package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Embedding scalar quantization (int8-style) — the storage/compute
  * trade every large ANN index makes: 4x smaller vectors, integer dot
  * products, exact arithmetic.
  *
  * Quantization is defined engine-portably: scale = max|x| / 127,
  * q_i = clamp(floor(x_i / scale + 0.5), -127, 127) (floor(x+0.5)
  * rather than round() — both engines floor identically, while
  * round()'s half-away-from-zero vs half-even behavior differs by
  * dialect). Quantized values are small integers carried as doubles,
  * so every downstream dot product is EXACT (≤ dim·127² ≪ 2^53) and
  * order-independent — quantized similarity needs no float tolerance
  * anywhere.
  *
  * The per-vector quantization pass is a linear HOF transform (an ETL
  * step, run once per corpus); the hot pairwise path stays on the
  * native codegen DotProduct. Callers should stage [[maxAbs]] as its
  * OWN projection column (as [[int8]]'s two-arg form requires): the
  * max is referenced twice in the quantize expression, which keeps
  * CollapseProject from inlining it into the per-element lambda —
  * one array scan per row, not one per element.
  */
object Quantize {

  /** max|x| over the vector, double. */
  def maxAbs(v: Column): Column =
    array_max(transform(v.cast("array<double>"), x => abs(x)))

  /** Quantized vector as array<double> of integer values in
    * [-127, 127], given a pre-staged maxAbs column; zero vectors map
    * to all-zeros. */
  def int8(v: Column, m: Column): Column = {
    val d = v.cast("array<double>")
    val scale = m / lit(127.0)
    when(m === 0.0, transform(d, _ => lit(0.0)))
      .otherwise(transform(d, x =>
        greatest(lit(-127.0), least(lit(127.0), floor(x / scale + 0.5)))))
  }

  /** Convenience single-expression form (small inputs / tests). */
  def int8(v: Column): Column = int8(v, maxAbs(v))

  /** Cosine over quantized vectors (exact integer dot, sqrt norms). */
  def cosine(qa: Column, qb: Column): Column =
    VF.dot(qa, qb) / nullif(VF.norm(qa) * VF.norm(qb), lit(0.0))

  /** PQ codebook TRAINING — per-subspace k-means on the subvector
    * slices (the step real PQ indexes run; s3's seeded codebook is the
    * bootstrap). One assignment round + `rounds-1` quantized mean
    * updates per subspace, all m subspaces trained in a SINGLE
    * dataframe pass per round (subspace index exploded, slices are
    * pure projections; assignment joins the broadcast m·kw codeword
    * frame per subspace; the update is one (subspace, codeword)-group
    * VecWeightedMean aggregate). Driver state: m·kw·subDim doubles.
    *
    * Oracle-exactness: assignment minimizes the quadratic form
    * `c·c − 2·x·c` (the ‖x‖² term is constant per row and dropped) —
    * codegen dots, bit-identical in SQL — with ties to the smaller
    * codeword index; means quantize to the 1e-6 grid per round (the
    * km1 recipe); empty cells keep their previous codeword. Returns
    * the flattened codebook in [[graft.functions.ProductQuantizer]]'s
    * (mi·kw + j)·subDim + d layout. */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, subDim: Int, kw: Int,
                       rounds: Int = 2): Array[Double] = {
    require(m > 0 && subDim > 0 && kw > 0 && rounds >= 1)
    val spark = corpus.sparkSession
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    val sub = corpus.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"))
      .select(col("__id"),
        explode(array((0 until m).map(lit): _*)).as("__mi"), col("__v"))
      .select(col("__id"), col("__mi"),
        slice(col("__v"), col("__mi") * lit(subDim) + lit(1), lit(subDim))
          .as("__sv"))
      .localCheckpoint()
    // seeds: the first kw vectors' slices (bounded collect: m·kw rows)
    var cw: Map[(Int, Long), Array[Double]] = sub
      .filter(col("__id") < kw)
      .select(col("__mi"), col("__id"),
        col("__sv").cast("array<double>").as("__dv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    for (_ <- 1 until rounds) {
      val cwDf = spark.createDataFrame(cw.toSeq.map { case ((mi, j), c) =>
        (mi, j, c.toSeq) }).toDF("__mi", "__j", "__cw")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id"), col("__mi"))
        .orderBy(col("__score"), col("__j"))
      val assigned = sub.join(broadcast(cwDf), Seq("__mi"))
        .withColumn("__score",
          VF.dot(col("__cw"), col("__cw")) -
            lit(2.0) * VF.dot(col("__sv"), col("__cw")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      // m·kw-row collect: per-cell quantized means
      val means = assigned.groupBy(col("__mi"), col("__j"))
        .agg(graft.functions.VecWeightedMean(col("__sv"), lit(1.0)).as("__mean"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          r.getSeq[Double](2).toArray.map(r6))
        .toMap
      cw = cw.map { case (key, c) => key -> means.getOrElse(key, c) }
    }
    val cb = new Array[Double](m * kw * subDim)
    for (((mi, j), c) <- cw; d <- 0 until subDim)
      cb((mi * kw + j.toInt) * subDim + d) = c(d)
    cb
  }

  /** PQ-ADC top-k with TRAINED codebooks: [[pqTrainCodebooks]] feeds
    * the same native encode/ADC machinery [[pqTopK]] uses. */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
                    m: Int = 8, subDim: Int = 8, kw: Int = 8,
                    rounds: Int = 2): DataFrame = {
    import graft.functions.ProductQuantizer
    val cb = pqTrainCodebooks(corpus, "vec_id", "embedding", m, subDim, kw, rounds)
    val codes = corpus.select(col("vec_id").as("cand_id"),
      ProductQuantizer.encode(col("embedding"), cb, m, kw, subDim).as("__codes"))
    val q = queries.select(col("query_id"),
      col("embedding").cast("array<double>").as("__qv"))
    val scored = codes.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        ProductQuantizer.adcDist(col("__qv"), col("__codes"), cb, m, kw, subDim)
          .as("adc_dist"))
    TopK.perGroup(scored, Seq("query_id"),
      Seq(("adc_dist", false), ("cand_id", false)), k, rankName = "rank")
  }

  /** Product-quantization ADC top-k (see
    * [[graft.functions.ProductQuantizer]] for the construction and the
    * 100 TB rationale): encode the corpus once to `m` small-int codes
    * per vector, then rank candidates for each query by asymmetric
    * (exact-query vs codeword) squared L2.
    *
    * Scale shape: the corpus-side pass is a pure projection (one
    * codegen loop/row, codes are ~m bytes vs 4·dim for the raw
    * vector); queries broadcast; the per-query top-k runs through the
    * bounded-heap [[TopK.perGroup]] operator, so no corpus-wide sort
    * or window shuffle exists anywhere. The seed collect is
    * |seedIds| rows (the documented bounded-collect pattern, same as
    * NearestCentroid's √n seed matrix).
    *
    * `corpus` needs (vec_id, embedding); `queries` (query_id,
    * embedding). dim must equal m·subDim. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, seedIds: Seq[Long],
             k: Int, m: Int = 8, subDim: Int = 8): DataFrame = {
    import graft.functions.ProductQuantizer
    val seeds = corpus.filter(col("vec_id").isin(seedIds: _*))
      .orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    require(seeds.nonEmpty, s"no seed vectors found for ids $seedIds")
    val kw = seeds.length
    val cb = ProductQuantizer.flatten(seeds, m, subDim)
    val codes = corpus.select(col("vec_id").as("cand_id"),
      ProductQuantizer.encode(col("embedding"), cb, m, kw, subDim).as("__codes"))
    val q = queries.select(col("query_id"),
      col("embedding").cast("array<double>").as("__qv"))
    val scored = codes.crossJoin(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        ProductQuantizer.adcDist(col("__qv"), col("__codes"), cb, m, kw, subDim)
          .as("adc_dist"))
    TopK.perGroup(scored, Seq("query_id"),
      Seq(("adc_dist", false), ("cand_id", false)), k, rankName = "rank")
  }
}
