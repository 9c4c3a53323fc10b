package graft.ops

import org.apache.spark.sql.Column
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
}
