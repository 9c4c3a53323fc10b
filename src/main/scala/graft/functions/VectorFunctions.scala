package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar vector math over `array<float>`/`array<double>` embedding
  * columns (SURVEY.md U5/F9 — the reference's sklearn cosine_similarity,
  * clustering/helpers.py:190-192).
  *
  * Implemented with higher-order functions (`zip_with` + `aggregate`)
  * rather than a Scala UDF so the expressions stay inside Catalyst:
  * no serialization boundary, null-safety handled by the engine, and the
  * plan remains visible to the optimizer. Elements are cast to double
  * BEFORE multiplying: the sum then runs as a deterministic left fold of
  * exact float→double products, which makes results reproducible across
  * engines (the DuckDB oracle casts to DOUBLE[] the same way).
  */
object VectorFunctions {

  /** Dot product with double accumulation, deterministic left-fold
    * order. Backed by the native codegen [[DotProduct]] expression —
    * numerically identical to the HOF `aggregate(zip_with(...))`
    * formulation but ~10x faster on pairwise workloads (HOF lambdas
    * are interpreted, never codegen'd). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is zero (reference treats
    * zero vectors as undefined similarity). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared Euclidean distance (clustering/helpers.py:178-181). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean distance. */
  def dist(a: Column, b: Column): Column = sqrt(sqDist(a, b))
}
