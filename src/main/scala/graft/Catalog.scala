package graft

import org.apache.spark.sql.SparkSession

/** View registration — the engine's SQL surface. After registration a
  * user runs plain `spark.sql` over everything the reference exposes
  * as Postgres tables (schema.sql) plus the synthetic star schema.
  */
object Catalog {

  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the synthetic tables as temp views named after the files.
    * Loader choice (typed/timestamp-normalizing vs plain) lives in
    * [[Tables.loaders]] — single source of truth for both surfaces. */
  def registerTestdata(spark: SparkSession, dir: String): Unit =
    testdataTables.foreach { t =>
      Tables.loaders.getOrElse(t, Tables.table(_, _, t))
        .apply(spark, dir).createOrReplaceTempView(t)
    }

  /** Register graft's vector/text primitives under SQL names, so the
    * spark.sql surface covers them: e.g.
    * `SELECT vec_cosine(a.embedding, b.embedding) FROM ...`,
    * `SELECT label, vec_weighted_mean(embedding, w) FROM ... GROUP BY label`.
    * All stay columnar (native expressions / HOFs, not row UDFs). */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.registerExprFunction
    import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EqualTo, Expression, If, Literal, Multiply, Sqrt}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.DotProduct

    def darr(e: Expression) = Cast(e, ArrayType(DoubleType))
    def dot(a: Expression, b: Expression) = DotProduct(darr(a), darr(b))
    def nullIfZero(e: Expression) =
      If(EqualTo(e, Literal(0.0)), Literal.create(null, DoubleType), e)

    spark.udf.register("vec_weighted_mean", graft.functions.VecWeightedMean.asUdaf)
    registerExprFunction(spark, "vec_dot", a => dot(a(0), a(1)))
    registerExprFunction(spark, "vec_norm", a => Sqrt(dot(a(0), a(0))))
    registerExprFunction(spark, "vec_cosine", a =>
      Divide(dot(a(0), a(1)),
        nullIfZero(Multiply(Sqrt(dot(a(0), a(0))), Sqrt(dot(a(1), a(1)))))))
    // SQL-surface conveniences registered as NATIVE expression trees
    // built from THE columnar forms themselves (TextFunctions.tokenCount
    // / wordCount through the bridge — structural sharing, not a copy
    // kept in sync by a comment). No Scala UDF survives anywhere in
    // main. The 0-for-null contract of the old lambdas is kept; the
    // old word_count lambda additionally trimmed ALL control chars
    // (Java String.trim) where the columnar contract trims spaces —
    // the SQL surface now matches the columnar n_words path exactly,
    // which is the contract the oracles gate.
    import org.apache.spark.sql.catalyst.expressions.{IsNull, Literal => Lit}
    import org.apache.spark.sql.types.StringType
    def str(e: Expression) = Cast(e, StringType)
    registerExprFunction(spark, "token_count", a =>
      If(IsNull(a(0)), Lit(0), graft.functions.TokenCount(str(a(0)))))
    registerExprFunction(spark, "word_count", a =>
      If(IsNull(a(0)), Lit(0),
        graft.functions.TextFunctions.wordCountExpr(str(a(0)))))
  }

  /** Register a TranscriptPipeline output directory as the warehouse
    * tables the reference's dbt layer reads (schema.sql names). */
  def registerPipelineOutputs(spark: SparkSession, outDir: String): Unit = {
    Seq(
      "oa_text" -> "oa_text",
      "document_chunk_embeddings" -> "document_chunk_embeddings",
      "transcript_embeddings" -> "transcript_embeddings",
      "gold_speaker_analytics" -> "gold_speaker_analytics",
      "gold_oral_arguments_analytics" -> "gold_oral_arguments_analytics"
    ).foreach { case (path, view) =>
      spark.read.parquet(s"$outDir/$path").createOrReplaceTempView(view)
    }
  }
}
