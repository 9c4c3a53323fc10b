package graft

import org.apache.spark.sql.functions._
import graft.functions.{NormalizeText, PolyHash, ShapeFingerprint, TextFunctions, TokenCount}

/** Regression guard for the Block.toString/stripMargin codegen bug:
  * Spark re-applies stripMargin when assembling generated code, so a
  * generated line BEGINNING with "||" loses its pipes and produces
  * uncompilable Java — which Spark then silently "fixes" by falling
  * back to interpreted eval, the exact hot-path tax the native
  * expressions exist to remove (r8 found TokenCount/NormalizeText
  * running interpreted inside composed Projects for this reason).
  *
  * CODEGEN_ONLY turns that silent fallback into a hard failure, so
  * this spec fails if any custom expression stops compiling in the
  * composed plan shapes that triggered the bug.
  */
class CodegenCompileSpec extends SparkSpec {
  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("custom expressions compile (no interpreter fallback) in composed plans") {
    withCodegenOnly {
      val df = Seq("The quick brown fox", "a b  c   d'e, f!", "", "x").toDF("text")
      // each expression alone, plus the composed shapes that first
      // exposed the bug (expression under CaseWhen inside a Project)
      val out = df.select(
        TokenCount.tokenCount($"text").as("tc"),
        NormalizeText.normalize($"text").as("nt"),
        PolyHash.polyHash($"text").as("ph"),
        ShapeFingerprint.fingerprint($"text").as("sf"),
        TextFunctions.truncateToTokens($"text", 3).as("trunc"))
      val rows = out.collect()
      assert(rows.length == 4)
      // values, not just compilation: codegen and interpreted eval agree
      assert(rows.map(_.getAs[Int]("tc")).toSeq == Seq(4, 7, 0, 1))
    }
  }

  test("PQ expressions compile and agree with interpreted eval under CODEGEN_ONLY") {
    import graft.functions.ProductQuantizer
    val seeds = Seq(Array(0.0, 0.0, 1.0, 1.0), Array(2.0, 2.0, 3.0, 3.0))
    val cb = ProductQuantizer.flatten(seeds, m = 2, subDim = 2)
    val df = Seq((1L, Seq(0.1, 0.2, 2.9, 3.0)), (2L, Seq(1.9, 2.1, 1.2, 0.8)))
      .toDF("id", "v")
    val out = withCodegenOnly {
      df.select(col("id"), col("v"),
          ProductQuantizer.encode(col("v"), cb, 2, 2, 2).as("codes"))
        .withColumn("d", ProductQuantizer.adcDist(col("v"), col("codes"), cb, 2, 2, 2))
        .orderBy("id").collect()
    }
    // interpreted reference via nullSafeEval paths (fresh exprs, no plan)
    assert(out(0).getSeq[Int](out(0).fieldIndex("codes")) == Seq(0, 1))
    assert(out(1).getSeq[Int](out(1).fieldIndex("codes")) == Seq(1, 0))
    // ADC dist of row 1: q=(0.1,0.2) vs cw0=(0,0) -> 0.05 ; (2.9,3.0) vs cw1=(3,3) -> 0.01+0.0
    assert(math.abs(out(0).getAs[Double]("d") - (0.01 + 0.04 + 0.01 + 0.0)) < 1e-12)
  }

  test("flatten + sectionChunks pipeline compiles under CODEGEN_ONLY") {
    withCodegenOnly {
      val raw = graft.etl.Transcripts.readRaw(spark,
        getClass.getResource("/transcripts").getPath + "/*.json")
      val utterances = graft.etl.Transcripts.flatten(graft.etl.Transcripts.valid(raw))
      assert(utterances.count() > 0)
      assert(graft.etl.Transcripts.sectionChunks(utterances).count() > 0)
    }
  }
}
