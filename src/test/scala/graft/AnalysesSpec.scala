package graft

import java.nio.file.Files
import graft.etl.Analyses

/** S8 — fixture-directory listing + classification
  * (visualization/helpers.py:20-71 semantics). */
class AnalysesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_analyses")
    def mk(parts: String*): Unit = {
      val p = dir.resolve(parts.head)
      Files.createDirectories(p)
      parts.tail.foreach(f => Files.writeString(p.resolve(f), "{}"))
    }
    mk("term-2020")
    mk("term-2019")
    mk("run_a", "analysis_metadata_20240101T120000.json", "results.csv")
    mk("unclassifiable")               // no term-, no metadata → dropped
    mk("run_b", "metadata_20230615.json")
    dir.toString
  }

  test("classifies term and timestamped analyses, drops the rest") {
    val got = Analyses.listAnalyses(spark, root)
      .select($"type", $"term", $"timestamp", $"display_name")
      .as[(String, Option[String], Option[String], String)].collect().toList
    // plain string sort over term-or-timestamp, as the reference:
    // "2019" < "2020" < "20230615" < "20240101T120000"
    assert(got == List(
      ("single_term", Some("2019"), None, "Term 2019"),
      ("single_term", Some("2020"), None, "Term 2020"),
      ("multi_term", None, Some("20230615"), "Multi-term Analysis 20230615"),
      ("multi_term", None, Some("20240101T120000"), "Multi-term Analysis 20240101T120000")))
  }

  test("timestamp extraction follows split('_')[-1].split('.')[0]") {
    val got = Analyses.listAnalyses(spark, root)
      .filter($"prefix" === "run_a/")
      .select($"timestamp").as[String].head()
    assert(got == "20240101T120000")
  }

  test("missing root yields an empty frame, not an error") {
    assert(Analyses.listAnalyses(spark, s"$root/nope").count() == 0)
  }
}
