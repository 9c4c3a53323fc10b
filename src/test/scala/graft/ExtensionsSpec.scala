package graft

import graft.plans.GraftFunctions

/** The engine's SQL-name surface: the native codegen expressions are
  * callable from spark.sql() once registered (by GraftExtensions on an
  * extensions-configured cluster, or GraftFunctions.register on an
  * existing session — both share the same descriptions).
  */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions dispatch to the native expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT polyhash('hello') AS ph,
        |  shape_fingerprint('ab cde f') AS fp,
        |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp
        |""".stripMargin).collect().head
    assert(r.getLong(0) == graft.functions.PolyHash.hash("hello"))
    assert(r.getLong(1) == graft.functions.ShapeFingerprint.hash("ab cde f"))
    assert(r.getDouble(2) == 32.0)
  }

  test("SQL functions agree with the Column API on real data") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir).limit(20)
    docs.createOrReplaceTempView("__ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, shape_fingerprint(text) AS fp FROM __ext_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.ShapeFingerprint.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("extensions class wires the strategy and every SQL function") {
    // the extensions entry point is config-driven
    // (spark.sql.extensions=graft.plans.GraftExtensions) — assert it
    // injects everything the register() path provides
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e)
    // building a session from scratch to observe injection is heavier
    // than this harness allows (the JVM-wide test session already
    // exists); the descriptions list being shared by both paths plus
    // the two tests above cover the dispatch itself
    assert(GraftFunctions.descriptions.map(_._1.funcName).sorted ==
      Seq("dot_product", "polyhash", "shape_fingerprint"))
  }
}
