package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, FuzzyJoin}

/** The c4 composition on planted fixtures: fuzzy candidate pairs →
  * conjunctive attribute agreement → components → canonical fold.
  * The oracle gate proves byte-equality on real data; these specs pin
  * the two behaviors that matter structurally — the attribute guard
  * BLOCKS transitive over-merging, and agreeing chains DO merge. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(rows: Seq[(Long, String, String, Int)]) = {
    val df = rows.toDF("id", "name", "seg", "nat")
    val agree = FuzzyJoin.editDistanceJoin(df, "id", "name", maxDist = 1,
        blockCols = Seq("seg", "nat"))
      .select($"id_a", $"id_b")
    Dedup.connectedComponents(agree, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
  }

  test("blockCols blocking ≡ unblocked join post-filtered by attribute equality") {
    val c = Tables.customer(spark, sfDir)
    val blocked = FuzzyJoin.editDistanceJoin(c, "c_custkey", "c_name",
        maxDist = 1, blockCols = Seq("c_mktsegment", "c_nationkey"))
      .select($"id_a", $"id_b", $"dist")
    val attrs = c.select($"c_custkey", $"c_mktsegment", $"c_nationkey")
    val reference = FuzzyJoin.editDistanceJoin(c, "c_custkey", "c_name", maxDist = 1)
      .join(attrs.select($"c_custkey".as("id_a"),
        $"c_mktsegment".as("sa"), $"c_nationkey".as("na")), Seq("id_a"))
      .join(attrs.select($"c_custkey".as("id_b"),
        $"c_mktsegment".as("sb"), $"c_nationkey".as("nb")), Seq("id_b"))
      .filter($"sa" === $"sb" && $"na" === $"nb")
      .select($"id_a", $"id_b", $"dist")
    assert(blocked.exceptAll(reference).isEmpty &&
      reference.exceptAll(blocked).isEmpty)
    assert(blocked.count() > 0)
  }

  test("attribute disagreement blocks a name-similar merge") {
    val comp = resolve(Seq(
      (1L, "acme corp", "A", 1),
      (2L, "acme korp", "A", 1),   // dist 1, attrs agree → merges with 1
      (3L, "acme corp", "B", 1)))  // dist 0 vs #1 but segment differs → alone
    assert(comp.get(1L).contains(1L) && comp.get(2L).contains(1L))
    assert(!comp.contains(3L)) // in no agreeing pair → not even a node
  }

  test("agreeing chains merge transitively into the min-id entity") {
    val comp = resolve(Seq(
      (5L, "aaaa", "A", 1),
      (6L, "aaab", "A", 1),   // 1 from 5
      (7L, "aabb", "A", 1),   // 2 from 5, 1 from 6 → chains via 6
      (9L, "zzzz", "A", 1)))  // far from everything
    assert(comp == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("rep-collapsed pipeline ≡ id-level formulation under mass-duplicated names") {
    // the ScaleUp regime: every (name, block) appears k times under
    // shifted ids. The production pipeline collapses to distinct
    // representatives before CC; this reference runs CC over the RAW
    // id-level pair graph (quadratic in k) — outputs must be equal.
    import org.apache.spark.sql.types.DecimalType
    val k = 3
    val base = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_nationkey",
        $"c_acctbal")
    val dup = (0 until k).map(i => base
        .withColumn("c_custkey", $"c_custkey" + i * 1000000L))
      .reduce(_ unionByName _)
    val got = graft.analytics.CoreQueries.entityResolutionFrom(dup)
    // id-level reference: fuzzy pairs over raw ids → CC → fold
    val pairs = FuzzyJoin.editDistanceJoin(dup, "c_custkey", "c_name",
        maxDist = 1, blockCols = Seq("c_mktsegment", "c_nationkey"))
      .select($"id_a", $"id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val stats = comp
      .join(dup.select($"c_custkey", $"c_acctbal"),
        $"node" === $"c_custkey")
      .groupBy($"component".as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        round(sum($"c_acctbal".cast(DecimalType(18, 2))), 2)
          .cast("double").as("total_acctbal"))
    val ref = stats
      .join(dup.select($"c_custkey", $"c_name"),
        stats("entity_id") === $"c_custkey")
      .select($"entity_id", $"c_name".as("canonical_name"),
        $"n_members", $"total_acctbal")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // every name now has k copies, so every entity has >= k members
    assert(got.agg(min($"n_members")).as[Long].head() >= k)
  }

  test("canonical fold: entity id is a member and carries that member's name") {
    val out = SparkEntry.queries("c4_entity_resolution")(spark, sfDir)
    val rows = out.as[(Long, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 2), "components come from pairs: >= 2 members")
    val names = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name").as[(Long, String)].collect().toMap
    assert(rows.forall(r => names.get(r._1).contains(r._2)),
      "canonical name must be the min-member's own name")
  }
}
