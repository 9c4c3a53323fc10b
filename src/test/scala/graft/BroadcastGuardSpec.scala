package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** The GENERALIZED bounded-broadcast guard (round-9 verdict ask #4):
  * v3b's scale finding — an explicit `broadcast()` hint on a
  * corpus-derived frame, invisible at gate scale, an OOM at 100 TB —
  * is a PATTERN risk, not a one-off. An explicit hint survives any
  * autoBroadcastJoinThreshold and any AQE re-plan, so the driver WILL
  * collect that frame no matter what the runtime sizes say. This spec
  * walks every registered query's optimized plan, finds every
  * broadcast JOIN HINT (the logical residue of `broadcast(df)`), and
  * requires the hinted subtree to carry structural evidence of bounded
  * cardinality:
  *
  *  - a LocalRelation: driver-created seed/codebook/stat/literal frames
  *    (bounded by construction — they already fit on the driver);
  *  - a Limit: explicitly bounded;
  *  - an Aggregate whose grouping keys are empty or not fact-row ids
  *    (global stats, label/priority/partition histograms — group
  *    cardinality is the bounded domain, never the corpus; an
  *    aggregate GROUPED BY a fact id would be corpus-sized and fails);
  *  - a Filter bounding a fact id (`vec_id < 20`, `doc_id IN (...)`)
  *    — ids are unique, so a value bound IS a row-count bound;
  *  - only dimension-table leaves (region/nation/supplier/customer/
  *    part) — the star-schema broadcast-the-dim idiom.
  *
  * A new `broadcast()` around anything else — a fact scan, an
  * id-grouped aggregate, an unbounded derived frame — fails here with
  * the query name, forcing the v3b adjudication (shuffle join or
  * size-aware strategy) instead of a silent scale bomb. */
class BroadcastGuardSpec extends SparkSpec {

  /** Row-identity columns of the FACT tables — grouping or filtering
    * on these tracks corpus cardinality. Quantizer-cell ids
    * (cluster_id, list_id: domain = the bounded centroid matrix) and
    * small derived domains (case_id = doc_id % 20) are deliberately
    * NOT here. */
  private val FactIds = Set(
    "doc_id", "vec_id", "event_id", "user_id", "train_id", "eval_id",
    "anchor_id", "cand_id", "query_id", "probe_id", "view_id", "id_a",
    "id_b", "__id", "__vid", "__rid")

  private def isFactId(name: String): Boolean =
    FactIds.contains(name.toLowerCase) || name.toLowerCase.endsWith("key")

  /** Checkpoint-severed bounded frames: localCheckpoint erases the
    * lineage (the subtree is a bare LogicalRDD), so boundedness is
    * adjudicated here, by name, with the argument on record. */
  private val CheckpointedBounded: Map[String, String] = Map(
    "d12_dsir_select" ->
      ("the broadcast dist frame is the per-bucket token histogram — " +
       "<= nBuckets = 512 rows at ANY corpus size (Sampling.dsirSelect)"),
    "t20_boilerplate" ->
      ("the broadcast frame is the boilerplate gram table AFTER the " +
       "doc_frac >= minFrac filter: a gram needs minFrac*N docs and " +
       "each doc contributes <= G grams, so rows <= G/minFrac — a " +
       "corpus-size-free bound (TextAnalysis.boilerplateGrams)"),
    "t21_boilerplate_strip" ->
      "same frame as t20 (stripBoilerplate applies the t20 table)")

  private val DimTables =
    Set("region", "nation", "supplier", "customer", "part")

  /** Structural bounded-cardinality evidence inside a hinted subtree. */
  private def boundedEvidence(plan: LogicalPlan): Option[String] = {
    var evidence: Option[String] = None
    plan.foreach {
      case _: LocalRelation if evidence.isEmpty =>
        evidence = Some("LocalRelation (driver-created frame)")
      case _: GlobalLimit | _: LocalLimit if evidence.isEmpty =>
        evidence = Some("Limit")
      case a: Aggregate if evidence.isEmpty &&
          !a.groupingExpressions.exists(_.references.exists(r => isFactId(r.name))) =>
        evidence = Some(
          if (a.groupingExpressions.isEmpty) "global Aggregate"
          else "Aggregate on non-id keys")
      case f: Filter if evidence.isEmpty && {
          import org.apache.spark.sql.catalyst.expressions._
          f.condition.exists {
            case LessThan(a: AttributeReference, Literal(_, _)) => isFactId(a.name)
            case LessThanOrEqual(a: AttributeReference, Literal(_, _)) => isFactId(a.name)
            case GreaterThan(Literal(_, _), a: AttributeReference) => isFactId(a.name)
            case EqualTo(a: AttributeReference, Literal(_, _)) => isFactId(a.name)
            case EqualTo(Literal(_, _), a: AttributeReference) => isFactId(a.name)
            case In(a: AttributeReference, _) => isFactId(a.name)
            case InSet(a: AttributeReference, _) => isFactId(a.name)
            case _ => false
          }
        } =>
        evidence = Some("Filter bounding a fact id")
      case _ =>
    }
    evidence.orElse {
      // dimension-only leaves: every scan under the hint reads a dim table
      val leaves = plan.collectLeaves()
      val files = leaves.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.getName).mkString(",")
            case _ => "?"
          }
      }
      if (files.nonEmpty && files.forall(f =>
          DimTables.exists(d => f.contains(d))))
        Some(s"dimension-table leaves [${files.mkString("; ")}]")
      else None
    }
  }

  test("every broadcast() hint in every registered query covers a bounded frame") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val audited = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val opt = try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      opt.foreach {
        case j: Join =>
          def check(side: Option[HintInfo], sub: LogicalPlan, which: String): Unit =
            if (side.exists(_.strategy.contains(BROADCAST))) {
              boundedEvidence(sub)
                .orElse(CheckpointedBounded.get(name).filter(_ =>
                  sub.exists(_.isInstanceOf[
                    org.apache.spark.sql.execution.LogicalRDD]))
                  .map(why => s"checkpointed, adjudicated: $why")) match {
                case Some(ev) => audited += s"$name/$which: $ev"
                case None => offenders +=
                  s"$name broadcasts an UNBOUNDED $which side:\n${sub.treeString.take(1500)}"
              }
            }
          check(j.hint.leftHint, j.left, "left")
          check(j.hint.rightHint, j.right, "right")
        case _ =>
      }
    }
    info(s"${audited.size} broadcast hints audited across " +
      s"${SparkEntry.queries.size} queries")
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
  }
}
