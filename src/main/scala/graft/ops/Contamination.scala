package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Benchmark decontamination: find training documents that share long
  * word n-grams with an evaluation set (the published pre-training
  * practice: drop or flag train docs colliding with eval on 8-13-gram
  * windows).
  *
  * Shape at 100 TB: both sides explode to (id, gram) rows, but the
  * JOIN KEY is the 60-bit portable PolyHash of the gram, not the gram
  * string — the shuffle carries 8-byte keys instead of ~50-byte
  * strings, and the eval side (small: benchmarks are thousands of
  * docs) broadcasts after aggregation. Collisions are not "corrected":
  * the hash is deterministic and portable, so the DuckDB oracle
  * reproduces the same join bit-for-bit (and at 60 bits a false
  * collision is ~never; decontamination errs on dropping anyway). */
object Contamination {

  /** (train_id, eval_id, n_shared) — distinct shared n-gram count per
    * contaminated (train, eval) pair.
    *
    * `broadcastEval` is the SIZE-AWARENESS knob (the v3b adjudication
    * applied here): true fits the real decontamination deployment —
    * the eval side is a FIXED benchmark suite, bounded regardless of
    * corpus scale, and broadcasting its gram table keeps the train
    * side shuffle-free. But when the eval side is carved FROM the
    * corpus (a holdout split, as the c1 gate query does), its gram
    * frame grows linearly with the data and a forced broadcast is the
    * same scale bomb v3b had — pass false and the join becomes a plain
    * shuffle on the 8-byte gram key (AQE still upgrades to broadcast
    * at runtime whenever the eval side MEASURES small). */
  def overlaps(train: DataFrame, trainId: String, trainText: String,
               eval: DataFrame, evalId: String, evalText: String,
               n: Int = 8, broadcastEval: Boolean = true): DataFrame = {
    // Per-doc distinct grams come out of the WordNGrams byte-slicer
    // MAP-SIDE (no per-word explode, no doc-key window shuffle — the
    // formulation the 100x sweep measured at 67 s for this query), and
    // because they are already distinct WITHIN each doc, no distinct()
    // pass is needed after hashing: (id, hash) rows are unique up to
    // intra-doc 60-bit collisions (~n_grams^2/2^60 per doc, never), so
    // the broadcast join + pair aggregate is the plan's ONLY shuffle.
    def grams(df: DataFrame, id: String, text: String, as: String) =
      df.select(col(id).as(as),
          explode(graft.functions.WordNGrams.grams(col(text), n)).as("__w"))
        .select(col(as), PolyHash.polyHash(col("__w")).as("__g"))
    val t = grams(train, trainId, trainText, "train_id")
    val e = grams(eval, evalId, evalText, "eval_id")
    t.join(if (broadcastEval) broadcast(e) else e, Seq("__g"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Clean view of the training set: drop every doc sharing at least
    * `minShared` n-grams with any eval doc (left_anti on the flagged
    * ids — the actual decontamination step). */
  def decontaminate(train: DataFrame, trainId: String, trainText: String,
                    eval: DataFrame, evalId: String, evalText: String,
                    n: Int = 8, minShared: Long = 1): DataFrame = {
    val flagged = overlaps(train, trainId, trainText, eval, evalId, evalText, n)
      .filter(col("n_shared") >= minShared)
      .select(col("train_id").as(trainId)).distinct()
    train.join(flagged, Seq(trainId), "left_anti")
  }
}
