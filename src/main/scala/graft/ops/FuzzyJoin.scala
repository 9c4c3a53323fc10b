package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DeletionHoods

/** Approximate-string (edit-distance) self-join — record linkage /
  * dirty-entity resolution over short keys: find every pair of rows
  * whose `strCol` values are within `maxDist` Levenshtein edits,
  * WITHOUT the quadratic all-pairs comparison.
  *
  * Candidate generation is deletion-neighborhood blocking
  * ([[graft.functions.DeletionHoods]], FastSS/SymSpell family): each
  * row emits the 64-bit hashes of its string and of every <=maxDist
  * single-character deletions; two strings within `maxDist` edits
  * provably share a key, so an equi-join on the 8-byte key hash has
  * 100% recall. Verification (`levenshtein` with Spark's
  * early-exit threshold form) restores precision, and the final
  * `distinct` collapses pairs that met on several keys.
  *
  * Shape at 100 TB:
  *  - candidate generation is a pure map (native expression, one
  *    explode) — no pre-shuffle;
  *  - the ONLY corpus-sized exchange is the equi-join on the 8-byte
  *    key hash; rows carry (id, short string), so the exchange moves
  *    ~(8 + |key string|) bytes per neighborhood entry — for
  *    name-length strings that is digest-scale, which is why the
  *    string rides along instead of a second join-back pass (the
  *    discipline for DOCUMENT-sized payloads — d2/c2/t22 — would
  *    join text back for survivors only);
  *  - block sizes are bounded by how many strings can share a
  *    deletion residue — for natural key data (names, codes, titles)
  *    tens, not thousands. A pathological hot residue (mass-duplicated
  *    keys) is the same adversarial case as d2's hot band, with the
  *    same mitigation (pre-aggregate exact duplicates first: exact
  *    dedup is cheaper than fuzzy and removes the quadratic mass).
  *
  * Returns (id_a, id_b, dist) with id_a < id_b, one row per matched
  * pair. Equal strings on different ids match at dist 0.
  */
object FuzzyJoin {

  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2, got $maxDist")
    val keyed = df.select(
        col(idCol).as("__id"), col(strCol).cast("string").as("__s"),
        explode(DeletionHoods.hoods(col(strCol), maxDist)).as("__k"))
    val a = keyed
    val b = keyed.select(col("__id").as("__id_b"), col("__s").as("__s_b"),
      col("__k").as("__k_b"))
    a.join(b, col("__k") === col("__k_b") && col("__id") < col("__id_b"))
      // threshold form short-circuits the DP once maxDist is exceeded
      // (returns -1), so verification cost per candidate is
      // O(maxDist · len), not O(len²)
      .select(col("__id").as("id_a"), col("__id_b").as("id_b"),
        levenshtein(col("__s"), col("__s_b"), maxDist).as("dist"))
      .where(col("dist") >= 0)
      .distinct()
  }
}
