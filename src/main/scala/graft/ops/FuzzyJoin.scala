package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join via deletion neighborhoods — the
  * SymSpell blocking scheme: if `ed(a, b) <= k` then some string reachable
  * by deleting ≤ k characters from `a` is also reachable by deleting ≤ k
  * characters from `b` (delete the edited positions on each side). So exact
  * candidates come from ONE equi-join on variant hashes — the shuffle moves
  * 8-byte hashes plus ids, strings never all-pair — and `levenshtein`
  * verifies survivors. Exact recall by construction at any scale; the cost
  * is C(len, ≤k) variants per row (len+1 at k=1), the indexing price every
  * fuzzy index pays. All variant generation is Column algebra (no UDF):
  * `substr` with Column offsets keeps expression size constant in length.
  */
object FuzzyJoin {

  /** Deletion variants of `s` with exactly one char removed, as an array. */
  private def oneDeletions(s: Column): Column =
    transform(sequence(lit(0), length(s) - 1), i =>
      concat(s.substr(lit(1), i), s.substr(i + 2, length(s) - i - 1)))

  /** All variants reachable by deleting up to `k` chars (k ∈ {1, 2}),
    * including the string itself; distinct.
    */
  private[ops] def deletionVariants(s: Column, k: Int): Column = {
    require(k >= 1 && k <= 2, s"maxDist must be 1 or 2, got $k")
    val v1 = array_union(array(s), oneDeletions(s))
    if (k == 1) v1
    else array_distinct(concat(v1, flatten(transform(oneDeletions(s), v => oneDeletions(v)))))
  }

  /** Candidate (id, variant-hash) rows: one per distinct deletion variant. */
  private def variantRows(df: DataFrame, id: String, strCol: String,
      k: Int, idOut: String, sOut: String): DataFrame =
    df.select(col(id).as(idOut), col(strCol).as(sOut))
      .withColumn("__vh__",
        explode(array_distinct(transform(deletionVariants(col(sOut), k), xxhash64(_)))))

  /** Pairs `(l_id, r_id, dist)` with `levenshtein(l, r) <= maxDist` across
    * two frames. Null strings never match (SQL semantics).
    */
  def byEditDistance(left: DataFrame, right: DataFrame,
      lId: String, lCol: String, rId: String, rCol: String,
      maxDist: Int): DataFrame = {
    val lv = variantRows(left, lId, lCol, maxDist, "l_id", "__ls__")
    val rv = variantRows(right, rId, rCol, maxDist, "r_id", "__rs__")
    lv.join(rv, "__vh__")
      .select(col("l_id"), col("r_id"), col("__ls__"), col("__rs__"))
      .distinct() // a pair can share many variants
      .withColumn("dist", levenshtein(col("__ls__"), col("__rs__")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** Self-join form: unordered pairs `id_a < id_b` within one frame. */
  def selfByEditDistance(df: DataFrame, id: String, strCol: String,
      maxDist: Int): DataFrame =
    byEditDistance(df, df, id, strCol, id, strCol, maxDist)
      .filter(col("l_id") < col("r_id"))
      .select(col("l_id").as("id_a"), col("r_id").as("id_b"), col("dist"))
}
