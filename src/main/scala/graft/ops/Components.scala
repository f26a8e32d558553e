package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering stage that turns near-dup candidate PAIRS
  * ([[Dedup.minhashCandidates]] / [[Dedup.cosineCandidates]]) into dedup
  * GROUPS (keep one representative per component).
  *
  * Algorithm: every node starts labeled with itself; each round, a node
  * adopts the minimum label in its neighborhood; converged when no label
  * changes. Rounds = O(component diameter) — near-dup graphs are
  * overwhelmingly small star/clique components, so 3–5 rounds suffice in
  * practice (`maxIter` caps pathological chains; the returned status says
  * whether the cap was hit). Each round is one edge-join + one
  * min-aggregate: shuffle scales with |E|, never |V|².
  *
  * Lineage discipline: each round chains join→agg onto the previous round's
  * plan. Left unbroken, the logical plan and the RDD DAG grow linearly with
  * rounds — planning slows every iteration, and one lost executor recomputes
  * the WHOLE chain from the raw edges. `localCheckpoint` every
  * [[CheckpointEvery]] rounds truncates both, bounding recompute depth and
  * keeping the plan constant-size regardless of iteration count.
  */
object Components {

  /** Truncate lineage every this many label-propagation rounds. */
  val CheckpointEvery = 3

  /** @param edges two-column frame of undirected edges (ids)
    * @return (id, component) — component = min node id reachable.
    *         Logs a warning when `maxIter` is hit before convergence
    *         (labels then under-merge); use [[connectedComponentsWithStatus]]
    *         to branch on it programmatically.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 10): DataFrame =
    connectedComponentsWithStatus(edges, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus an explicit converged flag. */
  def connectedComponentsWithStatus(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 10): (DataFrame, Boolean) = {
    // symmetrize once; self-edges make isolated candidate nodes carry through
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .union(edges.select(col(aCol).as("src"), col(aCol).as("dst")))
      .union(edges.select(col(bCol).as("src"), col(bCol).as("dst")))
      .distinct()
      .persist()

    // Convergence test: labels are monotone non-increasing per node (the
    // self-edges put each node's own label under the min), so sum(component)
    // strictly decreases until the fixed point — an EXACT no-join test, one
    // scalar agg per round instead of a next⋈prev join (which was a third
    // shuffle per round and dominated wall-clock on small graphs). decimal(38)
    // keeps the sum exact at any |V| (long would overflow at cluster scale).
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col(df.columns.last).cast("decimal(38,0)"))).first().getDecimal(0))

    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("component"))
    var prevSum = labelSum(labels)
    var prevCached: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node takes the min over its neighbors' current labels (and its own)
      val propagated = sym
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "nbr_label"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_label")).as("next_label"))
      val checkpointed = (iter + 1) % CheckpointEvery == 0
      // eager localCheckpoint truncates plan+DAG; otherwise cache lazily (the
      // labelSum job below materializes it)
      val next = if (checkpointed) propagated.localCheckpoint(true) else propagated.persist()
      val nextSum = labelSum(next)
      // a checkpointed frame's blocks ARE its data (lineage is gone) — never
      // unpersist those; plain cached rounds are safe to drop
      prevCached.foreach(_.unpersist())
      prevCached = if (checkpointed) None else Some(next)
      labels = next.withColumnRenamed("next_label", "component")
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"connectedComponents hit maxIter=$maxIter before convergence: " +
          "labels are under-merged (raise maxIter for high-diameter graphs)")
    (labels, converged)
  }

  /** End-to-end near-dup dedup: candidates → components → per-component
    * min-id representative; returns the surviving rows of `df`.
    */
  def dedupByCandidates(df: DataFrame, idCol: String, candidates: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comps = connectedComponents(candidates, aCol, bCol)
    val keepers = comps.groupBy(col("component")).agg(min(col("id")).as("keep_id"))
      .select(col("keep_id").as(idCol))
    val inGraph = comps.select(col("id").as(idCol))
    // rows never in any candidate pair survive untouched; graph rows survive
    // iff they are their component's representative
    df.join(inGraph, Seq(idCol), "left_anti")
      .unionByName(df.join(keepers, Seq(idCol), "left_semi"))
  }
}
