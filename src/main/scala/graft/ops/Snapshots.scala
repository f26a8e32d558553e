package graft.ops

import org.apache.spark.sql.DataFrame

/** Lifecycle helper for eagerly-checkpointed loop snapshots.
  *
  * `Dataset.unpersist` is a NO-OP for checkpointed frames: `localCheckpoint`
  * persists its materialized RDD at the RDD level, outside the CacheManager
  * that `Dataset.unpersist` talks to. Iterative operators (PageRank,
  * connectedComponents) that snapshot per round must release each superseded
  * snapshot by unpersisting THAT RDD — reached through the `LogicalRDD` the
  * checkpoint wrapped it in — or every round's blocks linger until session
  * teardown (O(iterations) leaked caches per call).
  *
  * Only safe once a SUCCESSOR snapshot has eagerly materialized: until then,
  * downstream lineage still reads the old snapshot's blocks.
  */
private[ops] object Snapshots {
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    case _ => df.unpersist(false)
  }
}
