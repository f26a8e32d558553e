package graft.queries

/** Placeholder — populated in later milestones. */
object PipelineQueries {
  val all: Map[String, Q] = Map.empty
}
