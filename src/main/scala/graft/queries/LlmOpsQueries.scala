package graft.queries

/** Placeholder — populated in later milestones. */
object LlmOpsQueries {
  val all: Map[String, Q] = Map.empty
}
