package graft.queries

/** Placeholder — populated in later milestones. */
object OpQueries {
  val all: Map[String, Q] = Map.empty
}
