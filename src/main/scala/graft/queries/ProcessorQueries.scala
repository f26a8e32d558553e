package graft.queries

/** Placeholder — populated in later milestones. */
object ProcessorQueries {
  val all: Map[String, Q] = Map.empty
}
