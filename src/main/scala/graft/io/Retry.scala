package graft.io

/** Driver-side retry with backoff — the reference's reader retry loop
  * (`src/bears/reader/dataframe/DataFrameReader.py:297-317`,
  * `util/concurrency/_utils.py:128-178`). Executor-side task retries are
  * Spark's own (`spark.task.maxFailures`); this wraps driver-side metadata
  * operations (listings, schema probes, control-plane writes).
  */
object Retry {

  def withRetry[T](attempts: Int = 3, initialWaitMs: Long = 100, backoff: Double = 2.0)
      (f: => T): T = {
    // attempts < 1 would skip the loop entirely and throw a bare
    // NullPointerException from `throw last` — refuse loudly instead
    require(attempts >= 1, s"withRetry needs attempts >= 1, got $attempts")
    // No `return` inside a closure here: in Scala 2 that compiles to a thrown
    // NonLocalReturnControl, which a Throwable catch would intercept — every
    // SUCCESSFUL attempt would register as a failure, re-running `f` (with
    // sleeps) on all remaining attempts and surfacing a later attempt's
    // exception even after a success. A plain while loop keeps control flow
    // exception-free; NonFatal keeps VM errors (OOM, interrupts) from being
    // swallowed into the retry loop.
    var wait = initialWaitMs
    var last: Throwable = null
    var result: Option[T] = None
    var i = 1
    while (result.isEmpty && i <= attempts) {
      try result = Some(f)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          if (i < attempts) { Thread.sleep(wait); wait = (wait * backoff).toLong }
      }
      i += 1
    }
    result.getOrElse(throw last)
  }
}
