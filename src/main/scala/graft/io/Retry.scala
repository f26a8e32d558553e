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
    var wait = initialWaitMs
    var last: Throwable = null
    (1 to attempts).foreach { i =>
      try return f
      catch {
        case e: Throwable =>
          last = e
          if (i < attempts) { Thread.sleep(wait); wait = (wait * backoff).toLong }
      }
    }
    throw last
  }
}
