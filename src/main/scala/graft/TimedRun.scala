package graft

/** Dev tool: run every corpus query at a given SF and print per-query wall
  * seconds (count-materialized), to catch scale outliers before the driver
  * does. `runMain graft.TimedRun [sfDir]`
  */
object TimedRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    graft.queries.QueryCorpus.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val res = try { fn(spark, dir).write.format("noop").mode("overwrite").save(); "ok" }
      catch { case e: Throwable => s"FAIL ${e.getMessage.linesIterator.next()}" }
      println(f"[timed] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $res")
    }
    spark.stop()
  }
}
