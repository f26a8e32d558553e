package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: the Spark-side implementation and (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver hash-compares
  * against at sf0.01 (`Verify.scala` → `CORRECTNESS_r{N}.json`).
  *
  * Conventions that make the hash-compare deterministic:
  *   - every double-valued aggregate is `round(x, 4)` on BOTH sides (double
  *     addition is not associative; partial-aggregation order differs between
  *     Spark and DuckDB);
  *   - every result has a total ORDER BY with explicit tie-breaks;
  *   - DuckDB integer sums are cast to BIGINT (DuckDB widens sum(INT) to
  *     HUGEINT, Spark keeps LongType);
  *   - column aliases match exactly between the Spark plan and the SQL.
  *
  * `bench = true` marks the headline queries `graft.Bench` times at sf0.1.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** The operator-inventory corpus (SURVEY.md §2): every operator the engine
  * claims is exercised by at least one named query here.
  */
object QueryCorpus {

  val all: Map[String, Q] = {
    val parts = Seq(
      CoreQueries.all, OpQueries.all, ProcessorQueries.all, PipelineQueries.all,
      LlmOpsQueries.all, StreamingQueries.all, IoQueries.all)
    val merged = parts.reduce(_ ++ _)
    // Map ++ silently drops duplicate keys — a name collision would silently
    // shrink the correctness corpus
    require(merged.size == parts.map(_.size).sum,
      s"duplicate query names across corpus objects: ${
        parts.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.mkString(", ")}")
    merged
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql), _)) => k -> sql }

  def benchNames: Seq[String] =
    all.collect { case (k, q) if q.bench => k }.toSeq.sorted
}
