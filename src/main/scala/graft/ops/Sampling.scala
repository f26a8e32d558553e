package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * The reference's `sample(n/frac, seed)` (`ScalableDataFrame.py:1772-1776`)
  * delegates to pandas RNG sampling — non-reproducible across engines and
  * partitionings. At 100 TB, reproducibility matters more than randomness
  * quality: a re-run (or a DuckDB replay, or a different partition count)
  * must select the same rows. Everything here keys on a content hash
  * ([[TextAnalysis.hash60]], first 60 bits of md5 — portable across engines),
  * so selection is a map-side filter: no shuffle, no driver state, no seed
  * drift between attempts/executors.
  */
object Sampling {

  /** Keep `fractions(stratum)` of each stratum (class rebalancing /
    * downsampling). Row kept iff `hash60(id) mod 10000 <
    * fractions(stratum) * 10000` — per-class Bernoulli on a stable id, so
    * membership is independent of partitioning and re-runs. Strata absent
    * from the map keep `default`.
    */
  def stratifiedByHash(
      df: DataFrame,
      stratum: Column,
      id: Column,
      fractions: Map[String, Double],
      default: Double = 1.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val threshold = fractions.foldLeft(lit((default * 10000).toLong)) {
      case (acc, (k, f)) => when(stratum === lit(k), lit((f * 10000).toLong)).otherwise(acc)
    }
    df.filter(pmod(TextAnalysis.hash60(id.cast("string")), lit(10000L)) < threshold)
  }

  /** Exact-n deterministic sample: the n rows with the smallest id-hash —
    * pandas `sample(n=...)` with engine-portable selection. Plans as
    * TakeOrderedAndProject (per-partition top-n, tiny merge), never a global
    * sort.
    */
  def nByHash(df: DataFrame, id: Column, n: Int): DataFrame =
    df.orderBy(TextAnalysis.hash60(id.cast("string"))).limit(n)
}
