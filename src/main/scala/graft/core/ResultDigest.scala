package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent content digest of a DataFrame, computed ENTIRELY in the
  * engine (one aggregate job, three scalar columns to the driver) — the
  * cross-execution-mode comparator behind [[graft.ClusterValidate]].
  *
  * Why not the DuckDB oracle hash: that gate compares engine vs oracle at
  * fixed SF on one execution mode. This digest compares the SAME engine to
  * itself across execution modes (`local[32]` vs a multi-JVM
  * `local-cluster`), where results must agree row-for-row but may arrive in
  * any partition order and floating-point sums may differ in the last ulp
  * when partitioning differs. Canonicalization is therefore:
  *   - order-free: per-row xxhash64 folded by count + XOR + wraparound sum
  *     (XOR alone cancels duplicate row pairs; the decimal sum restores
  *     multiplicity sensitivity without ANSI long-overflow),
  *   - float-tolerant: DoubleType/FloatType format at 6 significant digits
  *     (`%.6e`) — real double summation-order drift is ~1e-12 relative, real
  *     distribution defects (lost partition, wrong merge, dropped state) are
  *     categorical, so 6 digits separates the two regimes cleanly,
  *   - type-recursive: arrays/structs/maps/binary canonicalize element-wise
  *     (maps entry-sorted — Spark map iteration order is
  *     implementation-defined), null ≠ empty ≠ "" by sentinel framing.
  *
  * The digest is NOT a correctness oracle (6-digit rounding could mask a
  * sub-1e-6-relative value bug) — the DuckDB gate owns that. It is a
  * distribution-equivalence check: same rows, same multiplicity, same
  * values-to-float-noise, independent of physical execution.
  */
object ResultDigest {

  /** Digest triple: exact row count, XOR-fold and decimal wraparound sum of
    * the per-row canonical hashes, plus the canonical schema line (names +
    * types — a schema drift across modes is as much a defect as a value
    * drift).
    */
  final case class Digest(rows: Long, xor: Long, sum: String, schema: String) {
    def matches(o: Digest): Boolean =
      rows == o.rows && xor == o.xor && sum == o.sum && schema == o.schema
  }

  private val NUL = lit("∅") // distinguishes null from "" and from []

  /** Canonical string Column for one value of `dt` — total (never null). */
  def canon(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      val d = c.cast(DoubleType)
      when(c.isNull, NUL)
        .when(isnan(d), lit("NaN"))
        .otherwise(format_string("%.6e", d))
    case BinaryType => coalesce(base64(c), NUL)
    case ArrayType(et, _) =>
      when(c.isNull, NUL).otherwise(
        concat(lit("["), concat_ws(",", transform(c, x => canon(x, et))), lit("]")))
    case st: StructType =>
      val fields = st.fields.map(f => canon(c.getField(f.name), f.dataType))
      when(c.isNull, NUL).otherwise(
        concat(lit("{"), concat_ws(",", fields.toIndexedSeq: _*), lit("}")))
    case MapType(kt, vt, _) =>
      val entries = transform(map_entries(c), e =>
        concat(canon(e.getField("key"), kt), lit("→"),
          canon(e.getField("value"), vt)))
      when(c.isNull, NUL).otherwise(
        concat(lit("<"), concat_ws(",", array_sort(entries)), lit(">")))
    case _ => coalesce(c.cast(StringType), NUL)
  }

  /** One aggregate job over `df`; safe for duplicate column names (columns
    * are renamed positionally before canonicalization).
    */
  def digest(df: DataFrame): Digest = {
    val renamed = df.toDF(df.columns.indices.map(i => s"c$i"): _*)
    val cols = renamed.schema.fields.toIndexedSeq.map(f => canon(col(f.name), f.dataType))
    val hashed = renamed.select(xxhash64(concat_ws("|", cols: _*)).as("h"))
    val row = hashed.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
      // decimal(38,0) sum: ANSI mode would fail a LongType sum on overflow;
      // 2^63-scale hashes need ~1e19 rows to overflow 38 digits
      coalesce(sum(col("h").cast(DecimalType(38, 0))), lit(0).cast(DecimalType(38, 0))).as("s"))
      .head()
    val schemaLine = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
    Digest(row.getLong(0), row.getLong(1), row.getDecimal(2).toBigInteger.toString, schemaLine)
  }
}
