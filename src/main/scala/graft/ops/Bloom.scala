package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter as pure Column algebra — the map-side pre-filter
  * for joins whose small side is too large to broadcast as an exact set but
  * whose BITS fit comfortably: a 2^22-bit filter is 512 KB regardless of how
  * many items went in (the reference reaches the same regime through exact
  * in-memory sets, `src/bears/processor` join paths — viable single-node,
  * not at 10^9 benchmark grams).
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing over the engine's
  * portable 60-bit content hash ([[TextAnalysis.hash60]]):
  * `pos_i = (h1 + i*h2) mod bits` with `h1` = low 30 bits and `h2` = high 30
  * bits forced odd — so construction (one distributed aggregate) and
  * membership (a codegen'd Column, no UDF, no serialized filter object)
  * agree bit-for-bit.
  *
  * False positives only, at rate ≈ (1 − e^{−kn/m})^k; NEVER false
  * negatives — so callers use it as an EXACT-result accelerator: probe
  * map-side (drops ~(1−fp) of a non-matching corpus before any shuffle),
  * then verify the survivors with the exact join. Spark's runtime bloom
  * pruning does this automatically for some shuffle joins; this explicit
  * form covers semi/anti patterns the optimizer does not rewrite and lets
  * the filter be built once and reused across many queries.
  */
object Bloom {

  /** Max filter width: keeps `h1 + k*h2 < 2^31 + 2^30` well inside Long and
    * the double-hash distribution uniform (h1, h2 < 2^30).
    */
  val MaxBits: Long = 1L << 28

  private def probes(h: Column, bits: Long, k: Int): Seq[Column] = {
    val h1 = h.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L)) // odd => full-period stride
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(bits)))
  }

  /** Build the bit array from a frame of 60-bit hashes: explode the k probe
    * positions, OR the per-word masks in ONE distributed aggregate, collect
    * `bits/64` longs to the driver (bounded by construction: 2^22 bits =
    * 64 Ki longs = 512 KB — the same budget class as a broadcast dim).
    */
  def build(hashes: DataFrame, hashCol: String, bits: Long = 1L << 22,
      k: Int = 4): Array[Long] = {
    require(bits > 0 && bits % 64 == 0 && bits <= MaxBits,
      s"bits must be a positive multiple of 64 <= $MaxBits, got $bits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val arr = new Array[Long]((bits / 64).toInt)
    hashes
      // null hashes can never match a probe (SQL join semantics) and would
      // otherwise produce a null probe group that NPEs on the driver
      .filter(col(hashCol).isNotNull)
      .select(explode(array(probes(col(hashCol), bits, k): _*)).as("__p__"))
      .select((col("__p__") / 64).cast("int").as("__w__"),
        (col("__p__") % 64).cast("int").as("__b__"))
      .groupBy(col("__w__"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), col("__b__"))).as("__m__"))
      .collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership probe: a native codegen Expression
    * ([[graft.functions.BloomMightContain]]) holding the bit array as ONE
    * plan reference (rides the broadcast task binary once per executor) —
    * k early-out probes on a primitive `long[]` per row. Bit-for-bit the
    * same probe math as [[build]] and [[mightContainAlgebra]].
    */
  def mightContain(h: Column, filterBits: Array[Long], k: Int = 4): Column =
    graft.functions.BloomMightContain.bloom_might_contain(h, filterBits, k)

  /** The pure-Column spelling of [[mightContain]] (a `typedLit` long array
    * probed with `element_at`): kept as the independent differential
    * reference for the native expression — FunctionsSpec asserts they
    * agree on hits, misses, and the full built-filter probe surface.
    */
  def mightContainAlgebra(h: Column, filterBits: Array[Long], k: Int = 4): Column = {
    require(filterBits.nonEmpty, "empty filter")
    val bits = filterBits.length * 64L
    val blit = typedLit(filterBits.toSeq)
    probes(h, bits, k).map { p =>
      val word = element_at(blit, (p / 64).cast("int") + 1)
      call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
