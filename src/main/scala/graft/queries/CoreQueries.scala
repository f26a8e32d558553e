package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession.table

/** Core relational spine: scan → filter → project → join → aggregate →
  * window → sort → set ops. Covers SURVEY.md §2.2–§2.7.
  *
  * Each query mirrors a bears capability (cited per query) re-expressed as a
  * declarative Spark plan so Catalyst handles pushdown/pruning/join strategy.
  */
object CoreQueries {

  private def ts(s: String) = to_timestamp(lit(s))

  /** §2.4 groupby+agg (`ScalableDataFrame.py:1697-1710`): TPC-H Q1-shaped
    * pricing summary. Scale note: partial aggregation (map-side combine) on
    * 6 groups means the shuffle moves O(partitions*6) rows — scales to 100 TB.
    *
    * Hash discipline (r16, the q134 pattern — retires the adjudicated sf1
    * last-ulp drift: a 6M-term double sum is summation-order-dependent at
    * the 13th digit): the HASHED metrics ride exact DECIMAL sums (prices
    * are 2-dp, quantities integral — the casts are lossless) converted to
    * double with the identical expression on both sides; averages are
    * spelled sum/count of the same exact sums. The engine's native double
    * `sum`/`avg` stay LOAD-BEARING through the guard filter: a group where
    * the double aggregate drifts from the exact sum beyond fp dust (1e-6
    * relative — real double summation error on 6M terms is ~1e-12) is
    * dropped, turning an aggregation regression into a rows_match failure.
    *
    * Shave (r17, verdict item 3), two parts:
    * 1. the physical aggregate dedups to 8 buffers, down from 11 — ONE
    *    shared `count(1)` feeds count_order and both averages (lineitem's
    *    quantity/discount are non-null, so `count(col)` == `count(*)` — the
    *    oracle is spelled count(*) the same way), and the avg-discount
    *    guard rides the already-computed `sum(l_discount)` double against
    *    the exact sum instead of a separate `avg` (its own sum+count).
    * 2. the exact spellings ride SCALED-INTEGER arithmetic instead of
    *    per-row double→decimal casts: quantity is integral and
    *    price/discount are 2-dp, so `round(x·10^k)` recovers the exact
    *    scaled integer as a cheap codegen long (the double is within 1e-9
    *    of the integer — no rounding ambiguity on either engine), and the
    *    sums accumulate in decimal(38,0) — compact-long fast path until 18
    *    digits, graceful BigDecimal promotion beyond, so a 100 TB sum
    *    (disc_price units of 1e-6 dollars pass 10^18 around sf15k) stays
    *    exact where a bare long sum would silently wrap. Dividing the
    *    exact integer back down in DOUBLE is spelled identically in the
    *    oracle, so the hash rides arithmetic both engines compute
    *    bit-identically. Guards stay load-bearing on all three
    *    engine-native double sums.
    */
  val q01_agg_pricing_summary: Q = Q(
    fn = (s, dir) => {
      val qtyE4 = round(col("l_quantity") * 1e4).cast("long").cast("decimal(38,0)")
      val centsP = round(col("l_extendedprice") * 1e2).cast("long")
      val discE4 = round(col("l_discount") * 1e4).cast("long")
      val dpE6 = (centsP * (lit(10000L) - discE4)).cast("decimal(38,0)")
      val sQty = sum(qtyE4).cast("double") / 1e4
      val sBase = sum(centsP.cast("decimal(38,0)")).cast("double") / 1e2
      val sDisc = sum(dpE6).cast("double") / 1e6
      val sDd = sum(discE4.cast("decimal(38,0)")).cast("double") / 1e4
      val n = count(lit(1))
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sQty, 4).as("sum_qty"),
          round(sBase, 4).as("sum_base_price"),
          round(sDisc, 4).as("sum_disc_price"),
          round(sQty / n, 4).as("avg_qty"),
          round(sDd / n, 4).as("avg_disc"),
          n.as("count_order"),
          sum(col("l_extendedprice")).as("__eng_base"),
          sum(col("l_quantity")).as("__eng_qty"),
          sum(col("l_discount")).as("__eng_sumd"),
          sBase.as("__ex_base"), sQty.as("__ex_qty"), sDd.as("__ex_sumd"))
        .filter(
          abs(col("__eng_base") - col("__ex_base")) <= lit(1e-6) * (lit(1.0) + abs(col("__ex_base"))) &&
          abs(col("__eng_qty") - col("__ex_qty")) <= lit(1e-6) * (lit(1.0) + abs(col("__ex_qty"))) &&
          abs(col("__eng_sumd") - col("__ex_sumd")) <= lit(1e-6) * (lit(1.0) + abs(col("__ex_sumd"))))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("avg_qty"),
          col("avg_disc"), col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             round(CAST(sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000, 4) AS sum_qty,
             round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100, 4) AS sum_base_price,
             round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000, 4) AS sum_disc_price,
             round(CAST(sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000
                   / count(*), 4) AS avg_qty,
             round(CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000
                   / count(*), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** §2.2 boolean-mask filter + projection (`ScalableDataFrame.py:1663-1666`,
    * select `DictScalableDataFrame.py:255-314`). Predicates and the 3-column
    * projection push down to the parquet scan.
    */
  val q02_filter_project: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= ts("1995-06-01 00:00:00") &&
            col("l_shipdate") < ts("1995-09-01 00:00:00") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * l_discount, 4) AS disc_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        AND l_shipdate < TIMESTAMP '1995-09-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber"""))

  /** §2.3 merge(how="inner") 3-way + §2.6 top-k
    * (`ScalableDataFrame.py:1820-1836`): TPC-H Q3-shaped shipping priority.
    * customer (150·sf rows) is broadcast; lineitem⋈orders shuffles on the
    * orderkey — the natural co-partitioning key at 100 TB.
    */
  val q03_join_topk_revenue: Q = Q(
    fn = (s, dir) => {
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = table(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    oracle = Some("""
      SELECT l_orderkey, o_orderdate,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
    bench = true)

  /** §2.3 semi join (EXISTS; Spark `left_semi`) — bears note at SURVEY §2.3:
    * absent in bears itself, required capability for the engine.
    */
  val q04_semi_join: Q = Q(
    fn = (s, dir) => {
      val big = table(s, dir, "lineitem").filter(col("l_quantity") > 45)
      table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      ORDER BY o_orderkey"""))

  /** §2.3 anti join (NOT EXISTS; Spark `left_anti`): customers with no
    * open orders.
    */
  val q05_anti_join: Q = Q(
    fn = (s, dir) => {
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
      table(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY c_custkey"""))

  /** §2.3 merge(indicator=True) (`ScalableDataFrame.py:1820-1836`): full
    * outer join with a pandas-style `_merge` ∈ {left_only, right_only, both},
    * aggregated to counts per class.
    */
  val q06_outer_join_indicator: Q = Q(
    fn = (s, dir) => {
      val c = table(s, dir, "customer").select(col("c_custkey"))
      val o = table(s, dir, "orders").filter(col("o_totalprice") > 250000)
        .select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .withColumn(
          "merge_side",
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
            .when(col("c_custkey").isNotNull, "left_only")
            .otherwise("right_only"))
        .groupBy(col("merge_side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("merge_side"))
    },
    oracle = Some("""
      WITH o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000)
      SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
                  WHEN c_custkey IS NOT NULL THEN 'left_only'
                  ELSE 'right_only' END AS merge_side,
             count(*) AS n
      FROM customer FULL OUTER JOIN o ON c_custkey = o_custkey
      GROUP BY 1
      ORDER BY merge_side"""))

  /** §2.5 window rank (parity-plus; blocked in bears
    * `ScalableDataFrame.py:1374-1397`): top-3 priciest lineitems per
    * supplier. Single hash-partitioned window — no global sort.
    */
  val q07_window_rank: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      table(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_extendedprice"))
        .orderBy(col("l_suppkey"), col("rn"))
    },
    oracle = Some("""
      SELECT l_suppkey, rn, l_orderkey, l_extendedprice
      FROM (
        SELECT l_suppkey, l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, rn"""),
    bench = true)

  /** §2.6 nlargest (`ScalableSeries.py:936-942`): true top-k via Catalyst
    * TakeOrderedAndProject — no global sort, per-partition heaps then a
    * k-row merge on the driver. Survives any scale.
    */
  val q08_topk_nlargest: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100"""))

  /** §2.4 drop_duplicates(subset) (`ScalableDataFrame.py:1732-1738`) —
    * distinct over a projection.
    */
  val q09_distinct: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    oracle = Some("""
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** §2.7 concat(axis=0) (`ScalableDataFrame.py:1838-1868`) — row-union of
    * two frames via unionByName (bears' LIST_OF_DICT concat semantics).
    */
  val q10_concat_union: Q = Q(
    fn = (s, dir) => {
      val hi = table(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
      val lo = table(s, dir, "orders").filter(col("o_totalprice") < 20000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("low").as("bucket"))
      hi.unionByName(lo).orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT * FROM (
        SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'low'  AS bucket FROM orders WHERE o_totalprice < 20000)
      ORDER BY o_orderkey"""))

  /** §2.4 value_counts(normalize=True) (`ScalableSeries.py:991-993`). */
  val q11_value_counts: Q = Q(
    fn = (s, dir) => {
      val o = table(s, dir, "orders")
      // total rides INSIDE the plan as a broadcast 1-row aggregate (the
      // broadcast-scalar pattern; guide §5 — no driver-blocking count job)
      val total = o.agg(count(lit(1)).cast("double").as("__tot__"))
      o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .withColumn("frac", round(col("n") / col("__tot__"), 4))
        .drop("__tot__")
        .orderBy(col("n").desc, col("o_orderpriority"))
    },
    oracle = Some("""
      SELECT o_orderpriority, count(*) AS n,
             round(count(*) / (SELECT count(*) FROM orders)::DOUBLE, 4) AS frac
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY n DESC, o_orderpriority"""))

  /** §2.4 series statistics family (`ScalableSeries.py:880-993`): count,
    * mean, std (ddof=1), var, min, max, exact median and quantile — one
    * aggregate pass over l_extendedprice.
    */
  val q12_stats_family: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem").agg(
        count(col("l_extendedprice")).as("cnt"),
        round(avg(col("l_extendedprice")), 4).as("mean"),
        round(stddev_samp(col("l_extendedprice")), 4).as("std"),
        round(var_samp(col("l_extendedprice")), 4).as("var"),
        round(min(col("l_extendedprice")), 4).as("min_v"),
        round(max(col("l_extendedprice")), 4).as("max_v"),
        round(expr("median(l_extendedprice)"), 4).as("median_v"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("q25")),
    oracle = Some("""
      SELECT count(l_extendedprice) AS cnt,
             round(avg(l_extendedprice), 4) AS mean,
             round(stddev_samp(l_extendedprice), 4) AS std,
             round(var_samp(l_extendedprice), 4) AS var,
             round(min(l_extendedprice), 4) AS min_v,
             round(max(l_extendedprice), 4) AS max_v,
             round(median(l_extendedprice), 4) AS median_v,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS q25
      FROM lineitem"""))

  /** TPC-H Q5-shaped local-supplier revenue: the classic 6-table join —
    * the join-planning benchmark. Declarative plan; Catalyst broadcasts the
    * tiny dims (nation/region hinted, AQE free to upgrade
    * customer/supplier at small SF), pushes the date filter into the orders
    * scan, and shuffles only the three fact-side equi-joins. The
    * local-supplier condition (`c_nationkey = s_nationkey`) rides the
    * supplier join as a residual — no extra shuffle. Benched: regression
    * watch on multi-join planning.
    */
  val q146_tpch_q5: Q = Q(
    fn = (s, dir) => {
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      val lineitem = table(s, dir, "lineitem")
      val supplier = table(s, dir, "supplier")
      val nation = table(s, dir, "nation")
      val region = table(s, dir, "region")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("r_name"), col("n_name"))
    },
    oracle = Some("""
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name
      ORDER BY revenue DESC, r_name, n_name"""),
    bench = true)

  val all: Map[String, Q] = Map(
    "q146_tpch_q5" -> q146_tpch_q5,
    "q01_agg_pricing_summary" -> q01_agg_pricing_summary,
    "q02_filter_project" -> q02_filter_project,
    "q03_join_topk_revenue" -> q03_join_topk_revenue,
    "q04_semi_join" -> q04_semi_join,
    "q05_anti_join" -> q05_anti_join,
    "q06_outer_join_indicator" -> q06_outer_join_indicator,
    "q07_window_rank" -> q07_window_rank,
    "q08_topk_nlargest" -> q08_topk_nlargest,
    "q09_distinct" -> q09_distinct,
    "q10_concat_union" -> q10_concat_union,
    "q11_value_counts" -> q11_value_counts,
    "q12_stats_family" -> q12_stats_family)
}
