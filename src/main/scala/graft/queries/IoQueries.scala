package graft.queries

import org.apache.spark.sql.functions._
import graft.core.GraftSession.table
import graft.io.{Compress, FileMetadata, Pdf, Readers, Writers}
import graft.ops.AsOfJoin
import graft.sdf.SDF

/** I/O layer + remaining operator-surface corpus: sink→source round-trips
  * through the format-detecting readers/writers (SURVEY.md §2.1), wire
  * compression, the as-of join (custom composed operator), and the scalar
  * function family (§2.8).
  */
object IoQueries {

  private def scratch(name: String): String = {
    val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_scratch", name)
    d.toString
  }

  /** CSV sink → multi-file chunked write → CSV scan with schema inference
    * (`CsvReader.py:19-111` / `CsvWriter.py`; chunked naming
    * `DataFrameWriter.py:291-358`).
    */
  val q70_csv_roundtrip: Q = Q(
    fn = (s, dir) => {
      val out = scratch("nation_csv")
      Writers.write(table(s, dir, "nation"), FileMetadata.of(out + ".csv"), numChunks = Some(2))
      Readers.read(s, out + ".csv")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },
    oracle = Some("""
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation
      ORDER BY n_nationkey"""))

  /** CSV dialect robustness: values with embedded commas, double quotes,
    * and leading/trailing spaces survive the quote-escape write → inferred
    * read roundtrip byte-exactly.
    */
  val q212_csv_dialect: Q = Q(
    fn = (s, dir) => {
      val out = scratch("nation_dialect")
      val spiky = table(s, dir, "nation")
        .select(col("n_nationkey"),
          concat(col("n_name"), lit(""", "quoted" ,comma""")).as("spiky"))
      Writers.write(spiky, FileMetadata.of(out + ".csv"))
      Readers.read(s, out + ".csv")
        .select(col("n_nationkey"), col("spiky"))
        .orderBy(col("n_nationkey"))
    },
    oracle = Some("""
      SELECT n_nationkey, n_name || ', "quoted" ,comma' AS spiky
      FROM nation
      ORDER BY n_nationkey"""))

  /** Small-file compaction ([[Writers.compact]]): a 16-file dataset
    * rewrites to size-targeted files (one, at the default 128 MB target);
    * the roundtrip oracle proves content is untouched. IoSpec asserts the
    * file-count mechanics.
    */
  val q202_compact: Q = Q(
    fn = (s, dir) => {
      val out = scratch("lineitem_compact")
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .repartition(16)
        .write.mode("overwrite").parquet(out)
      Writers.compact(s, out)
      s.read.parquet(out)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS qty
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""))

  /** Schema-evolution parquet read ([[Readers.readParquetMerged]]): two
    * files written under one dataset dir with different column sets; the
    * merged read unions the schemas, absent columns null-filled per file.
    */
  val q192_merge_schema: Q = Q(
    fn = (s, dir) => {
      val out = scratch("nation_evolved")
      val nation = table(s, dir, "nation")
      nation.select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(out + "/gen1")
      nation.select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_regionkey").cast("long").as("n_regionkey"))
        .write.mode("overwrite").parquet(out + "/gen2")
      Readers.readParquetMerged(s, out + "/gen*")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"), col("n_name"))
    },
    oracle = Some("""
      SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey
      FROM (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation)
      UNION ALL
      SELECT CAST(n_nationkey AS BIGINT), CAST(NULL AS VARCHAR),
             CAST(n_regionkey AS BIGINT)
      FROM nation
      ORDER BY n_nationkey, n_name"""))

  /** JSON-lines sink → scan (`JsonLinesReader.py` / `JsonLinesWriter.py`). */
  val q71_jsonl_roundtrip: Q = Q(
    fn = (s, dir) => {
      val out = scratch("orders_jsonl")
      val subset = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Writers.write(subset, FileMetadata.of(out + ".jsonl"))
      Readers.read(s, out + ".jsonl")
        .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 4).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice
      FROM orders
      ORDER BY o_orderkey"""))

  /** NPZ sink → NPZ scan round-trip (`reader/dataframe/NpzReader.py`;
    * driver-side `np.savez` sink `ScalableDataFrame.py:2015-2017`): pure-JVM
    * NPY codec, long/string/double columns through `<i8`/`<U{n}`/`<f8`.
    */
  val q79_npz_roundtrip: Q = Q(
    fn = (s, dir) => {
      val out = scratch("supplier_npz") + ".npz"
      new java.io.File(out).getParentFile.mkdirs()
      val subset = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      Writers.write(subset, FileMetadata.of(out))
      Readers.read(s, out)
        .select(col("s_suppkey"), col("s_name"), round(col("s_acctbal"), 4).as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },
    oracle = Some("""
      SELECT s_suppkey, s_name, round(s_acctbal, 4) AS s_acctbal
      FROM supplier
      ORDER BY s_suppkey"""))

  /** Pickle sink → pickle scan round-trip (`reader/binary/PickleReader.py:20-34`
    * `pickle.load` / `writer/binary/PickleWriter.py:20-27` `pickle.dump`):
    * pure-JVM codec for the documented pickle protocol (read 0–5, write 4),
    * container-blob contract — a DataFrame travels as a Python list-of-dicts.
    * Driver-local interchange format exactly as in the reference; bulk data
    * stays parquet.
    */
  val q218_pickle_roundtrip: Q = Q(
    fn = (s, dir) => {
      val out = scratch("nation_pickle") + ".pkl"
      new java.io.File(out).getParentFile.mkdirs()
      val subset = table(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      Writers.write(subset, FileMetadata.of(out))
      Readers.read(s, out)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },
    oracle = Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CAST(n_regionkey AS BIGINT) AS n_regionkey
      FROM nation
      ORDER BY n_nationkey"""))

  /** ORC sink → ORC scan round-trip (parity-plus: ORC ships inside
    * spark-sql; a columnar alternative to parquet with the same pushdown/
    * pruning story — relevant wherever a lakehouse standardized on ORC).
    */
  val q101_orc_roundtrip: Q = Q(
    fn = (s, dir) => {
      val out = scratch("part_orc") + ".orc"
      val subset = table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
      Writers.write(subset, FileMetadata.of(out), numChunks = Some(2))
      Readers.read(s, out)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          round(col("p_retailprice"), 4).as("p_retailprice"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_partkey, p_brand, p_size, round(p_retailprice, 4) AS p_retailprice
      FROM part
      ORDER BY p_partkey"""))

  /** gzip JSON wire compression round-trip
    * (`ScalableDataFrame.py:336-393`): frame → payload → frame with pinned
    * schema.
    */
  val q72_compress_roundtrip: Q = Q(
    fn = (s, dir) => {
      val region = table(s, dir, "region")
      val payload = Compress.compress(region)
      Compress.decompress(s, payload, Some(region.schema))
        .orderBy(col("r_regionkey"))
    },
    oracle = Some("SELECT * FROM region ORDER BY r_regionkey"))

  /** As-of backward join (custom composed operator): for every event, the
    * user's most recent signup at-or-before it — verified against DuckDB's
    * native ASOF LEFT JOIN.
    */
  val q64_asof_join: Q = Q(
    fn = (s, dir) => {
      val ev = table(s, dir, "events")
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
      AsOfJoin.backward(
        left, signups,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Map("event_id" -> "last_signup_id"))
        .select(col("event_id"), col("user_id"), col("last_signup_id"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      SELECT l.event_id, l.user_id, r.event_id AS last_signup_id
      FROM events l
      ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""),
    bench = true)

  /** As-of join with tolerance (market/telemetry semantics): the match only
    * stands if the right row is within the time bound — carried `signup_ts`
    * nulls the payload past tolerance, same single-shuffle plan as q64.
    */
  val q96_asof_tolerance: Q = Q(
    fn = (s, dir) => {
      val ev = table(s, dir, "events")
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
      AsOfJoin.backward(
        left, signups,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Map("event_id" -> "last_signup_id", "ts" -> "signup_ts"))
        .select(col("event_id"), col("user_id"),
          when(col("signup_ts").isNotNull &&
            col("ts") <= col("signup_ts") + expr("INTERVAL 2 HOURS"),
            col("last_signup_id")).as("recent_signup_id"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      SELECT l.event_id, l.user_id,
             CASE WHEN r.ts IS NOT NULL AND l.ts <= r.ts + INTERVAL '2 hours'
                  THEN r.event_id END AS recent_signup_id
      FROM events l
      ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""))

  /** pandas `merge_asof(direction="forward")`: for every event, the user's
    * next signup at-or-after it — DuckDB's ASOF with the inequality flipped
    * verifies the mirrored single-shuffle window plan.
    */
  val q125_asof_forward: Q = Q(
    fn = (s, dir) => {
      val ev = table(s, dir, "events")
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
      AsOfJoin.forward(
        left, signups,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Map("event_id" -> "next_signup_id"))
        .select(col("event_id"), col("user_id"), col("next_signup_id"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      SELECT l.event_id, l.user_id, r.event_id AS next_signup_id
      FROM events l
      ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
        ON l.user_id = r.user_id AND l.ts <= r.ts
      ORDER BY l.event_id"""))

  /** pandas `merge_asof(direction="nearest")`: the closer of the inclusive-
    * backward and strict-forward signups, equal distance → backward. The
    * oracle replays the same choice from two native ASOF joins with exact
    * interval distances.
    */
  val q126_asof_nearest: Q = Q(
    fn = (s, dir) => {
      val ev = table(s, dir, "events")
      val left = ev.select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
      AsOfJoin.nearest(
        left, signups,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Map("event_id" -> "near_signup_id"))
        .select(col("event_id"), col("user_id"), col("near_signup_id"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      WITH b AS (
        SELECT l.event_id, l.user_id, l.ts, r.ts AS bt, r.event_id AS bid
        FROM events l
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
          ON l.user_id = r.user_id AND l.ts >= r.ts),
      f AS (
        SELECT l.event_id, r.ts AS ft, r.event_id AS fid
        FROM events l
        ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
          ON l.user_id = r.user_id AND l.ts < r.ts)
      SELECT event_id, user_id,
             CASE WHEN bid IS NULL THEN fid
                  WHEN fid IS NULL THEN bid
                  WHEN (ts - bt) <= (ft - ts) THEN bid
                  ELSE fid END AS near_signup_id
      FROM b JOIN f USING (event_id)
      ORDER BY event_id"""))

  /** §2.8 scalar family through SCol: clip, astype (truncating cast), abs,
    * arithmetic, conditional bucketing.
    */
  val q65_scalar_funcs: Q = Q(
    fn = (s, dir) => {
      val li = SDF(table(s, dir, "lineitem"))
      val qty = li("l_quantity")
      li.df.select(
        col("l_orderkey"), col("l_linenumber"),
        qty.clip(5.0, 40.0).as("qty_clip"),
        qty.astype("long").as("qty_int"),
        round(abs(col("l_discount") - lit(0.05)), 4).as("disc_dev"),
        when(col("l_extendedprice") > 50000, "high")
          .when(col("l_extendedprice") > 20000, "mid")
          .otherwise("low").as("price_band"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN l_quantity
                  ELSE least(greatest(l_quantity, 5.0), 40.0) END AS qty_clip,
             CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
             round(abs(l_discount - 0.05), 4) AS disc_dev,
             CASE WHEN l_extendedprice > 50000 THEN 'high'
                  WHEN l_extendedprice > 20000 THEN 'mid'
                  ELSE 'low' END AS price_band
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""))

  /** §2.3 cross join (merge how="cross"). */
  val q66_cross_join: Q = Q(
    fn = (s, dir) => {
      val r = table(s, dir, "region").select(col("r_name"))
      val n = table(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n).orderBy(col("r_name"), col("n_name"))
    },
    oracle = Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name"""))

  /** §2.8 dict-map (`ss.map(dict)`, `NumpyArrayScalableSeries.py:304-338`):
    * literal-map lookup with null for absent keys (na_action semantics).
    */
  val q67_dict_map: Q = Q(
    fn = (s, dir) => {
      val c = SDF(table(s, dir, "customer"))
      c.df.select(
        col("c_custkey"),
        c("c_mktsegment").mapValues(Map(
          "BUILDING" -> "B2B", "MACHINERY" -> "IND", "AUTOMOBILE" -> "AUTO")).as("seg_code"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey,
             CASE c_mktsegment WHEN 'BUILDING' THEN 'B2B'
                               WHEN 'MACHINERY' THEN 'IND'
                               WHEN 'AUTOMOBILE' THEN 'AUTO' END AS seg_code
      FROM customer
      ORDER BY c_custkey"""))

  /** §2.8 bfill + dropna + §2.4 duplicated mask in one pass through SDF:
    * backward-fill nulls per user along event time, flag repeat events per
    * user, drop rows whose trailing nulls could not be filled.
    */
  val q68_na_bfill_duplicated: Q = Q(
    fn = (s, dir) => {
      val e = SDF(table(s, dir, "events")
        .withColumn("v", when(col("value") < 50, lit(null)).otherwise(col("value"))))
      e.bfill(Seq("v"), orderBy = Seq(col("ts"), col("event_id")), partitionBy = Seq(col("user_id")))
        .withDuplicatedFlag(Seq("user_id"), orderBy = Seq(col("ts"), col("event_id")), flag = "repeat_user")
        .dropna(how = "any", subset = Seq("v"))
        .df.select(col("event_id"), col("user_id"), round(col("v"), 4).as("v"), col("repeat_user"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      WITH f AS (
        SELECT event_id, user_id,
               first_value(CASE WHEN value < 50 THEN NULL ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1 AS repeat_user
        FROM events)
      SELECT event_id, user_id, round(v, 4) AS v, repeat_user
      FROM f
      WHERE v IS NOT NULL
      ORDER BY event_id"""))

  /** §2.5 rolling mean + pct_change (blocked in bears,
    * `ScalableDataFrame.py:1374-1397`): 4-row trailing window and relative
    * change per supplier — one window spec, two frames.
    */
  val q69_rolling_pct_change: Q = Q(
    fn = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val base = table(s, dir, "lineitem").filter(col("l_suppkey") <= 3)
      // SCol.pctChange, not a raw (x-lag)/lag: a zero previous quantity is
      // ordinary data and the bare ratio is an ANSI DIVIDE_BY_ZERO crash;
      // the engine method yields pandas +-inf/NaN there (oracle mirrors)
      base
        .withColumn("roll_avg_qty", round(avg(col("l_quantity")).over(w.rowsBetween(-3, 0)), 4))
        .withColumn("pct_change", round(
          graft.sdf.SDF(base)("l_quantity").pctChange(w), 4))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("roll_avg_qty"), col("pct_change"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(avg(l_quantity) OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_avg_qty,
             round(CASE
               WHEN lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber) = 0 THEN
                 CASE WHEN l_quantity > 0 THEN CAST('infinity' AS DOUBLE)
                      WHEN l_quantity < 0 THEN CAST('-infinity' AS DOUBLE)
                      ELSE CAST('nan' AS DOUBLE) END
               ELSE (l_quantity - lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber)) /
                    lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber)
             END, 4) AS pct_change
      FROM lineitem
      WHERE l_suppkey <= 3
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** Pivot (parity-plus; blocked in bears `ScalableDataFrame.py:1421-1422`):
    * return-flag quantity totals pivoted by line status.
    */
  val q73_pivot: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 4))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_f,
             round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_o
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** pandas `melt` (wide→long, inverse of q73's pivot): three measure
    * columns unpivoted to (variable, value) rows via `stack` — narrow,
    * shuffle-free.
    */
  val q87_melt: Q = Q(
    fn = (s, dir) =>
      SDF(table(s, dir, "lineitem").filter(col("l_orderkey") <= 100))
        .melt(
          idVars = Seq("l_orderkey", "l_linenumber"),
          valueVars = Seq("l_quantity", "l_discount", "l_tax"))
        .df
        .select(col("l_orderkey"), col("l_linenumber"), col("variable"),
          round(col("value"), 4).as("value"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("variable")),
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, variable, round(value, 4) AS value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber, variable"""))

  /** Exact product aggregate (native DeclarativeAggregate,
    * `functions.ProductAgg`) — grouped compounding factor per order,
    * verified against DuckDB's exact `product()`. Unlike the log-sum trick
    * this is bit-exact under partial aggregation.
    */
  val q74_product_agg: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .groupBy(col("l_orderkey"))
        .agg(round(graft.functions.ProductAgg.product_exact(lit(1.0) + col("l_discount")), 4)
          .as("growth"))
        .orderBy(col("l_orderkey")),
    oracle = Some("""
      SELECT l_orderkey, round(product(1.0 + l_discount), 4) AS growth
      FROM lineitem
      WHERE l_orderkey < 100
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""))

  /** Semi-structured JSON column (`events.props`): extract, cast, aggregate
    * — the get_json_object path a real event pipeline lives on.
    */
  val q75_json_props: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n"),
          round(avg(col("k")), 4).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    oracle = Some("""
      SELECT event_type,
             count(CAST(props->>'k' AS BIGINT)) AS n,
             round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
             max(CAST(props->>'k' AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Datetime part extraction + truncation over order dates. */
  val q77_date_parts: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .withColumn("qtr", quarter(col("o_orderdate")).cast("long"))
        .withColumn("mon", month(col("o_orderdate")).cast("long"))
        .withColumn("month_start", date_trunc("month", col("o_orderdate")))
        .groupBy(col("yr"), col("qtr"), col("mon"), col("month_start"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy(col("yr"), col("mon")),
    oracle = Some("""
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(quarter FROM o_orderdate) AS qtr,
             EXTRACT(month FROM o_orderdate) AS mon,
             date_trunc('month', o_orderdate) AS month_start,
             count(*) AS n, round(sum(o_totalprice), 4) AS total
      FROM orders
      GROUP BY 1, 2, 3, 4
      ORDER BY yr, mon"""))

  /** String function family: substring, length, position, padding, split,
    * case-insensitive contains.
    */
  val q78_string_funcs: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          substring(col("p_name"), 1, 8).as("name8"),
          length(col("p_name")).cast("long").as("name_len"),
          instr(col("p_brand"), "#").cast("long").as("hash_pos"),
          lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
          size(split(col("p_name"), " ")).cast("long").as("name_words"),
          col("p_type").contains("a").as("has_a"))
        .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey,
             substr(p_name, 1, 8) AS name8,
             length(p_name) AS name_len,
             strpos(p_brand, '#') AS hash_pos,
             lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
             len(string_split(p_name, ' ')) AS name_words,
             contains(p_type, 'a') AS has_a
      FROM part
      ORDER BY p_partkey"""))

  /** pandas `str.extract` (regex capture groups) + `str.split().explode()`
    * with positions — the two string ops q78 leaves out.
    */
  val q130_str_extract_split: Q = Q(
    fn = (s, dir) =>
      table(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_last"),
          posexplode(split(col("p_name"), " ")).as(Seq("word_pos", "word")))
        .select(col("p_partkey"), col("brand_num"), col("type_last"),
          col("word_pos").cast("long").as("word_pos"), col("word"))
        .orderBy(col("p_partkey"), col("word_pos")),
    oracle = Some("""
      SELECT p_partkey,
             regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
             regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last,
             u.i - 1 AS word_pos,
             w[u.i] AS word
      FROM (SELECT *, string_split(p_name, ' ') AS w FROM part),
           UNNEST(generate_series(1, len(w))) u(i)
      ORDER BY p_partkey, word_pos"""))

  /** PDF Document pillar (reference `reader/document/pdf/FitzPdfReader.py`):
    * synthesize a 1–2 page PDF per document (FlateDecode content streams),
    * then recover the page text with the stream-walking extractor. The
    * oracle replays the 120-char page split over the source text, so stream
    * framing, Flate round-trip, literal escaping and Tj parsing are all
    * hash-verified end-to-end.
    */
  val q98_pdf_extract: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      // null text has no PDF to synthesize — filter BEFORE the typed map
      // (t.length on a null decoded string is an executor-killing NPE)
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val assets = docs.as[(Long, String)].map { case (id, t) =>
          val pages = if (t.length > 120) Seq(t.substring(0, 120), t.substring(120)) else Seq(t)
          ("doc://" + id, Pdf.synthesize(pages))
        }.toDF("path", "data")
        .select(graft.ops.Multimodal.assetStruct(col("path"), col("data"), map()).as("asset"))
      Pdf.extractPages(assets, "asset").toDF()
        .select(col("path"), col("page").cast("long").as("page"), col("text").as("ptext"))
        .orderBy(col("path"), col("page"))
    },
    oracle = Some("""
      WITH pages AS (
        SELECT 'doc://' || doc_id AS path, CAST(0 AS BIGINT) AS page,
               CASE WHEN length(text) > 120 THEN substr(text, 1, 120) ELSE text END AS ptext
        FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT 'doc://' || doc_id, CAST(1 AS BIGINT), substr(text, 121)
        FROM documents WHERE text IS NOT NULL AND length(text) > 120)
      -- the extractor skips pages whose content stream shows no text
      -- (documented heuristic), so an empty-text page never surfaces;
      -- pages keep their in-document index among SURVIVING pages
      SELECT path,
             row_number() OVER (PARTITION BY path ORDER BY page) - 1 AS page,
             ptext
      FROM pages WHERE ptext <> ''
      ORDER BY path, page"""))

  /** Range-partitioned sorted layout ([[Writers.writeRangeSorted]]): each
    * parquet file holds a disjoint `l_orderkey` range with monotone row
    * groups, so the read-back's range predicate prunes whole files from
    * footer stats — the data-layout half of scan performance (IoSpec
    * asserts the disjoint ranges; this query proves the round trip).
    */
  val q156_range_layout: Q = Q(
    fn = (s, dir) => {
      val out = scratch("lineitem_range")
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      Writers.writeRangeSorted(li, out, numFiles = 4, Seq("l_orderkey"))
      s.read.parquet(out)
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS l_quantity
      FROM lineitem
      WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber"""))

  /** Z-ordered layout ([[Writers.writeZOrdered]]): files are sorted runs of
    * the bit-interleaved (o_custkey, o_orderkey) [[Writers.zValue]], so a
    * box predicate on EITHER key prunes files from footer stats — the 2-D
    * complement of q156's single-key range layout. The oracle replays the
    * interleave as a disjoint-bit SUM (OR ≡ + when bits never collide),
    * proving the layout key is engine-portable, and the box filter proves
    * the round trip.
    */
  val q161_zorder_layout: Q = Q(
    fn = (s, dir) => {
      val out = scratch("orders_zorder")
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      Writers.writeZOrdered(o, out, numFiles = 4, "o_custkey", "o_orderkey")
      s.read.parquet(out)
        .filter(col("o_custkey") <= 50 && col("o_orderkey") <= 20000)
        .withColumn("z", Writers.zValue(col("o_custkey"), col("o_orderkey")))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(list_sum(list_transform(range(0, 32), i ->
               (((o_custkey >> i) & 1) << (2*i)) +
               (((o_orderkey >> i) & 1) << (2*i + 1)))) AS BIGINT) AS z
      FROM orders
      WHERE o_custkey <= 50 AND o_orderkey <= 20000
      ORDER BY o_orderkey"""))

  /** Manifest-writing sink ([[Writers.writeWithManifest]]): parquet plus a
    * `_MANIFEST.json` of per-file rows/bytes and totals — what a trainer
    * reads instead of re-listing a million-file dataset. The query proves
    * the data round trip; IoSpec checks the manifest against the files.
    */
  val q171_manifest_write: Q = Q(
    fn = (s, dir) => {
      val out = scratch("nation_manifest")
      Writers.writeWithManifest(
        table(s, dir, "nation").select(col("n_nationkey"), col("n_name")), out)
      s.read.parquet(out).orderBy(col("n_nationkey"))
    },
    oracle = Some("""
      SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"""))

  val all: Map[String, Q] = Map(
    "q161_zorder_layout" -> q161_zorder_layout,
    "q171_manifest_write" -> q171_manifest_write,
    "q156_range_layout" -> q156_range_layout,
    "q125_asof_forward" -> q125_asof_forward,
    "q130_str_extract_split" -> q130_str_extract_split,
    "q126_asof_nearest" -> q126_asof_nearest,
    "q98_pdf_extract" -> q98_pdf_extract,
    "q68_na_bfill_duplicated" -> q68_na_bfill_duplicated,
    "q74_product_agg" -> q74_product_agg,
    "q75_json_props" -> q75_json_props,
    "q77_date_parts" -> q77_date_parts,
    "q78_string_funcs" -> q78_string_funcs,
    "q69_rolling_pct_change" -> q69_rolling_pct_change,
    "q73_pivot" -> q73_pivot,
    "q87_melt" -> q87_melt,
    "q70_csv_roundtrip" -> q70_csv_roundtrip,
    "q101_orc_roundtrip" -> q101_orc_roundtrip,
    "q192_merge_schema" -> q192_merge_schema,
    "q202_compact" -> q202_compact,
    "q212_csv_dialect" -> q212_csv_dialect,
    "q71_jsonl_roundtrip" -> q71_jsonl_roundtrip,
    "q72_compress_roundtrip" -> q72_compress_roundtrip,
    "q79_npz_roundtrip" -> q79_npz_roundtrip,
    "q218_pickle_roundtrip" -> q218_pickle_roundtrip,
    "q64_asof_join" -> q64_asof_join,
    "q96_asof_tolerance" -> q96_asof_tolerance,
    "q65_scalar_funcs" -> q65_scalar_funcs,
    "q66_cross_join" -> q66_cross_join,
    "q67_dict_map" -> q67_dict_map)
}
