package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational operator suite over the driver's TPC-H-ish synthetic tables.
  *
  * One entry per operator category of SURVEY.md §2.B (the embedded SQL surface
  * the reference relies on PostgreSQL to evaluate: scans, conjunctive filters,
  * multi-way equi joins, union, distinct-on, sorts, aggregates, string/date
  * functions, CASE, casts, IN-subqueries, scalar subqueries). Each query has a
  * DuckDB oracle twin in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism rules for oracle parity: every aggregate over a floating-point
  * column first casts to an exact decimal type (double summation order is
  * partition-dependent in Spark, so raw double sums would hash-mismatch), and
  * every result carries an unambiguous ORDER BY.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Cast a double money/quantity column to an exact decimal for deterministic
    * distributed aggregation.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def sum2(c: Column): Column = sum(dec2(c)).cast("double")

  /** l_extendedprice * (1 - l_discount) in exact decimal arithmetic. */
  private def revenue(price: Column, disc: Column): Column =
    dec2(price) * (lit(1) - dec2(disc))

  /** Exact integer cents — `floor(value·100)`, ONE deterministic double op.
    * The single quantization every events-value operator keys on
    * ([[ev_anomaly]], [[q42_locf]], [[q43_interp]], [[q45_nulls]]); the
    * DuckDB twins build the same expression from `OracleSql.centsSql`, so
    * the two engines share one definition per side and the sides cannot
    * drift independently per operator.
    */
  private def centsCol(v: Column): Column = floor(v * 100).cast("long")

  /** [[centsCol]] with every multiple of `mod` blanked to NULL — the ONE
    * synthetic-missing-value definition behind the LOCF / interpolation /
    * null-ordering trio, so "missing" always means the same rows across
    * the repair operators and their twins.
    */
  private def synthCents(v: Column, mod: Int): Column =
    when(centsCol(v) % mod === 0, lit(null)).otherwise(centsCol(v))

  // --- scans + aggregation -------------------------------------------------

  /** Full-scan aggregate (TPC-H Q1 shape): group-by two low-cardinality keys,
    * map-side partial aggregation does the heavy lifting; only |groups| rows
    * cross the shuffle.
    */
  def q01_scan_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum2(col("l_quantity")).as("sum_qty"),
        sum2(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection — both must reach the parquet scan
    * (PushedFilters + 5-column ReadSchema instead of 11).
    */
  def q02_filter_project(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") < 3 &&
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  // --- joins ---------------------------------------------------------------

  /** 3-way join + aggregate (TPC-H Q3 shape). customer is small at every SF →
    * broadcast; orders⋈lineitem is the one real shuffle.
    */
  def q03_join_agg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
  }

  /** 5-way join (TPC-H Q5 shape): revenue by nation for one region. All three
    * dimension tables broadcast; the plan has a single big shuffle (the
    * orders⋈lineitem equi join).
    */
  def q04_join5_agg(s: SparkSession, dir: String): DataFrame = {
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nat = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("rev"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Left-semi join: customers with at least one finalized order (EXISTS). */
  def q09_semi_join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers with no pending orders (NOT EXISTS). */
  def q10_anti_join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Theta (non-equi) join: parts priced above the average price of their own
    * size class — broadcast the tiny per-size aggregate, non-equi predicate.
    * The mean comparison is expressed division-free (`price * n > sum`) so the
    * predicate is exact decimal arithmetic on both engines.
    */
  def q25_theta_join(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val bySize = part.groupBy(col("p_size").as("sz"))
      .agg(sum(dec2(col("p_retailprice"))).cast(DecimalType(38, 2)).as("sum_price"),
        count(lit(1)).as("n"))
    part.join(broadcast(bySize),
        part("p_size") === bySize("sz") &&
          dec2(part("p_retailprice")) * bySize("n") > bySize("sum_price"))
      .select(col("p_partkey"), col("p_size"), dec2(col("p_retailprice")).cast("double").as("price"))
      .orderBy("p_partkey")
  }

  // --- sorts / limits / windows -------------------------------------------

  /** Global top-k by value with a unique tiebreak — Spark plans this as
    * TakeOrderedAndProject (no full sort of the child).
    */
  def q05_topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), dec2(col("o_totalprice")).cast("double").as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)

  /** Postgres `DISTINCT ON (o_custkey) … ORDER BY o_custkey, o_orderdate`
    * semantics (first row per key) — SURVEY.md §2.B dialect delta, mapped to a
    * ranked window (`validation/location.yaml:14-29` uses this construct).
    */
  def q06_distinct_on(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .orderBy("o_custkey")
  }

  /** Window functions: per-customer order sequence + running decimal total. */
  def q07_window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("running_total",
        sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select("o_custkey", "o_orderkey", "seq", "running_total")
      .orderBy("o_custkey", "seq")
  }

  /** Exact distinct aggregation — the oracle-checked path. The 100 TB
    * variant is approx_count_distinct (HLL++), a drop-in swap here; it is
    * deliberately NOT emitted in this query because sketch values differ
    * across engines by design and any non-exact column would break the
    * oracle's full-row hash compare.
    */
  def q27_count_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HyperLogLog++ approximate distinct counts — the scale path for
    * [[q27_count_distinct]]. Exact count-distinct shuffles every distinct
    * key; the sketch aggregates a fixed-size register set with map-side
    * partials, so the shuffle is O(groups × sketch), independent of
    * cardinality — at 100 TB that is the difference between a re-shuffle of
    * the key universe and a few KB per group. rsd=0.02 ⇒ ±2 % typical
    * error (tolerance-tested against the exact counts in PipelineSpec; no
    * DuckDB oracle — its approx_count_distinct is a different sketch with
    * different estimates). Tighter rsd costs quadratically in register
    * count — measured 1.26 s at 0.01 vs 0.67 s at 0.02 at sf0.1, because
    * the imperative HLL aggregate's buffer (1536 longs/group at p=14) is
    * what every partial merge carries.
    */
  def ev_hll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("n_supps_approx"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Approximate percentiles (Greenwald–Khanna) — the scale path for
    * [[q30_percentile]] the same way [[ev_hll]] is for [[q27_count_distinct]]:
    * the exact form materializes each group's full value set on one reducer
    * to sort it; the GK summary is a fixed-size (accuracy-bound) buffer with
    * map-side partials, so the shuffle is O(groups × summary) regardless of
    * row count. accuracy=1000 ⇒ rank error ≤ 0.1 % (tolerance-tested
    * against exact per-group percentiles in PipelineSpec; no DuckDB oracle —
    * its approximate quantile is a t-digest with different estimates).
    */
  def ev_quantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        approx_percentile(col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(1000))
          .as("p_approx"),
        count(lit(1)).as("n_rows"))
      .select(col("event_type"),
        col("p_approx").getItem(0).as("p50"),
        col("p_approx").getItem(1).as("p95"),
        col("p_approx").getItem(2).as("p99"),
        col("n_rows"))
      .orderBy("event_type")

  // --- set ops -------------------------------------------------------------

  /** UNION (distinct) of two scans — `validation/location.yaml:15-18`. */
  def q08_union(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  // --- expressions ---------------------------------------------------------

  /** String functions used by the reference rules: substring / position /
    * length / `||` concat (`validation/condition_occurrence.yaml:71,105`).
    */
  def q17_string_funcs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      substring(col("p_name"), 1, 5).as("name5"),
      expr("position('a' in p_name)").as("pos_a"),
      length(col("p_name")).as("len"),
      concat_ws("#", col("p_brand"), col("p_type")).as("tag"))
      .orderBy("p_partkey")

  /** CASE expression + greatest (`tests/rules/join.yaml:28,34`). */
  def q18_case_expr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      when(dec2(col("l_discount")) > dec2(col("l_tax")), lit("D"))
        .otherwise(lit("T")).as("flag"),
      greatest(dec2(col("l_discount")), dec2(col("l_tax"))).cast("double").as("max_rate"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Date extraction (`validation/person.yaml:27` `extract(year from …)`). */
  def q19_date_extract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("total"))
      .orderBy("yr")

  // --- subqueries ----------------------------------------------------------

  /** IN-subquery (`tests/rules/custom_query.yaml:32`) — planned by Catalyst as
    * a left-semi join.
    */
  def q20_in_subquery(s: SparkSession, dir: String): DataFrame = {
    // query-scoped view names: a bare `orders` view would collide with a
    // concurrent engine run's temp tables in the same session
    Seq("orders", "customer").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(s"graft_q20_$n"))
    s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus FROM graft_q20_orders
             WHERE o_custkey IN (SELECT c_custkey FROM graft_q20_customer WHERE c_mktsegment = 'BUILDING')
             ORDER BY o_orderkey""")
  }

  /** Scalar subquery — the `total_rows()` fixture pattern
    * (`tests/rules/custom_query.yaml:3-11`): a global count available in every
    * output row.
    */
  def q22_scalar_subquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "part").createOrReplaceTempView("graft_q22_part")
    s.sql("""SELECT p_brand, count(*) AS n, (SELECT count(*) FROM graft_q22_part) AS total
             FROM graft_q22_part GROUP BY p_brand ORDER BY p_brand""")
  }

  /** GROUP BY + HAVING. */
  def q21_agg_having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("p_size").cast("long")).as("sum_size"))
      .filter(col("n") > 10)
      .orderBy("p_brand")

  // --- inline VALUES + casts ----------------------------------------------

  /** Inline VALUES table with column aliases + `::` casts
    * (`tests/rules/custom_query.yaml:26,17`), joined to a real table.
    */
  def q15_values_cast(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "region").createOrReplaceTempView("graft_q15_region")
    s.sql("""SELECT x.id, x.alpha, CAST(x.id AS INT) + 1 AS id2, r_name
             FROM (VALUES (0, 'a1'), (2, 'b1'), (4, 'c1')) AS x(id, alpha)
             JOIN graft_q15_region ON r_regionkey = x.id
             ORDER BY x.id""")
  }

  /** Constant columns (A17, `tests/rules/constant.yaml`): strings quoted,
    * numbers raw.
    */
  def q14_constants(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      lit("alpha").as("tag"),
      lit(1).as("flag"),
      lit(2.5).as("score"))
      .orderBy("c_custkey")

  /** Range (interval-containment) join: parts bucketed into price bands via
    * a broadcast non-equi join — the band table is tiny, so the scan side
    * never shuffles.
    */
  def q16_range_join(s: SparkSession, dir: String): DataFrame = {
    val bands = s.createDataFrame(Seq(
      ("low", 0, 930), ("mid", 930, 970), ("high", 970, 100000)))
      .toDF("band", "lo", "hi")
    val part = t(s, dir, "part")
    part.join(broadcast(bands),
        dec2(part("p_retailprice")) >= bands("lo") && dec2(part("p_retailprice")) < bands("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum2(col("p_retailprice")).as("total"))
      .orderBy("band")
  }

  /** As-of join: each purchase event paired with the user's most recent
    * strictly-prior view. Composed Spark-first from one per-user ordered
    * window (single shuffle on user_id) — no custom operator needed; the
    * DuckDB oracle uses its native ASOF JOIN, so two independent
    * implementations must agree. "Prior" is strictly-earlier-in-TIME
    * (a RANGE frame ending 1 µs before the current row), matching ASOF's
    * `view.ts < purchase.ts` — a ROW frame ordered by (ts, event_id)
    * would include a same-instant view the oracle excludes. Determinism
    * under ties: peers inside the frame share their ts, and ts is the
    * value `last` picks, so peer order cannot change the answer.
    */
  def q26_asof_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("last_view_ts"))
      .orderBy("user_id", "event_id")
  }

  // --- events (time series, batch) ----------------------------------------

  /** Tumbling-window aggregate over the events table (batch form; the
    * streaming twin lives in [[graft.streaming.EventsStream]]).
    */
  def q23_events_window(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum2(col("value")).as("v"))
      .orderBy("h", "event_type")

  /** Gap-based sessionization (30-minute inactivity) via lag + running sum —
    * the classic two-window pattern; shuffles once on user_id.
    */
  def q24_sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("brk",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sess",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .orderBy("user_id", "sess")
  }

  /** Sessionization via the NATIVE `session_window` operator — the built-in
    * twin of [[q24_sessionize]]'s lag/cumsum formulation (same 30-minute
    * gap; session_window splits at gap ≥ 30 m where the manual form used
    * > — the oracle twin mirrors ≥). One aggregate, no window functions:
    * Catalyst merges overlapping candidate windows in the aggregation
    * itself, and the SAME operator works unchanged in Structured Streaming
    * (where the lag/cumsum form cannot — no unbounded window over a
    * stream). Oracle-checked against the manual DuckDB sessionizer.
    */
  def q46_session_native(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("user_id"), col("t0"), col("t1"), col("n_events"))
      .orderBy("user_id", "t0")

  // --- grouping sets / pivot / percentiles / outer joins -------------------

  /** ROLLUP over (returnflag, linestatus): per-pair, per-flag, and grand
    * totals in ONE pass — Catalyst plans grouping sets as a single Expand +
    * hash aggregate, so the scan and shuffle are paid once, not once per
    * level. `grouping_id` disambiguates subtotal NULLs from data NULLs.
    */
  def q28_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** Plain GROUPING SETS — the non-hierarchical shape ROLLUP/CUBE cannot
    * express: per-returnflag totals and per-linestatus totals in one pass,
    * with NO combined and NO grand-total row. One Expand (2 replicas) + one
    * aggregate — same single-shuffle cost as two separate groupBys minus a
    * scan.
    */
  def q41_grouping_sets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** Pivot returnflag into columns (long→wide): Spark's `pivot` with an
    * explicit value list compiles to a single-shuffle conditional aggregate —
    * identical plan shape to the CASE-WHEN formulation the oracle uses, so
    * no per-value scan multiplication.
    */
  def q29_pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(dec2(col("l_quantity"))))
      .select(
        col("l_linestatus"),
        col("A").cast("double").as("qty_a"),
        col("N").cast("double").as("qty_n"),
        col("R").cast("double").as("qty_r"))
      .orderBy("l_linestatus")

  /** Exact interpolated percentiles per group (`percentile`, not the
    * t-digest approximation). Both engines compute pos = p·(n−1), but the
    * final interpolation combine differs in form (Spark weights each
    * endpoint; DuckDB's varies), so agreement is verified EMPIRICALLY by
    * the oracle gate per corpus — it holds on every group of the shipped
    * data, but is not guaranteed to the last ulp on adversarial inputs.
    * At 100 TB the exact form needs a per-group sort — the production
    * variant is `approx_percentile` (t-digest), a drop-in swap kept OUT of
    * this query so every emitted column stays oracle-exact (sketches differ
    * across engines by design and would break the full-row hash compare).
    */
  def q30_percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
        percentile(col("l_quantity"), lit(0.95)).as("p95_qty"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** FULL OUTER join of two filtered sides (high-balance customers vs
    * per-customer order totals): rows survive from both dangling sides.
    * Spark plans full-outer as a sort-merge join — both sides shuffle on the
    * key once; no broadcast variant exists for full-outer by definition.
    */
  def q31_full_outer(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"))
    val ords = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("total_price"))
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        col("n_orders"),
        col("total_price"))
      .orderBy("custkey")
  }

  /** INTERSECT / EXCEPT set operations (distinct semantics) over two derived
    * key sets, emitted as one tagged union. Spark plans both as hash
    * joins (LeftSemi / LeftAnti over aggregated children) — no sort, no
    * cartesian; the two branches share the scan via exchange reuse.
    */
  def q33_intersect_except(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def custsIn(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
    val a = custsIn(1995)
    val b = custsIn(1996)
    a.intersect(b).select(lit("both").as("tag"), col("o_custkey"))
      .unionAll(a.except(b).select(lit("only_1995").as("tag"), col("o_custkey")))
      .orderBy("tag", "o_custkey")
  }

  /** Ordered string aggregation — `LISTAGG(...) WITHIN GROUP (ORDER BY ...)`
    * (ANSI / Spark 4); the WITHIN GROUP ordering makes the concatenation
    * deterministic under any partitioning, which is what lets it be
    * oracle-compared at all (an unordered listagg is partition-order
    * dependent by construction).
    */
  def q34_listagg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n"))
      .orderBy("r_name")

  /** Correlated LATERAL derived table (SQL:2016; Spark ≥ 3.2): top-2 orders
    * per high-balance customer, expressed through the `spark.sql` entry
    * path the dialect layer feeds. Catalyst rewrites the correlated LIMIT
    * subquery into a ranked-window join — the same plan a hand-written
    * row_number formulation gets, so there is no per-customer re-scan.
    */
  def q37_lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q37_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_q37_orders")
    s.sql(
      """SELECT c_custkey, o.o_orderkey, o.price
        |FROM graft_q37_customer,
        |LATERAL (SELECT o_orderkey,
        |           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        |         FROM graft_q37_orders WHERE o_custkey = c_custkey
        |         ORDER BY price DESC, o_orderkey LIMIT 2) o
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin)
  }

  /** Correlated scalar AGGREGATE subqueries (events above their user's own
    * average) through the SQL entry path — Catalyst decorrelates both
    * correlated aggregates into one grouped join, not a per-row re-scan.
    * "Above average" is evaluated in exact integers (cents·n > Σcents —
    * multiplied through like [[ev_anomaly]]) so no engine's double
    * summation order can flip a boundary row.
    */
  def q47_corr_subquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("graft_q47_events")
    s.sql(
      """SELECT user_id, count(*) AS n_above
        |FROM graft_q47_events e
        |WHERE CAST(floor(value * 100) AS BIGINT) *
        |      (SELECT count(*) FROM graft_q47_events e2
        |       WHERE e2.user_id = e.user_id)
        |    > (SELECT sum(CAST(floor(value * 100) AS BIGINT))
        |       FROM graft_q47_events e3 WHERE e3.user_id = e.user_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** IGNORE NULLS window navigation — last-observation-carried-forward
    * (LOCF) gap fill, the standard sensor/feature-pipeline repair: each
    * user's missing readings take the most recent present one. `last(...,
    * ignoreNulls)` over a running frame is the Spark spelling; DuckDB's is
    * `last_value(... IGNORE NULLS)`. "Missing" is synthesized
    * deterministically (`nullif(value too small)`) since the fixture has no
    * physical NULLs. Readings quantize to integer cents so the carried
    * value is bit-stable. One shuffle on user_id.
    */
  def q42_locf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        synthCents(col("value"), 10).as("cents"))
      .withColumn("cents_filled", last(col("cents"), ignoreNulls = true).over(w))
      .select("event_id", "user_id", "cents", "cents_filled")
      .orderBy("event_id")
  }

  /** Linear interpolation of missing readings — the resample/repair step
    * beyond [[q42_locf]]'s carry-forward: a gap takes the line between its
    * nearest present neighbors, weighted by row distance. Four window
    * functions (prev/next value, prev/next position — IGNORE NULLS
    * navigation both directions) over ONE partition spec = one shuffle +
    * sort; edges fall back to the single present neighbor. The arithmetic
    * is integer cents until the final `prev + (next−prev)·frac` with an
    * identical operation order in the oracle, so the doubles match bit for
    * bit.
    */
  def q43_interp(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cents = synthCents(col("value"), 10)
    val prevV = last(col("cents"), ignoreNulls = true).over(back)
    val nextV = first(col("cents"), ignoreNulls = true).over(fwd)
    val pos = row_number().over(w).cast("long")
    val prevP = last(when(col("cents").isNotNull, col("rn")), ignoreNulls = true).over(back)
    val nextP = first(when(col("cents").isNotNull, col("rn")), ignoreNulls = true).over(fwd)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), cents.as("cents"))
      .withColumn("rn", pos)
      .select(col("event_id"), col("user_id"), col("ts"), col("cents"), col("rn"),
        prevV.as("pv"), nextV.as("nv"), prevP.as("pp"), nextP.as("np"))
      .select(col("event_id"), col("user_id"), col("cents"),
        when(col("cents").isNotNull, col("cents").cast("double"))
          .when(col("pv").isNull, col("nv").cast("double"))
          .when(col("nv").isNull, col("pv").cast("double"))
          .otherwise(col("pv").cast("double") +
            (col("nv") - col("pv")).cast("double") *
              ((col("rn") - col("pp")).cast("double") /
                (col("np") - col("pp")).cast("double")))
          .as("cents_interp"))
      .orderBy("event_id")
  }

  /** Value-based (RANGE) window frame — trailing-30-day customer spend per
    * order. Distinct semantics from the ROWS frames elsewhere: the frame is
    * bounded by the ORDER-BY VALUE (epoch day), so same-day orders are
    * peers and every peer row sees the identical frame — deterministic
    * under any tie order, which is exactly why the money flows as exact
    * integer cents (a double sum would vary with each engine's internal
    * frame-evaluation order; DuckDB uses segment trees, Spark a running
    * accumulator). One shuffle on o_custkey; the sort inside the window
    * covers the frame scan.
    */
  def q38_range_frame(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("day"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-30, Window.currentRow)
    orders.withColumn("spend_30d", sum(col("cents")).over(w))
      .orderBy("o_orderkey")
  }

  /** UNPIVOT / melt — wide metric columns to long (entity, metric, value)
    * form, the inverse of [[q29_pivot]]. Spark's native `unpivot` plans as
    * an Expand (each input row emits one output row per metric, no shuffle
    * at all); the oracle expresses the same relation as the portable
    * UNION ALL form. Values meet in DOUBLE; prices go through DECIMAL(12,2)
    * first so both engines quantize identically.
    */
  def q39_unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        dec2(col("p_retailprice")).cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "metric", "value")
      .orderBy("p_partkey", "metric")

  /** Recursive CTE (SQL:1999; Spark ≥ 4.0): a month spine generated by the
    * recursion, left-joined to orders for gap-filled monthly counts — the
    * date-scaffold pattern reporting pipelines need (months with zero
    * orders must appear). The recursion is 80 iterations over ONE row each
    * — driver-cheap scaffolding. The fact side aggregates to per-month
    * counts FIRST (distributed, map-side partials), and the spine joins the
    * tiny aggregate — never the raw fact table, which a naive
    * spine-LEFT-JOIN-orders formulation would have to broadcast or shuffle
    * whole. Bounds are fixture constants (the testdata generator's
    * order-date span), not data-derived, so the query stays a single
    * statement on both engines.
    */
  def q40_recursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q40_orders")
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM months WHERE m < CAST('2001-08-01' AS DATE)
        |),
        |agg AS (
        |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
        |         count(*) AS n
        |  FROM graft_q40_orders GROUP BY 1
        |)
        |SELECT date_format(m, 'yyyy-MM') AS month,
        |       coalesce(n, CAST(0 AS BIGINT)) AS n_orders
        |FROM months LEFT JOIN agg USING (m)
        |ORDER BY 1""".stripMargin)
  }

  /** Per-type 2σ outlier detection with no floating-point STATISTICS:
    * values quantize to integer cents (`floor(v·100)` — one deterministic
    * double op), and the per-type moments (n, Σx, Σx²) aggregate as exact
    * integers — order-independent under any partitioning. The z-test
    * |v−μ| > 2σ is multiplied through to (n·v − S1)² > 4·(n·S2 − S1²) and
    * evaluated in DOUBLE from those exact moments: the same operation order
    * on both engines gives bit-identical comparisons, and doubles never
    * overflow (the all-integer form exceeds int64 past ~10⁵ rows/type at
    * these value magnitudes — under Spark 4's default ANSI mode that is a
    * query-killing ArithmeticException, measured, not theoretical). The
    * moments themselves sum in DECIMAL(38,0): Σx² crosses int64 at ~3·10⁹
    * rows/type (cents² ≈ 3·10⁹ each), i.e. well inside the 100 TB regime
    * this operator claims — 38 digits carries ~10³⁸, beyond any corpus,
    * exactly the mitigation [[ev_dwell]]'s bound note prescribes; DuckDB
    * widens BIGINT sums to HUGEINT on its own, so the twins stay exact.
    * The tiny per-type stats table broadcasts back onto the fact scan.
    */
  def ev_anomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        centsCol(col("value")).as("cents"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("s1"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("s2"))
    val nD = col("n").cast("double")
    val s1D = col("s1").cast("double")
    val s2D = col("s2").cast("double")
    val devD = nD * col("cents").cast("double") - s1D
    ev.join(broadcast(stats), "event_type")
      .filter(devD * devD > lit(4.0) * (nD * s2D - s1D * s1D))
      .select(col("event_id"), col("event_type"), col("cents"))
      .orderBy("event_id")
  }

  /** [[ev_ewma]]'s default smoothing constant in millionths — shared with
    * the DuckDB twin (the mixtureWeights convention). */
  private[graft] val ewmaAlphaMillionths: Long = 300000L

  /** Per-user EXPONENTIAL SMOOTHING (EWMA — the classic streaming
    * baseline every metrics pipeline runs beside [[ev_anomaly]]'s global
    * z-test: Brown/Holt simple exponential smoothing, Hunter's EWMA
    * control chart): s₁ = x₁, sₜ = (α·xₜ + (1−α)·sₜ₋₁) in fixed-point
    * millionths — `(A·x + (10⁶−A)·s) div 10⁶`, pure BIGINT on the
    * non-negative cents domain, so the SEQUENTIAL recurrence (the thing
    * window sums cannot express) still gets a full DuckDB hash oracle:
    * Spark folds the user's time-ordered value list left-to-right with
    * `aggregate`, the twin with `list_reduce` — same init (first
    * element), same order, same integer floor.
    *
    * Scale shape: ONE user-keyed shuffle (the row_number window), then a
    * map-side-combined ordered collect per user; the fold is per-row
    * arithmetic over each user's own list (user series are bounded — the
    * events-per-user kind of bounded, not corpus-sized; a series too long
    * to collect per user belongs in a stateful stream, which is
    * [[graft.streaming]]'s `sessionize`/`windowedAgg` territory). Emits
    * per user: event count, first/last raw cents, and the smoothed value.
    */
  def ev_ewma(s: SparkSession, dir: String,
      alphaMillionths: Long = ewmaAlphaMillionths): DataFrame = {
    require(alphaMillionths >= 1L && alphaMillionths <= 1000000L,
      s"ev_ewma: alphaMillionths=$alphaMillionths must be in [1, 1000000]")
    val a = alphaMillionths
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        centsCol(col("value")).as("cents"))
      .withColumn("rn", row_number().over(seq))
      .groupBy("user_id")
      .agg(transform(
        array_sort(collect_list(struct(col("rn"), col("cents")))),
        p => p.getField("cents")).as("xs"))
      .select(col("user_id"),
        size(col("xs")).cast("long").as("n_events"),
        element_at(col("xs"), 1).as("first_cents"),
        element_at(col("xs"), -1).as("last_cents"),
        expr(s"""aggregate(slice(xs, 2, size(xs) - 1), xs[0],
                 |  (s, x) -> ($a * x + ${1000000L - a} * s) div 1000000)"""
          .stripMargin).as("ewma_cents"))
      .orderBy("user_id")
  }

  /** Semi-structured JSON column access: `events.props` is a JSON string;
    * extract a typed field with a JSON path and aggregate it. Spark's
    * `get_json_object` is codegen'd — the extraction runs inside the scan
    * stage, so at 100 TB this costs one pass with no shuffle beyond the tiny
    * per-type aggregate.
    */
  def q35_json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** CUBE over (returnflag, linestatus): all 2^k grouping combinations in
    * one Expand pass — same single-scan property as ROLLUP (q28) with the
    * flag-only subtotal level added.
    */
  def q36_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum2(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** Navigation window functions — lag / lead / ntile / first-in-partition
    * over the per-user event sequence; one shuffle on user_id serves all
    * four (same window spec → one Window operator).
    */
  def q32_lead_lag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(
        col("user_id"),
        col("event_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).cast("long").as("quartile"),
        first(col("event_type")).over(w).as("first_type"))
      .orderBy("user_id", "event_id")
  }

  /** Event funnel (view → click-after-view → purchase-after-click) in ONE
    * shuffle: each stage's per-user first-qualifying timestamp is a window
    * min over an expression referencing the previous stage's window result,
    * and every window shares the user partition spec — three chained Window
    * operators, one exchange, no self-joins (the naive formulation re-scans
    * and re-joins the events table once per stage). Stage timestamps are
    * exact epoch integers; the emitted per-stage user counts and summed
    * view→purchase lag are integer-exact.
    */
  def ev_funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val mv = min(when(col("event_type") === "view", col("ts"))).over(w)
    val events = t(s, dir, "events")
      .withColumn("mv", mv)
    val mc = min(when(col("event_type") === "click" && col("ts") >= col("mv"),
      col("ts"))).over(w)
    val mp = min(when(col("event_type") === "purchase" && col("ts") >= col("mc"),
      col("ts"))).over(w)
    events
      .withColumn("mc", mc)
      .withColumn("mp", mp)
      .select(col("user_id"), col("mv"), col("mc"), col("mp")).distinct()
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("mv").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("mc").isNotNull, 1L).otherwise(0L)).as("n_clicked"),
        sum(when(col("mp").isNotNull, 1L).otherwise(0L)).as("n_purchased"),
        sum(when(col("mp").isNotNull,
          unix_micros(col("mp")) - unix_micros(col("mv"))).otherwise(0L))
          .as("lag_micros_sum"))
  }

  /** Cohort retention: users grouped by the week of their first event, and
    * for each (cohort, week-offset) the count of users active that week.
    * Two bounded-domain aggregates after one window min — the (user, week)
    * distinct is the only corpus-sized shuffle; the retention matrix itself
    * is cohorts × offsets rows.
    */
  def ev_retention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    t(s, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .withColumn("cohort", min(col("week")).over(w))
      .distinct()
      .withColumn("offset",
        (datediff(col("week"), col("cohort")) / 7).cast("long"))
      // ISO string, not DATE: date-typed result cells round-trip differently
      // through the two oracle readers (date vs timestamp objects)
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users")) // (user, week) already distinct
      .orderBy("cohort", "offset")
  }

  /** The consecutive-pair stream behind [[ev_transitions]] and
    * [[ev_dwell]] — ONE derivation (lead window on user_id, ties by
    * event_id; rows whose event has no successor drop), so the transition
    * matrix and the dwell timings can never disagree about what counts as
    * an edge. Columns: from_type, to_type, gap_us.
    */
  private def transitionPairs(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .withColumn("gap_us",
        lead(unix_micros(col("ts")), 1).over(seq) - unix_micros(col("ts")))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"), col("gap_us"))
  }

  /** Event-sequence TRANSITION MATRIX — the first-order Markov view of user
    * journeys: for every consecutive (event, next event) pair within a
    * user's timeline, the count and the row-normalized transition
    * probability. This is the "what do users do after X" primitive behind
    * funnel discovery ([[ev_funnel]] fixes the stage order; this finds it)
    * and session modeling.
    *
    * One corpus-sized shuffle only: the lead() window partitions by
    * user_id (ties broken by event_id so the sequence is deterministic).
    * Everything after the pair aggregate operates on ≤ |event_types|²
    * rows — the per-from-type normalizing window and the output sort are
    * tiny-data exchanges. The probability is a single IEEE division of two
    * exact integer counts, so both engines produce the identical double.
    */
  def ev_transitions(s: SparkSession, dir: String): DataFrame =
    transitionPairs(s, dir)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
      .orderBy("from_type", "to_type")

  /** Per-group MODE — the most frequent value, as a real aggregate rather
    * than a window-rank trick ([[q06_distinct_on]] is the row-selection
    * cousin): `max_by` over a deterministic order key. Spark's built-in
    * `mode()` is tie-nondeterministic, which an oracle-checked engine
    * cannot ship; the order key here — zero-padded count ‖ value — makes
    * ties break toward the lexicographically greatest value identically in
    * any engine that compares ASCII strings (DuckDB's `arg_max` on the
    * same key). Two aggregates, both with map-side partials: the bounded
    * (user, type) count, then one `max_by` per user.
    */
  def q56_mode(s: SparkSession, dir: String): DataFrame = {
    // 19 digits = max Long width: a shorter pad silently truncates counts
    // past its ceiling and max_by picks the wrong mode — on BOTH engines,
    // so the oracle could never catch it
    val ord = concat(lpad(col("n").cast("string"), 19, "0"), col("event_type"))
    t(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(max_by(col("event_type"), ord).as("mode_type"),
        max_by(col("n"), ord).as("mode_n"),
        count(lit(1)).as("n_types"))
      .orderBy("user_id")
  }

  /** Transition DWELL times — [[ev_transitions]]'s timing half: for each
    * (event, next event) edge, how long users sit on it (count, total and
    * mean gap, and the max as the straggler signal). The edge-weighted
    * journey graph behind time-to-convert and abandonment analyses. Same
    * one-shuffle shape as ev_transitions — the SAME [[transitionPairs]]
    * derivation, so the two can never disagree about what counts as an
    * edge; gaps are exact integer micros (`unix_micros` differences summed
    * in 64-bit — exact up to 2⁶³ total micros per edge, ~292k
    * device-years; past that Spark's default ANSI mode kills the query
    * with an ArithmeticException — the measured behavior [[ev_anomaly]]
    * cites, not a silent wrap — while DuckDB widens to HUGEINT, so a
    * corpus anywhere near the bound should sum in DECIMAL), and the mean
    * is the single IEEE division both engines compute identically.
    */
  def ev_dwell(s: SparkSession, dir: String): DataFrame =
    transitionPairs(s, dir)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"),
        sum(col("gap_us")).as("gap_us_sum"),
        max(col("gap_us")).as("gap_us_max"))
      .withColumn("gap_us_mean",
        col("gap_us_sum").cast("double") / col("n").cast("double"))
      .orderBy("from_type", "to_type")

  /** Cumulative distinct-user REACH — the running `count(DISTINCT user)
    * OVER (ORDER BY day)` no engine supports as a window aggregate,
    * spelled the scalable way: a user contributes to reach exactly once,
    * on their FIRST day per event type, so one (type, user) min-day
    * aggregate + a per-day count + a running sum over days reproduces the
    * windowed-distinct semantics with ONE corpus-sized shuffle (the
    * min-day groupBy, map-side combined). The naive per-row windowed
    * distinct materializes a user set per (type, day) pair; this never
    * holds a set at all — the growth-dashboard primitive (DAU reach,
    * feature adoption) at any scale. [[ev_retention]] is the cohort-matrix
    * cousin; this is the single running curve.
    */
  def ev_reach(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
    val firstDay = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_new"))
    // densify over every ACTIVE (type, day): a day with events but zero
    // first-time users must emit n_new = 0 and the flat reach value —
    // dropping it would put gaps in the curve the windowed-distinct
    // semantics this derives has rows for. The distinct frame is
    // types × days rows (map-side combined), never user-sized.
    val activeDays = ev.select("event_type", "day").distinct()
    val w = Window.partitionBy("event_type").orderBy("day")
    activeDays.join(firstDay, Seq("event_type", "day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("reach", sum(col("n_new")).over(w))
      // ISO string, not DATE (ev_retention's oracle-reader convention)
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_new"), col("reach"))
      .orderBy("event_type", "day")
  }

  /** Per-user ENGAGED-TIME coverage — the interval-union metric every
    * engagement dashboard needs and naive sums get wrong: each event opens
    * an interval [ts, ts + value minutes], and overlapping sessions must
    * count once, not twice (sum-of-durations inflates engaged time by the
    * overlap; DISTINCT minutes quantizes it). The union is
    * [[Dedup.mergeIslands]] — the ONE gaps-and-islands definition in the
    * repo — run on the time axis (micros instead of word positions; the
    * ≤1 µs merge tolerance inherited from the inclusive-position
    * convention is noise at engagement scale). Emits per user: merged
    * session-island count, covered micros, and the longest island.
    *
    * floor() before the long cast on BOTH engines — Spark's double→long
    * cast truncates while DuckDB's rounds, so the shared floor is what
    * keeps the twin bit-exact.
    *
    * Scale shape: one map-only projection, then mergeIslands' single
    * user-keyed window + the final per-user aggregate on the SAME
    * partitioning — one shuffle total, islands never corpus-wide.
    */
  def ev_coverage(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "events")
      .select(col("user_id").as("doc_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          floor(col("value") * 60000000d).cast("long")).as("e"))
    Dedup.mergeIslands(iv)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("se") - col("ss")).as("covered_us"),
        max(col("se") - col("ss")).as("longest_us"))
      .select(col("doc_id").as("user_id"), col("n_sessions"),
        col("covered_us"), col("longest_us"))
      .orderBy("user_id")
  }

  /** LAST-TOUCH REVENUE ATTRIBUTION — the marketing-analytics close of the
    * event family: each purchase's value is credited to the nearest
    * PRECEDING non-purchase event in the user's timeline (the "channel");
    * purchases with no prior touch credit "(none)". [[ev_funnel]] counts
    * stage conversion; this allocates the money. Revenue is summed in the
    * ONE cents quantization ([[centsCol]] — exact 64-bit integers), and
    * the channel lookup is `last(..., ignoreNulls) OVER (user timeline,
    * UNBOUNDED PRECEDING .. 1 PRECEDING)` with the (ts, event_id) tie
    * rule — a running LOCF, not a self-join: ONE corpus-sized shuffle
    * (the user window), then a census over ≤ |event_types|+1 rows.
    */
  def ev_attribution(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(seq))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("channel"), lit("(none)")).as("channel"),
        centsCol(col("value")).as("cents"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents_sum"))
      .orderBy("channel")
  }

  /** Top user JOURNEY PATHS — the onboarding-funnel census: each user's
    * first `k` event types in timeline order, joined " > ", counted across
    * users. [[ev_transitions]] is the memoryless edge view; this is the
    * order-`k` prefix view that finds the actual entry sequences
    * (discovery input to [[ev_funnel]]'s fixed stage order). Sequence
    * order is (ts, event_id) — the [[transitionPairs]] tie rule — so the
    * path strings are deterministic on both engines.
    *
    * Scale shape: one corpus-sized shuffle (the per-user window), then a
    * per-user k-element reassembly aggregate on k·|users| rows, then a
    * census whose domain is ≤ |event_types|^k rows — tiny-data exchanges
    * after the first. The per-user array never exceeds k elements, so no
    * collect_list can balloon on a hot user.
    */
  def ev_paths(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    require(k > 0, s"ev_paths: k=$k must be positive")
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val firstK = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(seq))
      .filter(col("rn") <= k)
    firstK
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          p => p.getField("event_type")), " > ").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  /** NULL semantics surface — the dialect corners that silently differ
    * between engines if untested: explicit NULLS FIRST/LAST ordering (Spark
    * defaults nulls-first on ASC, Postgres/DuckDB default nulls-LAST, so
    * rank columns materialize the difference into values the oracle hashes)
    * and null-safe equality (`<=>` / IS NOT DISTINCT FROM). Both rank
    * windows and the lag share one partition key — one shuffle, two sorts.
    */
  def q45_nulls(s: SparkSession, dir: String): DataFrame = {
    val cents = synthCents(col("value"), 7)
    val byUser = Window.partitionBy("user_id")
    val wLast = byUser.orderBy(col("cents").asc_nulls_last, col("event_id"))
    val wFirst = byUser.orderBy(col("cents").asc_nulls_first, col("event_id"))
    val wSeq = byUser.orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), cents.as("cents"))
      .select(
        col("event_id"), col("user_id"), col("cents"),
        row_number().over(wLast).cast("long").as("rk_nulls_last"),
        row_number().over(wFirst).cast("long").as("rk_nulls_first"),
        (col("cents") <=> lag(col("cents"), 1).over(wSeq)).as("same_as_prev"))
      .orderBy("event_id")
  }

  /** Regex surface — match (`rlike`), group extraction (`regexp_extract`),
    * and global substitution (`regexp_replace`) in one per-lang audit.
    * Patterns stay in the RE2 ∩ java.util.regex common subset (character
    * classes, `\b`, capture groups — no backreferences or lookaround) so the
    * DuckDB twin evaluates them identically; Spark's regexp_replace is
    * global by default where DuckDB needs the 'g' flag. All three run in the
    * scan stage under whole-stage codegen with the compiled pattern cached
    * per task — at scale this is a map-only pass, shuffling only the
    * bounded (lang, partial) rows.
    */
  def q44_regex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        sum(when(col("text").rlike("\\bdup\\b"), 1L).otherwise(0L)).as("n_dup"),
        max(regexp_extract(col("text"), "([a-z]+) dup", 1)).as("before_dup"),
        min(md5(regexp_replace(col("text"), "[aeiou]", ""))).as("vowel_probe"))
      .orderBy("lang")

  /** MERGE-shaped latest-wins upsert (SCD type 1): a deterministic updates
    * batch (every 7th order re-keyed to status 'X', price +10) overlays the
    * base table; per key the highest version wins. Spelled as `max_by` over
    * the tagged union rather than `row_number` = 1 — max_by partial-
    * aggregates map-side, so one row per key per partition crosses the one
    * shuffle, where the window form would shuffle every version of every
    * key and sort each group. At 100 TB this is the difference between a
    * shuffle sized by the delta-merged table and one sized by all versions.
    * Versions are distinct per key (0 base / 1 update) → deterministic.
    */
  def q48_upsert(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), lit(0).as("version"))
    val upd = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (col("o_totalprice") + 10.0).as("o_totalprice"), lit(1).as("version"))
    base.unionByName(upd)
      .groupBy("o_orderkey")
      .agg(max_by(col("o_orderstatus"), col("version")).as("o_orderstatus"),
        max_by(col("o_totalprice"), col("version")).as("o_totalprice"),
        max(col("version")).as("version"))
      .orderBy("o_orderkey")
  }

  /** SCD type-2 history build — [[q48_upsert]]'s companion: instead of
    * latest-wins, KEEP every state with its validity interval. The events
    * table is read as a change feed (each event sets the user's
    * `event_type` state); consecutive repeats of the same state collapse
    * into one period (SCD2 only writes a row when the attribute CHANGES),
    * `valid_from` = first change ts, `valid_to` = next period's start
    * (NULL = current), via the lag-change-flag / running-sum islands
    * pattern. Scale shape: every window and the aggregate cluster on
    * `user_id` (the islands aggregate adds `grp`, and hash(user_id)
    * already satisfies ClusteredDistribution(user_id, grp)), so the whole
    * operator is ONE shuffle on user_id plus sorts — no per-period
    * re-shuffle, no driver state; history length per key is bounded by
    * that key's change count, never the table size.
    */
  def q49_scd2(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val periods = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(seq).isNull ||
          lag(col("event_type"), 1).over(seq) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("grp",
        sum(col("chg")).over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("event_type")).as("state"), min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    // order the period chain by the island index, not valid_from: two
    // same-instant changes yield periods with EQUAL valid_from, and grp is
    // the strict per-user time order the islands were built in
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("grp"))
    // final sort by (user_id, grp), not valid_from: same-instant changes
    // make (user_id, valid_from) — even with state as tiebreaker (A,B,A at
    // one instant) — a non-total order, so output row order could diverge
    // nondeterministically between runs/engines. grp IS the total per-user
    // period order; it is dropped after the sort (a narrow projection over
    // Sort preserves row order).
    periods
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("n_events"), col("grp"))
      .orderBy("user_id", "grp")
      .drop("grp")
  }

  /** Time-series gap filling: hourly event counts per type with the
    * MISSING hours materialized at zero — the bucket-creation half that
    * LOCF (q42) does not do. The dense hour spine is generated per type
    * from its own [min, max] with `sequence` + explode — spine size is
    * hours×types (tiny), so the left join back to the real counts
    * broadcasts the aggregated side at any corpus scale; the raw events
    * table is scanned once and reduced BEFORE any join. DuckDB twin uses
    * generate_series.
    */
  def q50_gapfill(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_raw"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        col("n_raw").isNull.as("gap_filled"))
      .orderBy("event_type", "h")
  }

  /** SLIDING event-time windows — `window(ts, '1 hour', '15 minutes')`:
    * each event lands in exactly 4 overlapping hourly windows (the
    * trending-dashboard shape; [[q23_events_window]] is the tumbling
    * special case). Spark expands the windows map-side with one Expand —
    * 4 rows per event into ONE aggregate shuffle, not 4 passes; the same
    * expression runs unchanged under Structured Streaming. The DuckDB
    * twin spells the expansion as an explicit ×4 range join on
    * epoch-aligned 15-minute buckets (every k∈0..3 window provably
    * contains the event, so no residual filter is needed).
    */
  def q55_sliding_window(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy("w_start", "event_type")

  /** Aggregate FILTER clause — per-aggregate predicates in ONE pass
    * (`count(*) FILTER (WHERE …)`), the standard-SQL spelling of
    * conditional aggregation (q29's pivot uses the CASE form; this is the
    * construct form). One scan, one map-side-partial aggregate — N
    * filtered aggregates never mean N scans. Quantities are integral
    * doubles, cast to BIGINT before summing so the distributed sum order
    * cannot change a value.
    */
  def q54_filtered_agg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("graft_q54_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_discount > 0.05)
        |       AS BIGINT) AS qty_discounted,
        |  count(*) FILTER (WHERE l_returnflag = 'R' AND l_tax > 0.04) AS n_taxed_returns
        |FROM graft_q54_lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** EVENT-TIME RANGE window frame — the interval twin of [[q38_range_frame]]
    * (which ranges over an integer column): per-user trailing-1-hour event
    * count and value sum, `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    * CURRENT ROW` over the timestamp ordering. One shuffle on user_id; the
    * frame is computed in one pass per partition with a sliding lower
    * bound. Values aggregate as exact integer cents via floor(value·100)
    * (floor and ×100 are correctly-rounded IEEE ops on both engines —
    * `round` would NOT be, half-even vs half-away), so the oracle
    * hash-matches.
    */
  def q53_time_range_frame(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("graft_q53_events")
    s.sql(
      """SELECT event_id, user_id, ts,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM graft_q53_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin)
  }

  /** Ranking-statistics window functions — rank / dense_rank /
    * percent_rank / cume_dist off ONE window spec (one shuffle on lang,
    * one per-partition sort; all four functions share the frame).
    * percent_rank = (rank−1)/(N−1) and cume_dist = peers≤/N are exact
    * small-integer divisions — bit-identical across engines, so the
    * DuckDB twin hash-matches doubles included.
    */
  def q52_rank_stats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
      .orderBy("lang", "n_chars", "doc_id")
  }

  /** Equal-width histogram via `width_bucket` — the SQL-surface profiling
    * construct behind every data-card length distribution: bucket 0 is
    * underflow, n+1 overflow, interior buckets [lo + (i−1)·w, lo + i·w).
    * Bounds are powers of two (0..512 in 16 buckets of 32) so the bucket
    * arithmetic is EXACT in doubles and the DuckDB twin (which lacks
    * width_bucket and spells the same floor arithmetic) hash-matches.
    * Scale shape: map-only bucketing + one tiny aggregate — the profile
    * of a 100 TB corpus is one scan, and the bucket count (not the row
    * count) bounds the result.
    */
  def q51_histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), width_bucket(col("n_chars"), lit(0), lit(512), lit(16)).as("bucket"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lo", when(col("bucket") === 0, lit(null).cast("long"))
        .otherwise((col("bucket") - 1) * 32))
      .withColumn("hi", when(col("bucket") === 17, lit(null).cast("long"))
        .otherwise(col("bucket") * 32))
      .select("lang", "bucket", "lo", "hi", "n_docs")
      .orderBy("lang", "bucket")
}
