package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational operator suite (SURVEY §2.1-2.5 generic classes) over the
  * driver's synthetic TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Float determinism policy: money aggregates are summed as exact integer
  * cents (`round(x·scale)::long`) and divided back at the end — the sum is
  * then order-independent and bit-identical to DuckDB regardless of Spark's
  * partial-aggregation order. Averages of large groups are rounded to 4
  * decimals (double-sum associativity error ≪ rounding unit).
  */
object CoreQueries {

  /** Order-independent exact money sum: Σ round(e·scale) as long, ÷ scale. */
  private def moneySum(e: Column, scale: Long): Column =
    coalesce(sum(round(e * scale).cast("long")), lit(0L)).cast("double") / scale.toDouble

  private def moneySumSql(e: String, scale: Long): String =
    s"CAST(coalesce(sum(CAST(round(($e) * $scale) AS BIGINT)), 0) AS DOUBLE) / $scale.0"

  /** q28's derived snapshot table, one set of constants for both engines. */
  private object AsofSnapshots {
    val EpochSec = 1704067200L // 2024-01-01T00:00:00Z
    val SpacingH = 96          // hours between a user's snapshots
    val StaggerModH = 24       // per-user stagger offset (hours)
    val SnapsPerUser = 8
    val ScoreScale = 10        // score = user_id * ScoreScale + k
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- S1/P1/P2: scan + filter + projection (pushdown-friendly) ---------
    "q02_scan_filter" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz") &&
          col("l_quantity") >= 45)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // --- A1-class: TPC-H Q1 pricing summary (partial+final agg) -----------
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice"), 100L).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L)
            .as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 1000000L).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (moneySum(col("l_extendedprice"), 100L) / count(lit(1))).as("avg_price"),
          (moneySum(col("l_discount"), 100L) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // --- J1+J2-class: 3-way join, top revenue orders (TPC-H Q3 shape) -----
    "q03_top_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") > lit("1997-01-01").cast("timestamp_ntz"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // --- J1 broadcast dim chain: region ⋈ nation ⋈ customer ---------------
    "q04_region_rollup" -> ((s, dir) => {
      Tables.region(s, dir)
        .join(Tables.nation(s, dir), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal"), 100L).as("total_acctbal"),
          (moneySum(col("c_acctbal"), 100L) / count(lit(1))).as("avg_acctbal"))
        .orderBy("r_name")
    }),

    // --- J6: left outer join + per-key counts (zero-order customers kept) -
    "q05_cust_orders" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          moneySum(col("o_totalprice"), 100L).as("total_spent"),
          coalesce(max("o_totalprice"), lit(0.0)).as("max_order"))
        .orderBy("c_custkey")
    }),

    // --- semi join (EXISTS) ------------------------------------------------
    "q06_semi_join" -> ((s, dir) => {
      Tables.supplier(s, dir)
        .join(Tables.lineitem(s, dir).where(col("l_quantity") === 50),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // --- anti join (NOT EXISTS) -------------------------------------------
    "q07_anti_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // --- J3-class interval join: purchases within 1h of a signup ----------
    "q08_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts_us").as("s_ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
      signups.join(purchases,
        col("s_user") === col("p_user") &&
          col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + lit(3600000000L))
        .groupBy(col("s_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // --- W1-class: per-group top-k via row_number -------------------------
    "q09_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select("l_orderkey", "rn", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "rn")
    }),

    // --- W4: gaps-and-islands sessionization (30-min inactivity gap) ------
    "q10_sessionize" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
        .withColumn("is_new",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
          min("ts_us").as("session_start_us"),
          count(lit(1)).as("n_events"),
          moneySum(col("value"), 100L).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // --- A8-class: daily grouped agg with severity-cased scoring ----------
    "q11_daily_type_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          moneySum(col("value"), 100L).as("total_value"),
          (moneySum(col("value"), 100L) / count(lit(1))).as("avg_value"))
        .orderBy("day", "event_type")
    }),

    // --- A11: per-group mode (most common segment per nation) -------------
    "q12_mode_segment" -> ((s, dir) => {
      val counts = Tables.customer(s, dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("n").desc, col("c_mktsegment").asc)
      counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("c_nationkey", "c_mktsegment", "n")
        .orderBy("c_nationkey")
    }),

    // --- A10/W5: trend = first-7-days avg vs last-7-days avg ±5 -----------
    "q13_trend" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      val agged = daily.agg(
        avg(when(col("day") < "2024-01-08", col("cnt"))).as("first7_avg"),
        avg(when(col("day") >= "2024-01-24", col("cnt"))).as("last7_avg"))
      agged.select(
        round(col("first7_avg"), 4).as("first7_avg"),
        round(col("last7_avg"), 4).as("last7_avg"),
        when(col("last7_avg") - col("first7_avg") > 5.0, "increasing")
          .when(col("last7_avg") - col("first7_avg") < -5.0, "decreasing")
          .otherwise("stable").as("trend"))
    }),

    // --- W6: pagination, scale-safe form ----------------------------------
    // Deep-pagination is inherently a global order, but the full table must
    // NOT move to one partition: `orderBy().limit(offset+n)` compiles to
    // TakeOrderedAndProject (per-partition top-k, then a single merge of
    // offset+n rows), and the row_number window runs over those ≤150 rows
    // only — on a constant partition key so WindowExec never sees an
    // unpartitioned full-table spec.
    "q14_pagination" -> ((s, dir) => {
      val order = Seq(col("c_acctbal").desc, col("c_custkey").asc)
      val top = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(order: _*)
        .limit(150)
      val w = Window.partitionBy(graft.expr.WindowKeys.pinned(col("c_acctbal"))).orderBy(order: _*)
      top
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") >= 101 && col("rn") <= 150)
        .select("rn", "c_custkey", "c_name", "c_acctbal")
        .orderBy("rn")
    }),

    // W6 at scale: KEYSET pagination — the form that stays O(page) at any
    // table size. Offset pagination (q14) must rank everything before the
    // requested page; a keyset cursor (last seen (acctbal, custkey))
    // turns "page after X" into an indexable predicate + top-N, which
    // Spark plans as filter-pushdown + TakeOrderedAndProject: no global
    // window, no rank, work independent of how deep the page is.
    "q21_keyset_page" -> ((s, dir) => {
      // cursor = last row of q14's page 2 boundary (deterministic values
      // derived from the same ordering, shared with the oracle). The
      // cursor stays IN-PLAN as a broadcast 1-row cross join — building
      // the entry must not run driver-side jobs (every other map entry is
      // lazy; EXPLAIN-only tooling would otherwise pay two sort+limit jobs
      // per construction). The serving path, where the client supplies the
      // cursor as literals, is keysetPageAfter below — that's the form
      // with the scan-pushdown predicate.
      val cursor = Tables.customer(s, dir)
        .select("c_custkey", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(100).orderBy(col("c_acctbal").asc, col("c_custkey").desc).limit(1)
        .select(col("c_acctbal").as("__cur_bal"), col("c_custkey").as("__cur_key"))
      Tables.customer(s, dir)
        .crossJoin(broadcast(cursor))
        .where(col("c_acctbal") < col("__cur_bal") ||
          (col("c_acctbal") === col("__cur_bal") && col("c_custkey") > col("__cur_key")))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(50)
    }),

    // --- J4 (2-level hierarchy): breadcrumb concat ------------------------
    "q15_breadcrumb" -> ((s, dir) => {
      Tables.nation(s, dir)
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .select(
          col("n_nationkey"),
          concat(col("r_name"), lit(" > "), col("n_name")).as("breadcrumb"))
        .orderBy("n_nationkey")
    }),

    // --- J4 at depth: planted ≥10-level hierarchy through the REAL
    // distributed walk (breadcrumbDistributed), oracle'd by a DuckDB
    // recursive CTE re-deriving the semantics from scratch. q15 only
    // exercises 2 levels; this plants a 20-node parent chain that crosses
    // a state-stop ('colorado'), the 15-name cap exactly (node 20), a
    // case/trim stop in ancestor position ('COLORADO'), own-node stops
    // ('usa', ' Utah '), and shallow fan-in nodes sharing mid-chain
    // ancestors. Data is arithmetic-planted identically in both engines.
    "q15b_breadcrumb_deep" -> ((s, dir) => {
      val locs = s.range(60).select(
        col("id").as("mp_id"),
        when(col("id") === 0, "usa")
          .when(col("id") === 5, "colorado")
          .when(col("id") === 25, " Utah ")
          .when(col("id") === 41, "COLORADO")
          .otherwise(concat(lit("loc_"), col("id").cast("string"))).as("name"),
        when(col("id") === 0 || col("id") === 41, lit(null).cast("long"))
          .when(col("id").between(1, 20), col("id") - 1)
          .when(col("id") === 40, lit(41L))
          .otherwise(lit(10L) + col("id") % 5).as("parent_id"))
      graft.analytics.Analytics.breadcrumbDistributed(locs).orderBy("mp_id")
    }),

    // --- J5: fuzzy containment join (token ⋈ documents.text) --------------
    "q16_contains_join" -> ((s, dir) => {
      import s.implicits._
      val tokens = Seq("spark", "hash", "merge", "window", "stream").toDF("token")
      tokens.crossJoin(Tables.documents(s, dir))
        .where(col("text").contains(col("token")))
        .groupBy("token")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("token")
    }),

    // --- A9-class: per-user activity rates --------------------------------
    "q17_user_rates" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
        .withColumn("purchase_per_1k_views",
          col("n_purchases") * 1000.0 / nullif(col("n_views").cast("double"), lit(0.0)))
        .orderBy("user_id")
    }),

    // --- W5-class: sliding window frame (7-day moving average) ------------
    "q20_moving_avg" -> ((s, dir) => {
      // per-day counts: key-cardinality = #days, bounded — constant
      // partition key avoids the unpartitioned-window warning
      val w = Window.partitionBy(graft.expr.WindowKeys.pinned(col("day")))
        .orderBy("day").rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ma7", avg("n").over(w))
        .orderBy("day")
    }),

    // --- A12-class at depth: ROLLUP — every aggregation level in ONE pass -
    // (detail, per-flag subtotal, grand total); Spark expands the grouping
    // sets map-side so the multi-level report costs one shuffle, not three
    // queries over the fact table.
    "q22_rollup" -> ((s, dir) => {
      // grouping() — not coalesce — tags subtotal rows: a data NULL in a
      // grouping column must stay a detail row, never merge with the
      // rollup indicator (latent here — the fixture has no NULL flags —
      // but the operator contract matters)
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L)
            .as("sum_disc_price"),
          count(lit(1)).as("n_rows"),
          grouping(col("l_returnflag")).as("__g1"),
          grouping(col("l_linestatus")).as("__g2"))
        .select(
          when(col("__g1") === 1, "ALL").otherwise(col("l_returnflag")).as("l_returnflag"),
          when(col("__g2") === 1, "ALL").otherwise(col("l_linestatus")).as("l_linestatus"),
          col("sum_qty"), col("sum_disc_price"), col("n_rows"))
        // explicit null placement: Spark defaults NULLS FIRST asc, DuckDB
        // NULLS LAST — a NULL detail value would order differently per
        // engine without this
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    }),

    // --- JSON extraction over the events props column ---------------------
    // `from_json` with a 1-field schema parses each props string ONCE into
    // a struct (get_json_object re-ran a full JSON path query per row —
    // 42 s of the sf0.1 bench; this form is a plain schema projection).
    "q19_json_props" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k",
          from_json(col("props"), "k BIGINT", Map.empty[String, String]).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum("k").as("total_k"),
          min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // --- exact interpolated percentiles per group --------------------------
    // `percentile` (linear interpolation — same formula as DuckDB's
    // quantile_cont) is exact but buffers each group's values: fine for a
    // bounded group count × bounded group size. The 100 TB path is
    // approx_percentile (t-digest sketch, map-side mergeable, bounded
    // memory) — spec-checked against this exact form within rank tolerance.
    "q23_percentiles" -> ((s, dir) => {
      def pct(p: Double) = round(expr(s"percentile(value, $p)"), 6)
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          pct(0.25).as("p25"),
          pct(0.5).as("p50"),
          pct(0.75).as("p75"),
          pct(0.95).as("p95"))
        .orderBy("event_type")
    }),

    // --- pivot: long→wide event-type matrix --------------------------------
    // Explicit pivot value list ⇒ single-pass map-side conditional
    // aggregation (no extra distinct-values job, fixed output schema — the
    // form that scales; an implicit pivot would first collect the distinct
    // event types to the driver).
    "q24_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(
          col("user_bucket"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .orderBy("user_bucket")
    }),

    // --- exact distinct counts (shuffle-dedup) ------------------------------
    // count(distinct x) needs a key shuffle; Spark expands it to a two-level
    // partial/final plan automatically. The 100 TB path is
    // approx_count_distinct (HLL++, map-side mergeable, fixed memory) —
    // pinned within relative error of this exact form in EntrySpec.
    "q25_distinct_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          (count(lit(1)).cast("double") / countDistinct(col("user_id")))
            .as("events_per_user"))
        .orderBy("event_type")
    }),

    // --- ntile decile segmentation -----------------------------------------
    // W-class: equal-height buckets over a global order. Like q14, a global
    // ntile is single-partition by construction; the scale form pre-ranks
    // per key or uses approx quantile cut points. Kept to the small
    // customer dim here.
    "q26_ntile" -> ((s, dir) => {
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"),
          ntile(10).over(w).cast("int").as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal"), 100L).as("total_acctbal"),
          min("c_acctbal").as("min_acctbal"),
          max("c_acctbal").as("max_acctbal"))
        .orderBy("decile")
    }),

    // --- lag/lead day-over-day deltas ---------------------------------------
    // W-class: per-key ordered window (partitioned by event_type — shuffles
    // once on the key, then sorts within partitions; no global window).
    "q27_daily_deltas" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("day")
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"),
          (col("n") - lag("n", 1).over(w)).as("delta_vs_prev"),
          (lead("n", 1).over(w) - col("n")).as("delta_to_next"))
        // drop the per-key first/last rows: null deltas decode to different
        // pandas dtypes (Int64 vs float64) across engines and fail the
        // driver's hash compare even when values agree
        .where(col("delta_vs_prev").isNotNull && col("delta_to_next").isNotNull)
        .orderBy("event_type", "day")
    }),

    // --- as-of join (most recent snapshot at-or-before each event) --------
    // The classic operator Spark has no built-in for. Naive form: a range
    // join (ts >= snap_ts) + argmax — O(events × snapshots-per-user) pair
    // blowup. This is the scale-canonical form instead: UNION the two
    // sides, one shuffle by key, one within-partition sort, and
    // `last(..., ignoreNulls)` over a running frame picks the newest
    // snapshot seen so far — O(n log n) per key, no pair explosion, works
    // at any snapshot density. At equal timestamps the snapshot sorts
    // FIRST (is_snap desc), matching the >= as-of convention. Oracle:
    // DuckDB's native ASOF JOIN — an entirely different algorithm
    // (per-key binary search) that must produce the same rows.
    "q28_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import AsofSnapshots._
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      // deterministic snapshot table: SnapsPerUser per user, staggered
      val snaps = ev.select(col("user_id")).distinct()
        .crossJoin(s.range(SnapsPerUser).select(col("id").as("k")))
        .select(col("user_id"),
          timestamp_seconds(lit(EpochSec) +
            (col("k") * SpacingH + col("user_id") % StaggerModH) * 3600).as("snap_ts"),
          (col("user_id") * ScoreScale + col("k")).as("score"))
      val tagged = snaps.select(col("user_id"), col("snap_ts").as("t"),
          lit(1).as("is_snap"), lit(null).cast("long").as("event_id"),
          col("score"), col("snap_ts"))
        .unionByName(ev.select(col("user_id"), col("ts").as("t"),
          lit(0).as("is_snap"), col("event_id"),
          lit(null).cast("long").as("score"),
          lit(null).cast("timestamp").as("snap_ts")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("t").asc, col("is_snap").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("eff_score", last("score", ignoreNulls = true).over(w))
        .withColumn("eff_snap", last("snap_ts", ignoreNulls = true).over(w))
        .where(col("is_snap") === 0 && col("eff_score").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("eff_score").as("score"), col("eff_snap").as("snap_ts"))
        .orderBy("event_id")
    }),

    // --- exact distinct via custom bitmap aggregate ------------------------
    // bitmap_distinct is a TypedImperativeAggregate: fixed-size BitSet
    // state set map-side, OR-merged across partitions — the bounded-id
    // warehouse trick that replaces count(DISTINCT)'s expand + value
    // re-shuffle with one small buffer per (group × partition). Exact, so
    // the DuckDB count(DISTINCT) oracle must match to the row.
    "q29_bitmap_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          graft.expr.BitmapDistinct.bitmapDistinct(col("user_id"), 1 << 20)
            .as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // --- tumbling 1-hour windows (batch twin of the streaming window) -----
    "q18_hourly_windows" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value"), 100L).as("total_value"))
        .orderBy("hour_us", "event_type")
    }))

  /** The keyset-pagination SERVING form: cursor values arrive from the
    * client as literals, so the page-after predicate reaches the parquet
    * scan (`PushedFilters`) and the plan is filter + TakeOrderedAndProject
    * — O(page) at any table size, no global window, no rank. The q21 map
    * entry is the in-plan twin (cursor derived via a broadcast 1-row
    * cross join) so query CONSTRUCTION stays lazy for tooling.
    */
  def keysetPageAfter(customer: DataFrame, cursorBal: Double, cursorKey: Long,
                      pageSize: Int = 50): DataFrame =
    customer
      .where(col("c_acctbal") < cursorBal ||
        (col("c_acctbal") === cursorBal && col("c_custkey") > cursorKey))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(pageSize)

  val oracles: Map[String, String] = Map(
    // native ASOF JOIN — per-key binary search vs the Spark side's
    // union + running-last window; the same (event → newest snapshot ≤ ts)
    // relation from two unrelated algorithms (constants shared via
    // AsofSnapshots so the two sides cannot drift)
    "q28_asof_join" -> {
      import AsofSnapshots._
      s"""WITH users AS (SELECT DISTINCT user_id FROM events),
         |snaps AS (
         |  SELECT user_id,
         |         make_timestamp(($EpochSec + (k * $SpacingH + user_id % $StaggerModH) * 3600)
         |                        * 1000000) AS snap_ts,
         |         user_id * $ScoreScale + k AS score
         |  FROM users, range($SnapsPerUser) t(k))
         |SELECT e.event_id, e.user_id, s.score, s.snap_ts
         |FROM events e ASOF JOIN snaps s
         |  ON e.user_id = s.user_id AND e.ts >= s.snap_ts
         |ORDER BY e.event_id""".stripMargin
    },

    "q29_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q02_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       sum(l_quantity) AS sum_qty,
         |       ${moneySumSql("l_extendedprice", 100L)} AS sum_base_price,
         |       ${moneySumSql("l_extendedprice * (1.0 - l_discount)", 10000L)} AS sum_disc_price,
         |       ${moneySumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 1000000L)} AS sum_charge,
         |       sum(l_quantity) / count(*) AS avg_qty,
         |       (${moneySumSql("l_extendedprice", 100L)}) / count(*) AS avg_price,
         |       (${moneySumSql("l_discount", 100L)}) / count(*) AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_top_orders" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         |       ${moneySumSql("l_extendedprice * (1.0 - l_discount)", 10000L)} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND o_orderkey = l_orderkey
         |  AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY o_orderkey, order_date
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,

    "q04_region_rollup" ->
      s"""SELECT r_name, count(*) AS n_customers,
         |       ${moneySumSql("c_acctbal", 100L)} AS total_acctbal,
         |       (${moneySumSql("c_acctbal", 100L)}) / count(*) AS avg_acctbal
         |FROM region
         |JOIN nation ON r_regionkey = n_regionkey
         |JOIN customer ON n_nationkey = c_nationkey
         |GROUP BY r_name
         |ORDER BY r_name""".stripMargin,

    "q05_cust_orders" ->
      s"""SELECT c_custkey,
         |       count(o_orderkey) AS n_orders,
         |       ${moneySumSql("o_totalprice", 100L)} AS total_spent,
         |       coalesce(max(o_totalprice), 0.0) AS max_order
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey
         |ORDER BY c_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity = 50)
        |ORDER BY s_suppkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q08_interval_join" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT s.user_id AS user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts_us FROM ev WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, ts_us FROM ev WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts_us > s.ts_us AND p.ts_us <= s.ts_us + 3600000000
        |GROUP BY s.user_id
        |ORDER BY user_id""".stripMargin,

    "q09_window_topk" ->
      """SELECT l_orderkey, rn, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2
        |ORDER BY l_orderkey, rn""".stripMargin,

    "q10_sessionize" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, value, ts_us,
         |         CASE WHEN lag(ts_us) OVER w IS NULL
         |                OR ts_us - lag(ts_us) OVER w > 1800000000
         |              THEN 1 ELSE 0 END AS is_new
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |sessions AS (
         |  SELECT user_id, event_id, value, ts_us,
         |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id,
         |       min(ts_us) AS session_start_us,
         |       count(*) AS n_events,
         |       ${moneySumSql("value", 100L)} AS session_value
         |FROM sessions
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q11_daily_type_agg" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         |       count(*) AS n_events,
         |       ${moneySumSql("value", 100L)} AS total_value,
         |       (${moneySumSql("value", 100L)}) / count(*) AS avg_value
         |FROM events
         |GROUP BY day, event_type
         |ORDER BY day, event_type""".stripMargin,

    "q12_mode_segment" ->
      """SELECT c_nationkey, c_mktsegment, n FROM (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY count(*) DESC, c_mktsegment ASC) AS rn
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |WHERE rn = 1
        |ORDER BY c_nationkey""".stripMargin,

    "q13_trend" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS DOUBLE) AS cnt
        |  FROM events GROUP BY day),
        |agged AS (
        |  SELECT avg(CASE WHEN day < '2024-01-08' THEN cnt END) AS first7_avg,
        |         avg(CASE WHEN day >= '2024-01-24' THEN cnt END) AS last7_avg
        |  FROM daily)
        |SELECT round(first7_avg, 4) AS first7_avg,
        |       round(last7_avg, 4) AS last7_avg,
        |       CASE WHEN last7_avg - first7_avg > 5.0 THEN 'increasing'
        |            WHEN last7_avg - first7_avg < -5.0 THEN 'decreasing'
        |            ELSE 'stable' END AS trend
        |FROM agged""".stripMargin,

    "q14_pagination" ->
      """SELECT rn, c_custkey, c_name, c_acctbal FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rn,
        |         c_custkey, c_name, c_acctbal
        |  FROM customer)
        |WHERE rn BETWEEN 101 AND 150
        |ORDER BY rn""".stripMargin,

    // GROUPING() mirrors the Spark side's subtotal discriminator
    "q22_rollup" ->
      s"""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
         |         AS l_returnflag,
         |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END
         |         AS l_linestatus,
         |       sum(l_quantity) AS sum_qty,
         |       ${moneySumSql("l_extendedprice * (1.0 - l_discount)", 10000L)} AS sum_disc_price,
         |       count(*) AS n_rows
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,

    "q21_keyset_page" ->
      """WITH cur AS (
        |  SELECT c_acctbal, c_custkey FROM customer
        |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 100),
        |last AS (
        |  SELECT c_acctbal AS cb, c_custkey AS ck FROM cur
        |  ORDER BY c_acctbal ASC, c_custkey DESC LIMIT 1)
        |SELECT c_custkey, c_name, c_acctbal
        |FROM customer, last
        |WHERE c_acctbal < cb OR (c_acctbal = cb AND c_custkey > ck)
        |ORDER BY c_acctbal DESC, c_custkey ASC
        |LIMIT 50""".stripMargin,

    "q15_breadcrumb" ->
      """SELECT n_nationkey, r_name || ' > ' || n_name AS breadcrumb
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    // Independent re-derivation of the ≤15-level parent walk: one row per
    // (start, level) in the recursive CTE, final state = max-level row.
    // Stop names are the subset of StateStopNames the planted data can
    // reach; the CASE arithmetic mirrors the Spark-side plant exactly.
    "q15b_breadcrumb_deep" ->
      """WITH RECURSIVE locs AS (
        |  SELECT id,
        |    CASE WHEN id = 0 THEN 'usa'
        |         WHEN id = 5 THEN 'colorado'
        |         WHEN id = 25 THEN ' Utah '
        |         WHEN id = 41 THEN 'COLORADO'
        |         ELSE 'loc_' || CAST(id AS VARCHAR) END AS name,
        |    CASE WHEN id = 0 OR id = 41 THEN NULL
        |         WHEN id BETWEEN 1 AND 20 THEN id - 1
        |         WHEN id = 40 THEN 41
        |         ELSE 10 + id % 5 END AS parent_id
        |  FROM range(60) t(id)),
        |walk(start_id, cursor, path, lvl) AS (
        |  SELECT id,
        |    CASE WHEN lower(trim(name)) IN ('usa','colorado','utah') THEN NULL
        |         ELSE parent_id END,
        |    CASE WHEN lower(trim(name)) IN ('usa','colorado','utah') THEN ''
        |         ELSE name END,
        |    1
        |  FROM locs
        |  UNION ALL
        |  SELECT w.start_id,
        |    CASE WHEN lower(trim(p.name)) IN ('usa','colorado','utah') THEN NULL
        |         ELSE p.parent_id END,
        |    CASE WHEN lower(trim(p.name)) IN ('usa','colorado','utah') THEN w.path
        |         ELSE p.name || ' > ' || w.path END,
        |    w.lvl + 1
        |  FROM walk w JOIN locs p ON w.cursor = p.id
        |  WHERE w.lvl < 15)
        |SELECT start_id AS mp_id, arg_max(path, lvl) AS breadcrumb
        |FROM walk GROUP BY start_id ORDER BY mp_id""".stripMargin,

    "q16_contains_join" ->
      """SELECT token, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM (VALUES ('spark'), ('hash'), ('merge'), ('window'), ('stream')) t(token)
        |CROSS JOIN documents
        |WHERE contains(text, token)
        |GROUP BY token
        |ORDER BY token""".stripMargin,

    "q17_user_rates" ->
      """WITH agged AS (
        |  SELECT user_id,
        |         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
        |         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
        |         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_views, n_purchases, n_errors,
        |       n_purchases * 1000.0 / nullif(CAST(n_views AS DOUBLE), 0.0)
        |         AS purchase_per_1k_views
        |FROM agged
        |ORDER BY user_id""".stripMargin,

    "q20_moving_avg" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY day)
        |SELECT day, n,
        |       avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
        |FROM daily
        |ORDER BY day""".stripMargin,

    "q19_json_props" ->
      """WITH e AS (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(k) AS BIGINT) AS total_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM e
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q25_distinct_users" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       count(*) AS n_events,
        |       CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS events_per_user
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q26_ntile" ->
      s"""WITH deciled AS (
         |  SELECT c_custkey, c_acctbal,
         |         CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INT)
         |           AS decile
         |  FROM customer)
         |SELECT decile, count(*) AS n_customers,
         |       ${moneySumSql("c_acctbal", 100L)} AS total_acctbal,
         |       min(c_acctbal) AS min_acctbal,
         |       max(c_acctbal) AS max_acctbal
         |FROM deciled
         |GROUP BY decile
         |ORDER BY decile""".stripMargin,

    "q27_daily_deltas" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, day, n,
        |         n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta_vs_prev,
        |         lead(n) OVER (PARTITION BY event_type ORDER BY day) - n AS delta_to_next
        |  FROM daily)
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |       CAST(delta_vs_prev AS BIGINT) AS delta_vs_prev,
        |       CAST(delta_to_next AS BIGINT) AS delta_to_next
        |FROM d
        |WHERE delta_vs_prev IS NOT NULL AND delta_to_next IS NOT NULL
        |ORDER BY event_type, day""".stripMargin,

    // quantile_cont uses the same lower+(higher-lower)*frac interpolation as
    // Spark's percentile; rounding to 6 absorbs any last-ulp libm drift
    "q23_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |       round(quantile_cont(value, 0.25), 6) AS p25,
        |       round(quantile_cont(value, 0.50), 6) AS p50,
        |       round(quantile_cont(value, 0.75), 6) AS p75,
        |       round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q24_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
        |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
        |       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
        |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q18_hourly_windows" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
         |       count(*) AS n_events,
         |       ${moneySumSql("value", 100L)} AS total_value
         |FROM events
         |GROUP BY hour_us, event_type
         |ORDER BY hour_us, event_type""".stripMargin)
}
