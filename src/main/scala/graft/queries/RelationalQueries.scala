package graft.queries

import graft.GraftSession.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core of the engine (SURVEY.md §2 B): scans with
  * pushdown, aggregations, the join family, windows, rollup,
  * date/string/conditional expressions. All declarative DataFrame
  * plans — Catalyst handles pushdown/pruning/join selection; AQE
  * handles skew and partition sizing at scale.
  *
  * Every double aggregate is rounded identically on the Spark and
  * oracle side so summation-order ulp drift cannot flip the
  * driver's hash compare.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // B2/B3: TPC-H Q1-style pricing summary — multi-key groupBy,
    // map-side-combinable aggs over the biggest table.
    Q("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // B2: global single-pass stats incl. exact distinct count.
    Q("agg_global_stats",
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  round(sum(l_extendedprice), 2) AS total_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice")), 2).as("total_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
    },

    // B4/B8/B16: TPC-H Q3-style — 3-way join, agg, deterministic
    // top-N (unique tie-break on l_orderkey). customer is small →
    // broadcast side; orders⋈lineitem shuffles on the key.
    Q("q3_shipping_priority",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val customer = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val lineitem = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // B7: TPC-H Q5-style 6-way join with co-located-nation predicate.
    // region/nation/supplier/customer are dims → broadcast chain; the
    // only big shuffle is orders⋈lineitem.
    Q("q5_region_revenue",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    },

    // B5: left outer join preserving order-less customers.
    Q("left_join_customer_orders",
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("total_spent"))
    },

    // B5b: FULL OUTER join — two partial per-nation rollups (top
    // customer balances vs top supplier balances) whose nation
    // coverage only partly overlaps, so unmatched rows survive from
    // BOTH sides. Both inputs are group-rollups (nation-sized), so
    // the outer join is dimension×dimension at any corpus scale.
    Q("full_join_rich_accounts",
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |      FROM customer WHERE c_acctbal > 9900 GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
        |ON c.nationkey = s.nationkey""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("c_nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = table(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("s_nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
          col("n_cust"), col("n_supp"))
    },

    // B6: left-semi join (EXISTS).
    Q("semi_join_ordered_customers",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin) { (s, dir) =>
      val big = table(s, dir, "orders").filter(col("o_totalprice") > 400000)
      table(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },

    // B6: left-anti join (NOT EXISTS).
    Q("anti_join_quiet_customers",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin) { (s, dir) =>
      val big = table(s, dir, "orders").filter(col("o_totalprice") > 400000)
      table(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // B8: deterministic top-N with unique tie-break.
    Q("topn_customers",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // B10: union + agg.
    Q("union_nation_population",
      """SELECT nationkey, count(*) AS n_parties FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(table(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_parties"))
    },

    // B11: ranking window — top supplier per nation.
    Q("window_top_supplier_per_nation",
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal FROM (
        |  SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey
        |                       ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM supplier) WHERE rn = 1""".stripMargin) { (s, dir) =>
      // k=1 per nation through TopKPerKey — 25 nations would pin the
      // row_number window to 25 full-sort tasks at any scale; the
      // bounded heap keeps one row per nation map-side.
      graft.plans.TopK.perKey(table(s, dir, "supplier"),
          Seq("s_nationkey"), Seq(("s_acctbal", false), ("s_suppkey", true)), 1)
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
    },

    // B40: bucketed co-located join — both sides written as
    // bucketed+sorted tables on the join key (the write-time
    // shuffle), then joined with NO runtime exchange on either side;
    // the only shuffle in the whole plan is the 5-row mktsegment
    // rollup. BucketingSpec asserts the exchange-free plan shape;
    // this row pins the result against the plain-join oracle.
    Q("bucketed_join_mktsegment",
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      import graft.sources.Bucketing
      Bucketing.writeBucketed(
        table(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
        "graft_b_orders", "o_custkey", 16)
      Bucketing.writeBucketed(
        table(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "graft_b_customer", "c_custkey", 16)
      Bucketing.bucketJoin(s, "graft_b_orders", "graft_b_customer",
          "o_custkey", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    },

    // B42: z-order (Morton) values — the multi-dimensional layout
    // key behind writeZOrdered's file skipping (ZOrderSpec measures
    // the pruning). The Spark side is a pure composition of native
    // bitwise column ops (fully codegen); the oracle replays the same
    // mask cascade in DuckDB, pinning bit-exactness.
    Q("zorder_values", {
      def step(shift: Int, mask: Long) =
        s"(x | (x << $shift)) & $mask AS x, (y | (y << $shift)) & $mask AS y"
      s"""WITH c AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(l_orderkey % 1024 AS BIGINT) AS x,
         |    CAST(l_partkey % 1024 AS BIGINT) AS y
         |  FROM lineitem),
         |s1 AS (SELECT l_orderkey, l_linenumber, ${step(16, 281470681808895L)} FROM c),
         |s2 AS (SELECT l_orderkey, l_linenumber, ${step(8, 71777214294589695L)} FROM s1),
         |s3 AS (SELECT l_orderkey, l_linenumber, ${step(4, 1085102592571150095L)} FROM s2),
         |s4 AS (SELECT l_orderkey, l_linenumber, ${step(2, 3689348814741910323L)} FROM s3),
         |s5 AS (SELECT l_orderkey, l_linenumber, ${step(1, 6148914691236517205L)} FROM s4)
         |SELECT l_orderkey, l_linenumber, x | (y << 1) AS z FROM s5""".stripMargin
    }) { (s, dir) =>
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        graft.sources.ZOrder.zValue(
          col("l_orderkey") % 1024, col("l_partkey") % 1024).as("z"))
    },

    // B41: runtime bloom-filter join pruning — the semi-join-pushdown
    // primitive. The selective dim filter (top ~20% of orders) builds
    // a 128 KiB bloom of its join keys in one agg; the single-row
    // broadcast prunes fact rows BEFORE the join exchange, so the
    // shuffle carries ~selectivity·|fact| rows instead of all of
    // them. False positives die in the exact join that follows;
    // false negatives are impossible — the oracle is the plain join.
    // The probe is a codegen expression on the scan (BloomFilter
    // .scala); at local scale the dim broadcasts anyway, but at
    // 100 TB (dim over the broadcast threshold → SMJ) this filter is
    // what keeps the fact exchange small.
    Q("bloom_pruned_join",
      """SELECT o_orderpriority,
        |  count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      import graft.functions.BloomFilter
      val dim = table(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val fact = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      BloomFilter.pruned(fact, "l_orderkey", dim, "o_orderkey")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("qty"))
    },

    // B11: running aggregate window. The running sum is evaluated in
    // identical frame order on both engines → bit-identical doubles.
    Q("window_running_revenue",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  lag(o_orderkey) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(run), 2).as("running_total"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
    },

    // B12: conditional aggregation.
    Q("conditional_agg_orders",
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_value
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0)), 2).as("finished_value"))
    },

    // B13: date functions — monthly sales.
    Q("date_trunc_monthly_sales",
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY date_trunc('month', o_orderdate)""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    },

    // B14: string functions.
    Q("string_funcs_parts",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin) { (s, dir) =>
      table(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
    },

    // B15: post-aggregation filter (HAVING).
    Q("having_big_customers",
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING sum(o_totalprice) > 3500000""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"),
          sum(col("o_totalprice")).as("_raw_total"))
        .filter(col("_raw_total") > 3500000)
        .drop("_raw_total")
    },

    // B17: rollup with subtotals + grand total (grouping nulls
    // coalesced to a sentinel so the subtotal rows are unambiguous).
    Q("rollup_order_value",
      """SELECT coalesce(o_orderpriority, '(all)') AS priority,
        |  coalesce(o_orderstatus, '(all)') AS status,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS value
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("value"))
        .select(
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          col("n_orders"), col("value"))
    },

    // B18: approx_count_distinct under the oracle — the estimate is
    // engine-specific, but the exact distincts plus a relative-error
    // bound on the estimate (rsd is 5%; gate at 10%) are checkable.
    Q("approx_distinct_parts",
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        |  CAST(1 AS INT) AS approx_parts_ok,
        |  CAST(1 AS INT) AS approx_supps_ok
        |FROM lineitem""".stripMargin) { (s, dir) =>
      def ok(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        when(abs(approx - exact).cast("double") / exact <= 0.1, 1).otherwise(0).cast("int")
      // Two countDistinct on DIFFERENT columns in one agg would plan
      // an Expand (every row duplicated per distinct column) — at
      // scale that multiplies shuffle volume. Three pruned
      // single-column passes (each with map-side partial distinct)
      // joined on their 1-row results shuffle only distinct keys.
      val li = table(s, dir, "lineitem")
      val ep = li.select(col("l_partkey")).distinct()
        .agg(count(lit(1)).as("exact_parts"))
      val es = li.select(col("l_suppkey")).distinct()
        .agg(count(lit(1)).as("exact_supps"))
      val sk = li.agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey")).as("asupp"))
      ep.crossJoin(es).crossJoin(sk)
        .select(col("exact_parts"), col("exact_supps"),
          ok(col("ap"), col("exact_parts")).as("approx_parts_ok"),
          ok(col("asupp"), col("exact_supps")).as("approx_supps_ok"))
    },

    // B13b: date-part extraction.
    Q("date_parts_orders",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow -- duckdb 0=Sun; spark 1=Sun
        |FROM orders""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"))
    },

    // B2b: histogram binning over a continuous measure.
    Q("histogram_order_value",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("bigint").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
    },

    // A2: JSON field extraction from the raw props string.
    Q("json_extract_props",
      """SELECT event_id,
        |  CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
        |FROM events""".stripMargin) { (s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
    },

    // A1: schema-full JSON parse (from_json) then aggregate.
    Q("json_parse_events",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '"k"\s*:\s*(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .withColumn("parsed", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("parsed.k")).as("sum_k"))
    })
}
