package graft.queries

import graft.Tables
import graft.functions.ColumnFunctions._
import graft.operators.Ranking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator inventory (SURVEY.md §2.2–§2.8) re-expressed over
  * the driver's TPC-H-ish corpus, each with a DuckDB oracle.
  *
  * Conventions for oracle parity:
  *  - every float aggregate is `round`ed identically on both sides (Spark
  *    ROUND = HALF_UP = DuckDB round for our value ranges);
  *  - DuckDB results are cast to Spark's narrower types (`year()` BIGINT→INT,
  *    `sum(int)` HUGEINT→BIGINT) so schemas hash-match;
  *  - every LIMIT/top-k query carries a full deterministic tie-break;
  *  - timestamps in outputs are formatted to strings.
  *
  * Scale notes are on each query; the global ones: all dim joins broadcast
  * (nation 25 / customer 1.5k / supplier 10 rows per sf0.01 — far under the
  * 10 MB auto-broadcast threshold), all aggregations are partial+final
  * HashAggregate, all top-k are TakeOrderedAndProject (no global sort).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Shadows functions.round with the parity round (see
    * ColumnFunctions.pround); the oracle SQL gets the same epsilon injected
    * in [[oracles]], so both engines round the identical shifted value.
    */
  private def round(c: org.apache.spark.sql.Column, d: Int) = pround(c, d)

  /** (name, spark query, optional DuckDB oracle). */
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // ───────── aggregation / scan / filter ─────────

    // TPC-H Q1 shape: scan-filter-agg, the bread-and-butter pipeline.
    // Filter + 5-col projection push into the parquet scan.
    ("q1_agg", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 2) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")),

    // Projection + cast + alias (reference result-shaping, SURVEY §2.2).
    ("q2_project_cast", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"),
        upper(col("l_returnflag")).as("flag"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity) AS INTEGER) AS qty_int,
             round(l_extendedprice * (1 - l_discount), 2) AS net_price,
             upper(l_returnflag) AS flag
      FROM lineitem""")),

    // Conjunctive threshold predicate (extreme-weather shape, §2.2).
    ("q3_filter_conjunction", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(isExtreme(col("l_quantity"), 30, col("l_discount"), 0.05))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem WHERE l_quantity > 30 AND l_discount > 0.05""")),

    // Range + membership predicates (dashboard filter shape, §2.2).
    ("q4_filter_range_in", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate").between("1996-01-01", "1996-12-31") &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_orderpriority""")),

    // Regex validity predicate (RLIKE, §2.2).
    ("q5_filter_rlike", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .filter(col("o_orderpriority").rlike("^[12]-"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders WHERE regexp_matches(o_orderpriority, '^[12]-')
      GROUP BY o_orderpriority""")),

    // Null dialects: the reference has both na.drop and na.fill(0) paths
    // (SURVEY §2.2) — exposed side by side. avg ignores nulls = "drop";
    // coalesce(x,0) = "fill".
    ("q6_null_dialects", (s: SparkSession, d: String) => {
      val nullable = when(col("l_discount") === 0, lit(null)).otherwise(col("l_discount"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), nullable.as("disc"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("disc").isNull, 1).otherwise(0)).cast("bigint").as("n_null"),
          round(avg(col("disc")), 6).as("avg_drop"),
          round(avg(coalesce(col("disc"), lit(0.0))), 6).as("avg_fill"))
    }, Some("""
      SELECT l_returnflag, count(*) AS n_rows,
             CAST(sum(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             round(avg(disc), 6) AS avg_drop,
             round(avg(coalesce(disc, 0.0)), 6) AS avg_fill
      FROM (SELECT l_returnflag,
                   CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS disc
            FROM lineitem)
      GROUP BY l_returnflag""")),

    // ───────── joins ─────────

    // Fact⋈dim⋈dim chain — both dims broadcast; single shuffle for the agg.
    ("q7_join_broadcast", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
    }, Some("""
      SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name""")),

    // Left outer join keeping customers with zero orders (§2.3).
    ("q8_join_left_outer", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("order_count"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
    }, Some("""
      SELECT c_custkey, c_name, count(o_orderkey) AS order_count,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name""")),

    // Left-semi join (EXISTS): lineitems of finished orders.
    ("q9_semi_join", (s: SparkSession, d: String) => {
      val finished = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      Tables.lineitem(s, d)
        .join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    }, Some("""
      SELECT l_returnflag, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
      GROUP BY l_returnflag""")),

    // Left-anti join (NOT EXISTS): customers with no orders.
    ("q10_anti_join", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // CTE top-k semi-join (requirement2_top_districts.sql:30-45 shape):
    // top-5 customers by spend, then their monthly order profile. The 5-row
    // key set broadcasts — no shuffle of the fact side.
    ("q11_topk_semijoin", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
      val spend = o.groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("total"))
      o.transform(f => Ranking.topKSemiJoin(f, spend, Seq("o_custkey"),
          Seq(col("total").desc, col("o_custkey")), 5))
        .groupBy(col("o_custkey"), yearMonth(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("monthly_total"))
    }, Some("""
      WITH top5 AS (
        SELECT o_custkey FROM orders GROUP BY o_custkey
        ORDER BY sum(o_totalprice) DESC, o_custkey LIMIT 5)
      SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS order_month,
             count(*) AS n_orders, round(sum(o_totalprice), 2) AS monthly_total
      FROM orders WHERE o_custkey IN (SELECT o_custkey FROM top5)
      GROUP BY o_custkey, order_month""")),

    // Cross join: small dim grid (scenario-grid shape, §2.3).
    ("q12_cross_join", (s: SparkSession, d: String) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") * 100 + col("n_nationkey")).as("grid_key"))
    }, Some("""
      SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS grid_key
      FROM region CROSS JOIN nation""")),

    // ───────── weather-pipeline analogs (SURVEY §3) ─────────

    // MR job 1 analog (DistrictMonthlyWeather.java:33-146): fact⋈dims +
    // per-(district, year-month) sum/avg. 255 lines of Java+loader → one
    // shuffled agg after broadcast joins.
    ("q13_district_monthly", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("district"), yearMonth(col("o_orderdate")).as("order_month"))
        .agg(
          round(sum(col("l_quantity")), 2).as("total_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          count(lit(1)).as("n_items"))
    }, Some("""
      SELECT n_name AS district, strftime(o_orderdate, '%Y-%m') AS order_month,
             round(sum(l_quantity), 2) AS total_qty,
             round(avg(l_extendedprice), 2) AS avg_price,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      GROUP BY district, order_month""")),

    // MR job 2 analog (HighestPrecipitationMonth.java:89-115): global argmax
    // month. Partial agg per partition → tiny final — no single-reducer
    // bottleneck (the reference forced numReduceTasks=1).
    ("q14_argmax_month", (s: SparkSession, d: String) => {
      Ranking.argmax(Tables.orders(s, d),
        yearMonth(col("o_orderdate")), round(sum(col("o_totalprice")), 2),
        "order_month", "total_price")
    }, Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders GROUP BY order_month
      ORDER BY total_price DESC, order_month LIMIT 1""")),

    // Hive q1 analog (02_query1_top_cities.hql): group-avg + abs-deviation
    // ranking + top-10. TakeOrderedAndProject, no global sort.
    ("q15_abs_deviation_topk", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(avg(col("c_acctbal")), 2).as("avg_acctbal"))
        .withColumn("deviation", round(absDeviation(col("avg_acctbal"), 1000.0), 2))
        .orderBy(col("deviation"), col("n_name"))
        .limit(10)
    }, Some("""
      SELECT n_name, round(avg(c_acctbal), 2) AS avg_acctbal,
             round(abs(round(avg(c_acctbal), 2) - 1000.0), 2) AS deviation
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY deviation, n_name LIMIT 10""")),

    // Hive q2 analog (03_query2_evapotranspiration.hql): grouping on CASE
    // expressions incl. the season-year shift (Jan–Mar → previous year).
    ("q16_seasonal_shift", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
      val m = month(col("o_orderdate"))
      val y = year(col("o_orderdate"))
      o.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), season(m).as("season"), seasonYear(y, m).as("season_year"))
        .agg(round(avg(col("o_totalprice")), 2).as("avg_total"), count(lit(1)).as("n_orders"))
    }, Some("""
      SELECT n_name,
             CASE WHEN month(o_orderdate) IN (1,2,3,9,10,11,12) THEN 'Maha' ELSE 'Yala' END AS season,
             CAST(CASE WHEN month(o_orderdate) IN (1,2,3) THEN year(o_orderdate) - 1
                       ELSE year(o_orderdate) END AS INTEGER) AS season_year,
             round(avg(o_totalprice), 2) AS avg_total,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, season, season_year""")),

    // Spark task 2.3a analog (weather_spark_analysis_new.py:316-328):
    // conditional-count percentage per year×month.
    ("q17_conditional_pct", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mo"))
        .agg(
          count(lit(1)).as("total_items"),
          sum(when(col("l_quantity") > 30, 1).otherwise(0)).as("items_above"),
          round(avg(col("l_quantity")), 2).as("avg_qty"))
        .withColumn("pct_above", round(col("items_above") * 100.0 / col("total_items"), 2))
    }, Some("""
      SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
             CAST(month(l_shipdate) AS INTEGER) AS mo,
             count(*) AS total_items,
             CAST(sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS items_above,
             round(avg(l_quantity), 2) AS avg_qty,
             round(CAST(sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) * 100.0
                   / count(*), 2) AS pct_above
      FROM lineitem GROUP BY yr, mo""")),

    // Spark task 2.3b analog (weather_spark_analysis_new.py:358-402), the
    // hardest reference pipeline: monthly avg → top-3 months per year by
    // window rank → semi-join facts → weekly agg. Top-3 key set broadcasts.
    ("q18_weekly_top_months", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
      val monthly = o.groupBy(col("yr"), col("mo")).agg(avg(col("o_totalprice")).as("avg_total"))
      val top3 = Ranking.topKPerGroup(monthly, Seq(col("yr")),
        Seq(col("avg_total").desc, col("mo")), 3).select("yr", "mo")
      o.join(broadcast(top3), Seq("yr", "mo"))
        .groupBy(col("yr"), col("mo"), weekofyear(col("o_orderdate")).as("wk"), col("o_orderstatus"))
        .agg(
          round(max(col("o_totalprice")), 2).as("max_total"),
          round(avg(col("o_totalprice")), 2).as("avg_total"),
          count(lit(1)).as("n_orders"))
    }, Some("""
      WITH o AS (SELECT *, CAST(year(o_orderdate) AS INTEGER) AS yr,
                        CAST(month(o_orderdate) AS INTEGER) AS mo FROM orders),
      monthly AS (SELECT yr, mo, avg(o_totalprice) AS avg_total FROM o GROUP BY yr, mo),
      top3 AS (SELECT yr, mo FROM (
                 SELECT yr, mo,
                        row_number() OVER (PARTITION BY yr ORDER BY avg_total DESC, mo) AS rnk
                 FROM monthly) WHERE rnk <= 3)
      SELECT o.yr, o.mo, CAST(weekofyear(o.o_orderdate) AS INTEGER) AS wk, o.o_orderstatus,
             round(max(o.o_totalprice), 2) AS max_total,
             round(avg(o.o_totalprice), 2) AS avg_total,
             count(*) AS n_orders
      FROM o JOIN top3 t ON o.yr = t.yr AND o.mo = t.mo
      GROUP BY o.yr, o.mo, wk, o.o_orderstatus""")),

    // ───────── windows / sorts / set ops ─────────

    // Ranked top-N per group with deterministic tie-break (§2.5).
    ("q19_window_topn", (s: SparkSession, d: String) => {
      Ranking.topKPerGroup(Tables.orders(s, d), Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total_price"))
    }, Some("""
      SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey,
             round(o_totalprice, 2) AS total_price
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders)
      WHERE rank <= 3""")),

    // Window frames: running sum + lag/lead per supplier (beyond the
    // reference's ranking-only windows — real frame specs).
    ("q20_window_running", (s: SparkSession, d: String) => {
      // the synthetic corpus has duplicate (orderkey, linenumber) keys at
      // sf0.1, so the price joins the tie-break: rows identical in all
      // ordering columns then have order-invariant window outputs
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_extendedprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_rev"),
        round(lag(col("l_extendedprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("l_extendedprice"), 1).over(w), 2).as("next_price"))
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_extendedprice) OVER w, 2) AS running_rev,
             round(lag(l_extendedprice, 1) OVER w2, 2) AS prev_price,
             round(lead(l_extendedprice, 1) OVER w2, 2) AS next_price
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice)""")),

    // ORDER BY + LIMIT top-k (§2.6) → TakeOrderedAndProject.
    ("q21_orderby_limit", (s: SparkSession, d: String) => {
      Tables.part(s, d)
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(10)
        .select(col("p_partkey"), col("p_name"), round(col("p_retailprice"), 2).as("retail"))
    }, Some("""
      SELECT p_partkey, p_name, round(p_retailprice, 2) AS retail
      FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10""")),

    // Union of heterogeneous inputs with provenance tag (§2.7).
    ("q22_union_tagged", (s: SparkSession, d: String) => {
      val a = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
      val b = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
      a.unionByName(b).groupBy(col("nationkey"), col("side")).agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT nationkey, side, count(*) AS n
      FROM (SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
      GROUP BY nationkey, side""")),

    // Intersect: nations having both customers and suppliers.
    ("q23_intersect", (s: SparkSession, d: String) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
    }, Some("""
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey AS nationkey FROM supplier""")),

    // Except: nations with customers but no suppliers.
    ("q24_except", (s: SparkSession, d: String) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
    }, Some("""
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey AS nationkey FROM supplier""")),

    // ───────── scalar / date functions (§2.8) ─────────

    ("q25_date_parts", (s: SparkSession, d: String) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        weekofyear(col("o_orderdate")).as("wk"),
        quarter(col("o_orderdate")).as("qtr"),
        yearMonth(col("o_orderdate")).as("order_month"))
    }, Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             CAST(day(o_orderdate) AS INTEGER) AS dom,
             CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
             CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             strftime(o_orderdate, '%Y-%m') AS order_month
      FROM orders""")),

    // 3-way severity CASE (requirement4_extreme_weather.sql:52-56 shape).
    ("q26_severity_case", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(severity(col("l_quantity"), 30, col("l_extendedprice"), 40000).as("severity"))
        .agg(count(lit(1)).as("n_items"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"))
    }, Some("""
      SELECT CASE WHEN l_quantity > 45.0 AND l_extendedprice > 52000.0 THEN 'Severe'
                  WHEN l_quantity > 30.0 AND l_extendedprice > 40000.0 THEN 'Moderate'
                  ELSE 'Normal' END AS severity,
             count(*) AS n_items,
             round(avg(l_extendedprice), 2) AS avg_price
      FROM lineitem GROUP BY severity""")),

    // Event-time hourly rollup — batch equivalent of the streaming
    // aggregation (§2.9); also the dashboard date_trunc shape.
    ("q27_events_hourly", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"),
          round(avg(col("value")), 2).as("avg_value"))
    }, Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
             event_type, count(*) AS n_events,
             round(sum(value), 2) AS total_value,
             round(avg(value), 2) AS avg_value
      FROM events GROUP BY hour, event_type""")),

    // Single-pass multi-column whole-table stats (train_et_model.py:276-292
    // did 4 passes; we do one).
    ("q28_stats_single_pass", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d).agg(
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(stddev(col("l_quantity")), 4).as("std_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(stddev(col("l_extendedprice")), 4).as("std_price"),
        count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT round(avg(l_quantity), 4) AS avg_qty,
             round(stddev(l_quantity), 4) AS std_qty,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(stddev(l_extendedprice), 4) AS std_price,
             count(*) AS n_rows
      FROM lineitem""")),

    // Exact count-distinct (27-district scale in the reference; here the
    // part/supp key spaces).
    ("q29_count_distinct", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag""")),

    // ml_feature_statistics analog: per-feature stats via UNPIVOT/stack —
    // one scan, not one scan per feature.
    ("q30_feature_stats", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .selectExpr("stack(3, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, " +
          "'l_discount', l_discount) as (feature, value)")
        .groupBy(col("feature"))
        .agg(
          round(avg(col("value")), 4).as("avg_value"),
          round(stddev(col("value")), 4).as("std_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT feature, round(avg(value), 4) AS avg_value,
             round(stddev(value), 4) AS std_value,
             min(value) AS min_value, max(value) AS max_value, count(*) AS n
      FROM (SELECT 'l_quantity' AS feature, l_quantity AS value FROM lineitem
            UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
      GROUP BY feature""")),

    // Gap-based sessionization (lag + running sum + agg) — the stateful
    // stream op (mapGroupsWithState shape) expressed relationally for the
    // batch/oracle path; the streaming twin lives in graft.streaming.
    ("q31_sessionize", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 14400, 1).otherwise(0))
        .withColumn("sess_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          round(sum(col("value")), 2).as("total_value"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, ts, value,
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                 FROM events),
      f AS (SELECT *, CASE WHEN prev_ts IS NULL
                             OR date_diff('second', prev_ts, ts) > 14400
                           THEN 1 ELSE 0 END AS new_sess FROM e),
      g AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
            FROM f)
      SELECT user_id, sess_id, count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
             round(sum(value), 2) AS total_value
      FROM g GROUP BY user_id, sess_id""")),
  )

  /** Declared outside `entries` purely to keep that literal under compiler
    * limits as the inventory grows.
    */
  val extraEntries: Seq[(String, Q, Option[String])] = Seq(
    // Native argmax aggregate (max_by / arg_max) — the single-agg form of
    // the reference's global-argmax reducer (§2.4).
    ("q32_max_by", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("top_orderkey"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_orderkey"),
          round(max(col("o_totalprice")), 2).as("top_price"))
    }, Some("""
      SELECT o_orderpriority,
             arg_max(o_orderkey, o_totalprice) AS top_orderkey,
             arg_min(o_orderkey, o_totalprice) AS bottom_orderkey,
             round(max(o_totalprice), 2) AS top_price
      FROM orders GROUP BY o_orderpriority""")),
  )

  /** Classic analytical shapes (TPC-H Q3/Q5-like) + multi-grain grouping —
    * the canonical join-heavy benchmark anchors.
    */
  val classicEntries: Seq[(String, Q, Option[String])] = Seq(

    // TPC-H Q3 shape: selective filters on both sides of a fact join,
    // revenue agg, top-10 — filters push into both scans, orders broadcast
    // after filtering.
    ("q33_shipping_priority", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d).filter(col("o_orderdate") < "1996-06-01")
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > "1996-06-01")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"), col("revenue"))
    }, Some("""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_orderpriority,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate < TIMESTAMP '1996-06-01'
        AND l_shipdate > TIMESTAMP '1996-06-01'
      GROUP BY l_orderkey, order_date, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // TPC-H Q5 shape: 5-way star join with a region filter, revenue per
    // nation per year.
    ("q34_local_volume", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }, Some("""
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
      GROUP BY n_name, order_year""")),

    // Multi-grain rollup (beyond the reference's flat GROUP BYs): subtotals
    // per (flag, status), per flag, and grand total in one pass.
    ("q35_rollup", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Cube over two dims (all 4 grouping combinations in one pass).
    ("q36_cube", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // HLL/quantile sketches — the 100 TB cardinality/distribution tools.
    // Sketch internals are engine-specific, but their estimates are
    // DETERMINISTIC for fixed data, so the entry emits the exact values
    // plus within-tolerance booleans the DuckDB oracle replays as TRUE —
    // the whole row hash-checks while still exercising the sketch path
    // (tighter numeric tolerances asserted in SketchSpec).
    ("q37_approx_sketches", (s: SparkSession, d: String) => {
      // separate aggregations: a distinct aggregate in the same agg would
      // force the sketch buffers through the 4-level distinct rewrite
      // (measured 6.3 s -> ~2 s at sf0.1)
      val li = Tables.lineitem(s, d)
      val sketches = li.agg(
        approx_count_distinct(col("l_partkey")).as("apx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99a"))
      // countDistinct split OUT of the percentile aggregate: together they
      // planned a ×2 Expand of the whole table AND funneled the distinct
      // merge through the same single final reducer as the percentile
      // buffer; apart, the distinct goes 2-phase (partial per partition)
      // and the two exact passes materialize concurrently under AQE
      val exactParts = li.select(col("l_partkey")).distinct()
        .agg(count(lit(1)).as("exact_parts"))
      val exactPs = li.agg(
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("ps"))
      sketches.crossJoin(exactParts).crossJoin(exactPs).select(
        col("exact_parts"),
        round(element_at(col("ps"), 1), 2).as("p50_price"),
        round(element_at(col("ps"), 2), 2).as("p99_price"),
        (abs(col("apx") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("approx_distinct_ok"),
        (abs(col("p50a") - element_at(col("ps"), 1)) <= element_at(col("ps"), 1) * 0.02)
          .as("p50_ok"),
        (abs(col("p99a") - element_at(col("ps"), 2)) <= element_at(col("ps"), 2) * 0.02)
          .as("p99_ok"))
    }, Some("""
      SELECT count(DISTINCT l_partkey) AS exact_parts,
             round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_price,
             round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price,
             TRUE AS approx_distinct_ok, TRUE AS p50_ok, TRUE AS p99_ok
      FROM lineitem""")),
  )

  /** Behavioral-analytics shapes over the events/orders tables. */
  val behavioralEntries: Seq[(String, Q, Option[String])] = Seq(

    // Conversion funnel: per-user stage flags -> combination counts.
    ("q57_event_funnel", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("viewed"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("clicked"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchased"))
        .groupBy(col("viewed"), col("clicked"), col("purchased"))
        .agg(count(lit(1)).as("n_users"))
    }, Some("""
      SELECT viewed, clicked, purchased, count(*) AS n_users
      FROM (SELECT user_id,
                   CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INTEGER) AS viewed,
                   CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INTEGER) AS clicked,
                   CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INTEGER) AS purchased
            FROM events GROUP BY user_id)
      GROUP BY viewed, clicked, purchased""")),

    // Cohort retention: customers bucketed by first-order month, order
    // activity per (cohort, month).
    ("q58_order_cohorts", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
      val cohorts = o.groupBy(col("o_custkey"))
        .agg(min(yearMonth(col("o_orderdate"))).as("cohort_month"))
      o.join(cohorts, Seq("o_custkey"))
        .groupBy(col("cohort_month"), yearMonth(col("o_orderdate")).as("order_month"))
        .agg(
          countDistinct(col("o_custkey")).as("active_customers"),
          count(lit(1)).as("n_orders"))
    }, Some("""
      WITH cohorts AS (
        SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m')) AS cohort_month
        FROM orders GROUP BY o_custkey)
      SELECT cohort_month, strftime(o.o_orderdate, '%Y-%m') AS order_month,
             count(DISTINCT o.o_custkey) AS active_customers,
             count(*) AS n_orders
      FROM orders o JOIN cohorts c ON o.o_custkey = c.o_custkey
      GROUP BY cohort_month, order_month""")),

    // Window-function breadth: ntile, percent_rank, first/last value over
    // frames (beyond the reference's ranking-only windows).
    ("q59_window_misc", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2).as("min_price"),
        round(last(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2).as("max_price"))
    }, Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(first_value(o_totalprice) OVER wf, 2) AS min_price,
             round(last_value(o_totalprice) OVER wf, 2) AS max_price
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
             wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // As-of (point-in-time) join: each purchase matched to the user's most
    // recent prior-or-simultaneous click (union+window composition — see
    // operators.AsOfJoin; DuckDB's native ASOF JOIN is the oracle).
    ("q65_asof_join", (s: SparkSession, d: String) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.operators.AsOfJoin
        .joinAsOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_ts", "click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          round(col("click_value"), 2).as("click_value"))
    }, Some("""
      WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, value AS cvalue
            FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
             strftime(c.cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
             round(c.cvalue, 2) AS click_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.cts""")),

    // Range join via bucket decomposition (operators.RangeJoin): orders
    // classified into price bands — the banded equi-join replaces the
    // BroadcastNestedLoopJoin a naive inequality join would plan.
    ("q66_range_join", (s: SparkSession, d: String) => {
      import s.implicits._
      val bands = Seq(
        ("tiny", 0.0, 50000.0), ("small", 50000.0, 150000.0),
        ("medium", 150000.0, 300000.0), ("large", 300000.0, 1e9))
        .toDF("band", "lo", "hi")
      graft.operators.RangeJoin
        .byBucket(Tables.orders(s, d), "o_totalprice", bands, "lo", "hi", 50000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
    }, Some("""
      WITH bands(band, lo, hi) AS (VALUES
        ('tiny', 0.0, 50000.0), ('small', 50000.0, 150000.0),
        ('medium', 150000.0, 300000.0), ('large', 300000.0, 1e9))
      SELECT band, count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
      FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band""")),
  )

  val queries: Map[String, Q] =
    (entries ++ extraEntries ++ classicEntries ++ behavioralEntries)
      .map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] =
    (entries ++ extraEntries ++ classicEntries ++ behavioralEntries)
      .collect { case (n, _, Some(sql)) =>
        n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
      }.toMap
}
