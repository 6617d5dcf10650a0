package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 coverage widening: relational/functional surfaces the round-1
  * inventory did not yet exercise as first-class query entries — full outer
  * join, pivot/unpivot, exact percentiles, grouping sets, regexp extraction,
  * string/array aggregation, JSON functions, correlated (EXISTS) and scalar
  * subqueries, time-series gap fill, and RANGE-frame sliding windows.
  *
  * All are oracle-checked against DuckDB. SQL-subquery entries run through
  * `spark.sql` over registered views — the same SQL text runs verbatim on
  * both engines, covering the parser/analyzer surface too.
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Parity round shadow — see ColumnFunctions.pround. */
  private def round(c: org.apache.spark.sql.Column, d: Int) =
    graft.functions.ColumnFunctions.pround(c, d)

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Full outer join of two aggregates: per-nation customer vs supplier
    // counts. Both sides are pre-aggregated (shuffle on a 25-key column),
    // so the join is between tiny relations regardless of fact scale.
    ("q69_full_outer", (s: SparkSession, d: String) => {
      val cust = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, Seq("nationkey"), "full_outer")
        .select(col("nationkey").cast("long").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }, Some("""
      WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                 FROM customer GROUP BY 1),
      s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
            FROM supplier GROUP BY 1)
      SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
             COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""")),

    // Pivot: order counts by year × status. Pivot values are pinned
    // (F/O/P) so the plan is a single aggregation — Spark never needs the
    // extra distinct-values job a dynamic pivot would run.
    ("q70_pivot", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .withColumn("year", year(col("o_orderdate")))
        .groupBy(col("year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
    }, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      FROM orders GROUP BY 1""")),

    // Exact percentiles (linear interpolation) — Spark `percentile` and
    // DuckDB `quantile_cont` share the (n-1)·q interpolation rule. One
    // sort-based agg per group; at scale approx_percentile (q37) is the
    // sketch path, this is the exact path.
    ("q71_percentiles", (s: SparkSession, d: String) => {
      // one array-percentile aggregate: a single value digest per group,
      // not four (4 separate percentile() calls each buffer the column)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p75"),
          round(element_at(col("ps"), 4), 4).as("p95"))
    }, Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      FROM lineitem GROUP BY l_returnflag""")),

    // Regexp extraction: first integer and first Capitalized word per doc
    // (both engines return '' on no match; RE2 and java.util.regex agree
    // on this pattern class).
    ("q72_regexp_extract", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_extract(col("text"), "([0-9]+)", 1).as("first_int"),
        regexp_extract(col("text"), "\\b([A-Z][a-z]+)\\b", 1).as("first_cap"))
    }, Some("""
      SELECT doc_id,
             regexp_extract(text, '([0-9]+)', 1) AS first_int,
             regexp_extract(text, '\b([A-Z][a-z]+)\b', 1) AS first_cap
      FROM documents""")),

    // Ordered string aggregation: per-nation roster. collect_list is
    // order-nondeterministic under parallel merge, so the sort happens
    // inside the array before joining — deterministic on any partitioning.
    ("q73_string_agg", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
    }, Some("""
      SELECT c_nationkey, count(*) AS n,
             string_agg(c_name, ',' ORDER BY c_name) AS names
      FROM customer GROUP BY c_nationkey""")),

    // JSON functions: parse the `props` JSON payload ONCE with an explicit
    // schema (from_json) and extract the typed field — one tokenizer pass
    // per row; a get_json_object per field re-parses the payload each time.
    ("q74_json_extract", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .select(from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"),
          col("value"))
        // floor() on both sides: DuckDB CAST(x AS INT) rounds half-away
        // while Spark's cast truncates — floor agrees for non-negative k
        .groupBy(floor(col("k") / 10).cast("int").as("k_decile"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }, Some("""
      SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10.0) AS INTEGER)
               AS k_decile,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1""")),

    // Grouping sets via the typed API (finer than rollup/cube: an explicit
    // lattice subset), with GROUPING() flags to disambiguate rolled-up
    // nulls from data nulls.
    ("q75_grouping_sets", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    // Time-series gap fill: per event type, a dense daily axis spanning
    // min..max date (sequence+explode — the generator side), left-joined
    // to observed daily counts. The dense axis is generated from the tiny
    // per-type span aggregate, never by exploding the fact table.
    ("q76_gap_fill", (s: SparkSession, d: String) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("dt"))
        .groupBy(col("event_type"), col("dt"))
        .agg(count(lit(1)).as("n"))
      val axis = daily.groupBy(col("event_type"))
        .agg(min(col("dt")).as("mind"), max(col("dt")).as("maxd"))
        .select(col("event_type"),
          explode(sequence(col("mind"), col("maxd"))).as("dt"))
      axis.join(daily, Seq("event_type", "dt"), "left_outer")
        .select(col("event_type"),
          date_format(col("dt"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n_events"))
    }, Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS dt, count(*) AS n
        FROM events GROUP BY 1, 2),
      axis AS (
        SELECT event_type,
               CAST(unnest(generate_series(min(dt), max(dt), INTERVAL 1 DAY)) AS DATE) AS dt
        FROM daily GROUP BY event_type)
      SELECT a.event_type, strftime(a.dt, '%Y-%m-%d') AS day,
             COALESCE(d.n, 0) AS n_events
      FROM axis a LEFT JOIN daily d
        ON a.event_type = d.event_type AND a.dt = d.dt""")),

    // RANGE-frame sliding window: 7-day trailing average of daily order
    // revenue, keyed on epoch-day so the frame is a true value range (a
    // missing day shrinks the window — rowsBetween would silently span it).
    ("q77_sliding_window", (s: SparkSession, d: String) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("dt"))
        .agg(sum(col("o_totalprice")).as("total"))
        .withColumn("epoch_day", datediff(col("dt"), lit("1970-01-01")))
      val w = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
      daily.select(
        date_format(col("dt"), "yyyy-MM-dd").as("day"),
        round(col("total"), 2).as("total"),
        round(avg(col("total")).over(w), 2).as("trailing_avg_7d"))
    }, Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS dt, sum(o_totalprice) AS total
        FROM orders GROUP BY 1),
      e AS (SELECT dt, total, datediff('day', DATE '1970-01-01', dt) AS epoch_day FROM daily)
      SELECT strftime(dt, '%Y-%m-%d') AS day, round(total, 2) AS total,
             round(avg(total) OVER (ORDER BY epoch_day
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing_avg_7d
      FROM e""")),

    // Correlated subqueries (EXISTS / NOT EXISTS) through spark.sql —
    // Catalyst rewrites them to semi/anti joins; the identical SQL text is
    // the oracle.
    ("q78_exists_subquery", (s: SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_cust
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        GROUP BY c_mktsegment""")
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderstatus = 'F')
      GROUP BY c_mktsegment""")),

    // Scalar subquery: orders above the global mean price, per priority.
    ("q79_scalar_subquery", (s: SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderpriority""")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_above
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderpriority""")),

    // Unpivot (wide→long melt): one generator pass, no shuffle.
    ("q80_unpivot", (s: SparkSession, d: String) => {
      Tables.part(s, d).unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("p_size"), col("p_retailprice")),
        "metric", "val")
    }, Some("""
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part""")),

    // Sliding (overlapping) time windows: 2-hour windows every hour — each
    // event lands in exactly two windows. The batch twin of the streaming
    // window() surface; the oracle expands the membership set explicitly.
    ("q83_sliding_window", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
    }, Some("""
      WITH expanded AS (
        SELECT unnest([date_trunc('hour', ts),
                       date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
               event_type, value
        FROM events)
      SELECT strftime(ws, '%Y-%m-%d %H:00:00') AS win_start, event_type,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM expanded GROUP BY 1, 2""")),

    // lag/lead windows: per-user deltas between consecutive events (value
    // change and microsecond gap) — the feature-engineering staple.
    ("q88_lag_lead", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        round(col("value") - lag(col("value"), 1).over(w), 2).as("delta_value"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
    }, Some("""
      SELECT event_id, user_id,
             round(value - lag(value) OVER w, 2) AS delta_value,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // Higher-order array functions: L2-normalize embeddings with
    // transform(); spot components + the unit-norm check come back as
    // scalars (array cells don't round-trip the compare harness).
    ("q89_embedding_normalize", (s: SparkSession, d: String) => {
      import graft.functions.VectorFunctions
      val v = VectorFunctions.asDouble(col("embedding"))
      val nrm = VectorFunctions.l2Norm(v)
      val unit = transform(v, x => x / nrm)
      Tables.embeddings(s, d).select(
        col("vec_id"),
        round(element_at(unit, 1), 6).as("c0"),
        round(element_at(unit, 2), 6).as("c1"),
        round(aggregate(unit, lit(0.0), (acc, x) => acc + x * x), 6).as("unit_norm_sq"))
    }, Some("""
      WITH t AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        FROM embeddings),
      u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS unit FROM t)
      SELECT vec_id,
             round(unit[1], 6) AS c0,
             round(unit[2], 6) AS c1,
             round(list_sum(list_transform(unit, x -> x * x)), 6) AS unit_norm_sq
      FROM u""")),

    // Built-in session windows (gap-merged): Spark's session_window
    // operator; the oracle rebuilds identical sessions with the classic
    // gaps-and-islands formulation (a new session starts when the gap
    // reaches the timeout, since [t, t+gap) windows that merely touch do
    // not overlap).
    ("q90_session_window", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"),
          col("n_events"), col("total_value"))
    }, Some("""
      WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM o)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
             strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM s GROUP BY user_id, sid""")),

    // Date arithmetic breadth: month addition (with end-of-month clamping),
    // month end, ISO week truncation, Monday-based weekday — the calendar
    // functions beyond q25's part extraction.
    ("q91_date_math", (s: SparkSession, d: String) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"),
        weekday(col("o_orderdate")).as("wd"))
    }, Some("""
      SELECT o_orderkey,
             strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
             CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd
      FROM orders""")),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other instead of silently dropping — the join dialect a
    // plain equi-join gets wrong on nullable keys.
    ("q94_nullsafe_join", (s: SparkSession, d: String) => {
      val nk = when(col("l_discount") === 0, lit(null)).otherwise(col("l_discount"))
      val t = Tables.lineitem(s, d).select(col("l_returnflag"), nk.as("k"))
      val dim = t.groupBy(col("k")).agg(count(lit(1)).as("n_k"))
        .withColumnRenamed("k", "dk")
      t.join(dim, t("k") <=> dim("dk"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_matched"),
          sum(when(col("k").isNull, 1).otherwise(0)).cast("bigint").as("n_null_matched"))
    }, Some("""
      WITH t AS (SELECT l_returnflag,
                        CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS k
                 FROM lineitem),
      dim AS (SELECT k AS dk, count(*) AS n_k FROM t GROUP BY k)
      SELECT l_returnflag, count(*) AS n_matched,
             CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_matched
      FROM t JOIN dim ON t.k IS NOT DISTINCT FROM dim.dk
      GROUP BY l_returnflag""")),

    // BPE-ish regex tokenization: letter-runs, digit-runs, single symbols —
    // the pre-tokenizer split every BPE implementation starts from.
    ("q81_bpe_tokens", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"))
    }, Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER)
               AS n_bpe_tokens
      FROM documents""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}
