package graft.queries

import graft.Tables
import graft.core._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 window / rolling / aligned analytics + §2.3 fill/shift.
  * Every window here is keyed (partitioned) — the scale path — while the
  * library also supports the reference's whole-frame form.
  */
object WindowQueries extends QueryPack {
  import Exact._

  def queries: Seq[Query] = Seq(
    // §2.5 Align() — aggregate broadcast back to every row = window
    // aggregate; deviation from the nation mean balance.
    Query(
      "q21_align_window",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
        cust.groupBy("c_nationkey").align.reduceWith(Seq(
            "nat_sum" -> sum(dec(col("c_acctbal"))),
            "nat_cnt" -> count(col("c_acctbal"))))
          .withCol("dev_from_nation_mean",
            col("c_acctbal") - col("nat_sum").cast("double") / col("nat_cnt"))
          .out.select("c_custkey", "c_nationkey", "dev_from_nation_mean")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
               c_acctbal - CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                OVER (PARTITION BY c_nationkey) AS DOUBLE)
                           / count(c_acctbal) OVER (PARTITION BY c_nationkey)
               AS dev_from_nation_mean
        FROM customer
        ORDER BY c_custkey
      """)),

    // §2.6 RollingN per key: 3-order rolling spend per customer;
    // incomplete tail windows ⇒ null.
    Query(
      "q22_rolling_n",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        Rolling.rollingN(orders, 3, "o_totalprice",
            c => sum(dec(c)), "rolling3_spend",
            partitionBy = Seq("o_custkey"), finish = _.cast("double"))
          .out.select("o_orderkey", "o_custkey", "rolling3_spend")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CASE WHEN count(*) OVER w = 3
                    THEN CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               END AS rolling3_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
        ORDER BY o_orderkey
      """)),

    // §2.6 RollingDuration [t, t+1h) per user over the event stream —
    // range frame on microseconds, left-inclusive right-exclusive.
    Query(
      "q23_rolling_duration",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
        Rolling.rollingDuration(ev, "ts", 3600000000L, "value",
            c => sum(dec(c)), "next_hour_value",
            partitionBy = Seq("user_id"), finish = _.cast("double"))
          .out.select("event_id", "user_id", "next_hour_value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN CURRENT ROW AND 3599999999 FOLLOWING) AS DOUBLE)
               AS next_hour_value
        FROM events
        ORDER BY event_id
      """)),

    // §2.6 CumSum per customer in date order; nulls contribute 0.
    Query(
      "q24_cumsum",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
          .withCol("tp", dec(col("o_totalprice")))
        Analytics.cumSum(orders, "tp", "cum_spend", partitionBy = Seq("o_custkey"))
          .withCol("cum_spend", col("cum_spend").cast("double"))
          .out.select("o_orderkey", "o_custkey", "cum_spend")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cum_spend
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.3 Shift(n): previous event value per user (lag).
    Query(
      "q25_shift",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
          .sort(Sorter("ts"), Sorter("event_id"))
        Analytics.shift(ev, "value", 1, "prev_value", partitionBy = Seq("user_id"))
          .out.select("event_id", "user_id", "value", "prev_value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, value,
               lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events
        ORDER BY event_id
      """)),

    // §2.6 dense Rank with tada null semantics (null in ⇒ null out, rank
    // counts only non-null values), keyed by return flag.
    Query(
      "q26_rank_dense",
      (s, dir) => {
        val li0 = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                  nullif(col("l_quantity"), lit(10.0)).as("qty"))
        val li = TadaFrame.ingest(li0)
        // the BY-VALUE form (r12): identical semantics to rankDense,
        // but the ordered window runs over the ~50-value quantity
        // vocabulary instead of sorting every row in 3 flag partitions
        // (100× probe: 32.4 s → vocabulary-sized); oracle unchanged
        Analytics.rankDenseByValue(li, "qty", "qty_rank", partitionBy = Seq("l_returnflag"))
          .out.select("l_orderkey", "l_linenumber", "l_returnflag", "qty_rank")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CASE WHEN qty IS NULL THEN NULL
                    ELSE dense_rank() OVER (PARTITION BY l_returnflag
                                            ORDER BY qty ASC NULLS FIRST)
                         - max(CASE WHEN qty IS NULL THEN 1 ELSE 0 END)
                             OVER (PARTITION BY l_returnflag)
               END AS qty_rank
        FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
                     NULLIF(l_quantity, 10.0) AS qty
              FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
      """)),

    // §2.6 exclusive Percentile: fraction of non-null values strictly
    // below — (min_rank - 1) / n_nonnull, NOT percent_rank/cume_dist.
    Query(
      "q27_percentile_excl",
      (s, dir) => {
        val li0 = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                  nullif(col("l_quantity"), lit(10.0)).as("qty"))
        val li = TadaFrame.ingest(li0)
        // BY-VALUE form (r12): same integer numerator/denominator as
        // percentile, so the doubles are bit-identical — the oracle
        // hash-matches either way (see Analytics.percentileByValue)
        Analytics.percentileByValue(li, "qty", "qty_pct", partitionBy = Seq("l_returnflag"))
          .out.select("l_orderkey", "l_linenumber", "l_returnflag", "qty_pct")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CASE WHEN qty IS NULL THEN NULL
                    ELSE CAST(rank() OVER (PARTITION BY l_returnflag
                                           ORDER BY qty ASC NULLS FIRST)
                              - sum(CASE WHEN qty IS NULL THEN 1 ELSE 0 END)
                                  OVER (PARTITION BY l_returnflag)
                              - 1 AS DOUBLE)
                         / count(qty) OVER (PARTITION BY l_returnflag)
               END AS qty_pct
        FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
                     NULLIF(l_quantity, 10.0) AS qty
              FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
      """)),

    // §2.6 Bin: left-exclusive right-inclusive edges with auto "lo-hi"
    // labels, aggregated to bin counts.
    Query(
      "q28_bin",
      (s, dir) => {
        val li = TadaFrame.ingest(Tables.lineitem(s, dir))
        Analytics.bin(li, "l_quantity", Seq(0.0, 10.0, 20.0, 30.0, 40.0, 50.0), "qty_bin")
          .groupBy("qty_bin").reduceWith(Seq("n" -> count(lit(1))))
          .out.orderBy("qty_bin")
      },
      Some("""
        SELECT CASE WHEN l_quantity > 0 AND l_quantity <= 10 THEN '0-10'
                    WHEN l_quantity > 10 AND l_quantity <= 20 THEN '10-20'
                    WHEN l_quantity > 20 AND l_quantity <= 30 THEN '20-30'
                    WHEN l_quantity > 30 AND l_quantity <= 40 THEN '30-40'
                    WHEN l_quantity > 40 AND l_quantity <= 50 THEN '40-50'
               END AS qty_bin,
               count(*) AS n
        FROM lineitem
        GROUP BY 1
        ORDER BY qty_bin
      """)),

    // §2.6 PercentileBin: bin the exclusive percentile into quartiles —
    // left-INclusive right-EXclusive (opposite edge rule of Bin).
    Query(
      "q29_percentile_bin",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
        Analytics.percentileBin(o, "o_totalprice", Seq(0, 0.25, 0.5, 0.75, 1.0),
            "price_quartile", partitionBy = Seq("o_orderstatus"))
          .groupBy("o_orderstatus", "price_quartile")
          .reduceWith(Seq("n" -> count(lit(1))))
          .out.orderBy("o_orderstatus", "price_quartile")
      },
      Some("""
        SELECT o_orderstatus,
               CASE WHEN pct >= 0 AND pct < 0.25 THEN '0-0.25'
                    WHEN pct >= 0.25 AND pct < 0.5 THEN '0.25-0.5'
                    WHEN pct >= 0.5 AND pct < 0.75 THEN '0.5-0.75'
                    WHEN pct >= 0.75 AND pct < 1.0 THEN '0.75-1'
               END AS price_quartile,
               count(*) AS n
        FROM (SELECT o_orderstatus,
                     CAST(rank() OVER (PARTITION BY o_orderstatus
                                       ORDER BY o_totalprice ASC NULLS FIRST) - 1 AS DOUBLE)
                     / count(o_totalprice) OVER (PARTITION BY o_orderstatus) AS pct
              FROM orders)
        GROUP BY o_orderstatus, 2
        ORDER BY o_orderstatus, price_quartile
      """)),

    // §2.6 Resample by calendar month (date_trunc) with exact sums.
    Query(
      "q30_resample_month",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
        Analytics.resample(o, "o_orderdate", "month", "order_month")
          .groupBy("order_month")
          .reduceWith(Seq("n" -> count(lit(1)), "revenue" -> dsum(col("o_totalprice"))))
          .out.orderBy("order_month")
      },
      Some(s"""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               count(*) AS n, ${sqlDsum("o_totalprice")} AS revenue
        FROM orders
        GROUP BY 1
        ORDER BY order_month
      """)),

    // §2.6 Resample by arbitrary duration (15-minute floor) on the event
    // stream — the streaming tumbling-window shape, batch form.
    Query(
      "q31_resample_duration",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
        Analytics.resampleDuration(ev, "ts", 900000000L, "bucket")
          .groupBy("bucket")
          .reduceWith(Seq("n" -> count(lit(1)), "v" -> dsum(col("value"))))
          .out.orderBy("bucket")
      },
      Some(s"""
        SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
               count(*) AS n, ${sqlDsum("value")} AS v
        FROM events
        GROUP BY 1
        ORDER BY bucket
      """)),

    // §2.6 Resample by week with an arbitrary start day (Wednesday):
    // the reference accepts all seven time.Weekday values
    // (internal.go:2432-2438) — any start reduces to Monday-truncation
    // by a (8 − isoDay) mod 7 day shift, applied and reversed around
    // date_trunc on both engines.
    Query(
      "q78_resample_weekstart",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
        Analytics.resample(o, "o_orderdate", "week", "order_week",
            weekStart = "WEDNESDAY")
          .groupBy("order_week")
          .reduceWith(Seq("n" -> count(lit(1)), "revenue" -> dsum(col("o_totalprice"))))
          .out.orderBy("order_week")
      },
      Some(s"""
        SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 DAY)
                 - INTERVAL 5 DAY AS order_week,
               count(*) AS n, ${sqlDsum("o_totalprice")} AS revenue
        FROM orders
        GROUP BY 1
        ORDER BY order_week
      """)),

    // §1.4 FillNull forward-fill per user: running last(ignoreNulls).
    Query(
      "q32_fillnull_ffill",
      (s, dir) => {
        val ev0 = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
                  when(col("value") < 5, lit(null)).otherwise(col("value")).as("v"))
        val ev = TadaFrame.ingest(ev0).sort(Sorter("ts"), Sorter("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Long.MinValue, 0)
        ev.withCol("v_filled", last(col("v"), ignoreNulls = true).over(w))
          .out.select("event_id", "user_id", "v", "v_filled")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, v,
               last_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM (SELECT event_id, user_id, ts,
                     CASE WHEN value < 5 THEN NULL ELSE value END AS v
              FROM events)
        ORDER BY event_id
      """)),

    // §2.7 multi-key stable Sort (nulls last both directions) + Head —
    // TopK plan, no global row-number.
    Query(
      "q33_sort_head",
      (s, dir) => {
        val li0 = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                  nullif(col("l_quantity"), lit(25.0)).as("qty"))
        TadaFrame.ingest(li0)
          .sort(Sorter("l_returnflag", descending = true), Sorter("qty"),
                Sorter("l_orderkey"), Sorter("l_linenumber"))
          .head(1000)
          .out.select("l_orderkey", "l_linenumber", "l_returnflag", "qty")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_returnflag, NULLIF(l_quantity, 25.0) AS qty
        FROM lineitem
        ORDER BY l_returnflag DESC NULLS LAST, qty ASC NULLS LAST,
                 l_orderkey, l_linenumber
        LIMIT 1000
      """)),

    // §2.3 Head/Range positional slicing: rows [50, 100) in sort order.
    Query(
      "q34_range",
      (s, dir) => {
        val li = TadaFrame.ingest(Tables.lineitem(s, dir))
          .sort(Sorter("l_orderkey"), Sorter("l_linenumber"))
        li.range(50, 100)
          .out.select("l_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 50 OFFSET 50
      """)),

    // §2.9 ValueCounts: stringified value → count.
    Query(
      "q35_value_counts",
      (s, dir) => {
        val p = TadaFrame.ingest(Tables.part(s, dir))
        p.groupBy("p_brand").reduceWith(Seq("n" -> count(lit(1))))
          .out.orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand ORDER BY p_brand
      """)),

    // §2.6 WHOLE-FRAME CumSum (empty partitionBy) — executes the r13
    // chunked prefix plan (graft.core.Prefix.cumSum: order-monotone width
    // buckets + tiny-frame carry), which until r14 had no registered
    // oracle entry (r13 verdict item 5): the driver gate only ran the
    // per-key window forms.
    Query(
      "q101_cumsum_frame",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
          .withCol("tp", dec(col("o_totalprice")))
        Analytics.cumSum(orders, "tp", "running_total")
          .withCol("running_total", col("running_total").cast("double"))
          .out.select("o_orderkey", "running_total")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(sum(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)), 0)) OVER
                 (ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.3 WHOLE-FRAME Shift(3) — Prefix.shift's chunked carry plan
    // (cross-chunk lag assembled from the previous chunks' tails).
    Query(
      "q102_shift_frame",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
          .sort(Sorter("ts"), Sorter("event_id"))
        Analytics.shift(ev, "value", 3, "prev3_value")
          .out.select("event_id", "value", "prev3_value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, value,
               lag(value, 3) OVER (ORDER BY ts ASC NULLS LAST, event_id) AS prev3_value
        FROM events
        ORDER BY event_id
      """)),

    // §2.3 WHOLE-FRAME forward fill — Prefix.fill's chunked
    // last-non-null carry plan. events.value carries no nulls in the
    // driver data, so ~14% are punched out deterministically first.
    Query(
      "q103_ffill_frame",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
          .withCol("value",
            when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
          .sort(Sorter("ts"), Sorter("event_id"))
        ev.fillNull(Map("value" -> FillNullHow.Forward))
          .out.select("event_id", "value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                          IGNORE NULLS) OVER
                 (ORDER BY ts ASC NULLS LAST, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        FROM events
        ORDER BY event_id
      """)),

    // §2.5 SORTED-frame groupBy reduce with the result ORDER observable
    // (r14 chunked-ordinal machinery under the driver gate — r14 verdict
    // item 1): the frame is date-sorted, so group order = each customer's
    // FIRST APPEARANCE in date order (internal.go:1399-1424), ranked via
    // TadaGrouped.repAgg/rankRep on the reduced output. head(500) makes
    // the rank order load-bearing — the SELECTED SET of customers is
    // wrong if the ordinal machinery is. Oracle mirrors the appearance
    // rank as min((date, orderkey)) — a tuple min, exact at ANY key
    // scale (ADVICE r15: the earlier date·1e10+key encoding silently
    // corrupted once o_orderkey exceeded 10^10).
    Query(
      "q104_sorted_group_order",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        o.groupBy("o_custkey")
          .reduceWith(Seq("spend" -> dsum(col("o_totalprice"))))
          .head(500)
          .out.select("o_custkey", "spend")
          .orderBy("o_custkey")
      },
      Some(s"""
        SELECT o_custkey, spend FROM (
          SELECT o_custkey, ${sqlDsum("o_totalprice")} AS spend,
                 min(ROW(CAST(o_orderdate AS DATE), o_orderkey)) AS first_app
          FROM orders GROUP BY o_custkey
          ORDER BY first_app LIMIT 500)
        ORDER BY o_custkey
      """)),

    // §2.5 SORTED-frame positional picks (First/Last/Nth) — in-group
    // positions follow the FRAME order (the ship-date sort), computed by
    // the r14 partition-local window (groupers.go:188-200); OOB ⇒ null
    // (suppliers with < 3 rows get null third_price).
    Query(
      "q105_sorted_positional",
      (s, dir) => {
        val li = TadaFrame.ingest(Tables.lineitem(s, dir))
          .sort(Sorter("l_shipdate"), Sorter("l_orderkey"), Sorter("l_linenumber"))
        TadaGrouped(li, Seq("l_suppkey"), aligned = false)
          .positional(Seq(
            ("first_price", "l_extendedprice", 0),
            ("last_price", "l_extendedprice", -1),
            ("third_price", "l_extendedprice", 2)))
          .out.select("l_suppkey", "first_price", "last_price", "third_price")
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey,
               max(CASE WHEN rn = 1 THEN p END) AS first_price,
               max(CASE WHEN rn = cnt THEN p END) AS last_price,
               max(CASE WHEN rn = 3 THEN p END) AS third_price
        FROM (SELECT l_suppkey, l_extendedprice AS p,
                     row_number() OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
                     count(*) OVER (PARTITION BY l_suppkey) AS cnt
              FROM lineitem)
        GROUP BY l_suppkey
        ORDER BY l_suppkey
      """)),

    // §2.6 WHOLE-FRAME RollingN — executes Prefix.rollingN's chunked
    // head-carry plan (r14; groupers.go:295-314): rows near each chunk's
    // end rebuild their window from the following chunks' heads;
    // incomplete frame tail ⇒ null.
    Query(
      "q106_rolling_frame",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
          .sort(Sorter("ts"), Sorter("event_id"))
        Rolling.rollingN(ev, 4, "value", c => sum(dec(c)), "roll4",
            finish = _.cast("double"))
          .out.select("event_id", "roll4")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               CASE WHEN count(*) OVER w = 4
                    THEN CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               END AS roll4
        FROM events
        WINDOW w AS (ORDER BY ts ASC NULLS LAST, event_id
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
        ORDER BY event_id
      """)),

    // §2.6 CumSum OVERWRITING its own sort key — the anchored re-entry
    // path: the order is first materialized into the banded chunked
    // ordinal (TadaFrame.anchored → Prefix.materializeOrd), then the
    // chunked prefix plan re-enters on the ingest-order chunking of that
    // ordinal. Unique (tp, o_orderkey) sort keeps ties deterministic on
    // both engines.
    Query(
      "q107_cumsum_overwrite_key",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
          .withCol("tp", dec(col("o_totalprice")))
          .sort(Sorter("tp"), Sorter("o_orderkey"))
        Analytics.cumSum(o, "tp", "tp")
          .withCol("tp", col("tp").cast("double"))
          .out.select("o_orderkey", "tp")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(sum(tp0) OVER (ORDER BY tp0 ASC NULLS LAST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS tp
        FROM (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS tp0
              FROM orders)
        ORDER BY o_orderkey
      """)),

    // §2.6 WHOLE-FRAME cumsum over a STRING-sorted frame (r17): before
    // the binary-prefix string image (Prefix.stringImageExpr) this plan
    // fell to the single-partition global window; c_name is the
    // high-cardinality shared-prefix shape ("Customer#000000123" — the
    // lcp-strip window reads the digit tail). Both engines compare
    // strings byte-lexicographically, so the oracle replays the order
    // exactly.
    Query(
      "q108_cumsum_string_key",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
          .sort(Sorter("c_name"), Sorter("c_custkey"))
          .withCol("ab", dec(col("c_acctbal")))
        Analytics.cumSum(cust, "ab", "running_bal")
          .withCol("running_bal", col("running_bal").cast("double"))
          .out.select("c_custkey", "running_bal")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               CAST(sum(COALESCE(CAST(c_acctbal AS DECIMAL(18,2)), 0)) OVER
                 (ORDER BY c_name ASC NULLS LAST, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_bal
        FROM customer
        ORDER BY c_custkey
      """)),

    // §2.6 dense Rank over a NEAR-UNIQUE column (r18): l_extendedprice
    // is continuous, so the distinct frame is corpus-sized and the
    // by-value plan buys nothing — the dispatcher routes to the CHUNKED
    // value-axis plan (Analytics.rankDenseChunked: width-bucket by
    // value, per-chunk dense_rank, prefix of per-chunk distinct counts)
    // instead of the pre-r18 single-partition global window — the last
    // global-window shape a user query could hit. Nulls punched
    // deterministically to exercise null-in ⇒ null-out.
    Query(
      "q110_rank_dense_chunked",
      (s, dir) => {
        val li0 = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_orderkey") % 97 === 0, lit(null))
              .otherwise(col("l_extendedprice")).as("p"))
        val li = TadaFrame.ingest(li0)
        Analytics.rankDense(li, "p", "price_rank")
          .out.select("l_orderkey", "l_linenumber", "price_rank")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN p IS NULL THEN NULL
                    ELSE dense_rank() OVER (ORDER BY p ASC NULLS FIRST)
                         - max(CASE WHEN p IS NULL THEN 1 ELSE 0 END) OVER ()
               END AS price_rank
        FROM (SELECT l_orderkey, l_linenumber,
                     CASE WHEN l_orderkey % 97 = 0 THEN NULL
                          ELSE l_extendedprice END AS p
              FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
      """)),

    // §2.6 exclusive Percentile over a NEAR-UNIQUE column (r18) — the
    // percentileChunked twin of q110: same integer numerator/denominator
    // as the window form, so the doubles hash-match the oracle exactly.
    Query(
      "q111_percentile_chunked",
      (s, dir) => {
        val o0 = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 89 === 0, lit(null))
              .otherwise(col("o_totalprice")).as("tp"))
        val o = TadaFrame.ingest(o0)
        Analytics.percentile(o, "tp", "tp_pct")
          .out.select("o_orderkey", "tp_pct")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN tp IS NULL THEN NULL
                    ELSE CAST(rank() OVER (ORDER BY tp ASC NULLS FIRST)
                              - sum(CASE WHEN tp IS NULL THEN 1 ELSE 0 END) OVER ()
                              - 1 AS DOUBLE)
                         / count(tp) OVER ()
               END AS tp_pct
        FROM (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 89 = 0 THEN NULL
                          ELSE o_totalprice END AS tp
              FROM orders)
        ORDER BY o_orderkey
      """)),

    // §2.6 WHOLE-FRAME shift over an ENUM-string-sorted frame (r17):
    // o_orderstatus has 3 one-char values — the injective string image
    // shape, where value-chunking sub-bands the ties (before r17:
    // global window; with the image but without injectivity gating the
    // parallelism would cap at 3).
    Query(
      "q109_shift_string_enum_key",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderstatus"), Sorter("o_orderkey"))
        Analytics.shift(orders, "o_totalprice", 2, "prev2_total")
          .out.select("o_orderkey", "prev2_total")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               lag(o_totalprice, 2) OVER
                 (ORDER BY o_orderstatus ASC NULLS LAST, o_orderkey) AS prev2_total
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.6 WHOLE-FRAME RollingDuration (r18): the q23 shape without
    // keys — before r18 this was the last reachable single-partition
    // window (a global RANGE window over the data); now it runs the
    // time-bucket plan (Rolling.rollingDurationChunked: width ≥ 2d
    // buckets, one-bucket replication, tag-partitioned range window).
    // Exact decimal sums keep the duplicated evaluation bit-identical.
    Query(
      "q113_rolling_duration_frame",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
        Rolling.rollingDuration(ev, "ts", 3600000000L, "value",
            c => sum(dec(c)), "next_hour_value", finish = _.cast("double"))
          .out.select("event_id", "next_hour_value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                 (ORDER BY epoch_us(ts)
                  RANGE BETWEEN CURRENT ROW AND 3599999999 FOLLOWING) AS DOUBLE)
               AS next_hour_value
        FROM events
        ORDER BY event_id
      """)),

    // §2.6 dense Rank over a HEAVY-TAILED near-unique column (r19, r18
    // verdict item 2): p = price^7 spans ~14 decades, so equi-WIDTH
    // value buckets would land ~60% of rows in bucket 0 and the chunked
    // plan would silently degrade toward the single-partition shape it
    // replaces; the equi-DEPTH approx-percentile boundaries keep chunks
    // ~balanced regardless of the distribution. p is 6 IEEE multiplies
    // — bit-identical on both engines, so ranks compare exactly.
    Query(
      "q115_rank_skewed_axis",
      (s, dir) => {
        val pExpr = "((((((l_extendedprice*l_extendedprice)*l_extendedprice)" +
          "*l_extendedprice)*l_extendedprice)*l_extendedprice)*l_extendedprice)"
        val li0 = Tables.lineitem(s, dir)
          .selectExpr("l_orderkey", "l_linenumber", s"$pExpr AS p")
        val li = TadaFrame.ingest(li0)
        Analytics.rankDense(li, "p", "p_rank")
          .out.select("l_orderkey", "l_linenumber", "p_rank")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               dense_rank() OVER (ORDER BY p ASC) AS p_rank
        FROM (SELECT l_orderkey, l_linenumber,
                     ((((((l_extendedprice*l_extendedprice)*l_extendedprice)
                        *l_extendedprice)*l_extendedprice)*l_extendedprice)
                        *l_extendedprice) AS p
              FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
      """)),

    // §2.6 GROUPED RollingDuration with FEW keys (r19, r18 verdict item
    // 6): 3 segments cap the keyed range window's parallelism at 3
    // regardless of cluster size — the q14 buffer story on the window
    // axis — so the dispatcher composes the time-bucket plan with the
    // key (tag = (seg, bucket)) when the memoized key HLL is under the
    // partition count. Exact decimal sums keep the replicated
    // evaluation bit-identical to the keyed window oracle.
    Query(
      "q116_rolling_duration_grouped_chunked",
      (s, dir) => {
        val ev0 = Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("value"),
            (col("user_id") % 3).cast("int").as("seg"))
        val ev = TadaFrame.ingest(ev0)
        Rolling.rollingDuration(ev, "ts", 3600000000L, "value",
            c => sum(dec(c)), "next_hour_value",
            partitionBy = Seq("seg"), finish = _.cast("double"))
          .out.select("event_id", "seg", "next_hour_value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, CAST(user_id % 3 AS INT) AS seg,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                 (PARTITION BY user_id % 3 ORDER BY epoch_us(ts)
                  RANGE BETWEEN CURRENT ROW AND 3599999999 FOLLOWING) AS DOUBLE)
               AS next_hour_value
        FROM events
        ORDER BY event_id
      """)),

    // §2.3 GROUPED Shift with FEW keys incl. a PUNCHED-NULL key (r20,
    // r19 verdict item 5): 3 statuses + a deterministic null stripe cap
    // the keyed window's parallelism at 4 tasks at ANY cluster width —
    // the xo14 probe shape — so the dispatcher composes the chunked
    // carry plan with the key (Prefix.shift keys form: windows
    // partition by (key, chunk), carries chain per key over chunk
    // order, and the carry re-joins NULL-SAFELY — both engines group
    // null keys together, so a plain equi-join would silently drop the
    // null group's cross-chunk carries; this query oracle-pins that).
    Query(
      "q117_shift_grouped_few_keys",
      (s, dir) => {
        val o0 = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            when(col("o_orderkey") % 97 === 0, lit(null))
              .otherwise(col("o_orderstatus")).as("seg"))
        val o = TadaFrame.ingest(o0).sort(Sorter("o_orderkey"))
        Analytics.shift(o, "o_totalprice", 2, "prev2_total",
            partitionBy = Seq("seg"))
          .out.select("o_orderkey", "prev2_total")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               lag(o_totalprice, 2) OVER
                 (PARTITION BY CASE WHEN o_orderkey % 97 = 0 THEN NULL
                               ELSE o_orderstatus END
                  ORDER BY o_orderkey) AS prev2_total
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.6 GROUPED CumSum with FEW keys (r20) — the cumSum twin of
    // q117: per-key running decimal total through the composed
    // (key, chunk) plan; the null-key stripe's carries ride the same
    // null-safe join.
    Query(
      "q118_cumsum_grouped_few_keys",
      (s, dir) => {
        val o0 = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            when(col("o_orderkey") % 89 === 0, lit(null))
              .otherwise(col("o_orderstatus")).as("seg"))
        val o = TadaFrame.ingest(o0).sort(Sorter("o_orderkey"))
          .withCol("tp", dec(col("o_totalprice")))
        Analytics.cumSum(o, "tp", "run_total", partitionBy = Seq("seg"))
          .withCol("run_total", col("run_total").cast("double"))
          .out.select("o_orderkey", "run_total")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(sum(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)), 0)) OVER
                 (PARTITION BY CASE WHEN o_orderkey % 89 = 0 THEN NULL
                               ELSE o_orderstatus END
                  ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS run_total
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.6 GROUPED RollingN with FEW keys (r20) — the rollingN twin:
    // 3-row forward window per key, incomplete tail ⇒ null, through the
    // composed head-carry plan (Prefix.rollingN keys form). Exact
    // decimal sums keep the rebuilt tail windows bit-identical.
    Query(
      "q119_rollingn_grouped_few_keys",
      (s, dir) => {
        val o0 = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            when(col("o_orderkey") % 93 === 0, lit(null))
              .otherwise(col("o_orderstatus")).as("seg"))
        val o = TadaFrame.ingest(o0).sort(Sorter("o_orderkey"))
          .withCol("tp", dec(col("o_totalprice")))
        Rolling.rollingN(o, 3, "tp", c => sum(c), "roll3",
            partitionBy = Seq("seg"), finish = _.cast("double"))
          .out.select("o_orderkey", "roll3")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN count(*) OVER w = 3
                    THEN CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                              AS DOUBLE)
               END AS roll3
        FROM orders
        WINDOW w AS (PARTITION BY CASE WHEN o_orderkey % 93 = 0 THEN NULL
                                  ELSE o_orderstatus END
                     ORDER BY o_orderkey
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
        ORDER BY o_orderkey
      """)),

    // §2.5 Align with FEW keys incl. a PUNCHED-NULL key (r20): the
    // window-aggregate align buffers each key's ENTIRE partition on one
    // task — 4 keys over a corpus is 4 corpus-sized buffers — so the
    // few-keys gate re-plans it as a map-side-combined hash aggregate
    // broadcast back through a NULL-SAFE join (the null-key group's
    // aggregate must reach its rows; a plain equi-join nulls exactly
    // those). q21 (25 nations) rides the same aggJoin dispatch; this
    // query adds the null-key stripe the q21 shape can't express.
    Query(
      "q120_align_grouped_null_key",
      (s, dir) => {
        val o0 = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            when(col("o_orderkey") % 91 === 0, lit(null))
              .otherwise(col("o_orderstatus")).as("seg"))
        val o = TadaFrame.ingest(o0)
        o.groupBy("seg").align.reduceWith(Seq(
            "seg_sum" -> sum(dec(col("o_totalprice")))))
          .withCol("seg_sum", col("seg_sum").cast("double"))
          .out.select("o_orderkey", "seg_sum")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY CASE WHEN o_orderkey % 91 = 0 THEN NULL
                               ELSE o_orderstatus END) AS DOUBLE)
               AS seg_sum
        FROM orders
        ORDER BY o_orderkey
      """)))
}
