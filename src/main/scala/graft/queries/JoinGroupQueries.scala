package graft.queries

import graft.Tables
import graft.core._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 joins / §2.5 grouping / §2.8 set ops, expressed through
  * the TadaFrame library and verified against DuckDB.
  */
object JoinGroupQueries extends QueryPack {
  import Exact._

  def queries: Seq[Query] = Seq(
    // §2.4 Lookup/Merge on a unique right key — the classic dim lookup;
    // the deduped right side is broadcast-joinable at any scale.
    Query(
      "q10_lookup_join",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
        Lookup.merge(orders, cust.cols("c_custkey", "c_name"),
            leftOn = Seq("o_custkey"), rightOn = Seq("c_custkey"),
            broadcastRight = true, uniqueRight = true)
          .out.select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, c_name, o_totalprice
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
      """)),

    // §2.4 first-match-only semantics: right side (orders) has many rows
    // per key; tada keeps only the first per frame order — no row
    // multiplication, result cardinality = customers.
    Query(
      "q11_lookup_first_match",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        Lookup.merge(cust, orders.cols("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
            leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"))
          .out.select("c_custkey", "o_orderdate", "o_totalprice")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, o.o_orderdate AS o_orderdate, o.o_totalprice AS o_totalprice
        FROM customer LEFT JOIN (
          SELECT * FROM (
            SELECT o_custkey, o_orderdate, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders) WHERE rn = 1) o
        ON c_custkey = o.o_custkey
        ORDER BY c_custkey
      """)),

    // §2.4 inner merge: left-merge then drop unmatched (dataframe.go:1633-1657).
    Query(
      "q12_merge_inner",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        Lookup.merge(cust, orders.cols("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
            how = "inner", leftOn = Seq("c_custkey"), rightOn = Seq("o_custkey"))
          .out.select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
        FROM customer JOIN (
          SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders) WHERE rn = 1) o
        ON c_custkey = o.o_custkey
        ORDER BY c_custkey
      """)),

    // §2.4 Series arithmetic with lookup alignment (combineMath):
    // per-nation customer balance + supplier balance.
    Query(
      "q13_arith_align",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
          .groupBy("c_nationkey")
          .reduceWith(Seq("bal" -> dsum(col("c_acctbal"))))
        val supp = TadaFrame.ingest(Tables.supplier(s, dir))
          .groupBy("s_nationkey")
          .reduceWith(Seq("bal" -> dsum(col("s_acctbal"))))
        Lookup.combineMath(cust, supp, "add",
            leftOn = Seq("c_nationkey"), rightOn = Seq("s_nationkey"),
            leftVal = "bal", rightVal = "bal", out = "total_bal")
          .out.orderBy("c_nationkey")
      },
      Some(s"""
        SELECT c.c_nationkey, c.bal + s.bal AS total_bal
        FROM (SELECT c_nationkey, ${sqlDsum("c_acctbal")} AS bal
              FROM customer GROUP BY c_nationkey) c
        LEFT JOIN (SELECT s_nationkey, ${sqlDsum("s_acctbal")} AS bal
                   FROM supplier GROUP BY s_nationkey) s
        ON c.c_nationkey = s.s_nationkey
        ORDER BY c.c_nationkey
      """)),

    // §2.5 full reducer set over one grouping: exact median, POPULATION
    // stddev (via exact decimal moments so both engines see identical
    // doubles), count, countDistinct, min, max.
    Query(
      "q14_group_reducers",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, dir)
        val sx = sum(dec($"l_extendedprice")).cast("double")
        val sx2 = sum(dec($"l_extendedprice") * dec($"l_extendedprice")).cast("double")
        val n = count($"l_extendedprice").cast("double")
        // r21: the exact median used to ride this aggregation as
        // percentile(l_quantity, 0.5) — a TypedImperativeAggregate that
        // (a) forces every stage of the whole 6-aggregate pass into
        // ObjectHashAggregate (no whole-stage codegen) and (b) buffers
        // group-sized value maps through the countDistinct expand's
        // per-(flag, partkey) intermediate groups (~20M doubles per
        // final task at the 100× probe). Split it out through the
        // by-value counting plan q112 pinned (per-(group, value) counts,
        // vocabulary window, Percentile's own interpolation expression —
        // bit-identical doubles, GroupOrderSpec + the q112 oracle), and
        // the base pass becomes plain codegen HashAggregates.
        val base = li.groupBy($"l_returnflag")
          .agg(
            // round: DuckDB's decimal->double conversion can double-round
            // one ULP off the JVM's, and sqrt amplifies nothing — 4
            // decimals absorbs it deterministically on both engines
            round(sqrt((sx2 - sx * sx / n) / n), 4).as("stddev_pop_price"),
            count(lit(1)).as("n_rows"),
            countDistinct($"l_partkey").as("n_parts"),
            min($"l_quantity").as("min_qty"),
            max($"l_quantity").as("max_qty"))
        val cnt = li.filter($"l_quantity".isNotNull)
          .groupBy($"l_returnflag", $"l_quantity".cast("double").as("__v"))
          .agg(count(lit(1)).as("__n"))
        val wCum = Window.partitionBy($"l_returnflag").orderBy($"__v".asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy($"l_returnflag")
        val scored = cnt
          .withColumn("__cum", sum("__n").over(wCum))
          .withColumn("__tot", sum("__n").over(wAll))
        // value __v covers sorted positions [cum − n, cum − 1] (0-based)
        val pos = ($"__tot" - 1L).cast("double") / 2.0
        val lo = floor(pos)
        val hi = ceil(pos)
        val prev = $"__cum" - $"__n"
        val med = scored.groupBy($"l_returnflag").agg(
          max(when(prev <= lo && lo <= $"__cum" - 1, $"__v")).as("__lo"),
          max(when(prev <= hi && hi <= $"__cum" - 1, $"__v")).as("__hi"),
          max($"__tot").as("__tN"))
        val posA = ($"__tN" - 1L).cast("double") / 2.0
        val loA = floor(posA).cast("double")
        val hiA = ceil(posA).cast("double")
        val medE = when(loA === hiA || $"__lo" === $"__hi", $"__lo")
          .otherwise((hiA - posA) * $"__lo" + (posA - loA) * $"__hi")
        val medDf = med.select($"l_returnflag".as("__mk"), medE.as("median_qty"))
        // null-safe: a null return flag is a legitimate group
        base.join(broadcast(medDf), base("l_returnflag") <=> medDf("__mk"), "left")
          .select($"l_returnflag", $"median_qty", $"stddev_pop_price",
            $"n_rows", $"n_parts", $"min_qty", $"max_qty")
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               round(sqrt((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       / CAST(count(l_extendedprice) AS DOUBLE))
                    / CAST(count(l_extendedprice) AS DOUBLE)), 4) AS stddev_pop_price,
               count(*) AS n_rows,
               count(DISTINCT l_partkey) AS n_parts,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)),

    // §2.5 exact grouped Median through the BY-VALUE counting plan
    // (r18): l_quantity (50 values) and l_linenumber (7) are the
    // low-cardinality domains where TadaGrouped.median dispatches to
    // per-(group, value) counts + vocabulary-window position picks —
    // no group-sized value buffer in the final agg task (q14's
    // percentile(c, 0.5) holds ~20M doubles per task at the 100× probe;
    // this plan's final stage is #groups × vocabulary). Values are
    // integers/halves, exact on both engines.
    Query(
      "q112_grouped_median_by_value",
      (s, dir) => {
        val li = TadaFrame.ingest(Tables.lineitem(s, dir))
        li.groupBy("l_returnflag").median("l_quantity", "l_linenumber")
          .out.select("l_returnflag", "median_l_quantity", "median_l_linenumber")
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_l_quantity,
               quantile_cont(CAST(l_linenumber AS DOUBLE), 0.5) AS median_l_linenumber
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)),

    // §2.5 SORTED frame grouped by a NEAR-UNIQUE key (r19, closing the
    // r18 audit's last data-shaped single-partition window): ~46k
    // distinct (orderkey, linenumber) keys at sf0.01 push the group-key
    // HLL past TadaGrouped.RankRepMaxWindowGroups, so the group ordinal
    // is ranked through the BANDED chunked path (rankRepBanded →
    // Prefix.materializeOrd over the rep fields) instead of a
    // corpus-sized single-partition row_number — "sort by timestamp,
    // group by user_id" at corpus scale. head(500) makes the banded
    // ordinal load-bearing: the SELECTED SET of groups is wrong if the
    // chunked order is. Oracle mirrors the appearance rank as the tuple
    // min over (shipdate, key) — deterministic because distinct groups
    // differ in the key.
    Query(
      "q114_sorted_group_near_unique_key",
      (s, dir) => {
        val li0 = Tables.lineitem(s, dir)
          .select(expr("l_orderkey * 100 + l_linenumber").as("lk"),
            col("l_shipdate"), col("l_quantity"))
        val li = TadaFrame.ingest(li0)
          .sort(Sorter("l_shipdate"), Sorter("lk"))
        li.groupBy("lk")
          .reduceWith(Seq("qty" -> dsum(col("l_quantity"))))
          .head(500)
          .out.select("lk", "qty")
          .orderBy("lk")
      },
      Some(s"""
        SELECT lk, qty FROM (
          SELECT l_orderkey * 100 + l_linenumber AS lk,
                 ${sqlDsum("l_quantity")} AS qty,
                 min(ROW(l_shipdate, l_orderkey * 100 + l_linenumber)) AS fa
          FROM lineitem GROUP BY 1
          ORDER BY fa LIMIT 500)
        ORDER BY lk
      """)),

    // §2.5 Earliest/Latest (time min/max) + HavingCount: active users with
    // ≥ some events.
    Query(
      "q15_having_earliest",
      (s, dir) => {
        val ev = TadaFrame.ingest(Tables.events(s, dir))
        val grouped = ev.groupBy("user_id")
        val reduced = grouped.reduceWith(Seq(
          "earliest_ts" -> min(col("ts")),
          "latest_ts" -> max(col("ts")),
          "n" -> count(lit(1))))
        reduced.filter(col("n") >= 50)
          .out.orderBy("user_id")
      },
      Some("""
        SELECT user_id, min(ts) AS earliest_ts, max(ts) AS latest_ts, count(*) AS n
        FROM events
        GROUP BY user_id
        HAVING count(*) >= 50
        ORDER BY user_id
      """)),

    // §2.5 First/Last/Nth positional picks per group in frame order.
    Query(
      "q16_first_last_nth",
      (s, dir) => {
        val orders = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        orders.groupBy("o_custkey").positional(Seq(
            ("first_price", "o_totalprice", 0),
            ("second_price", "o_totalprice", 1),
            ("last_price", "o_totalprice", -1)))
          .out.orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey,
               max(CASE WHEN rn = 1 THEN o_totalprice END) AS first_price,
               max(CASE WHEN rn = 2 THEN o_totalprice END) AS second_price,
               max(CASE WHEN rn = cnt THEN o_totalprice END) AS last_price
        FROM (SELECT o_custkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn,
                     count(*) OVER (PARTITION BY o_custkey) AS cnt
              FROM orders)
        GROUP BY o_custkey
        ORDER BY o_custkey
      """)),

    // §2.3 Unique — first appearance per key in frame order
    // (series.go:1265-1274).
    Query(
      "q17_unique_first",
      (s, dir) => {
        val cust = TadaFrame.ingest(Tables.customer(s, dir))
          .sort(Sorter("c_custkey"))
        cust.unique(subset = Seq("c_mktsegment"))
          .out.select("c_mktsegment", "c_custkey")
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, min(c_custkey) AS c_custkey
        FROM customer GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """)),

    // §2.8 Append (UNION ALL) of two name/balance frames.
    Query(
      "q18_append",
      (s, dir) => {
        val c = TadaFrame.ingest(
          Tables.customer(s, dir).selectExpr("c_name AS nm", "c_acctbal AS bal", "'cust' AS src"))
        val p = TadaFrame.ingest(
          Tables.supplier(s, dir).selectExpr("s_name AS nm", "s_acctbal AS bal", "'supp' AS src"))
        c.append(p).out.orderBy("src", "nm")
      },
      Some("""
        SELECT c_name AS nm, c_acctbal AS bal, 'cust' AS src FROM customer
        UNION ALL
        SELECT s_name AS nm, s_acctbal AS bal, 'supp' AS src FROM supplier
        ORDER BY src, nm
      """)),

    // §2.8 set algebra (Spark intersect/except — free extras over the
    // reference's internal row-index sets).
    Query(
      "q19_set_ops",
      (s, dir) => {
        import s.implicits._
        val rich = Tables.customer(s, dir).filter($"c_acctbal" > 9000)
          .select($"c_nationkey".cast("int").as("nationkey")).distinct()
        val supp = Tables.supplier(s, dir).filter($"s_acctbal" > 9000)
          .select($"s_nationkey".cast("int").as("nationkey")).distinct()
        rich.except(supp).orderBy("nationkey")
      },
      Some("""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
        ORDER BY nationkey
      """)),

    // Skew path: two-phase salted aggregation. lineitem has exactly 3
    // return-flag values — the canonical few-hot-keys shape where a
    // plain groupBy funnels a third of the table through one reducer.
    // Salting is semantics-neutral for algebraic aggs, so the oracle is
    // the plain GROUP BY.
    Query(
      "q57_salted_agg",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .select($"l_returnflag", dec($"l_quantity").as("q"))
        Skew.saltedAgg(li, Seq("l_returnflag"), Seq(
            "sum_qty" -> (("q", "sum")), "n" -> (("q", "count")),
            "min_qty" -> (("q", "min")), "max_qty" -> (("q", "max"))),
            salts = 16)
          .select($"l_returnflag", $"sum_qty".cast("double").as("sum_qty"), $"n",
            $"min_qty".cast("double").as("min_qty"), $"max_qty".cast("double").as("max_qty"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(l_quantity) AS n,
               CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
               CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)),

    // semi/anti joins (SURVEY §2.4 "free extras"): customers with no orders.
    Query(
      "q20_anti_join",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter($"o_totalprice" > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
      """)))
}
