package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Core relational operators from SURVEY.md §2.2–§2.5: scan, project,
  * filter, conditional, aggregate. Each query is the Spark-first
  * expression of a tada operator, verified against a DuckDB oracle.
  */
object CoreQueries extends QueryPack {
  import Exact._

  def queries: Seq[Query] = Seq(
    // §2.5 GroupBy + {Sum, Mean, Count} — TPC-H Q1 flavor. Filter is pushed
    // to the parquet scan; partial aggregation makes the shuffle carry only
    // |groups| rows per partition.
    Query(
      "q01_agg",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount"))).cast("double").as("sum_disc_price"),
            dmean($"l_quantity").as("avg_qty"),
            dmean($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlDsum("l_quantity")} AS sum_qty,
               ${sqlDsum("l_extendedprice")} AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               ${sqlDmean("l_quantity")} AS avg_qty,
               ${sqlDmean("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // §2.3 Filter — predicate pushdown + column pruning; the scan should
    // read only the 4 emitted columns (ReadSchema) with both predicates in
    // PushedFilters.
    Query(
      "q02_filter",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_quantity" > 45 && $"l_discount" >= 0.09)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 45 AND l_discount >= 0.09
        ORDER BY l_orderkey, l_linenumber
      """)),

    // §2.3 FilterByValue — tada compares stringified values; the Spark-first
    // expression casts to string so float 1 and string "1" compare equal.
    Query(
      "q03_filter_by_value",
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .filter($"c_mktsegment".cast("string") === "BUILDING" &&
                  $"c_nationkey".cast("string") === "3")
          .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_nationkey")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment, c_nationkey
        FROM customer
        WHERE CAST(c_mktsegment AS VARCHAR) = 'BUILDING'
          AND CAST(c_nationkey AS VARCHAR) = '3'
        ORDER BY c_custkey
      """)),

    // §2.3 Where(filters, ifTrue, ifFalse) — per-row conditional value.
    Query(
      "q04_where",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(
            $"o_orderkey",
            when($"o_totalprice" > 250000, lit("big"))
              .otherwise(lit("small")).as("size_class"),
            when($"o_orderstatus" === "F", $"o_totalprice")
              .otherwise(lit(0.0)).as("finished_price"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_class,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS finished_price
        FROM orders
        ORDER BY o_orderkey
      """)),

    // §2.3 DropNull — the source data is null-free, so nulls are
    // synthesized identically on both sides via NULLIF, then dropped.
    Query(
      "q05_dropnull",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_id", nullif($"event_type", lit("error")).as("etype"), $"value")
          .na.drop(Seq("etype"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, NULLIF(event_type, 'error') AS etype, value
        FROM events
        WHERE NULLIF(event_type, 'error') IS NOT NULL
        ORDER BY event_id
      """)),

    // §2.3 IsNull — keep rows with any null in the subset.
    Query(
      "q06_isnull",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_id", nullif($"event_type", lit("click")).as("etype"),
                  nullif($"value", lit(0.0)).as("v"))
          .filter($"etype".isNull || $"v".isNull)
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, NULLIF(event_type, 'click') AS etype, NULLIF(value, 0.0) AS v
        FROM events
        WHERE NULLIF(event_type, 'click') IS NULL OR NULLIF(value, 0.0) IS NULL
        ORDER BY event_id
      """)),

    // §1.3/§2.9 multi-format datetime parsing: strings in two different
    // date formats parse through the reference's format-list chain
    // (coalesced try_to_timestamp — first format that matches wins,
    // all-fail ⇒ null).
    Query(
      "q08_parse_datetime",
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir).select(
          $"o_orderkey",
          when($"o_orderkey" % 2 === 0, date_format($"o_orderdate", "yyyy-MM-dd"))
            .otherwise(date_format($"o_orderdate", "MM/dd/yyyy")).as("datestr"))
        o.select($"o_orderkey", $"datestr",
            graft.semantics.TadaFormat.parseDateTime($"datestr",
              Seq("yyyy-MM-dd", "MM/dd/yyyy")).as("parsed"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, datestr,
               coalesce(try_strptime(datestr, '%Y-%m-%d'),
                        try_strptime(datestr, '%m/%d/%Y')) AS parsed
        FROM (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 2 = 0
                          THEN strftime(o_orderdate, '%Y-%m-%d')
                          ELSE strftime(o_orderdate, '%m/%d/%Y') END AS datestr
              FROM orders)
        ORDER BY o_orderkey
      """)),

    // §2.9 whole-DF per-column stats reshaped long (dataframe.go:1910-1993).
    Query(
      "q09_df_stats",
      (s, dir) => {
        val li = graft.core.TadaFrame.ingest(
          Tables.lineitem(s, dir).select("l_quantity", "l_extendedprice", "l_discount"))
        li.stats("max_value", c => max(c)).orderBy("col_name")
      },
      Some("""
        SELECT 'l_quantity' AS col_name, CAST(max(l_quantity) AS DOUBLE) AS max_value FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(max(l_discount) AS DOUBLE) FROM lineitem
        ORDER BY col_name
      """)),

    // §2.2 projection + §2.9 conversions: Cast round-trip double→string→double
    // plus a computed column kept in whole-stage codegen.
    Query(
      "q07_cast_project",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select(
            $"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("string").cast("double").as("qty_rt"),
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("disc_price"))
          .filter($"qty_rt" >= 30.0)
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_rt,
               l_extendedprice * (1.0 - l_discount) AS disc_price
        FROM lineitem
        WHERE CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) >= 30.0
        ORDER BY l_orderkey, l_linenumber
      """)))
}
