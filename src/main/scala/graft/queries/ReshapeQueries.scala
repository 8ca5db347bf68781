package graft.queries

import graft.Tables
import graft.core._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.10 reshaping, DuckDB-verified. */
object ReshapeQueries extends QueryPack {
  import Exact._

  def queries: Seq[Query] = Seq(
    // PivotTable: linestatus × returnflag → exact quantity sums.
    Query(
      "q36_pivot",
      (s, dir) => {
        val li = TadaFrame.ingest(Tables.lineitem(s, dir))
        Reshape.pivotTable(li, Seq("l_linestatus"), "l_returnflag",
            sum(dec(col("l_quantity"))).cast("double"),
            knownValues = Seq("A", "N", "R"), prefix = "qty_")
          .out.orderBy("l_linestatus")
      },
      Some("""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
      """)),

    // PromoteToColLevel: first-in-frame-order value per
    // (priority, status) cell spread across a column level.
    Query(
      "q37_promote_col_level",
      (s, dir) => {
        val o = TadaFrame.ingest(Tables.orders(s, dir))
          .sort(Sorter("o_orderdate"), Sorter("o_orderkey"))
        Reshape.promoteToColLevel(o, Seq("o_orderpriority"), "o_orderstatus",
            "o_totalprice", knownValues = Seq("F", "O", "P"), prefix = "price_")
          .out.orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               max(CASE WHEN o_orderstatus = 'F' AND rn = 1 THEN o_totalprice END) AS price_F,
               max(CASE WHEN o_orderstatus = 'O' AND rn = 1 THEN o_totalprice END) AS price_O,
               max(CASE WHEN o_orderstatus = 'P' AND rn = 1 THEN o_totalprice END) AS price_P
        FROM (SELECT o_orderpriority, o_orderstatus, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority, o_orderstatus
                                        ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)),

    // Transpose: stats-by-flag summary flipped so stats are rows —
    // driver-side, capped, stringified (tada transposes to string).
    Query(
      "q38_transpose",
      (s, dir) => {
        import s.implicits._
        val stats = Tables.lineitem(s, dir)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_rows"), countDistinct($"l_partkey").as("n_parts"))
          .orderBy($"l_returnflag")
        Reshape.transpose(TadaFrame.ingest(stats), headerCol = "l_returnflag")
          .out.orderBy("stat")
      },
      Some("""
        SELECT 'n_rows' AS stat,
               CAST((SELECT count(*) FROM lineitem WHERE l_returnflag='A') AS VARCHAR) AS A,
               CAST((SELECT count(*) FROM lineitem WHERE l_returnflag='N') AS VARCHAR) AS N,
               CAST((SELECT count(*) FROM lineitem WHERE l_returnflag='R') AS VARCHAR) AS R
        UNION ALL
        SELECT 'n_parts',
               CAST((SELECT count(DISTINCT l_partkey) FROM lineitem WHERE l_returnflag='A') AS VARCHAR),
               CAST((SELECT count(DISTINCT l_partkey) FROM lineitem WHERE l_returnflag='N') AS VARCHAR),
               CAST((SELECT count(DISTINCT l_partkey) FROM lineitem WHERE l_returnflag='R') AS VARCHAR)
        ORDER BY stat
      """)),

    // MakeMultiLevelLabels: cartesian product of label level values.
    Query(
      "q39_multilevel_labels",
      (s, dir) => {
        import s.implicits._
        val regions = Tables.region(s, dir).select($"r_name").distinct()
        val statuses = Tables.orders(s, dir).select($"o_orderstatus").distinct()
        Reshape.makeMultiLevelLabels(s, Seq(regions, statuses))
          .orderBy("r_name", "o_orderstatus")
      },
      Some("""
        SELECT r_name, o_orderstatus
        FROM (SELECT DISTINCT r_name FROM region)
        CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        ORDER BY r_name, o_orderstatus
      """)))
}
