package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Multi-join analytical flagships (TPC-H Q3/Q5 shapes): the plans a
  * 100 TB deployment lives on — fact-to-fact joins shuffled on keys,
  * dimension joins broadcast, aggregates decimal-exact, AQE free to
  * re-plan. */
object FlagshipQueries extends QueryPack {
  import Exact._

  def queries: Seq[Query] = Seq(
    // Q3 shape: segment-filtered customers ⨝ orders ⨝ lineitem,
    // revenue per order, top 10. Customer filter prunes before the join;
    // the two fact joins shuffle on their keys; TopK avoids a full sort.
    Query(
      "q53_revenue_top10",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
          .filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val ord = Tables.orders(s, dir)
          .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate")
        val li = Tables.lineitem(s, dir)
          .select($"l_orderkey", dec($"l_extendedprice").as("ep"), dec($"l_discount").as("disc"))
        ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(sum($"ep" * (lit(1).cast("decimal(18,2)") - $"disc")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)),

    // Q5 shape: five joins across the star schema — region/nation dims
    // broadcast, supplier-nation = customer-nation constraint, revenue
    // per nation. The only shuffles left are the two fact joins + the
    // final 25-group aggregate.
    Query(
      "q54_nation_revenue",
      (s, dir) => {
        import s.implicits._
        val region = Tables.region(s, dir).filter($"r_name".isin("ASIA", "AMERICA"))
        val nation = Tables.nation(s, dir)
        val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
        val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
        val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
        val li = Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_suppkey",
            dec($"l_extendedprice").as("ep"), dec($"l_discount").as("disc"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(sum($"ep" * (lit(1).cast("decimal(18,2)") - $"disc")).cast("double").as("revenue"))
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name IN ('ASIA', 'AMERICA')
        GROUP BY n_name
        ORDER BY n_name
      """)))
}
