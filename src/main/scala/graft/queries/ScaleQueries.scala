package graft.queries

import graft.Tables
import graft.core.{RangeJoin, Temporal}
import graft.pipeline.{Sampling, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Scale-path operators beyond the reference's surface: as-of join,
  * range join, sessionization, TF-IDF, deterministic/stratified
  * sampling. Every one is oracle-checked — including the as-of join
  * (DuckDB has native ASOF JOIN) and the hash-based samplers (md5 is
  * engine-portable, so the oracle replays the exact sample).
  */
object ScaleQueries extends QueryPack {

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  def queries: Seq[Query] = Seq(

    // As-of join: each click aligned to the user's most recent prior (or
    // simultaneous) view — one shuffle on user_id, running window, no
    // range explosion. Oracle: DuckDB's native ASOF JOIN.
    Query(
      "q59_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(F.col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val views = e.filter(F.col("event_type") === "view")
          .select(F.col("event_id").as("view_id"), F.col("user_id"), F.col("ts"))
        Temporal.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
            Seq("view_id", "ts"), inner = true)
          .select(F.col("event_id"), F.col("user_id"),
            F.col("asof_view_id").as("view_id"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""
        SELECT c.event_id, c.user_id, v.event_id AS view_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id
      """)),

    // Range join: facts against [lo, hi) price bands. The bands side is
    // a broadcast dim — facts never shuffle; the rollup is one partial
    // aggregation. (RangeJoin.binnedRange is the big×big path; its
    // equivalence is pinned by ScalaTest.)
    Query(
      "q60_range_join",
      (s, dir) => {
        import s.implicits._
        // 11 bands cover the full price domain (≤ ~105k) — no null-band
        // row, whose sort position differs between engines
        val bands = (0 to 10).map(i => (i.toLong, i * 10000.0, (i + 1) * 10000.0))
          .toDF("band", "lo", "hi")
        val li = Tables.lineitem(s, dir).select("l_extendedprice", "l_quantity")
        RangeJoin.broadcastRange(li, bands, "l_extendedprice", "lo", "hi")
          .groupBy("band")
          .agg(F.count(F.lit(1)).as("n"), Exact.dsum(F.col("l_quantity")).as("sum_qty"))
          .orderBy("band")
      },
      Some(s"""
        SELECT b.band, count(*) AS n, ${Exact.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem l
        LEFT JOIN (SELECT band, band * 10000.0 AS lo, (band + 1) * 10000.0 AS hi
                   FROM (SELECT CAST(range AS BIGINT) AS band FROM range(0, 11))) b
          ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        GROUP BY b.band ORDER BY b.band
      """)),

    // The same range join through the grid-binned BIG×BIG path: bands
    // explode to the grid cells they overlap and the join becomes a hash
    // EQUI-join on the cell id (no nested loop) with the residual range
    // predicate re-checked — the shape that scales when neither side
    // broadcasts. Bands cover the full domain, so inner == q60's left.
    Query(
      "q65_range_join_binned",
      (s, dir) => {
        import s.implicits._
        val bands = (0 to 10).map(i => (i.toLong, i * 10000.0, (i + 1) * 10000.0))
          .toDF("band", "lo", "hi")
        val li = Tables.lineitem(s, dir).select("l_extendedprice", "l_quantity")
        RangeJoin.binnedRange(li, bands, "l_extendedprice", "lo", "hi", step = 10000.0)
          .groupBy("band")
          .agg(F.count(F.lit(1)).as("n"), Exact.dsum(F.col("l_quantity")).as("sum_qty"))
          .orderBy("band")
      },
      Some(s"""
        SELECT b.band, count(*) AS n, ${Exact.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem l
        JOIN (SELECT band, band * 10000.0 AS lo, (band + 1) * 10000.0 AS hi
              FROM (SELECT CAST(range AS BIGINT) AS band FROM range(0, 11))) b
          ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        GROUP BY b.band ORDER BY b.band
      """)),

    // Gap-based sessionization (gap > 30 min splits): one shuffle on
    // user_id, lag + running-sum windows sharing a single sort.
    Query(
      "q61_sessionize",
      (s, dir) => {
        val e = Tables.events(s, dir).select("user_id", "event_id", "ts")
        Temporal.sessionize(e, Seq("user_id"), "ts", F.lit(1800L * 1000000),
            tieBreak = Seq("event_id"))
          .groupBy("user_id", "session")
          .agg(F.count(F.lit(1)).as("n_events"),
            (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
              .as("duration_us"))
          .orderBy("user_id", "session")
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
          FROM o)
        SELECT user_id, session, count(*) AS n_events,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        FROM sess GROUP BY user_id, session
        ORDER BY user_id, session
      """)),

    // TF-IDF: explode → tf → df (broadcast dim) → top-3 terms per doc.
    // Ranking key is (tf DESC, df ASC, term ASC) — integers + strings
    // only, so rank order is engine-portable; the tfidf double itself is
    // emitted rounded.
    Query(
      "q62_tfidf",
      (s, dir) => {
        val ti = TextOps.tfIdf(Tables.documents(s, dir), "doc_id", "text")
        val w = Window.partitionBy("doc_id")
          .orderBy(F.col("tf").desc, F.col("df").asc, F.col("term").asc)
        ti.withColumn("rank", F.row_number().over(w))
          .filter(F.col("rank") <= 3)
          .select(F.col("doc_id"), F.col("rank"), F.col("term"), F.col("tf"),
            F.col("df"), F.round(F.col("tfidf"), 4).as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      Some(s"""
        WITH terms AS (
          SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
          FROM documents WHERE length($normSql) > 0),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        SELECT doc_id, rank, term, tf, df,
               round(tf * ln(n / df), 4) AS tfidf
        FROM (
          SELECT doc_id, term, tf, df, n,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tf DESC, df ASC, term ASC) AS rank
          FROM tf JOIN df USING (term), n)
        WHERE rank <= 3
        ORDER BY doc_id, rank
      """)),

    // Deterministic 5% sample by md5 of a stable row key — reproducible
    // across engines/partitionings/retries (scan-stage, no shuffle, no
    // RNG state). The oracle replays the identical sample.
    Query(
      "q63_det_sample",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val key = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"),
          F.col("l_linenumber").cast("string"))
        Sampling.deterministic(li, key, bp = 500)
          .groupBy("l_returnflag")
          .agg(F.count(F.lit(1)).as("n"), Exact.dsum(F.col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        SELECT l_returnflag, count(*) AS n, ${Exact.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem
        WHERE ('0x' || substring(md5(l_orderkey || '_' || l_linenumber), 1, 15))::BIGINT
              % 10000 < 500
        GROUP BY 1 ORDER BY 1
      """)),

    // Stratified sampling: per-stratum basis-point rates via a when-chain
    // (no join) over the same md5 coordinate.
    Query(
      "q64_stratified_sample",
      (s, dir) => {
        val e = Tables.events(s, dir)
        Sampling.stratified(e, F.col("event_id").cast("string"),
            F.col("event_type"),
            Map("click" -> 2000, "view" -> 500, "purchase" -> 10000))
          .groupBy("event_type")
          .agg(F.count(F.lit(1)).as("n"), Exact.dsum(F.col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""
        SELECT event_type, count(*) AS n, ${Exact.sqlDsum("value")} AS sum_value
        FROM events
        WHERE ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10000
              < CASE event_type WHEN 'click' THEN 2000 WHEN 'view' THEN 500
                                WHEN 'purchase' THEN 10000 ELSE 0 END
        GROUP BY 1 ORDER BY 1
      """)),

    // Deterministic train/val/test split: each row's permanent hash
    // coordinate buckets it 80/10/10; the property under test is
    // leak-freeness under churn (a row never migrates between splits
    // across reruns/repartitions/engines). Scan-stage when-chain.
    Query(
      "q86_train_val_test",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val key = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"),
          F.col("l_linenumber").cast("string"))
        Sampling.split(li, key, trainBp = 8000, valBp = 1000)
          .groupBy("split")
          .agg(F.count(F.lit(1)).as("n"), Exact.dsum(F.col("l_quantity")).as("sum_qty"))
          .orderBy("split")
      },
      Some(s"""
        SELECT CASE WHEN c < 8000 THEN 'train'
                    WHEN c < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n, ${Exact.sqlDsum("l_quantity")} AS sum_qty
        FROM (SELECT l_quantity,
                ('0x' || substring(md5(l_orderkey || '_' || l_linenumber), 1, 15))::BIGINT
                % 10000 AS c
              FROM lineitem)
        GROUP BY 1 ORDER BY 1
      """)))
}
