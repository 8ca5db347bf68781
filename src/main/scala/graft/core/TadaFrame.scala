package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

import graft.semantics.TadaFormat

/** Multi-key sort spec (reference: `Sorter` types.go:161-170). `cast`
  * reproduces tada's sort-time dtype coercion. */
final case class Sorter(name: String, descending: Boolean = false,
                        cast: Option[DataType] = None)

/** Null-fill strategies (reference: types.go:178-189). */
sealed trait FillNullHow
object FillNullHow {
  case object Forward extends FillNullHow
  case object Backward extends FillNullHow
  case object ZeroValue extends FillNullHow
  final case class Const(value: Double) extends FillNullHow
}

/** The engine's frame: a lazy Spark `DataFrame` plus the tada frame model
  * (SURVEY.md §1) — label levels, frame name, multi-level column names,
  * and an order contract.
  *
  * Design notes (Spark-first, 100 TB-aware):
  *
  *   - '''Labels''' (tada's row index, types.go:74-80) are ordinary
  *     columns listed in `labels`; they join/group/sort like columns, so
  *     Catalyst sees one flat relation and every optimization applies.
  *   - '''Row order''' is a first-class tada semantic (head/shift/
  *     first-appearance grouping). We carry a hidden `__ord` column
  *     (monotonically increasing id = scan order, assigned once at
  *     ingest) plus a logical `order` spec. `sort` only rewrites the
  *     spec — NO shuffle happens until an order-sensitive operator
  *     actually needs it, and then it is expressed as `orderBy`/window
  *     clauses Catalyst can plan (range-partitioned sort), never a
  *     global row_number materialization.
  *   - Every operator returns a new lazy frame; tada's `InPlace`
  *     mutator twins (series.go:346-355) collapse into this one form.
  */
final case class TadaFrame(
    df: DataFrame,
    labels: Seq[String],
    name: String = "",
    colLevelNames: Seq[String] = Seq("*0"),
    order: Seq[Sorter] = Nil,
    /** Number of ordinal bands consumed by this frame (see `append`):
      * its `__ord` values live in [0, bands·2^53). A fresh ingest is one
      * band; each append stacks the right frame's bands above the left's. */
    bands: Int = 1) {

  import TadaFrame._

  /** Value (non-label) column names, in schema order. */
  def valueCols: Seq[String] =
    df.columns.toSeq.filterNot(c => c == ORD || labels.contains(c))

  /** Resolve a container name against labels ++ columns — tada resolves
    * either namespace (dataframe.go:107). */
  def resolve(n: String): String = {
    require(df.columns.contains(n), s"container '$n' not found")
    n
  }

  private def spark: SparkSession = df.sparkSession

  /** The frame's order as Catalyst sort expressions: the sort spec, then
    * `__ord` as the stable tiebreak (tada sorts are stable,
    * internal.go:1257-1330; nulls always last, internal.go:1297-1309). */
  def orderCols: Seq[Column] = {
    val keys = order.map { s =>
      val c0 = df(s.name)
      val c = s.cast.map(c0.cast).getOrElse(c0)
      if (s.descending) c.desc_nulls_last else c.asc_nulls_last
    }
    keys :+ df(ORD).asc
  }

  /** Window over the whole frame in frame order. Single-partition by
    * construction — callers that can partition (grouped/rolling ops)
    * use `TadaGrouped` instead; whole-series analytics are inherently
    * order-global and documented as such. */
  private[core] def globalWindow = Window.orderBy(orderCols: _*)

  // ===== §2.2 projections / column ops =====

  /** Re-anchor the hidden ordinal to the CURRENT frame order before a
    * structural op removes/renames/overwrites a sort-key column.
    * tada's sorts are PHYSICAL (internal.go:1257-1330) — row order must
    * survive the key's disappearance — but our sort is a lazy spec over
    * live columns, so the order is materialized into `__ord` once
    * (chunked — see [[anchored]]; r14) and the affected spec entries
    * drop. No-op when no
    * affected column is an order key — the common path stays lazy and
    * shuffle-free. Surfaced by PropertySpec's label-move model fuzz
    * (r8 verdict task 7): sort(k) → subsetLabels/dropCols(k) previously
    * threw on the next order-sensitive operator. */
  private def anchorOrder(affected: Iterable[String]): TadaFrame = {
    val hit = order.exists(s => affected.exists(_ == s.name))
    if (!hit) this else anchored
  }

  /** The frame with its order spec MATERIALIZED into the hidden ordinal:
    * order becomes empty, row order preserved. r14: chunked
    * materialization (Prefix.materializeOrd — order-monotone chunks +
    * partition-local row_number, banded ordinal) with the pre-r14
    * single-partition global window as the fallback for non-bucketable
    * (string) sort keys. `bands` is KEPT (not reset): the banded ordinal
    * inherits the old chunk ids' band bits, so the old band claim stays
    * the correct upper bound for a later append. */
  private[core] def anchored: TadaFrame =
    if (order.isEmpty) this
    else copy(
      df = {
        val d = Prefix.materializeOrd(this).getOrElse(
          df.withColumn(Prefix.MATORD,
            row_number().over(Window.orderBy(orderCols: _*)).cast(LongType)))
        d.withColumn(ORD, d(Prefix.MATORD)).drop(Prefix.MATORD)
      },
      order = Nil)

  def col(n: String): TadaFrame = {
    val keep = (ORD +: labels :+ resolve(n)).distinct
    val f = anchorOrder(df.columns.toSeq.diff(keep))
    f.copy(df = f.df.select(keep.map(f.df(_)): _*))
  }

  def cols(ns: String*): TadaFrame = {
    val keep = (ORD +: labels).distinct ++
      ns.filterNot(n => n == ORD || labels.contains(n)).map(resolve)
    val f = anchorOrder(df.columns.toSeq.diff(keep))
    f.copy(df = f.df.select(keep.map(f.df(_)): _*))
  }

  def subsetCols(idx: Seq[Int]): TadaFrame = cols(idx.map(valueCols): _*)

  def dropCols(ns: String*): TadaFrame = {
    val f = anchorOrder(ns)
    // dropping a LABEL column must also retire the label designation, or
    // `labels` dangles on a missing column and the next projection throws
    f.copy(df = f.df.drop(ns: _*), labels = labels.filterNot(ns.contains))
  }

  def reorderCols(ns: Seq[String]): TadaFrame = cols(ns: _*)

  def withCol(n: String, c: Column): TadaFrame =
    // overwriting an order key's VALUES must not reorder settled rows:
    // anchor and overwrite in ONE projection (both expressions resolve
    // against the pre-overwrite plan — a sequential anchor would strand
    // `c` if it references the old `__ord`, as the fill windows do)
    if (order.exists(_.name == n) && df.columns.contains(n)) {
      // stage `c` into a temp column FIRST (it must see the pre-overwrite
      // values and the old `__ord`), then materialize the order on top —
      // the staged column also rides through anchoring unambiguously
      val staged = copy(df = df.withColumn("__wc_tmp", c)).anchored
      staged.copy(df = staged.df.withColumn(n, staged.df("__wc_tmp")).drop("__wc_tmp"))
    } else copy(df = df.withColumn(n, c))

  /** Cast (series.go:135, dataframe.go Cast, types.go:205-219): column →
    * target dtype in the reference's DType vocabulary — string, float64,
    * datetime, date, time. `time` maps to the HH:mm:ss string image:
    * Spark has no time-of-day type, and the reference's civil.Time
    * surface IS its printed form (pinned by ExampleSeries_Cast_time).
    * Failed coercions null out (try_cast), matching castToFloat64/
    * castToTime's duck-error contract (internal.go:1639-1641). */
  def cast(types: Map[String, String]): TadaFrame =
    types.foldLeft(this) { case (f, (n, dt)) =>
      val c = f.df(n)
      dt match {
        case "string"   => f.withCol(n, TadaFormat.stringify(c, f.df.schema(n).dataType))
        case "float64" | "float" => f.withCol(n, c.try_cast(DoubleType))
        case "datetime" => f.withCol(n, c.try_cast(TimestampType))
        case "date"     => f.withCol(n, c.try_cast(DateType))
        case "time"     => f.withCol(n, date_format(c.try_cast(TimestampType), "HH:mm:ss"))
        case other      => throw new IllegalArgumentException(s"cast: unknown dtype $other")
      }
    }

  def renameCol(from: String, to: String): TadaFrame = {
    val lab = labels.map(l => if (l == from) to else l)
    copy(df = df.withColumnRenamed(from, to), labels = lab,
         order = order.map(s => if (s.name == from) s.copy(name = to) else s))
  }

  def setColNames(ns: Seq[String]): TadaFrame = {
    val vc = valueCols
    require(ns.size == vc.size, s"${ns.size} names for ${vc.size} columns")
    vc.zip(ns).foldLeft(this) { case (f, (o, n)) => f.renameCol(o, n) }
  }

  /** Append `_n` to duplicate names left→right (dataframe.go:457-469). */
  def deduplicateNames: TadaFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val renames = df.columns.toSeq.map { c =>
      val k = seen.getOrElse(c, 0); seen(c) = k + 1
      if (k == 0) c -> c else c -> s"${c}_$k"
    }
    val newDf = df.toDF(renames.map(_._2): _*)
    copy(df = newDf, labels = labels) // label names are unique already
  }

  def filterCols(pred: String => Boolean): TadaFrame =
    cols(valueCols.filter(pred): _*)

  def hasCols(ns: String*): Boolean = ns.forall(df.columns.contains)
  def hasLabels(ns: String*): Boolean = ns.forall(labels.contains)
  def listColNames: Seq[String] = valueCols
  def listLabelNames: Seq[String] = labels

  /** HasType (dataframe.go:258-271): positions of label levels and value
    * columns whose type matches — Spark DataType name in place of the Go
    * slice-type string (e.g. "LongType", "StringType", "DoubleType"). */
  def hasType(typeName: String): (Seq[Int], Seq[Int]) = {
    def idx(ns: Seq[String]) = ns.zipWithIndex.collect {
      case (n, i) if df.schema(n).dataType.toString == typeName => i
    }
    (idx(labels), idx(valueCols))
  }

  /** UnpackIDs/UnpackIDsByName (dataframe.go:508-524): the reference
    * exposes immutable container ids usable anywhere a name is. Spark's
    * analogue is the attribute exprId — stable through every derived
    * transformation that doesn't re-alias the column (filter/sort/
    * withColumn on other columns), which is what makes it "more robust
    * than an index position"; exposed per container name for
    * introspection/debugging. */
  def containerIds(excludeLabels: Boolean = false): Map[String, Long] = {
    val ns = (if (excludeLabels) valueCols else labels ++ valueCols).toSet
    df.queryExecution.analyzed.output
      .filter(a => ns.contains(a.name)).map(a => a.name -> a.exprId.id).toMap
  }

  // ===== §2.3 row selection / filters =====

  /** Positional head/tail/range (series.go:241-286) — expressed as
    * order-limit plans (TopK at scale), never a global row_number. */
  def head(n: Int): TadaFrame = copy(df = df.orderBy(orderCols: _*).limit(n))

  def tail(n: Int): TadaFrame = {
    val rev = reverseOrder(this)
    copy(df = df.orderBy(rev: _*).limit(n))
  }

  def range(first: Int, last: Int): TadaFrame = {
    require(first <= last, s"range: $first > $last")
    head(last).tail(last - first)
  }

  /** Filter by per-container predicates, ANDed; null rows never match
    * (internal.go:1184-1187). Predicates are Column→Column so they stay
    * native expressions inside codegen — tada's FilterFn lambda escape
    * hatch is `filterUdf`. */
  def filter(preds: Map[String, Column => Column]): TadaFrame = {
    val cond = preds.map { case (n, f) =>
      val c = df(resolve(n)); c.isNotNull && f(c)
    }.reduce(_ && _)
    copy(df = df.filter(cond))
  }

  def filter(cond: Column): TadaFrame = copy(df = df.filter(cond))

  /** tada FilterByValue: equality on stringified values (internal.go:241-253). */
  def filterByValue(vals: Map[String, Any]): TadaFrame = {
    val cond = vals.map { case (n, v) =>
      val c = df(resolve(n))
      TadaFormat.stringify(c, df.schema(n).dataType) === lit(v.toString)
    }.reduce(_ && _)
    copy(df = df.filter(cond))
  }

  /** Where(filters, ifTrue, ifFalse) → new column; result is null iff any
    * inspected container is null at that row (dataframe.go:1437-1477). */
  def where(name: String, inspected: Seq[String], pred: Column,
            ifTrue: Column, ifFalse: Column): TadaFrame = {
    val anyNull = inspected.map(df(_).isNull).reduceOption(_ || _).getOrElse(lit(false))
    withCol(name, when(anyNull, lit(null)).otherwise(when(pred, ifTrue).otherwise(ifFalse)))
  }

  def dropNull(subset: String*): TadaFrame = {
    val cs = if (subset.isEmpty) valueCols else subset
    copy(df = df.na.drop(cs))
  }

  def isNullRows(subset: String*): TadaFrame = {
    val cs = if (subset.isEmpty) valueCols else subset
    copy(df = df.filter(cs.map(df(_).isNull).reduce(_ || _)))
  }

  /** FillNull per column (internal.go:936-983). Forward/backward fill is
    * a running `last(ignoreNulls)` in frame order — dispatched to
    * [[Prefix.fill]]'s chunked plan (no single-partition WindowExec);
    * [[fillNullWindow]] is the sequential reference form it falls back to
    * (and is spec-compared against). */
  def fillNull(how: Map[String, FillNullHow]): TadaFrame =
    how.foldLeft(this) { case (f, (n, h)) =>
      h match {
        case FillNullHow.ZeroValue =>
          val dt = f.df.schema(n).dataType
          val zero: Column = dt match {
            case StringType => lit("")
            case _ => lit(0).cast(dt)
          }
          f.withCol(n, coalesce(f.df(n), zero))
        case FillNullHow.Const(v) =>
          f.withCol(n, coalesce(f.df(n).cast(DoubleType), lit(v)))
        case FillNullHow.Forward =>
          Prefix.fill(f, n, forward = true)(f.fillNullWindow(n, forward = true))
        case FillNullHow.Backward =>
          Prefix.fill(f, n, forward = false)(f.fillNullWindow(n, forward = false))
      }
    }

  /** Sequential whole-frame forward/backward fill — one global window;
    * semantic oracle for [[Prefix.fill]] and the no-chunking fallback. */
  private[graft] def fillNullWindow(n: String, forward: Boolean): TadaFrame =
    if (forward) {
      val w = globalWindow.rowsBetween(Window.unboundedPreceding, 0)
      withCol(n, last(df(n), ignoreNulls = true).over(w))
    } else {
      val w = globalWindow.rowsBetween(0, Window.unboundedFollowing)
      withCol(n, first(df(n), ignoreNulls = true).over(w))
    }

  /** First appearance of each value (or labels+value) combo
    * (series.go:1265-1274). `dropDuplicates` does not promise *first*, so
    * pick row_number==1 over appearance order. */
  def unique(includeLabels: Boolean = false, subset: Seq[String] = Nil): TadaFrame = {
    val keyCols0 = if (subset.nonEmpty) subset
                   else if (includeLabels) labels ++ valueCols else valueCols
    val key = TadaFormat.rowKey(keyCols0.map(n => (df(n), df.schema(n).dataType)))
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    copy(df = df.withColumn(RN, row_number().over(w)).filter(org.apache.spark.sql.functions.col(RN) === 1).drop(RN))
  }

  /** Positional single-cell access (series.go:110-119): At(row[,col]). */
  def at(row: Int, colName: String): Option[Any] = {
    val r = range(row, row + 1).sorted.select(colName).collect()
    r.headOption.map(_.get(0))
  }

  /** The frame's df with a DENSE 0-based frame-order position in
    * `Prefix.MATPOS` (r14: chunked — partition-local row_number +
    * broadcast per-chunk count offsets), or the pre-r14 global window
    * form when no chunking exists (string sort key). Callers stage any
    * of their own expressions BEFORE calling (Prefix.materializePos's
    * ambiguity contract). */
  private def positioned: DataFrame =
    Prefix.materializePos(this).getOrElse(
      df.withColumn(Prefix.MATPOS,
        (row_number().over(Window.orderBy(orderCols: _*)) - 1).cast(LongType)))

  /** DropRow(i) (series.go:439-459): delete one row by position. */
  def dropRow(i: Int): TadaFrame = {
    val d = positioned
    copy(df = d.filter(d(Prefix.MATPOS) =!= i.toLong).drop(Prefix.MATPOS))
  }

  /** Subset(index) (series.go:169-189): select rows by position, in the
    * given order. Position resolution needs a frame-order rank — at
    * scale prefer key-based filters; the rank itself plans chunked. */
  def subset(positions: Seq[Int]): TadaFrame = {
    val aug = positioned
    val posDf = df.sparkSession.createDataset(
      positions.map(_.toLong).zipWithIndex)(
      org.apache.spark.sql.Encoders.product[(Long, Int)]).toDF(Prefix.MATPOS, ORD2)
    val joined = aug.join(posDf, Seq(Prefix.MATPOS), "inner")
      .drop(Prefix.MATPOS).drop(ORD).withColumnRenamed(ORD2, ORD)
    copy(df = joined, order = Nil)
  }

  /** FilterIndex (series.go:613-627): positions of matching rows,
    * ascending. The predicate is staged into a column BEFORE the
    * position materialization (ambiguity contract), and the result is
    * ordered explicitly — the chunked frame is multi-partition, so
    * collect order is not frame order. */
  def filterIndex(cond: Column): Seq[Long] = {
    val staged = copy(df = df.withColumn("__fi_m", cond))
    val d = staged.positioned
    d.filter(org.apache.spark.sql.functions.col("__fi_m"))
      .select(Prefix.MATPOS).orderBy(Prefix.MATPOS)
      .collect().map(_.getLong(0)).toSeq
  }

  /** SetRows (series.go:769-792): apply an expression only at the given
    * row positions, keep the column's value elsewhere. */
  def setRows(colName: String, positions: Seq[Int], e: Column): TadaFrame =
    if (order.exists(_.name == colName)) {
      // overwriting a sort key: keep the anchoring withCol form (the
      // position rank must freeze the OLD order, and withCol owns the
      // anchor; exotic shape, no registered query carries it)
      val w = Window.orderBy(orderCols: _*)
      val pos = row_number().over(w) - 1
      withCol(colName, when(pos.isin(positions.map(Integer.valueOf): _*), e)
        .otherwise(df(colName)))
    } else {
      // stage `e` BEFORE the chunked position materialization
      // (Prefix.materializePos's ambiguity contract), then pick per row
      val staged = copy(df = df.withColumn("__sr_tmp", e))
      val d = staged.positioned
      val posL = positions.map(p => java.lang.Long.valueOf(p.toLong))
      copy(df = d.withColumn(colName,
          when(d(Prefix.MATPOS).isin(posL: _*), d("__sr_tmp")).otherwise(d(colName)))
        .drop(Prefix.MATPOS, "__sr_tmp"))
    }

  /** Whole-DF per-column stats (dataframe.go:1910-1993): one aggregate
    * per value column, reshaped long — a Series keyed by column name. */
  def stats(aggName: String, agg: Column => Column): DataFrame = {
    val aggs = valueCols.map(n => agg(df(n)).cast("double").as(n))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = valueCols.map(n => s"'$n', `$n`").mkString(", ")
    wide.selectExpr(s"stack(${valueCols.size}, $pairs) as (col_name, $aggName)")
  }

  /** ValueCounts (series.go:1258-1260): stringified value → count,
    * nulls skipped. */
  def valueCounts(colName: String): DataFrame = {
    val key = TadaFormat.stringify(df(colName), df.schema(colName).dataType)
    df.filter(df(colName).isNotNull)
      .groupBy(key.as("value")).agg(count(lit(1)).as("count"))
  }

  /** Deterministic shuffle (series.go:422-435): rand(seed) becomes the new
    * frame order. */
  /** Shuffle(seed): seeded pseudo-random BIJECTION over the 53-bit
    * ordinal band. r16 used `xxhash64(ord, seed) & (2^53−1)` — a raw
    * hash, whose ~n²/2^54 expected collisions are NOT benign: ordinal
    * uniqueness is load-bearing downstream (Prefix's tail rebuild
    * groups/joins on `__ord`, setRows/dedup are positional), so at the
    * corpus scales this engine targets (~20 expected duplicate ordinals
    * at the 600M-row ×1000 probe scale) a shuffled frame feeding a
    * chunked op would silently merge two rows' windows (r16 ADVICE,
    * medium). r17: a 3-round unbalanced add-Feistel over the 26/27-bit
    * halves of the band — each round adds a seeded hash of one half
    * into the other modulo the half's width, so every round is
    * invertible (subtract the same hash) and the composition is a true
    * permutation of [0, 2^53): collision-free BY CONSTRUCTION, still
    * deterministic, sort-free, and one map-side expression.
    *
    * APPENDED frames (`bands` > 1) carry ordinals in [0, bands·2^53) —
    * and both append sides share ingest ordinals in their low 53 bits,
    * so any permutation that ignored the band bits would collide them
    * SYSTEMATICALLY (one duplicate ordinal per shared ingest position,
    * not ~n²/2^54). The full construction is a bijection of
    * [0, bands) × [0, 2^53): the band TWEAKS every Feistel round hash
    * (each band gets its own permutation of the inner domain), and the
    * output band is `(band + h(inner')) mod bands` — invertible because
    * inner' alone recovers the band offset, then the band recovers the
    * tweaked Feistel. Output ordinals stay in [0, bands·2^53) and
    * `bands` is KEPT, so the append band budget still holds downstream;
    * the single-band case reduces to the plain Feistel. */
  def shuffle(seed: Long): TadaFrame = {
    val maskA = (1L << 26) - 1 // high half of the inner 53: bits 27..52
    val maskB = (1L << 27) - 1 // low half: bits 0..26
    val inner = df(ORD).bitwiseAND(lit((1L << 53) - 1))
    val band = shiftright(df(ORD), 53) // ∈ [0, bands)
    var l: Column = shiftright(inner, 27)
    var r: Column = inner.bitwiseAND(lit(maskB))
    for (round <- 0 until 3) {
      r = (r + xxhash64(l, band, lit(seed), lit(round)).bitwiseAND(lit(maskB)))
        .bitwiseAND(lit(maskB))
      l = (l + xxhash64(r, band, lit(seed), lit(round + 64)).bitwiseAND(lit(maskA)))
        .bitwiseAND(lit(maskA))
    }
    val innerP = shiftleft(l, 27).bitwiseOR(r)
    val newOrd =
      if (bands == 1) innerP
      else {
        // double-pmod keeps every intermediate < 2·bands (no ANSI
        // overflow risk from adding a raw 64-bit hash)
        val bandP = pmod(pmod(xxhash64(innerP, lit(seed), lit(7)),
          lit(bands.toLong)) + band, lit(bands.toLong))
        shiftleft(bandP, 53) + innerP
      }
    copy(df = df.withColumn(ORD, newOrd), order = Nil, bands = bands)
  }

  // ===== §2.7 sort =====

  /** Multi-key stable sort, nulls last both directions
    * (internal.go:1257-1330). Lazy: records the spec; consumers emit
    * `orderBy` which Spark plans as a range-partitioned sort. */
  def sort(by: Sorter*): TadaFrame = copy(order = by.toSeq)

  /** Materialized sorted view (for writers/golden output). */
  def sorted: DataFrame = df.orderBy(orderCols: _*)

  // ===== §2.8 set ops =====

  /** Vertical concat = UNION ALL (series.go:486-508); on type mismatch
    * tada coerces both sides to string (internal.go:1159-1170). */
  def append(other: TadaFrame): TadaFrame = {
    require(valueCols.size == other.valueCols.size && labels.size == other.labels.size,
      "append: container counts differ")
    val pairs = (labels ++ valueCols).zip(other.labels ++ other.valueCols)
    var (l, r) = (df, other.df)
    pairs.foreach { case (a, b) =>
      val (ta, tb) = (l.schema(a).dataType, r.schema(b).dataType)
      if (ta != tb) {
        l = l.withColumn(a, l(a).cast(StringType))
        r = r.withColumn(b, r(b).cast(StringType))
      }
      r = r.withColumnRenamed(b, a)
    }
    // Appended rows come after the anchor's: shift the right side's
    // ordinals into the bands above the left's. Band width 2^53 holds any
    // monotonically_increasing_id up to 2^20 partitions (id = partition
    // << 33 | row); tracking consumed bands per frame keeps chained
    // appends a.append(b).append(c) in disjoint, correctly ordered bands
    // (a fixed shift would interleave b's and c's rows).
    require(bands.toLong + other.bands <= 1000,
      "append: ordinal band budget exhausted (1000 chained appends)")
    r = r.withColumn(ORD, r(ORD) + lit(bands.toLong << 53))
    val outCols = (ORD +: labels) ++ valueCols
    copy(df = l.select(outCols.map(l(_)): _*)
      .unionByName(r.select(outCols.map(r(_)): _*)),
      bands = bands + other.bands)
  }

  // ===== label ↔ column moves (§2.10) =====

  def setAsLabels(ns: String*): TadaFrame = copy(labels = labels ++ ns)

  def resetLabels(ns: String*): TadaFrame = {
    val drop = if (ns.isEmpty) labels else ns
    // "*"-prefixed labels get renamed on reset — anchor order first or
    // a sort spec naming the old name dangles
    val f = anchorOrder(drop.filter(_.startsWith("*")))
    val renamed = drop.foldLeft(f.df) { (d, n) =>
      if (n.startsWith("*")) d.withColumnRenamed(n, n.stripPrefix("*")) else d
    }
    f.copy(df = renamed, labels = labels.filterNot(drop.contains))
  }

  def relabel(): TadaFrame = {
    val gone = labels.filterNot(_ == ORD)
    val f = anchorOrder(gone)
    f.copy(df = f.df.drop(gone: _*), labels = Nil).defaultLabels
  }

  def swapLabels(a: String, b: String): TadaFrame = {
    val i = labels.indexOf(a); val j = labels.indexOf(b)
    require(i >= 0 && j >= 0, s"labels $a/$b not found")
    copy(labels = labels.updated(i, b).updated(j, a))
  }

  def subsetLabels(ns: Seq[String]): TadaFrame = {
    val gone = labels.filterNot(ns.contains)
    val f = anchorOrder(gone)
    f.copy(df = f.df.drop(gone: _*), labels = ns)
  }

  private def defaultLabels: TadaFrame =
    if (labels.nonEmpty) this
    else copy(df = df.withColumn("*0", df(ORD)), labels = Seq("*0"))

  // ===== grouping =====

  def groupBy(ns: String*): TadaGrouped = {
    val keys = if (ns.nonEmpty) ns.toSeq else labels
    TadaGrouped(this, keys, aligned = false)
  }

  /** The reference's exact grouping contract (§1.5): keys are the "|"-
    * joined stringified row values — cross-container concatenation
    * collisions included. `groupBy` (typed columns) is the Spark-first
    * default; this variant is bit-for-bit tada. */
  def groupByStringified(ns: String*): TadaGrouped = {
    val keys = if (ns.nonEmpty) ns.toSeq else labels
    TadaGrouped(this, keys, aligned = false, stringified = true)
  }

  /** Row iterator in frame order (series.go:970-995): the driver-side
    * escape hatch; streams one partition at a time, never materializes
    * the frame. Cell = (name → value, null as None). */
  def iterator(): Iterator[Map[String, Option[Any]]] = {
    val cs = labels ++ valueCols
    sorted.select(cs.map(df(_)): _*).toLocalIterator()
      .asInstanceOf[java.util.Iterator[org.apache.spark.sql.Row]]
      .asScala.map { r =>
        cs.zipWithIndex.map { case (n, i) =>
          n -> (if (r.isNullAt(i)) None else Some(r.get(i))) }.toMap
      }
  }

  /** Collapse a column-name level (dropColLevel, dataframe.go:1832-1840):
    * multi-level names are "|"-joined (options.go:9); dropping level i
    * removes that segment from every value-column name. */
  def dropColLevel(level: Int): TadaFrame = {
    val renames = valueCols.map { c =>
      val parts = c.split('|')
      c -> (if (level < parts.length) parts.patch(level, Nil, 1).mkString("|") else c)
    }
    val d = renames.foldLeft(df) { case (acc, (from, to)) =>
      if (from == to) acc else acc.withColumnRenamed(from, to) }
    copy(df = d,
      colLevelNames = colLevelNames.patch(level, Nil, 1) match {
        case Nil => Seq("*0"); case x => x })
  }

  // ===== output =====

  /** Collected records with tada null rendering "(null)"
    * (internal.go:2866-2890) — test/golden harness path, driver-side. */
  def records(includeLabels: Boolean = true,
              nullPrinter: String = "(null)"): Seq[Seq[String]] = {
    val cs = (if (includeLabels) labels else Nil) ++ valueCols
    val out = sorted.select(cs.map(n =>
      coalesce(TadaFormat.stringify(df(n), df.schema(n).dataType), lit(nullPrinter)).as(n)): _*)
    cs +: out.collect().toSeq.map(r => (0 until r.length).map(r.getString))
  }

  /** The public DataFrame view: labels first, no hidden columns, frame
    * order applied. This is what queries hand to the driver. */
  def out: DataFrame = {
    val cs = (labels ++ valueCols).map(df(_))
    df.orderBy(orderCols: _*).select(cs: _*)
  }
}

object TadaFrame {
  /** Hidden ordinal — scan order at ingest (SURVEY §1.2 Spark mapping).
    * `monotonically_increasing_id` is (partition << 33 | row), which sorts
    * identically to scan order and costs nothing — no global counter, no
    * shuffle, valid at any scale. */
  val ORD = "__ord"
  private[core] val ORD2 = "__ord2"
  private[core] val RN = "__rn"

  /** Ingest: wrap a source DataFrame; `labelCols` become label levels, a
    * default hidden label is fabricated if none given (internal.go:162-174). */
  def ingest(src: DataFrame, labelCols: Seq[String] = Nil, name: String = ""): TadaFrame = {
    val withOrd = src.withColumn(ORD, monotonically_increasing_id())
    TadaFrame(withOrd, labelCols, name)
  }

  private[core] def reverseOrder(f: TadaFrame): Seq[Column] = {
    val keys = f.order.map { s =>
      val c0 = f.df(s.name)
      val c = s.cast.map(c0.cast).getOrElse(c0)
      if (s.descending) c.asc_nulls_first else c.desc_nulls_first
    }
    keys :+ f.df(ORD).desc
  }
}
