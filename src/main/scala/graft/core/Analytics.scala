package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Whole-series analytics (SURVEY.md §2.6): cumsum, shift, dense rank,
  * exclusive percentile, bin, percentile-bin, resample.
  *
  * Whole-series rank/percentile/cumsum are order-global by definition —
  * the reference runs single-threaded over the full column. Here they are
  * single-partition window functions (documented); every operator also
  * takes optional partition columns so the scaled form
  * (per-group analytics over a keyed window) is the same code path.
  */
object Analytics {
  import TadaFrame.ORD

  /** Day-shift that maps `weekStart` onto Monday: (8 − isoDay) mod 7.
    * All seven weekdays accepted, mirroring the reference's
    * `time.Weekday` switch (internal.go:2432-2438). */
  def weekStartShift(weekStart: String): Int = {
    val iso = Map("MONDAY" -> 1, "TUESDAY" -> 2, "WEDNESDAY" -> 3,
      "THURSDAY" -> 4, "FRIDAY" -> 5, "SATURDAY" -> 6, "SUNDAY" -> 7)
    val d = iso.getOrElse(weekStart.toUpperCase,
      throw new IllegalArgumentException(s"weekStart $weekStart"))
    (8 - d) % 7
  }

  private def win(f: TadaFrame, partitionBy: Seq[String]): WindowSpec =
    if (partitionBy.isEmpty) f.globalWindow
    else Window.partitionBy(partitionBy.map(f.df(_)): _*).orderBy(f.orderCols: _*)

  /** CumSum (internal.go:2173-2183): nulls contribute 0, result never null. */
  def cumSum(f: TadaFrame, c: String, out: String,
             partitionBy: Seq[String] = Nil): TadaFrame = {
    val w = win(f, partitionBy).rowsBetween(Window.unboundedPreceding, 0)
    val zero = F.lit(0).cast(f.df.schema(c).dataType)
    f.withCol(out, F.sum(F.coalesce(f.df(c), zero)).over(w))
  }

  /** Shift(n) (internal.go:1141-1155): value from n rows back, else null. */
  def shift(f: TadaFrame, c: String, n: Int, out: String,
            partitionBy: Seq[String] = Nil): TadaFrame =
    f.withCol(out, F.lag(f.df(c), n).over(win(f, partitionBy)))

  /** Dense rank ascending over values; ties share a rank; null in ⇒ null
    * out (internal.go:2302-2351). dense_rank counts null rows as a rank,
    * so rank nulls first and subtract the null bucket. */
  def rankDense(f: TadaFrame, c: String, out: String,
                partitionBy: Seq[String] = Nil): TadaFrame = {
    val v = f.df(c)
    val wOrder =
      if (partitionBy.isEmpty) Window.orderBy(v.asc_nulls_first)
      else Window.partitionBy(partitionBy.map(f.df(_)): _*).orderBy(v.asc_nulls_first)
    val wAll =
      if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(f.df(_)): _*)
    val hasNulls = F.max(v.isNull.cast(IntegerType)).over(wAll)
    val r = F.dense_rank().over(wOrder) - hasNulls
    f.withCol(out, F.when(v.isNull, F.lit(null)).otherwise(r))
  }

  /** Exclusive percentile (internal.go:2353-2388): fraction of non-null
    * values STRICTLY below; ties share the first-occurrence value —
    * `(min_rank - 1) / count_nonnull`. Deliberately NOT `percent_rank`
    * ((r-1)/(n-1)) nor `cume_dist` (≤, not <). */
  def percentile(f: TadaFrame, c: String, out: String,
                 partitionBy: Seq[String] = Nil): TadaFrame = {
    val v = f.df(c)
    val part = partitionBy.map(f.df(_))
    val wOrder = if (part.isEmpty) Window.orderBy(v.asc_nulls_first)
                 else Window.partitionBy(part: _*).orderBy(v.asc_nulls_first)
    val wAll = if (part.isEmpty) Window.partitionBy() else Window.partitionBy(part: _*)
    val nNull = F.sum(v.isNull.cast(LongType)).over(wAll)
    val nNonNull = F.count(v).over(wAll)
    val minRank = F.rank().over(wOrder) // ties → min rank; nulls occupy the first ranks
    val pct = (minRank - nNull - 1).cast(DoubleType) / nNonNull
    f.withCol(out, F.when(v.isNull, F.lit(null)).otherwise(pct))
  }

  /** Bin(edges) (internal.go:2208-2300): left-EXclusive right-INclusive
    * `lo < x <= hi`; `andLess/andMore` add open edge bins; labels default
    * to "lo-hi". (Spark ML Bucketizer is left-inclusive — wrong edge rule.) */
  def bin(f: TadaFrame, c: String, edges: Seq[Double], out: String,
          labels: Seq[String] = Nil, andLess: Boolean = false,
          andMore: Boolean = false): TadaFrame = {
    require(edges.size >= 2, "bin: need at least 2 edges")
    require(labels.isEmpty || labels.size == edges.size - 1,
      s"bin: ${labels.size} labels for ${edges.size - 1} bins")
    def fmt(d: Double): String = if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    val coreLabels =
      if (labels.nonEmpty) labels
      else edges.sliding(2).map { case Seq(a, b) => s"${fmt(a)}-${fmt(b)}" }.toSeq
    val v = f.df(c)
    var expr: Column = F.lit(null).cast(StringType)
    // build the when-chain from the last bin backwards
    edges.sliding(2).toSeq.zip(coreLabels).reverse.foreach { case (Seq(lo, hi), lab) =>
      expr = F.when(v > lo && v <= hi, F.lit(lab)).otherwise(expr)
    }
    if (andLess) expr = F.when(v <= edges.head, F.lit(s"<=${fmt(edges.head)}")).otherwise(expr)
    if (andMore) expr = F.when(v > edges.last, F.lit(s">${fmt(edges.last)}")).otherwise(expr)
    f.withCol(out, F.when(v.isNull, F.lit(null)).otherwise(expr))
  }

  /** PercentileBin (internal.go:2392-2408): bin the exclusive percentile;
    * edges here are left-INclusive right-EXclusive — opposite of Bin. */
  def percentileBin(f: TadaFrame, c: String, edges: Seq[Double], out: String,
                    partitionBy: Seq[String] = Nil,
                    labels: Seq[String] = Nil): TadaFrame = {
    require(labels.isEmpty || labels.size == edges.size - 1,
      s"percentileBin: ${labels.size} labels for ${edges.size - 1} bins")
    val tmp = "__pct"
    val withPct = percentile(f, c, tmp, partitionBy)
    def fmt(d: Double): String = if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    val v = withPct.df(tmp)
    val binLabels =
      if (labels.nonEmpty) labels // Binner{Labels} (internal.go:2392-2408)
      else edges.sliding(2).map { case Seq(a, b) => s"${fmt(a)}-${fmt(b)}" }.toSeq
    var expr: Column = F.lit(null).cast(StringType)
    edges.sliding(2).toSeq.zip(binLabels).reverse.foreach { case (Seq(lo, hi), lab) =>
      expr = F.when(v >= lo && v < hi, F.lit(lab)).otherwise(expr)
    }
    // top edge inclusive so pct == last edge still bins (reference keeps 1.0 out of range; percentiles are < 1 by construction)
    withPct.withCol(out, F.when(v.isNull, F.lit(null)).otherwise(expr)).dropCols(tmp)
  }

  /** Resample (internal.go:2423-2479): truncate datetimes by year / month /
    * day / week(start day) / hour / minute / second, or floor to an
    * arbitrary duration. All native date_trunc / epoch math — codegen'd. */
  def resample(f: TadaFrame, c: String, by: String, out: String,
               weekStart: String = "MONDAY"): TadaFrame = {
    val v = f.df(c)
    val e: Column = by.toLowerCase match {
      case "year" | "month" | "day" | "hour" | "minute" | "second" =>
        F.date_trunc(by, v)
      case "week" =>
        // date_trunc("week") is Monday-start; any start day W reduces to
        // it by shifting W onto Monday first and shifting back after —
        // shift = (8 − isoDay(W)) mod 7 days (internal.go:2432-2438
        // accepts all seven time.Weekday values; so does this).
        val shiftDays = Analytics.weekStartShift(weekStart)
        F.date_trunc("week", F.date_add(v, shiftDays)).cast(TimestampType) - F.expr(s"INTERVAL $shiftDays DAYS")
      case other => throw new IllegalArgumentException(s"resample by $other")
    }
    f.withCol(out, e)
  }

  /** Resample by arbitrary duration: floor to a multiple of `micros`.
    * Pure integer arithmetic — epoch-micros exceed 2^53, so a double
    * division would round near bucket boundaries. */
  def resampleDuration(f: TadaFrame, c: String, micros: Long, out: String): TadaFrame = {
    val us = F.unix_micros(f.df(c))
    f.withCol(out, F.timestamp_micros(us - F.pmod(us, F.lit(micros))))
  }
}
