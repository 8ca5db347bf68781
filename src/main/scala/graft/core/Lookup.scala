package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** tada joins (SURVEY.md §2.4): lookup-style left joins with
  * '''first-match-only''' semantics — a right key appearing k times
  * contributes only its first row (internal.go:1486-1495), so result
  * cardinality always equals the anchor side's. This is the big semantic
  * divergence from SQL joins and is enforced here for every join-shaped
  * op (including Series arithmetic alignment, internal.go:1519-1558).
  *
  * Scale shape: dedup-first is a per-key window over the right side
  * (combines with the join's own shuffle under the same hash
  * partitioning), then a plain equi-join Catalyst is free to broadcast
  * when the deduped right is small — at 100 TB the dim-side lookup
  * becomes a broadcast-hash-join with zero extra shuffles.
  */
object Lookup {
  import TadaFrame.{ORD, RN}

  /** Keep only the first row (in frame order) per right-side key. */
  def firstMatchOnly(right: TadaFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(right.df(_)): _*).orderBy(right.orderCols: _*)
    right.df.withColumn(RN, F.row_number().over(w))
      .filter(F.col(RN) === 1).drop(RN)
  }

  /** Auto key discovery: shared label names (internal.go:187-213), else
    * explicit leftOn/rightOn. */
  def autoKeys(left: TadaFrame, right: TadaFrame): Seq[String] = {
    val shared = left.labels.filter(right.labels.contains)
    require(shared.nonEmpty, "lookup: no shared label names and no explicit keys")
    shared
  }

  /** Series-style Lookup (series.go Lookup → lookup, pinned by
    * example_series_test.go:189-267): the result keeps the LEFT's shape —
    * its labels, name, and value-column names — while the VALUES come
    * from the right's first-match rows aligned on the join keys.
    * how="left" keeps every left row (unmatched ⇒ null); "inner" keeps
    * matched rows only. Right value columns pair with left value columns
    * positionally (the series case is 1:1). Same scale shape as merge:
    * first-match window + equi-join, broadcastable right. */
  def lookup(left: TadaFrame, right: TadaFrame, how: String = "left",
             leftOn: Seq[String] = Nil, rightOn: Seq[String] = Nil): TadaFrame = {
    require(how == "left" || how == "inner", s"lookup: unsupported how=$how")
    val lk = if (leftOn.nonEmpty) leftOn else autoKeys(left, right)
    val rk = if (rightOn.nonEmpty) rightOn else lk
    val rDedup = firstMatchOnly(right, rk)
    val rvNames = right.valueCols.filterNot(rk.contains)
    val lvNames = left.valueCols
    require(rvNames.size == lvNames.size,
      s"lookup: ${rvNames.size} right value cols for ${lvNames.size} left")
    // all renames ride ONE projection: sequential withColumnRenamed can
    // merge distinct columns when a rename target equals a later source
    val rSel = rDedup.select(
      rk.zip(lk).map { case (r, l) => rDedup(r).as(l) } ++
        rvNames.zip(lvNames).map { case (r, l) => rDedup(r).as(l) }: _*)
    val lCols = (ORD +: (left.labels ++ lk).distinct).map(left.df(_))
    val joined = left.df.select(lCols: _*)
      .join(rSel, lk, if (how == "inner") "inner" else "left")
    TadaFrame(joined, left.labels, left.name, left.colLevelNames, left.order,
      bands = left.bands)
  }

  /** Merge (dataframe.go:1606-1657): anchor keeps all its containers and
    * gains the right side's value columns; unmatched ⇒ null; `inner` =
    * left-merge then drop rows that found no match; `right` = swap sides.
    * Result ordinal = anchor ordinal (cardinality preserved). */
  def merge(left: TadaFrame, right: TadaFrame, how: String = "left",
            leftOn: Seq[String] = Nil, rightOn: Seq[String] = Nil,
            broadcastRight: Boolean = false,
            uniqueRight: Boolean = false): TadaFrame = how match {
    case "right" => merge(right, left, "left", rightOn, leftOn, broadcastRight, uniqueRight)
    case _ =>
      val lk = if (leftOn.nonEmpty) leftOn else autoKeys(left, right)
      val rk = if (rightOn.nonEmpty) rightOn else lk
      // when the caller vouches the right key is unique (dim tables),
      // first-match dedup is a no-op — skip its window shuffle entirely
      val rDedup0 = if (uniqueRight) right.df else firstMatchOnly(right, rk)
      // bring over only right VALUE columns; rename join keys to match left
      val rCols = rk.map(rDedup0(_)) ++ right.valueCols.filterNot(rk.contains).map(rDedup0(_))
      var rSel = rDedup0.select(rCols: _*)
      rk.zip(lk).foreach { case (r, l) => if (r != l) rSel = rSel.withColumnRenamed(r, l) }
      // value names colliding with a left column take the `_N` suffix
      // BEFORE the join (dataframe.go:457-469) so the joined plan never
      // holds ambiguous duplicate names (inner-mode na.drop needs them)
      val taken = scala.collection.mutable.Set(left.df.columns.toSeq: _*)
      rSel.columns.filterNot(lk.contains).foreach { c =>
        if (taken.contains(c)) {
          var i = 1
          while (taken.contains(s"${c}_$i")) i += 1
          rSel = rSel.withColumnRenamed(c, s"${c}_$i")
          taken += s"${c}_$i"
        } else taken += c
      }
      val rFinal = if (broadcastRight) F.broadcast(rSel) else rSel
      val joined = left.df.join(rFinal, lk, "left")
      val withMatch = how match {
        case "inner" =>
          // Faithful to the reference: inner merge = left merge + DropNull()
          // (dataframe.go:1649-1651 calls DropNull with no subset), and a
          // no-subset DropNull inspects only VALUE containers
          // (dataframe.go:695-716 iterates df.values, not labels) — so
          // unmatched rows drop (their looked-up columns are null) and so
          // do matched rows with a null value column, but a null in a
          // label level alone keeps the row.
          val values = joined.columns.filterNot(c => c == ORD || left.labels.contains(c))
          joined.na.drop(values.toSeq)
        case _ => joined
      }
      val f = TadaFrame(withMatch, left.labels, left.name, left.colLevelNames, left.order,
        bands = left.bands)
      f.deduplicateNames
  }

  /** Elementwise arithmetic with lookup alignment
    * (combineMath internal.go:1519-1558): coerce to double, align other
    * via first-match lookup on shared keys, combine; div-by-0 ⇒ null;
    * ignoreNulls treats a missing/null side as 0. */
  def combineMath(left: TadaFrame, right: TadaFrame, op: String,
                  leftOn: Seq[String], rightOn: Seq[String],
                  leftVal: String, rightVal: String,
                  out: String, ignoreNulls: Boolean = false): TadaFrame = {
    val merged = merge(left, right.cols((rightOn :+ rightVal).distinct: _*),
      leftOn = leftOn, rightOn = rightOn)
    val rCol0 = if (leftVal == rightVal) s"${rightVal}_1" else rightVal
    val l0 = merged.df(leftVal).cast("double")
    val r0 = merged.df(rCol0).cast("double")
    val l = if (ignoreNulls) F.coalesce(l0, F.lit(0.0)) else l0
    val r = if (ignoreNulls) F.coalesce(r0, F.lit(0.0)) else r0
    val res = op match {
      case "add" => l + r
      case "subtract" => l - r
      case "multiply" => l * r
      case "divide" => F.when(r === 0.0, F.lit(null)).otherwise(l / r)
    }
    // NaN/Inf ⇒ null (internal.go:1543-1551)
    val guarded = F.when(F.isnan(res) || res === Double.PositiveInfinity ||
      res === Double.NegativeInfinity, F.lit(null)).otherwise(res)
    merged.withCol(out, guarded).dropCols(leftVal, rCol0)
  }
}
