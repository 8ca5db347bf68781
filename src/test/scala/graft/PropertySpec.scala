package graft

import graft.core.{Lookup, TadaFrame, Sorter}
import graft.pipeline.{Embeddings, Sampling, TextOps}
import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests — the layer the reference lacks entirely
  * (SURVEY §5: all its tests are example-based). Each property drives
  * real Spark jobs, so minSuccessfulTests stays small; the generators
  * aim at the semantic contracts most likely to break under refactors:
  * first-match join cardinality, nulls-last sorts, sampling determinism,
  * metric ranges, fixed-point non-negativity. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("first-match merge NEVER multiplies rows, for any key multisets") {
    val gen = for {
      lk <- Gen.listOfN(12, Gen.choose(0, 5))
      rk <- Gen.listOfN(12, Gen.choose(0, 5))
    } yield (lk, rk)
    check("cardinality", 10)(Prop.forAll(gen) { case (lk, rk) =>
      val left = TadaFrame.ingest(
        lk.zipWithIndex.map { case (k, i) => (k, s"l$i") }.toDF("k", "lv"))
      val right = TadaFrame.ingest(
        rk.zipWithIndex.map { case (k, i) => (k, s"r$i") }.toDF("k", "rv"))
      val merged = Lookup.merge(left, right, leftOn = Seq("k"), rightOn = Seq("k"))
      merged.df.count() == lk.size
    })
  }

  test("interface records roundtrip read->write->read for any mixed table") {
    // cells drawn from the mixed-type families the reference's
    // [][]interface{} reader accepts; the roundtrip contract is that a
    // second read of the written records reproduces the same stringified
    // frame (typed values survive, nulls stay null, headers survive)
    val cell: Gen[Any] = Gen.oneOf(
      Gen.choose(-1000L, 1000L).map(x => x: Any),
      Gen.choose(-10.0, 10.0).map(x => x: Any),
      Gen.alphaNumStr.map(s => s.take(8): Any),
      Gen.oneOf(true, false).map(x => x: Any),
      Gen.const(null: Any))
    val table: Gen[(Int, List[List[Any]])] = for {
      w <- Gen.choose(1, 4)
      h <- Gen.choose(1, 6)
      rows <- Gen.listOfN(h, Gen.listOfN(w, cell))
    } yield (w, rows)
    check("interface-roundtrip", 10)(Prop.forAll(table) { case (w, rows) =>
      val header = (0 until w).map(i => s"c$i": Any).toList
      val recs = header +: rows.map(_.toList)
      val f = graft.io.TadaIO.readInterfaceRecords(spark, recs)
      val out = graft.io.TadaIO.writeInterfaceRecords(f)
      val f2 = graft.io.TadaIO.readInterfaceRecords(spark, out)
      f.records() == f2.records()
    })
  }

  test("sort places nulls last in BOTH directions, for any null mix") {
    val gen = Gen.listOfN(10, Gen.option(Gen.choose(-50, 50)))
    check("nulls-last", 8)(Prop.forAll(gen) { xs =>
      val df = xs.map(x => Tuple1(x.map(_.toString).orNull)).toDF("v")
        .select(F.col("v").cast("int").as("v"))
      val nNull = xs.count(_.isEmpty)
      def tailNulls(desc: Boolean) = {
        val f = TadaFrame.ingest(df).sort(Sorter("v", descending = desc))
        val vals = f.sorted.select("v").collect().map(r => Option(r.get(0)))
        vals.takeRight(nNull).forall(_.isEmpty) &&
          vals.dropRight(nNull).forall(_.nonEmpty)
      }
      tailNulls(desc = false) && tailNulls(desc = true)
    })
  }

  test("deterministic sampling is a pure row predicate: union = disjoint parts") {
    val gen = Gen.listOfN(40, Gen.choose(0L, 1000000L)).map(_.distinct)
    check("sampling", 8)(Prop.forAll(gen) { ids =>
      val df = ids.toDF("id")
      val in = Sampling.deterministic(df, F.col("id").cast("string"), 3000)
        .select("id").collect().map(_.getLong(0)).toSet
      val out = df.filter(Sampling.hashBp(F.col("id").cast("string")) >= 3000)
        .select("id").collect().map(_.getLong(0)).toSet
      (in intersect out).isEmpty && (in union out) == ids.toSet
    })
  }

  test("dupNgramFraction is in [0,1) and 0 below n tokens, for any word list") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val gen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    check("repetition-range", 8)(Prop.forAll(gen) { ws =>
      val df = Seq(Tuple1(ws.mkString(" "))).toDF("text")
      val f = df.select(TextOps.dupNgramFraction(F.col("text"), 2).as("f"))
        .head().getDouble(0)
      if (ws.size < 2) f == 0.0 else f >= 0.0 && f < 1.0
    })
  }

  test("winnow fingerprints are a subset of k-gram hashes; shared run => shared fp") {
    val word = Gen.oneOf("u1", "u2", "u3", "u4", "u5", "u6", "u7", "u8")
    val gen = for {
      a <- Gen.listOfN(8, word)
      b <- Gen.listOfN(8, word)
      shared <- Gen.listOfN(6, word) // w+k-1 = 6 guarantees a shared window
    } yield (a ++ shared, shared ++ b)
    check("winnow", 8)(Prop.forAll(gen) { case (d1, d2) =>
      val df = Seq((1, d1.mkString(" ")), (2, d2.mkString(" "))).toDF("id", "text")
      val rows = df.select($"id", TextOps.tokens($"text").as("w"))
        .select($"id", TextOps.kgramHashes($"w", 3).as("h"))
        .select($"id", $"h", TextOps.winnow($"h", 4).as("fp"))
        .collect().map(r => r.getInt(0) ->
          (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet)).toMap
      val subset = rows.values.forall { case (h, fp) => fp.subsetOf(h) }
      val sharedFp = (rows(1)._2 intersect rows(2)._2).nonEmpty
      subset && sharedFp
    })
  }

  test("packSequences: packs are contiguous per source and never overfill past one doc") {
    val gen = Gen.listOfN(20, Gen.choose(0, 40))
    check("packing", 8)(Prop.forAll(gen) { toks =>
      val docs = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, if (i % 2 == 0) "a" else "b", t.toLong) }
        .toDF("id", "src", "tok")
      val out = Sampling.packSequences(docs, "src", "id", F.col("tok"), budget = 32)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      out.groupBy(_._1).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        // pack ids never decrease in source order (contiguity)...
        val packs = sorted.map(_._4)
        val monotone = packs.zip(packs.drop(1)).forall { case (a, b) => a <= b }
        // ...and a pack's token total minus its LAST doc stays under budget
        // (only the straddling doc may push past the boundary)
        val bounded = sorted.groupBy(_._4).values.forall { p =>
          val total = p.map(_._3).sum
          total - p.map(_._3).max <= 32
        }
        monotone && bounded
      }
    })
  }

  test("mixtureRates: rates are always in [0, 10000] and 0 for untargeted sources") {
    val gen = for {
      ns <- Gen.listOfN(4, Gen.choose(1, 30))
      budget <- Gen.choose(1L, 500L)
    } yield (ns, budget)
    check("mixture", 8)(Prop.forAll(gen) { case (ns, budget) =>
      val docs = ns.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s"s$s", i))
      }.toDF("source", "x")
      val rates = Sampling.mixtureRates(docs, "source",
        Map("s0" -> 6000, "s1" -> 4000), budget)
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      rates.values.forall(r => r >= 0 && r <= 10000) &&
        rates.getOrElse("s2", 0L) == 0L && rates.getOrElse("s3", 0L) == 0L
    })
  }

  test("clusterStats: within-variance and centroid norm are never negative") {
    val vec = Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 1000.0f))
    val gen = Gen.listOfN(6, Gen.zip(Gen.choose(0, 1), vec))
    check("fixed-point", 8)(Prop.forAll(gen) { rows =>
      val df = rows.map { case (l, v) => (l, v.toArray) }.toDF("label", "embedding")
      Embeddings.clusterStats(df, "label", "embedding")
        .collect().forall { r =>
          r.getDouble(4) >= 0.0 && r.getDouble(5) >= -1e-12
        }
    })
  }

  // ===== label ↔ column move family vs an in-memory model (r8 task 7) =====

  /** The model mirrors the frame's ORDER MACHINERY, not just its names:
    * `tiebreak` is what `__ord` encodes (ingest order until a structural
    * op removes/overwrites a live sort key, at which point the frame
    * anchors the current order into `__ord` and clears the spec), and
    * `spec` is the lazy sort. Rendered rows = stable nulls-last sort of
    * `tiebreak` by `spec`. */
  private case class MoveModel(schema: Vector[String],
                               data: Map[String, Vector[Option[String]]],
                               labels: Vector[String],
                               tiebreak: Vector[Int],
                               spec: List[(String, Boolean)]) {
    def valueCols: Vector[String] = schema.filterNot(labels.contains)
    def rows: Vector[Int] = {
      val ord = new Ordering[Int] {
        def compare(a: Int, b: Int): Int =
          spec.iterator.map { case (c, desc) =>
            (data(c)(a), data(c)(b)) match {
              case (None, None) => 0
              case (None, _) => 1 // nulls last, both directions
              case (_, None) => -1
              case (Some(u), Some(v)) =>
                val d = u.compareTo(v); if (desc) -d else d
            }
          }.find(_ != 0).getOrElse(0)
      }
      tiebreak.sorted(ord) // TimSort — stable, so tiebreak IS the tie rule
    }
    private def anchorIf(affected: Iterable[String]): MoveModel =
      if (spec.exists(s => affected.exists(_ == s._1)))
        copy(tiebreak = rows, spec = Nil)
      else this
    def setLabel(c: String): MoveModel = copy(labels = labels :+ c)
    def resetAll(): MoveModel = copy(labels = Vector.empty)
    def swap(i: Int, j: Int): MoveModel =
      copy(labels = labels.updated(i, labels(j)).updated(j, labels(i)))
    def subset(keep: Vector[String]): MoveModel = {
      val gone = labels.filterNot(keep.contains)
      val m = anchorIf(gone)
      m.copy(schema = m.schema.filterNot(gone.contains),
        data = m.data -- gone, labels = keep)
    }
    def dropValue(c: String): MoveModel = {
      val m = anchorIf(Seq(c))
      m.copy(schema = m.schema.filterNot(_ == c), data = m.data - c,
        labels = m.labels.filterNot(_ == c))
    }
    def sort(keys: List[(String, Boolean)]): MoveModel = copy(spec = keys)
    def render: Seq[Seq[String]] =
      (labels ++ valueCols) +:
        rows.map(r => (labels ++ valueCols).map(c => data(c)(r).getOrElse("(null)")))
  }

  private sealed trait Move
  private case class MvSet(i: Int) extends Move
  private case object MvResetAll extends Move
  private case class MvSwap(i: Int, j: Int) extends Move
  private case class MvSubset(keep: List[Int]) extends Move
  private case class MvDrop(i: Int) extends Move
  private case class MvSort(keys: List[(Int, Boolean)]) extends Move

  test("label/column move sequences + multi-key sorts match the model") {
    val cell = Gen.option(Gen.oneOf("a", "b", "c", "d", "e"))
    val gen = for {
      h <- Gen.choose(4, 7)
      rows <- Gen.listOfN(h, Gen.listOfN(3, cell))
      moves <- Gen.listOfN(6, Gen.oneOf(
        Gen.choose(0, 9).map(MvSet),
        Gen.const(MvResetAll),
        Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)).map { case (i, j) => MvSwap(i, j) },
        Gen.listOfN(2, Gen.choose(0, 9)).map(MvSubset),
        Gen.choose(0, 9).map(MvDrop),
        Gen.listOfN(2, Gen.zip(Gen.choose(0, 9), Gen.oneOf(true, false)))
          .map(ks => MvSort(ks))))
    } yield (rows, moves)
    check("label-moves", 12)(Prop.forAll(gen) { case (rows, moves) =>
      val names = Vector("c0", "c1", "c2")
      val df = rows.map(r => (r(0).orNull, r(1).orNull, r(2).orNull))
        .toDF(names: _*)
      var frame = TadaFrame.ingest(df)
      var model = MoveModel(names,
        names.zipWithIndex.map { case (n, i) =>
          n -> rows.map(_(i)).toVector }.toMap,
        Vector.empty, rows.indices.toVector, Nil)
      // interpret each move against CURRENT state; skip when its
      // precondition fails (the generator is state-blind on purpose —
      // validity is decided here so long sequences stay productive)
      moves.foreach {
        case MvSet(i) if model.valueCols.nonEmpty =>
          val c = model.valueCols(i % model.valueCols.size)
          frame = frame.setAsLabels(c); model = model.setLabel(c)
        case MvResetAll if model.labels.nonEmpty =>
          frame = frame.resetLabels(); model = model.resetAll()
        case MvSwap(i, j) if model.labels.size >= 2 =>
          val (a, b) = (i % model.labels.size, j % model.labels.size)
          frame = frame.swapLabels(model.labels(a), model.labels(b))
          model = model.swap(a, b)
        case MvSubset(keep) if model.labels.nonEmpty =>
          val ks = keep.map(k => model.labels(k % model.labels.size)).distinct.toVector
          frame = frame.subsetLabels(ks); model = model.subset(ks)
        case MvDrop(i)
          // any column — including a LABEL (its designation must retire
          // with it); keep ≥2 so later moves still have material
          if model.schema.size >= 2 =>
          val c = model.schema(i % model.schema.size)
          frame = frame.dropCols(c); model = model.dropValue(c)
        case MvSort(keys) if model.schema.nonEmpty =>
          val ks = keys.map { case (i, d) => (model.schema(i % model.schema.size), d) }
            .distinctBy(_._1)
          frame = frame.sort(ks.map { case (c, d) => Sorter(c, descending = d) }: _*)
          model = model.sort(ks)
        case _ => ()
      }
      val got = frame.records()
      val want = model.render
      if (got != want)
        println(s"DIVERGENCE\n got: $got\nwant: $want\nlabels=${model.labels} spec=${model.spec}")
      got == want
    })
  }

  test("containmentPairs equals the set model for random corpora and caps") {
    // small alphabet forces heavy gram sharing — the adversarial regime
    // for the inverted-index join and the df cap
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = for {
      n <- Gen.choose(2, 7)
      ds <- Gen.listOfN(n, doc)
      cap <- Gen.oneOf(1, 2, 1000)
      tau <- Gen.oneOf(0.3, 0.8)
    } yield (ds, cap, tau)
    check("containment-model", 8)(Prop.forAll(corpus) { case (ds, cap, tau) =>
      val texts = ds.zipWithIndex.map { case (t, i) => (i, t) }
      def grams(t: String): Set[String] = {
        val w = t.split(" ").filter(_.nonEmpty)
        if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = texts.map { case (i, t) => i -> grams(t) }.toMap
      val docFreq = sets.values.flatten.toSeq.groupBy(identity).map { case (g, xs) => g -> xs.size }
      val kept = sets.map { case (i, s) => i -> s.filter(g => docFreq(g) <= cap) }
      val want = (for {
        a <- kept.keys; b <- kept.keys if a < b
        inter = (kept(a) & kept(b)).size if inter > 0
        nS = math.min(kept(a).size, kept(b).size)
        c = BigDecimal(java.math.BigDecimal.valueOf(inter.toDouble / nS))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble if c >= tau
        (s, l) = if (kept(a).size <= kept(b).size) (a, b) else (b, a)
      } yield (s, l) -> ((nS.toLong, inter.toLong, c))).toMap
      val got = graft.pipeline.Dedup.containmentPairs(
          texts.toDF("doc_id", "text"), "doc_id", "text", k = 3, tau = tau, maxDf = cap)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      if (got != want) println(s"DIVERGENCE docs=$texts cap=$cap tau=$tau\n got=$got\nwant=$want")
      got == want
    })
  }

  test("incremental containment equals the rebuild on random corpus/batch splits") {
    // the equivalence that makes q92 trustworthy: for ANY corpus, batch
    // and cap — including caps the batch pushes grams across — the
    // incremental fold must reproduce the full rebuild's batch pairs
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val scenario = for {
      nc <- Gen.choose(2, 5)
      nb <- Gen.choose(1, 3)
      cs <- Gen.listOfN(nc, doc)
      bs <- Gen.listOfN(nb, doc)
      cap <- Gen.oneOf(1, 2, 3, 1000)
    } yield (cs, bs, cap)
    check("incremental-containment", 8)(Prop.forAll(scenario) { case (cs, bs, cap) =>
      val D = graft.pipeline.Dedup
      val corpus = cs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("doc_id", "text")
      val batch = bs.zipWithIndex.map { case (t, i) => (100 + i, t) }.toDF("doc_id", "text")
      val index = D.containmentGramIndex(corpus, "doc_id", "text")
      val gramDf = index.groupBy("g").agg(F.count(F.lit(1)).as("df"))
      val sizes = index.join(gramDf.filter(F.col("df") <= cap), "g")
        .groupBy("id").agg(F.count(F.lit(1)).as("n"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      val inc = rows(D.containmentPairsIncremental(index, gramDf, sizes, batch,
        "doc_id", "text", k = 3, tau = 0.3, maxDf = cap)).toMap
      val full = rows(D.containmentPairs(corpus.unionByName(batch), "doc_id", "text",
        k = 3, tau = 0.3, maxDf = cap))
        .filter { case ((a, b), _) => a >= 100 || b >= 100 }.toMap
      if (inc != full) println(s"DIVERGENCE cs=$cs bs=$bs cap=$cap\n inc=$inc\nfull=$full")
      inc == full
    })
  }
}
