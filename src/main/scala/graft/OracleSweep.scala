package graft

/** Standing full-scale oracle sweep (r11 verdict task 5).
  *
  * The q55 recall hole survived ten rounds because the driver's gate
  * runs at sf0.01 — cell geometry only gets adversarial when corpora
  * are big enough that nearest-cell co-assignment stops covering the
  * threshold radius. This tool makes the sf0.1 sweep a one-command
  * round-exit step for the APPROXIMATE families (the ones whose
  * correctness is empirical-at-some-scale rather than algebraic):
  *
  * {{{
  *   sbt "runMain graft.OracleSweep /root/testdata/sf0.1"
  *   # or a custom subset / out dir:
  *   sbt "runMain graft.OracleSweep <sfDir> <outDir> q55,q58"
  * }}}
  *
  * Mechanics: reuses [[Verify]]'s dump verbatim (same queries map, same
  * per-query job-group timeouts, same oracle_sql.json), restricted to
  * the approximate-family prefixes, then — when a driver-side python3
  * with duckdb is present on this box — invokes `tools/check.py` (the
  * local replica of the driver's gate) and exits nonzero on any
  * non-OK row, so the sweep can sit in a round's exit checklist as a
  * hard gate. Without python/duckdb it prints the manual command and
  * exits 0 after the dump (the dump alone is still the expensive part).
  */
object OracleSweep {

  /** The empirical/approximate families named by the r11 verdict: LSH
    * and SimHash near-dup, cosine-pairs + clusters, IVF ANN, adaptive
    * containment, winnow overlap. Everything else is algebraic or
    * exact-by-construction and fully covered by the sf0.01 gate. */
  val approxFamilies: Seq[String] =
    Seq("q41", "q42", "q55", "q56", "q58", "q79", "q89", "q100")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: OracleSweep <sfDir> [outDir] [prefixes]")
    val sfDir = args(0)
    val outDir = if (args.length > 1) args(1) else "target/oracle-sweep"
    val prefixes = if (args.length > 2) args(2) else approxFamilies.mkString(",")
    Verify.main(Array(sfDir, outDir, prefixes))

    // The gate must FAIL CLOSED (ADVICE r12, medium): a query that
    // crashes or times out inside Verify leaves no output directory, and
    // check.py only iterates directories that exist — without this
    // assertion the sweep would silently drop exactly the query it was
    // built to catch and still exit 0.
    val wanted = prefixes.split(",").map(_.trim).filter(_.nonEmpty)
    val expected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.exists(n.startsWith))
    val missing = expected.filterNot { n =>
      val d = new java.io.File(outDir, n)
      d.isDirectory && d.listFiles() != null &&
        d.listFiles().exists(f => f.getName.endsWith(".parquet") || f.getName == "_SUCCESS")
    }
    if (expected.isEmpty) {
      println(s"[sweep] GATE-NOT-RUN: no registered query matches '$prefixes'")
      sys.exit(3)
    }
    if (missing.nonEmpty) {
      println(s"[sweep] FAIL: ${missing.size} quer${if (missing.size == 1) "y" else "ies"} " +
        s"produced NO output (crash/timeout in Verify): ${missing.mkString(", ")}")
      sys.exit(2)
    }

    val checker = new java.io.File("tools/check.py")
    if (!checker.exists()) {
      // no comparison ran — an unambiguous non-pass (ADVICE r12, low)
      println(s"[sweep] GATE-NOT-RUN: dump complete at $outDir but tools/check.py " +
        s"not found; compare manually against $sfDir")
      sys.exit(3)
    }
    val cmd = Seq("python3", checker.getPath, outDir, sfDir)
    val exit =
      try {
        val pb = new ProcessBuilder(cmd: _*)
        pb.inheritIO()
        pb.start().waitFor()
      } catch {
        case e: Throwable =>
          println(s"[sweep] GATE-NOT-RUN: could not start " +
            s"'${cmd.mkString(" ")}' (${e.getMessage}); the comparison never ran")
          3
      }
    if (exit != 0) sys.exit(exit)
  }
}
