package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** CI harness for the DuckDB differential fuzz (r12 verdict task 8).
  * Tagged Slow: ~100 random op-chains through the engine AND generated
  * SQL (~2 min). Skips cleanly when the driver-side python3/duckdb
  * toolchain is absent (library users don't carry it). */
object Slow extends Tag("graft.Slow")

class FuzzDiffSpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("100-seed differential fuzz vs DuckDB is exact-match", Slow) {
    assume(duckdbAvailable, "python3+duckdb not available on this box")
    val seeds = sys.env.get("GRAFT_FUZZ_SEEDS").flatMap(_.toIntOption).getOrElse(100)
    val (exit, ran) = FuzzDiff.run(TestSpark.spark, 1 to seeds, "/tmp/fuzzdiff-spec")
    assert(exit == 0, s"fuzz checker reported mismatches across $ran seeds " +
      "(see output above; oracle_sql.json holds the repro SQL per failure)")
  }
}
