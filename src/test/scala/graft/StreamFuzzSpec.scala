package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag

object SlowStream extends Tag("graft.SlowStream")

/** In-suite slice of the StreamFuzz differential harness (r15 verdict
  * item 3): randomized bounded-disorder inputs through the stateful
  * streaming twins must equal their batch operators exactly. The full
  * two-scale sweep runs via `runMain graft.StreamFuzz` (recorded in
  * PERF.md); this keeps a small always-on regression slice in `sbt
  * test`. */
class StreamFuzzSpec extends AnyFunSuite {
  test("stream fuzz: all 16 streaming twins equal batch on random inputs",
      SlowStream) {
    val seeds = sys.env.get("GRAFT_STREAMFUZZ_SEEDS").flatMap(_.toIntOption).getOrElse(2)
    val bad = StreamFuzz.run(TestSpark.spark, 1 to seeds, "/tmp/streamfuzz-spec",
      Seq(("spec", 600, 120)))
    assert(bad == 0, s"$bad streaming-vs-batch mismatches (see output above)")
  }
}
