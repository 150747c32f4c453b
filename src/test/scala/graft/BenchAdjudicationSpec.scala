package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's self-adjudication (SURVEY §26.1/§26.9: every
  * probed >=3x bench-tail was box contention, never code) — the prior
  * parse and the retry trigger are pure functions, pinned here so the
  * contention guard can't silently rot.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  private val line =
    """{"metric":"total","value":12.5,"unit":"sec","total_covers":"successful_queries_only",""" +
      """"noise_note":"x","queries":{"q_a":1.25,"q_b":0.04,"q_c":null},""" +
      """"failed":["q_c"],"retried":{},"sf":"/root/testdata/sf0.1"}"""

  test("parsePrior reads numeric entries, skips null, keyed off sf") {
    val m = Bench.parsePrior(line, "/root/testdata/sf0.1")
    assert(m == Map("q_a" -> 1.25, "q_b" -> 0.04))
    // a different scale factor yields NO baseline, not a wrong one
    assert(Bench.parsePrior(line, "/root/testdata/sf0.01").isEmpty)
    // garbage degrades to empty, never throws — including entries the
    // number regex admits but toDouble rejects ("1e")
    assert(Bench.parsePrior("not json at all", "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parsePrior("", "/root/testdata/sf0.1").isEmpty)
    val mangled = line.replace("\"q_b\":0.04", "\"q_b\":1e")
    assert(Bench.parsePrior(mangled, "/root/testdata/sf0.1") ==
      Map("q_a" -> 1.25))
  }

  test("needsRetry: 3x AND +0.5s absolute, no baseline = no retry") {
    // contended: 4x the prior 1.25s entry
    assert(Bench.needsRetry(5.0, Some(1.25)))
    // under 3x: a real-looking regression stays in the artifact
    assert(!Bench.needsRetry(3.0, Some(1.25)))
    // millisecond entry jitter: 5x prior but under the absolute floor
    assert(!Bench.needsRetry(0.2, Some(0.04)))
    // first run of a new query has no baseline
    assert(!Bench.needsRetry(100.0, None))
  }
}
