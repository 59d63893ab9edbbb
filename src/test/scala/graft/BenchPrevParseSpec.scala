package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query noise tripwire is only as good as its reference
  * parse: the driver's BENCH_rN.json wraps the bench stdout in a
  * `"tail"` field whose escaped line can be FRONT-TRUNCATED (round 8's
  * capture starts mid-`queries`-object), so the parser must recover
  * per-query times from the `query_runs` arrays that survive, and
  * prefer the official `queries` mins when the head is intact.
  */
class BenchPrevParseSpec extends AnyFunSuite {

  test("raw bench line: queries object wins") {
    val raw = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q1":0.321,"fs_es_docs":1.798},""" +
      """"query_runs":{"q1":[0.683,0.321],"fs_es_docs":[2.1,1.798]},""" +
      """"sf":"/x"}"""
    val got = Bench.parsePrevBench(raw)
    assert(got == Map("q1" -> 0.321, "fs_es_docs" -> 1.798))
  }

  test("driver wrapper with front-truncated tail: query_runs recovers") {
    // the round-8 shape: tail starts mid-queries-object, so only the
    // later queries' official mins exist; query_runs is complete
    val wrapper = """{"n":8,"rc":0,"cpus":32,"sf":0.1,""" +
      """"tail":"explode\":0.581,\"fs_merge_upsert\":2.864},""" +
      """\"query_runs\":{\"q1\":[0.683,0.321],""" +
      """\"fs_merge_upsert\":[2.903,2.864]},\"failed\":[]}"}"""
    val got = Bench.parsePrevBench(wrapper)
    // q1 only exists in query_runs (min of the array); fs_merge_upsert
    // appears in the truncated fragment too but with no "queries":{
    // opener that fragment is not a parseable object — runs-min stands
    assert(got == Map("q1" -> 0.321, "fs_merge_upsert" -> 2.864))
  }

  test("real driver capture: every headline query has a prev time") {
    val f = java.nio.file.Paths.get("BENCH_r08.json")
    assume(java.nio.file.Files.exists(f))
    val got = Bench.parsePrevBench(java.nio.file.Files.readString(f))
    Bench.headline.foreach { q =>
      assert(got.contains(q), s"no prev time recovered for $q")
      assert(got(q) > 0.0 && got(q) < 60.0)
    }
  }
}
