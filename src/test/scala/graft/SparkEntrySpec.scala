package graft

/** Driver-contract meta-spec: every declared query must execute and
  * every oracle key must name a declared query (a dangling oracle or a
  * throwing query would silently zero part of the round's correctness).
  */
class SparkEntrySpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("oracle keys are a subset of declared queries") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
