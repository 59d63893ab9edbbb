package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class KibanaSetupSpec extends AnyFunSuite {

  test("import payload is two NDJSON saved objects wired together") {
    val p = KibanaSetup.importPayload("files", "Files")
    val lines = p.trim.split("\n")
    assert(lines.length == 2)
    assert(lines(0).contains(""""type":"index-pattern""""))
    assert(lines(0).contains(""""timeFieldName":"modified_time""""))
    assert(lines(1).contains(""""type":"search""""))
    // the search references the data view by id
    assert(lines(1).contains(""""id":"files-view""""))
    // mapping parity: key query-side fields present
    Seq("relative_path", "size_bytes", "direct_link", "last_seen")
      .foreach(f => assert(lines(0).contains(f)))
  }
}
