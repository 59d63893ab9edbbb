package graft.sinks

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** ES admin surface: exact index mapping JSON, create-before-bulk
  * lifecycle, and the multi_match search payload + response parsing —
  * all over a recording fake transport (no cluster in this container).
  */
class EsAdminSpec extends AnyFunSuite {

  /** Records calls; existing ⇒ HEAD 200, else 404 then accepts PUT. */
  private final class FakeTransport(var exists: Boolean,
      searchResponse: String = "{}") extends EsAdmin.Transport {
    val calls = mutable.Buffer.empty[(String, String, Option[String])]
    def apply(method: String, path: String,
        body: Option[String]): (Int, String) = {
      calls += ((method, path, body))
      method match {
        case "HEAD" => (if (exists) 200 else 404, "")
        case "PUT" => exists = true; (200, """{"acknowledged":true}""")
        case "POST" => (200, searchResponse)
        case m => (405, s"unexpected $m")
      }
    }
  }

  private val mapper = new ObjectMapper()

  test("mapping JSON matches the reference payload field-for-field") {
    val m = mapper.readTree(EsAdmin.indexMappingJson)
    // settings (elasticsearch_integration.py:46-63)
    val settings = m.path("settings")
    assert(settings.path("number_of_shards").asInt() == 1)
    assert(settings.path("number_of_replicas").asInt() == 0)
    assert(settings.path("refresh_interval").asText() == "30s")
    val analyzer = settings.path("analysis").path("analyzer")
      .path("path_analyzer")
    assert(analyzer.path("tokenizer").asText() == "path_tokenizer")
    assert(analyzer.path("filter").get(0).asText() == "lowercase")
    val tokenizer = settings.path("analysis").path("tokenizer")
      .path("path_tokenizer")
    assert(tokenizer.path("type").asText() == "path_hierarchy")
    assert(tokenizer.path("delimiter").asText() == "/")
    // mappings (:65-95)
    val props = m.path("mappings").path("properties")
    val expectKeyword = Seq("id", "size", "type", "extension", "checksum",
      "direct_link", "fsentry_id", "relative_path")
    expectKeyword.foreach(f =>
      assert(props.path(f).path("type").asText() == "keyword", f))
    val expectDate = Seq("modified_time", "creation_time",
      "api_modified_time", "api_creation_time", "last_seen")
    expectDate.foreach(f =>
      assert(props.path(f).path("type").asText() == "date", f))
    assert(props.path("size_bytes").path("type").asText() == "long")
    Seq("name", "filepath").foreach { f =>
      assert(props.path(f).path("type").asText() == "text", f)
      assert(props.path(f).path("fields").path("keyword")
        .path("type").asText() == "keyword", f)
    }
    // the load-bearing analyzer binding: filepath tokenized by hierarchy
    assert(props.path("filepath").path("analyzer").asText()
      == "path_analyzer")
    assert(props.size() == 16) // no extra/missing fields vs the reference
  }

  test("ensureIndex creates once with the mapping, then no-ops") {
    val t = new FakeTransport(exists = false)
    assert(EsAdmin.ensureIndex(t, "files"))
    assert(t.calls.map(c => (c._1, c._2)) ==
      Seq(("HEAD", "/files"), ("PUT", "/files")))
    assert(t.calls(1)._3.contains(EsAdmin.indexMappingJson))
    // second call: index exists now — exactly one HEAD, no PUT
    assert(!EsAdmin.ensureIndex(t, "files"))
    assert(t.calls.map(_._1) == Seq("HEAD", "PUT", "HEAD"))
  }

  test("ensureIndex surfaces a failed existence check or create") {
    val refuse = new EsAdmin.Transport {
      def apply(m: String, p: String, b: Option[String]) = (503, "down")
    }
    assertThrows[RuntimeException](EsAdmin.ensureIndex(refuse, "files"))
  }

  test("search issues the boosted multi_match DSL and parses hits") {
    val resp =
      """{"hits":{"hits":[
        |{"_id":"a1","_score":7.5,"_source":{"name":"report.pdf"}},
        |{"_id":"b2","_score":3.25,"_source":{"name":"report-old.pdf"}}
        |]}}""".stripMargin
    val t = new FakeTransport(exists = true, searchResponse = resp)
    val hits = EsAdmin.search(t, "files", "report", size = 50)
    // payload: same ranking surrogate as the green fs_search_topk query
    // (name^3 over filepath^2, best_fields), size honored
    val (method, path, body) = t.calls.head
    assert(method == "POST" && path == "/files/_search")
    val sent = mapper.readTree(body.get)
    val mm = sent.path("query").path("multi_match")
    assert(mm.path("query").asText() == "report")
    assert((0 until mm.path("fields").size())
      .map(mm.path("fields").get(_).asText()).toSet ==
      Set("filepath^2", "name^3"))
    assert(mm.path("type").asText() == "best_fields")
    assert(sent.path("size").asInt() == 50)
    // parsing: id/score/_source round-trip in rank order
    assert(hits.map(_.id) == Seq("a1", "b2"))
    assert(hits.map(_.score) == Seq(7.5, 3.25))
    assert(mapper.readTree(hits.head.source).path("name").asText()
      == "report.pdf")
  }

  test("search query strings are JSON-escaped in the payload") {
    val t = new FakeTransport(exists = true,
      searchResponse = """{"hits":{"hits":[]}}""")
    EsAdmin.search(t, "files", "a \"quoted\"\npath\\x")
    val sent = mapper.readTree(t.calls.head._3.get)
    assert(sent.path("query").path("multi_match").path("query").asText()
      == "a \"quoted\"\npath\\x")
  }
}
