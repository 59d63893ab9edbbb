package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper

/** ES index administration + search — the sink-side calls the reference
  * makes OUTSIDE the bulk path:
  *
  *  - index creation with an explicit mapping before any bulk call
  *    (elasticsearch_integration.py:30-96): keyword/text `.keyword`
  *    subfields, and `filepath` tokenized by a `path_hierarchy` analyzer
  *    so path-prefix queries work. Without this a fresh cluster gets
  *    dynamic mappings and path search breaks;
  *  - the full-text search call (elasticsearch_integration.py:277-296):
  *    a `multi_match` over `name^3` / `filepath^2`, `best_fields`. The
  *    in-engine scoring surrogate of the same ranking is the oracle-
  *    checked `fs_search_topk` query (FsOps.searchTopk).
  *
  * Like [[EsSink]], the HTTP layer is a pluggable [[EsAdmin.Transport]]
  * so the payloads and lifecycle are spec-testable hermetically (no ES in
  * this container); [[EsAdmin.http]] is the real client. These are
  * driver-side single calls — index creation and search never fan out to
  * executors, so the transport needn't be serializable-distributed (it
  * still is, for symmetry).
  */
object EsAdmin {

  /** One admin/search call: (method, path, optional JSON body) →
    * (HTTP status, response body).
    */
  trait Transport
      extends ((String, String, Option[String]) => (Int, String))
      with Serializable

  /** The reference's exact index payload
    * (elasticsearch_integration.py:43-96): settings (1 shard, 0
    * replicas, 30s refresh, the `path_hierarchy` analyzer chain) +
    * mappings for the canonical document fields.
    */
  val indexMappingJson: String =
    """{
      |  "settings": {
      |    "number_of_shards": 1,
      |    "number_of_replicas": 0,
      |    "refresh_interval": "30s",
      |    "analysis": {
      |      "analyzer": {
      |        "path_analyzer": {
      |          "tokenizer": "path_tokenizer",
      |          "filter": ["lowercase"]
      |        }
      |      },
      |      "tokenizer": {
      |        "path_tokenizer": {
      |          "type": "path_hierarchy",
      |          "delimiter": "/"
      |        }
      |      }
      |    }
      |  },
      |  "mappings": {
      |    "properties": {
      |      "id": {"type": "keyword"},
      |      "name": {
      |        "type": "text",
      |        "fields": {"keyword": {"type": "keyword"}}
      |      },
      |      "filepath": {
      |        "type": "text",
      |        "fields": {"keyword": {"type": "keyword"}},
      |        "analyzer": "path_analyzer"
      |      },
      |      "size_bytes": {"type": "long"},
      |      "size": {"type": "keyword"},
      |      "modified_time": {"type": "date"},
      |      "creation_time": {"type": "date"},
      |      "api_modified_time": {"type": "date"},
      |      "api_creation_time": {"type": "date"},
      |      "type": {"type": "keyword"},
      |      "extension": {"type": "keyword"},
      |      "checksum": {"type": "keyword"},
      |      "direct_link": {"type": "keyword"},
      |      "fsentry_id": {"type": "keyword"},
      |      "last_seen": {"type": "date"},
      |      "relative_path": {"type": "keyword"}
      |    }
      |  }
      |}""".stripMargin

  /** Create-before-bulk lifecycle (elasticsearch_integration.py:30-41):
    * if the index exists, no-op; otherwise create it with the explicit
    * mapping. Returns true iff the index was created by this call.
    */
  def ensureIndex(transport: Transport, index: String): Boolean = {
    val (status, _) = transport("HEAD", s"/$index", None)
    if (status == 200) false
    else if (status == 404) {
      val (cst, body) =
        transport("PUT", s"/$index", Some(indexMappingJson))
      if (cst != 200 && cst != 201)
        sys.error(s"index create failed for '$index': HTTP $cst $body")
      true
    } else sys.error(s"index existence check failed for '$index': " +
      s"HTTP $status")
  }

  /** The reference's search DSL (elasticsearch_integration.py:280-289):
    * name boosted 3×, filepath 2×, best_fields.
    */
  def searchBody(query: String, size: Int): String =
    s"""{"query":{"multi_match":{"query":"${jsonEsc(query)}",""" +
      s""""fields":["filepath^2","name^3"],"type":"best_fields"}},""" +
      s""""size":$size}"""

  /** One search hit: document id, relevance score, raw `_source` JSON. */
  final case class Hit(id: String, score: Double, source: String)

  // ObjectMapper construction is expensive and the instance is
  // thread-safe for reads — share one.
  private val mapper = new ObjectMapper()

  /** `search_files` (elasticsearch_integration.py:277-296). */
  def search(transport: Transport, index: String, query: String,
      size: Int = 100): Seq[Hit] = {
    val (status, body) =
      transport("POST", s"/$index/_search", Some(searchBody(query, size)))
    if (status != 200)
      sys.error(s"search failed on '$index': HTTP $status $body")
    val hits = mapper.readTree(body)
      .path("hits").path("hits")
    (0 until hits.size()).map { i =>
      val h = hits.get(i)
      Hit(h.path("_id").asText(), h.path("_score").asDouble(0.0),
        h.path("_source").toString)
    }
  }

  private def jsonEsc(s: String): String =
    graft.functions.JsonText.esc(s)

  /** Real HTTP transport against a cluster base URL. */
  def http(url: String, connectTimeoutMs: Int = 30000,
      readTimeoutMs: Int = 300000): Transport = new Transport {
    def apply(method: String, path: String,
        body: Option[String]): (Int, String) = {
      val conn = new java.net.URI(url + path).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod(method)
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        body.foreach { b =>
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          val out = conn.getOutputStream
          try out.write(b.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
        val status = conn.getResponseCode
        val stream =
          if (status >= 400) Option(conn.getErrorStream)
          else Option(conn.getInputStream)
        val resp = stream.map { in =>
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        }.getOrElse("")
        (status, resp)
      } finally conn.disconnect()
    }
  }
}
