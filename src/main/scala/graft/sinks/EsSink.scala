package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** S10/S11: Elasticsearch bulk sink, re-expressed as a `foreachPartition`
  * writer (reference: elasticsearch_integration.py:298-451 bulk index
  * with per-item accounting, :253-275/:526-551 batched deletes).
  *
  * The HTTP layer is a pluggable [[EsSink.Transport]] (bulk NDJSON lines
  * → per-item status codes) so the sink's batching / retry / accounting
  * logic is unit-testable without a cluster; [[EsSink.http]] is the real
  * transport. Retry policy = ST5: retryable statuses (429/5xx) and
  * IOExceptions are re-sent with linear backoff up to `maxRetries`, only
  * for the failed items (the reference re-sends whole batches; per-item
  * retry strictly dominates).
  *
  * Scale notes: one transport connection per partition, `batchSize` docs
  * per bulk call (reference default 100k), success/failure counted via
  * accumulators (A8/A9) — no driver round-trip per batch.
  */
final class EsSink(
    transport: EsSink.Transport,
    batchSize: Int = 1000,
    maxRetries: Int = 3,
    backoffMs: Long = 0L) extends Serializable {
  import EsSink.BulkStats

  /** Bulk-index `df` into `index`, `_id` taken from `idCol`. */
  def bulkIndex(df: DataFrame, index: String, idCol: String): BulkStats = {
    val payload = df.select(
      col(idCol).cast("string").as("_id"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("_doc"))
    val idx = EsSink.jsonEsc(index)
    run(payload, r => Seq(
      s"""{"index":{"_index":"$idx","_id":"${EsSink.jsonEsc(r.getString(0))}"}}""",
      r.getString(1)))
  }

  /** Bulk-delete by id (the reference's 1000-per-batch delete loop). */
  def bulkDelete(ids: DataFrame, index: String, idCol: String): BulkStats = {
    val payload = ids.select(col(idCol).cast("string").as("_id"))
    val idx = EsSink.jsonEsc(index)
    run(payload, r => Seq(
      s"""{"delete":{"_index":"$idx","_id":"${EsSink.jsonEsc(r.getString(0))}"}}"""))
  }

  private def run(payload: DataFrame,
      toLines: Row => Seq[String]): BulkStats = {
    val sc = payload.sparkSession.sparkContext
    val okAcc = sc.longAccumulator("es.ok")
    val failAcc = sc.longAccumulator("es.fail")
    val retryAcc = sc.longAccumulator("es.retries")
    val t = transport
    val (bs, mr, backoff) = (batchSize, maxRetries, backoffMs)
    payload.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(bs).foreach { group =>
        EsSink.sendWithRetry(group.map(toLines), t, mr, backoff,
          okAcc, failAcc, retryAcc)
      }
    }
    BulkStats(okAcc.value, failAcc.value, retryAcc.value)
  }
}

object EsSink {
  final case class BulkStats(indexed: Long, failed: Long, retries: Long)


  /** Bulk payload lines → one status code per item (not per line). */
  trait Transport extends (Seq[String] => Seq[Int]) with Serializable

  /** JSON string-escape for hand-built action lines — shared
    * [[graft.functions.JsonText]] definition.
    */
  private[sinks] def jsonEsc(s: String): String =
    graft.functions.JsonText.esc(s)

  private[sinks] def sendWithRetry(
      items: Seq[Seq[String]],
      transport: Transport,
      maxRetries: Int,
      backoffMs: Long,
      ok: LongAccumulator,
      fail: LongAccumulator,
      retries: LongAccumulator): Unit = {
    var pending = items
    var attempt = 0
    while (pending.nonEmpty && attempt <= maxRetries) {
      if (attempt > 0) {
        retries.add(pending.size.toLong)
        if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
      val statuses =
        try transport(pending.flatten)
        catch { case _: java.io.IOException => Seq.fill(pending.size)(503) }
      val padded = statuses.padTo(pending.size, 503)
      val next = Seq.newBuilder[Seq[String]]
      pending.zip(padded).foreach { case (item, st) =>
        if (st == 200 || st == 201) ok.add(1L)
        else if (st == 429 || st >= 500) next += item // retryable
        else fail.add(1L) // permanent 4xx
      }
      pending = next.result()
      attempt += 1
    }
    fail.add(pending.size.toLong) // exhausted retries
  }

  /** Real HTTP transport (POST `<url>/_bulk`), parsing the per-item
    * response statuses with Jackson (ships with Spark). Untested in this
    * container (no ES); the partition/batch/retry logic above is what the
    * specs cover.
    */
  def http(url: String, connectTimeoutMs: Int = 30000,
      readTimeoutMs: Int = 300000): Transport = new Transport {
    def apply(lines: Seq[String]): Seq[Int] = {
      val conn = new java.net.URI(url + "/_bulk").toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
        conn.setDoOutput(true)
        // reference parity: 300 s bulk timeout (indexer-config.yaml:51);
        // a hung node must fail the call so retry/backoff can engage
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        val body = lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = conn.getOutputStream
        try out.write(body) finally out.close()
        val in = conn.getInputStream
        val resp = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val items = mapper.readTree(resp).path("items")
        (0 until items.size()).map { i =>
          val item = items.get(i)
          val op = item.fieldNames().next()
          item.path(op).path("status").asInt(500)
        }
      } finally conn.disconnect()
    }
  }
}
