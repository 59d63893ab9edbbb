package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.SparkSpecBase

/** Sink logic without a cluster: batching (W4/ST2), per-item accounting
  * (A9), retry with backoff on 429/5xx (ST5), permanent-4xx failures.
  * Static probe state works because local-mode executors share the JVM.
  */
object TransportProbe {
  val calls = new ConcurrentLinkedQueue[Seq[String]]()
  @volatile var failFirstN = 0
  @volatile var status: Int = 200
  @volatile var failIds: Set[String] = Set.empty
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)

  def reset(): Unit = { calls.clear(); failFirstN = 0; status = 200
    failIds = Set.empty; attempts.set(0) }

  val transport: EsSink.Transport = new EsSink.Transport {
    def apply(lines: Seq[String]): Seq[Int] = {
      calls.add(lines)
      val n = attempts.incrementAndGet()
      val actions = lines.filter(l =>
        l.startsWith("{\"index\":") || l.startsWith("{\"delete\":"))
      actions.map { a =>
        val id = a.split("\"_id\":\"")(1).takeWhile(_ != '"')
        if (n <= failFirstN) 503
        else if (failIds.contains(id)) 404
        else status
      }
    }
  }
}

class EsSinkSpec extends SparkSpecBase {

  private def docs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (s"id$i", s"doc$i")).toDF("id", "body").coalesce(1)
  }

  test("bulk index batches and counts per-item successes") {
    TransportProbe.reset()
    val sink = new EsSink(TransportProbe.transport, batchSize = 3)
    val stats = sink.bulkIndex(docs(10), "files", "id")
    assert(stats.indexed == 10 && stats.failed == 0 && stats.retries == 0)
    assert(TransportProbe.calls.size == 4) // ceil(10/3) bulk calls
    val firstCall = TransportProbe.calls.asScala.head
    assert(firstCall.size == 6) // 3 action lines + 3 docs
    assert(firstCall.head.contains(""""_index":"files""""))
  }

  test("permanent 4xx failures are counted, not retried") {
    TransportProbe.reset()
    TransportProbe.failIds = Set("id3", "id7")
    val sink = new EsSink(TransportProbe.transport, batchSize = 100)
    val stats = sink.bulkIndex(docs(10), "files", "id")
    assert(stats.indexed == 8 && stats.failed == 2 && stats.retries == 0)
  }

  test("retryable 5xx is re-sent and succeeds") {
    TransportProbe.reset()
    TransportProbe.failFirstN = 1 // first bulk call fails wholesale
    val sink = new EsSink(TransportProbe.transport, batchSize = 100,
      maxRetries = 3)
    val stats = sink.bulkIndex(docs(5), "files", "id")
    assert(stats.indexed == 5 && stats.failed == 0 && stats.retries == 5)
  }

  test("exhausted retries land in failed") {
    TransportProbe.reset()
    TransportProbe.status = 503
    val sink = new EsSink(TransportProbe.transport, batchSize = 100,
      maxRetries = 2)
    val stats = sink.bulkIndex(docs(4), "files", "id")
    assert(stats.indexed == 0 && stats.failed == 4)
    assert(TransportProbe.calls.size == 3) // initial + 2 retries
  }

  test("bulk delete emits delete actions") {
    TransportProbe.reset()
    val sink = new EsSink(TransportProbe.transport, batchSize = 100)
    import spark.implicits._
    val stats = sink.bulkDelete(Seq("a", "b").toDF("id").coalesce(1),
      "files", "id")
    assert(stats.indexed == 2)
    val lines = TransportProbe.calls.asScala.head
    assert(lines.forall(_.startsWith("""{"delete":""")))
  }
}
