package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

import graft.sinks.ParquetIndex

/** Structured-Streaming formulations of the reference's incremental
  * behaviors (SURVEY.md §2.8):
  *
  *  - ST1/ST2: the producer-thread + bounded-queue + 100k-row batch
  *    triggers (scanner.py:312-320, 364-403) become a streaming source
  *    consumed in micro-batches; backpressure is Spark's own.
  *  - ST3: snapshot reconciliation stays a batch anti-join between scans
  *    ([[ParquetIndex.reconcile]]); [[indexContinuously]] shows the
  *    foreachBatch path that lands each micro-batch through the same J1
  *    merge the batch pipeline uses.
  *  - Event-time windows + watermark (engine capability beyond the
  *    reference's surface): [[hourlyCounts]].
  */
object EventsStream {

  /** Tumbling 1-hour counts with a 2-hour watermark (late data beyond
    * the watermark is dropped; state is bounded).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))

  /** Gap-based session windows (30-min silence closes a session) with a
    * watermark bounding state — the engine-native streaming form of
    * [[graft.operators.EventsOps.sessionize]] (the batch query keeps the
    * lag+running-sum formulation because THAT is DuckDB-mirrorable
    * value-for-value; `session_window` state merging is not).
    */
  def sessionCounts(events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact-dedup with custom state (ST3's stateful shape +
    * the training-pipeline dedup applied to a stream): the first record
    * for each key passes through, later duplicates are dropped. State is
    * one boolean per key with a processing-time TTL so it cannot grow
    * unboundedly (`flatMapGroupsWithState`, the Spark-native form of the
    * reference's seen-set at lucidlink_api.py:43,150-152).
    */
  def dedupStream(spark: SparkSession, keyed: Dataset[(String, String)],
      ttlMs: Long = 0L): Dataset[(String, String)] = {
    import spark.implicits._
    // ttlMs > 0 bounds state with a processing-time timeout (production
    // knob). NOTE: with a timeout registered the engine schedules
    // continuous timeout-check batches, which livelocks
    // processAllAvailable-style draining — tests use ttlMs = 0.
    val timeout = if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String, rows: Iterator[(String, String)],
            state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rows.take(1)
          }
      }
  }

  /** Continuously-maintained per-group top-k (streaming leaderboard) —
    * the streaming face of [[graft.plans.GroupTopK]]: the state per
    * group is the SAME k-bounded summary the batch operator keeps in
    * its partial heaps (top-k is a mergeable bounded statistic, which
    * is exactly why it streams well), so state is `groups × k` forever,
    * independent of stream length — no watermark needed. Each
    * micro-batch emits the refreshed descending (score, id) ranking for
    * every group it touched (Update-mode semantics). Rows are
    * observations `(group, id, score)` ranked by (score desc, id asc);
    * after any prefix of the stream the emitted ranking equals the
    * batch operator run over the same rows (pinned by the spec).
    */
  def topkStream(spark: SparkSession,
      rows: Dataset[(String, Long, Double)], k: Int)
      : Dataset[(String, Seq[Long], Seq[Double])] = {
    import spark.implicits._
    require(k > 0, s"topkStream needs k > 0, got $k")
    rows
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[(String, Long, Double)],
            state: GroupState[List[(Long, Double)]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
            batch.map(r => (r._2, r._3)))
            .sortBy { case (id, score) => (-score, id) }
            .take(k)
          state.update(merged)
          (g, merged.map(_._1), merged.map(_._2))
      }
  }

  /** Streaming conversion detection — the streaming twin of
    * [[graft.operators.EventsOps.conversionLag]]'s funnel timing, and
    * under the ordering contract below its EXACT form: per user the
    * state carries first-view µs and first-purchase µs (two longs,
    * forever-bounded by |users|, the same mergeable-summary discipline
    * as [[topkStream]]; a TTL knob would bound it further in
    * production). A user converts iff their FIRST purchase is at or
    * after their FIRST view — a purchase that precedes every view
    * settles the user as non-converted permanently, matching the batch
    * query's `min(purchase) - min(view) >= 0` predicate instead of
    * waiting for a later purchase. On conversion, ONE
    * `(user_id, first_purchase - first_view)` record is emitted.
    * Ordering contract (as [[asofStream]]): event-time order WITHIN a
    * micro-batch (rows are sorted before the state update), arrival
    * order across batches — a view arriving in a later batch than the
    * user's first purchase does not retro-convert or retro-cancel; when
    * per-user arrival respects event time the stream result equals the
    * batch query's.
    */
  def conversionStream(spark: SparkSession,
      events: Dataset[(Long, Long, String)]): Dataset[(Long, Long)] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)],
            state: GroupState[(Long, Long)]) =>
          var (firstView, firstPurchase) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
          // event-time order, VIEWS FIRST on a timestamp tie: the batch
          // query's `min(purchase) - min(view) >= 0` counts an
          // equal-timestamp view+purchase as converted with lag 0, so a
          // purchase must not shadow a same-microsecond view
          rows.toSeq.sortBy { case (_, ts, typ) =>
            (ts, if (typ == "view") 0 else 1)
          }.foreach { case (_, ts, typ) =>
            if (typ == "view" && firstView == Long.MinValue &&
              firstPurchase == Long.MinValue)
              firstView = ts
            else if (typ == "purchase" && firstPurchase == Long.MinValue) {
              firstPurchase = ts
              if (firstView != Long.MinValue && ts >= firstView)
                out += ((user, ts - firstView))
            }
          }
          state.update((firstView, firstPurchase))
          out.iterator
      }
  }

  /** Engine-native watermark-bounded streaming dedup
    * (`dropDuplicatesWithinWatermark`) — the zero-custom-code counterpart
    * of [[dedupStream]]: state for a key is dropped once the watermark
    * passes its event time, so memory is bounded by the delay window
    * instead of a TTL knob. The contract is exact dedup WITHIN the
    * watermark window and at-least-once beyond it (a key recurring after
    * its state expired is re-emitted) — the standard trade for unbounded
    * streams; exact global dedup stays a batch job
    * ([[graft.operators.TextOps.dedupExact]]).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-STREAM interval join (attribution shape): each left event
    * matches right events for the same user within `[l_ts, l_ts +
    * horizon]`. Both sides carry watermarks, and the range condition
    * bounds them against each other, so the engine derives a state
    * eviction bound for BOTH buffers (left rows expire `horizon` past
    * the right watermark; right rows expire at the left watermark +
    * horizon) — the state-bounded form of a fact-fact event join. Inner
    * join ⇒ results emit as soon as both sides arrive; no watermark
    * wait. At scale this is a key-partitioned symmetric hash join with
    * per-key time-pruned buffers — the streaming twin of
    * [[graft.operators.TemporalJoins.rangeJoin]].
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      horizon: String = "1 hour", delay: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_type").as("l_type")).withWatermark("l_ts", delay)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_type")).withWatermark("r_ts", delay)
    l.join(r, expr(
      s"""l_user = r_user AND
         |r_ts >= l_ts AND r_ts <= l_ts + INTERVAL $horizon""".stripMargin))
      .select(col("l_user").as("user_id"), col("l_ts"), col("l_type"),
        col("r_ts"), col("r_type"))
  }

  /** Streaming point-in-time (as-of) enrichment — the streaming twin of
    * [[graft.operators.TemporalJoins.asof]]: each probe event is joined
    * to the latest build-side row with `build.ts <= probe.ts` for its
    * key, maintained as per-key state. Within a micro-batch, rows are
    * processed in event-time order, so a build row enriches probes later
    * in the same batch; ACROSS batches the state carries the running
    * max-ts build row — exact when arrival respects event time per key
    * (the watermark's contract), which is the standard streaming
    * point-in-time compromise: state is ONE row per key, not a buffer of
    * the whole build history.
    *
    * Input: (key, ts-millis, side, payload) with side 0 = build,
    * 1 = probe. Output: (key, tsMs, payload, matchPayload, matchTsMs) —
    * matchPayload/-TsMs null (None) when no build row is at-or-before.
    */
  def asofStream(spark: SparkSession,
      rows: Dataset[(Long, Long, Int, Long)])
      : Dataset[(Long, Long, Long, Option[Long], Option[Long])] = {
    import spark.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[(Long, Long, Int, Long)],
            state: GroupState[(Long, Long)]) =>
          // (ts, side, payload) ordered by event time; build-before-probe
          // on ties = the batch operator's inclusive-match rule
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Option[Long], Option[Long])]
          batch.toSeq.sortBy(r => (r._2, r._3, r._4)).foreach {
            case (_, ts, 0, payload) =>
              // ties on ts keep the HIGHEST payload — the same rule the
              // batch operator's (time, side, struct) window order gives
              if (!state.exists || state.get._1 < ts ||
                  (state.get._1 == ts && state.get._2 <= payload))
                state.update((ts, payload))
            case (_, ts, _, payload) =>
              val m = state.getOption.filter(_._1 <= ts)
              out += ((key, ts, payload, m.map(_._2), m.map(_._1)))
          }
          out.iterator
      }
  }

  /** ST2: continuous indexing — each micro-batch of scan entries is
    * merged (J1) into the Parquet snapshot index.
    */
  def indexContinuously(
      entries: DataFrame,
      index: ParquetIndex,
      keyCol: String,
      tsCol: String,
      checkpointDir: String): StreamingQuery =
    entries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        index.upsert(batch.sparkSession, batch, keyCol, tsCol): Unit
      }
      .start()
}
