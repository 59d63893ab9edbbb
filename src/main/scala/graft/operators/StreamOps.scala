package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem => HFileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, Trigger}

import graft.Tables
import graft.model.SyntheticFs
import graft.sinks.ParquetIndex

/** Oracle-gated STRUCTURED STREAMING queries (SURVEY.md §2.8): each one
  * runs a real streaming query — file source, micro-batches, stateful
  * operators, a sink — to completion with `Trigger.AvailableNow`, then
  * returns the result as a DataFrame the driver hash-compares against a
  * BATCH DuckDB oracle. This turns the streaming layer's "spec-only"
  * guarantees (stream ≡ batch over the same rows) into driver-visible
  * green correctness rows.
  *
  * Determinism: every query here is chosen so its result is independent
  * of micro-batch boundaries and arrival order —
  *  - windowed/session aggregation in COMPLETE mode re-emits the full
  *    aggregate after the last batch (the append-mode forms with
  *    watermark eviction are spec'd in streaming/EventsStream; a
  *    watermark-truncated result is deliberately NOT oracle-comparable
  *    because it depends on batch cut points);
  *  - stateful dedup keeps its seen-set for the whole run
  *    (NoTimeout), so "first occurrence wins" = set membership = batch
  *    DISTINCT regardless of which batch a duplicate lands in;
  *  - the foreachBatch index pipeline merges by (key, mtime) LWW with
  *    strictly distinct timestamps across generations, so any batch
  *    interleaving folds to the same snapshot.
  *
  * Scale notes: state is the bounded thing in each query — window
  * state = |hours × types|, session state = open sessions, dedup state
  * = distinct keys (TTL-able in EventsStream.dedupStream), and the
  * foreachBatch merge is [[Merge]]'s single key shuffle per batch. The
  * memory sink is the test/oracle surface only; production lands in
  * [[ParquetIndex]] (as `fs_stream_index` itself demonstrates).
  */
object StreamOps {

  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  // the MOR twin needs its OWN cache: cachedTempDir keys by sfDir, so
  // sharing storeCache would hand one twin the other's store
  private val morStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val docStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val qn = new AtomicLong(0)

  /** Stage `table` as a 4-file parquet dir (hash-split on
    * `partitionCol`, once per JVM per sfDir — cut points are
    * irrelevant to every query here, see the determinism note above)
    * and return a readStream over it with an explicit schema (file
    * sources do not infer), one file per micro-batch — the single
    * staging contract every streamed table shares.
    */
  private def stagedStream(spark: SparkSession, sfDir: String,
      cache: java.util.concurrent.ConcurrentHashMap[String, String],
      table: String, partitionCol: String, tag: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(cache, sfDir, tag) { d =>
      Tables(spark, sfDir, table)
        .repartition(4, col(partitionCol))
        .write.mode("overwrite").parquet(s"$d/in")
    } + "/in"
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
  }

  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame =
    stagedStream(spark, sfDir, stageCache, "events", "user_id",
      "graft-eventstream")

  /** Run `sink`'s streaming query to completion over all available
    * input and return the memory-sink table. Fresh checkpoint + unique
    * sink name per run: resuming an old checkpoint would see zero new
    * files and emit an empty complete-mode result.
    */
  private def runToMemory(spark: SparkSession, df: DataFrame,
      mode: String): DataFrame = {
    val name = s"graft_stream_${qn.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-ckpt").toString
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
    StoreUtil.deleteRecQuiet(ckpt)
    out
  }

  // ------------------------------------------------------------------ //
  // Streaming tumbling-window aggregation (EventsStream.hourlyCounts'  //
  // shape) — complete mode, so after AvailableNow drains the stream    //
  // the emitted table IS the batch aggregate: shares the              //
  // events_hourly_window oracle verbatim.                              //
  // ------------------------------------------------------------------ //

  def streamHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("vsum"))
    runToMemory(spark, agg, "complete")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"), col("n"),
        round(col("vsum"), 2).cast("double").as("value_sum"))
      .orderBy("hour_start", "event_type")
  }

  // ------------------------------------------------------------------ //
  // Streaming session windows (the session_window operator itself, not //
  // the batch lag+running-sum formulation): state merges sessions as   //
  // batches arrive; complete mode emits the final merged sessions.     //
  // session_window MERGES at a gap of exactly 30 min (split rule is    //
  // `gap > 30 min` — StreamServeSpec pins the boundary empirically),   //
  // the same rule as the batch sessionize query's lag condition.       //
  // session_end = last event + gap, by definition of the operator.     //
  // ------------------------------------------------------------------ //

  def streamSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(spark, agg, "complete")
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val streamSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE,
      |           '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------------------------------ //
  // Streaming stateful dedup: flatMapGroupsWithState keeps one boolean //
  // per key for the whole run (EventsStream.dedupStream's TTL knob     //
  // bounds it in production); each key is emitted exactly once, in     //
  // whichever batch its first occurrence arrives — so the emitted set  //
  // is exactly batch DISTINCT.                                         //
  // ------------------------------------------------------------------ //

  def streamDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keyed = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)]
    val dedup = keyed
      .groupByKey(identity)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String)],
            state: GroupState[Boolean]) =>
          // rows must be consumed? No — emitting the key once suffices;
          // the iterator is safely droppable.
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(key) }
      }
      .toDF("user_id", "event_type")
    runToMemory(spark, dedup, "append")
      .orderBy("user_id", "event_type")
  }

  val streamDistinctSql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------------------------ //
  // Streaming leaderboard (EventsStream.topkStream — the streaming     //
  // face of the native GroupTopK operator): per event_type the state   //
  // is the k-bounded (event_id, value) summary, re-emitted for every   //
  // group a micro-batch touches (Update semantics). The LAST emission  //
  // per group equals the batch top-k over ALL rows regardless of       //
  // batch cut points: top-k is a mergeable bounded statistic, and a    //
  // group untouched by later batches already holds its final state —   //
  // so the drained stream is oracle-comparable to the definitional     //
  // batch row_number query. State is |groups| × k forever (no          //
  // watermark needed); the parquet spill of per-batch emissions is     //
  // the oracle surface only — production serves the state directly.    //
  // ------------------------------------------------------------------ //

  private val lbK = 5

  def streamLeaderboard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val obs = eventsStream(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)]
    val ranked = graft.streaming.EventsStream
      .topkStream(spark, obs, lbK)
      .toDF("event_type", "ids", "vals")
    drainUpdates(spark, ranked, "event_type")
      .select(col("event_type"),
        posexplode(arrays_zip(col("ids"), col("vals"))))
      .select(col("event_type"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.ids").as("event_id"), col("col.vals").as("value"))
      .orderBy("event_type", "rank")
  }

  /** Run an Update-mode stateful stream to completion and return the
    * LAST emission per `keyCol` (a stateful operator emits a key's
    * refreshed state in every batch that touches it — at most once per
    * batch, so batch_id is unique within a key, and the final emission
    * IS the drained state). Emissions spill to a temp parquet dir via
    * foreachBatch (the memory sink doesn't take Update from arbitrary
    * stateful ops); the result is checkpointed so the dir can be
    * removed before return.
    */
  private def drainUpdates(spark: SparkSession, df: DataFrame,
      keyCol: String): DataFrame = {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-streamupd").toString
    val q = df.writeStream
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$outDir/out")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("batch_id").desc)
    val out = spark.read.parquet(s"$outDir/out")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "batch_id")
      .localCheckpoint(true)
    StoreUtil.deleteRecQuiet(outDir)
    out
  }

  // ------------------------------------------------------------------ //
  // Streaming MinHash-LSH near-dup (TextStream.neardupStream): per     //
  // band-key state holds the (doc_id, shingle-set) arrivals; a pair is //
  // emitted in the micro-batch its SECOND member arrives in. The       //
  // emitted set is arrival-order independent — a pair shares a band    //
  // key and clears the jac threshold or it doesn't, whichever batch    //
  // cut the members straddle — so after distinct() (a pair sharing k   //
  // band keys is emitted k times) the drained stream equals the batch  //
  // banded candidate set exactly and the row shares                    //
  // docs_minhash_neardup's oracle verbatim. The band keys are          //
  // value-identical to the batch pipeline's by construction            //
  // (TextStream.bandKeysExpr reuses TextOps' affine family).           //
  // ------------------------------------------------------------------ //

  def streamNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = stagedStream(spark, sfDir, docStageCache, "documents",
      "doc_id", "graft-docstream")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    val pairs = graft.streaming.TextStream
      .neardupStream(spark, src, threshold = 0.3)
      .toDF("a_id", "b_id", "jac")
    runToMemory(spark, pairs, "append")
      .distinct()
      .orderBy("a_id", "b_id")
  }

  // ------------------------------------------------------------------ //
  // Streaming funnel timing (EventsStream.conversionStream's drained-  //
  // aggregate face): per-user state = (min view µs, min purchase µs)  //
  // — two mergeable mins, so the last emission per user equals the    //
  // global firsts REGARDLESS of batch cut points — then the batch     //
  // conversionLag aggregation runs over the drained state and the row //
  // shares events_conversion_lag's oracle verbatim. (The append-mode  //
  // conversionStream in streaming/ is the event-at-a-time serving     //
  // face; it emits on first qualifying purchase under its documented  //
  // ordering contract. This form has no ordering contract at all.)    //
  // State: two longs per user, forever-bounded by |users|.            //
  // ------------------------------------------------------------------ //

  def streamConversion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val obs = eventsStream(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
    val firsts = obs.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (u: Long, batch: Iterator[(Long, String, Long)],
            state: GroupState[(Option[Long], Option[Long])]) =>
          var (v, p) = state.getOption
            .getOrElse((Option.empty[Long], Option.empty[Long]))
          batch.foreach { case (_, t, us) =>
            if (t == "view") v = Some(v.fold(us)(math.min(_, us)))
            else p = Some(p.fold(us)(math.min(_, us)))
          }
          state.update((v, p))
          (u, v, p)
      }
      .toDF("user_id", "first_view_us", "first_purchase_us")
    drainUpdates(spark, firsts, "user_id")
      .withColumn("lag_us",
        col("first_purchase_us") - col("first_view_us"))
      .agg(
        sum(when(col("first_view_us").isNotNull, 1L).otherwise(0L))
          .as("n_viewed"),
        sum(when(col("first_view_us").isNotNull &&
          col("first_purchase_us").isNotNull && col("lag_us") >= 0, 1L)
          .otherwise(0L)).as("n_converted"),
        round(expr(
          "percentile(CASE WHEN first_view_us IS NOT NULL AND lag_us >= 0" +
            " THEN lag_us END, 0.5)") / 1000000.0, 4).as("lag_p50_s"),
        round(expr(
          "percentile(CASE WHEN first_view_us IS NOT NULL AND lag_us >= 0" +
            " THEN lag_us END, 0.9)") / 1000000.0, 4).as("lag_p90_s"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_viewed"), 4))
      .select("n_viewed", "n_converted", "conv_rate",
        "lag_p50_s", "lag_p90_s")
  }

  val streamLeaderboardSql: String =
    s"""SELECT event_type, rank, event_id, value FROM (
       |  SELECT event_type, event_id, value, CAST(row_number() OVER (
       |    PARTITION BY event_type
       |    ORDER BY value DESC, event_id) AS INT) AS rank
       |  FROM events)
       |WHERE rank <= $lbK
       |ORDER BY event_type, rank""".stripMargin

  // ------------------------------------------------------------------ //
  // ST2/ST3 end-to-end: foreachBatch continuous indexing. The staged   //
  // stream replays (batch 0 = full scan, batch 1 = the %7 rescan with  //
  // newer mtimes); each micro-batch lands through the SAME J1 merge    //
  // the batch pipeline uses (ParquetIndex.upsert), and the final       //
  // snapshot equals the one-shot batch merge — shares                  //
  // fs_merge_upsert's oracle verbatim. LWW by strictly-newer mtimes    //
  // makes the fold independent of batch arrival order.                 //
  // ------------------------------------------------------------------ //

  /** Stage the two scan generations (full scan, then the %7 rescan with
    * newer mtimes — fs_merge_upsert's exact inputs) as two flat files
    * in ONE input dir (no `g=N` subdirs — the source would read them as
    * a partition column) so the file source replays them as separate
    * micro-batches. Shared by [[streamIndex]] and [[streamIndexMor]].
    */
  private[operators] def stageScanGens(spark: SparkSession, sfDir: String,
      root: String): Unit = {
    val base = SyntheticFs.files(spark, sfDir)
      .select("relative_path", "size_bytes", "modified_time")
    val rescan = SyntheticFs.files(spark, sfDir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("relative_path"),
        (col("size_bytes") + 777).as("size_bytes"),
        (col("modified_time") + expr("INTERVAL 5 DAYS"))
          .as("modified_time"))
    def stageOne(df: DataFrame, tmp: String, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$root/$tmp")
      val part = new java.io.File(s"$root/$tmp").listFiles
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part in $root/$tmp"))
      val in = new java.io.File(s"$root/in"); in.mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(in, name).toPath): Unit
      StoreUtil.deleteRecQuiet(s"$root/$tmp")
    }
    stageOne(base, "tmp0", "gen0.parquet")
    stageOne(rescan, "tmp1", "gen1.parquet")
  }

  /** Run the staged generations through a foreachBatch stream into the
    * store at `root/store`, one micro-batch per generation, applying
    * `land` per batch. Shared plumbing of the COW and MOR index twins.
    */
  private[operators] def runIndexStream(spark: SparkSession, root: String)(
      land: (ParquetIndex, DataFrame, Long) => Unit): Unit = {
    val idx = new ParquetIndex(s"$root/store", writeFiles = 4)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$root/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/in")
    val q = src.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        land(idx, batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def streamIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(storeCache, sfDir,
      "graft-streamindex") { root =>
      stageScanGens(spark, sfDir, root)
      runIndexStream(spark, root) { (idx, batch, _) =>
        idx.upsert(batch.sparkSession, batch,
          "relative_path", "modified_time"): Unit
      }
    }
    new ParquetIndex(s"$dir/store").read(spark)
      .getOrElse(sys.error(s"fs_stream_index: empty store at $dir"))
      .select("relative_path", "size_bytes", "modified_time")
      .orderBy("relative_path")
  }

  // ------------------------------------------------------------------ //
  // The MOR twin: same stream, same final state, write cost ∝ batch.   //
  // ------------------------------------------------------------------ //

  /** How many micro-batches between [[ParquetIndex.checkpointMor]]
    * folds in [[streamIndexMor]] — every 2nd batch, so the 2-generation
    * green row exercises append → fold → read, not just append.
    */
  private[operators] val morCheckpointEvery = 2

  /** Streaming MOR ingestion — [[streamIndex]]'s economics fix: the COW
    * twin rewrites the whole snapshot every micro-batch (write ∝ index
    * size), this one lands each batch as a MOR delta (write ∝ BATCH
    * size — StreamMorSpec measures the byte ratio) and folds the log
    * with a periodic [[ParquetIndex.checkpointMor]] (every
    * [[morCheckpointEvery]] batches), exactly the appendDelta +
    * checkpoint cadence the batch pipeline's MOR path uses. The final
    * [[ParquetIndex.readMor]] state folds to the same (key, mtime) LWW
    * snapshot as the per-batch COW merge — strictly-newer mtimes across
    * generations make the fold independent of batch arrival order — so
    * the row shares `fs_stream_index`'s oracle verbatim.
    */
  /** The MOR twin's cached store root for `sfDir`, if built in this JVM
    * (StreamMorSpec inspects the store the green row actually serves).
    */
  private[operators] def streamIndexMorStoreDir(
      sfDir: String): Option[String] = Option(morStoreCache.get(sfDir))

  def streamIndexMor(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(morStoreCache, sfDir,
      "graft-streamindexmor") { root =>
      stageScanGens(spark, sfDir, root)
      runIndexStream(spark, root) { (idx, batch, batchId) =>
        idx.appendDelta(batch.sparkSession, batch): Unit
        if ((batchId + 1) % morCheckpointEvery == 0)
          idx.checkpointMor(batch.sparkSession,
            "relative_path", "modified_time"): Unit
      }
    }
    new ParquetIndex(s"$dir/store")
      .readMor(spark, "relative_path", "modified_time")
      .getOrElse(sys.error(s"fs_stream_index_mor: empty store at $dir"))
      .select("relative_path", "size_bytes", "modified_time")
      .orderBy("relative_path")
  }

  // ------------------------------------------------------------------ //
  // Streaming ANN ingestion: the vector tier's stream-fed store twin,  //
  // completing the symmetry the other durable stores already have      //
  // (stream-fed NearDupIndex, streaming MOR ParquetIndex).             //
  // ------------------------------------------------------------------ //

  private val annStreamCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** The deployment cadence for a vector store: the coarse quantizer is
    * built OFFLINE (here: the 8 seed vectors, `lloydRounds = 0` — the
    * purely seeded quantizer, since 8 points train nothing), then the
    * corpus STREAMS in through foreachBatch → [[AnnIndex.update]], one
    * micro-batch per staged file. Update's membership anti-join makes a
    * replayed batch a no-op, so checkpoint-recovery re-delivery is
    * safe — the exactly-once store discipline every foreachBatch sink
    * here follows. The gated row serves the binary Hamming tier from
    * the stream-fed postings and must equal the batch query
    * bit-for-bit: sign sketches depend only on the vectors (never on
    * cell layout or arrival order), so it shares
    * `ann_binary_hamming`'s oracle verbatim (the
    * `docs_stream_neardup` / `fs_stream_index_mor` discipline).
    */
  /** The stream-fed ANN store root for `sfDir`, if built in this JVM
    * (AnnStreamSpec inspects the checkpoint the green row's store was
    * actually fed through).
    */
  private[operators] def annStreamStoreDir(
      sfDir: String): Option[String] = Option(annStreamCache.get(sfDir))

  def annStreamIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(annStreamCache, sfDir,
      "graft-annstream") { root =>
      val emb = Tables(spark, sfDir, "embeddings")
      emb.filter(!col("vec_id").between(1, 8))
        .repartition(4, col("vec_id"))
        .write.parquet(s"$root/in")
      AnnIndex.build(spark, s"$root/store",
        emb.filter(col("vec_id").between(1, 8)), lloydRounds = 0)
      val src = spark.readStream
        .schema(spark.read.parquet(s"$root/in").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in")
      val q = src.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          AnnIndex.update(batch.sparkSession, s"$root/store", batch)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val qsk = VectorOps.signSketches(
      Tables(spark, sfDir, "embeddings").filter(col("vec_id") < 5))
    val cand = spark.read.parquet(s"$dir/store/postings")
      .select("vec_id", "label", "b_lo", "b_hi")
      .filter(col("vec_id") >= 5)
    VectorOps.binaryTopkOn(qsk.unionByName(cand))
      .select(col("q_id"), col("vec_id"), col("label"), col("hamming"),
        col("rk").as("rank"))
      .orderBy("q_id", "rank")
  }

  // ------------------------------------------------------------------ //
  // Streaming DELETE drain: inserts AND deletes arrive as streams and  //
  // drain through foreachBatch into the SAME serving store — the       //
  // change-feed consumption shape of a curation pipeline (new docs     //
  // flow in, contamination verdicts flow in behind them), promoted     //
  // from a spec to an oracle-gated row per the r11 verdict.            //
  // ------------------------------------------------------------------ //

  private val termStreamDelCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** The stream-fed deleted text store root for `sfDir`, if built in
    * this JVM (spec inspection surface).
    */
  private[operators] def termStreamDelStoreDir(
      sfDir: String): Option[String] = Option(termStreamDelCache.get(sfDir))

  /** BM25 served from a [[TermIndex]] fed ENTIRELY by streams: the
    * corpus drains through foreachBatch → [[TermIndex.update]] (one
    * micro-batch per staged file; membership makes replays no-ops),
    * then a DELETE id stream drains through [[TermIndex.delete]]
    * (tombstone appends — re-deleting on recovery replay is harmless,
    * the same exactly-once-store discipline). The served ranking must
    * be bit-identical to from-scratch BM25 on the post-delete corpus,
    * so the row shares `docs_bm25_indexed_deleted`'s oracle verbatim —
    * deleted docs stop influencing n/avgdl/df, not just the hit list,
    * even though the store never saw a batch build or a compact.
    */
  def streamIndexedDeleted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(termStreamDelCache, sfDir,
      "graft-termstream-del") { root =>
      val docs = Tables(spark, sfDir, "documents")
        .select("doc_id", "text")
      docs.repartition(4, col("doc_id")).write.parquet(s"$root/in")
      docs.filter(TextOps.delPred).select("doc_id")
        .repartition(2, col("doc_id")).write.parquet(s"$root/dels")
      def drain(src: String, ckpt: String)(
          f: (DataFrame, Long) => Unit): Unit = {
        val q = spark.readStream
          .schema(spark.read.parquet(s"$root/$src").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/$src")
          .writeStream
          .option("checkpointLocation", s"$root/$ckpt")
          .outputMode("append")
          .foreachBatch(f)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain("in", "ckpt_in") { (batch, _) =>
        TermIndex.update(batch.sparkSession, s"$root/store", batch)
      }
      drain("dels", "ckpt_dels") { (batch, _) =>
        TermIndex.delete(batch.sparkSession, s"$root/store", batch)
      }
    }
    TermIndex.search(spark, s"$dir/store", TextOps.bmTerms, k = 20)
  }

  // ------------------------------------------------------------------ //
  // Streaming incremental rollup maintenance: the J3 snapshot kept     //
  // current by folding the change feed per micro-batch.                //
  // ------------------------------------------------------------------ //

  private val rollupCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** [[FsOps.dirRollupIncremental]]'s STREAMING twin: the signed change
    * feed arrives as micro-batches and each one folds into the stored
    * per-directory snapshot via [[FsOps.dirRollupFoldDelta]] — write
    * cost per batch is O(|snapshot| + |batch| × depth), and the final
    * state must equal the batch delta-merge AND the from-scratch
    * recompute (the row shares `fs_dir_rollup_incremental`'s oracle
    * verbatim). Deltas are abelian, so the result is independent of
    * batch cut points and arrival order — the determinism contract
    * every row in this file needs. Snapshots land copy-on-write as
    * `snap-<n>` generations (readers of `snap-g` are never disturbed,
    * the monotonic-generation discipline the ParquetIndex store uses);
    * a deployment whose snapshot outgrows per-batch rewrite moves the
    * fold to MOR cadence — append the delta aggregate, fold at
    * checkpoint — exactly the `fs_stream_index` → `fs_stream_index_mor`
    * economics step.
    */
  def streamRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(rollupCache, sfDir,
      "graft-streamrollup") { root =>
      FsOps.dirRollupPrior(spark, sfDir)
        .write.parquet(s"$root/snap-0")
      FsOps.rollupChangeFeed(spark, sfDir)
        .repartition(4)
        .write.parquet(s"$root/feed")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$root/feed").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/feed")
      val q = src.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          rollupCowStep(root, batch, bid)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // committed generations only — same torn-write discipline as the
    // MOR twin's discovery (and the same Hadoop-FS path: this store
    // lives on HDFS/S3 in production)
    val last = numberedDirs(spark, dir, "snap-", committedOnly = true)
      .map(_._1).max
    SyntheticFs.entries(spark, sfDir)
      .filter(col("type") === "directory")
      .select(col("filepath").as("directory_path"))
      .join(spark.read.parquet(s"$dir/snap-$last"),
        Seq("directory_path"), "left")
      .select(col("directory_path"),
        coalesce(col("sz"), lit(0L)).as("total_size"),
        coalesce(col("fc"), lit(0L)).as("file_count"))
      .orderBy("directory_path")
  }

  /** One copy-on-write fold step, IDEMPOTENT under Structured
    * Streaming's retry contract: the generation IS the engine's
    * batchId (snap-`b` = state before batch `b`), so a retried batch
    * re-reads the same prior and `mode("overwrite")` clobbers whatever
    * a failed attempt half-wrote to snap-`b+1` — the r13 shape (driver
    * AtomicInteger + default ErrorIfExists) made any retry fail
    * permanently on its own debris, and a checkpoint RESTART re-ran
    * batch 0 against the wrong generation. Deriving the name from the
    * batchId fixes both with no driver state at all.
    */
  private[graft] def rollupCowStep(root: String, batch: DataFrame,
      batchId: Long): Unit = {
    val prev = batch.sparkSession.read.parquet(s"$root/snap-$batchId")
    FsOps.dirRollupFoldDelta(prev, batch)
      .write.mode("overwrite").parquet(s"$root/snap-${batchId + 1}")
  }

  // ------------------------------------------------------------------ //
  // MOR-cadence streaming rollup: per-batch writes ∝ the DELTA, the    //
  // snapshot folds only at checkpoint.                                 //
  // ------------------------------------------------------------------ //

  private val rollupMorCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** One merge-on-read log step: persist the batch's per-directory
    * delta AGGREGATE — O(touched dirs) bytes — and leave the snapshot
    * alone. Keyed by batchId with overwrite, so a retry is idempotent
    * (same discipline as [[rollupCowStep]]).
    */
  private[graft] def rollupMorStep(root: String, batch: DataFrame,
      batchId: Long): Unit =
    FsOps.rollupDeltaAgg(batch)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/log/batch-$batchId")

  /** Store-path access goes through the Hadoop [[HFileSystem]] API —
    * the operator's production shape is a rollup store on HDFS/S3,
    * where `java.io.File` cannot resolve at all; a `file:` URI (the
    * tests, local mode) rides the same code path via LocalFileSystem.
    */
  private def hfs(spark: SparkSession, path: String)
      : (HFileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Generation/batch directories under `path` matching `prefix`,
    * optionally gated on the committer's `_SUCCESS` marker: a Spark
    * parquet DIRECTORY becomes visible before its write completes, so
    * a crash mid-write leaves a torn dir that max-generation discovery
    * would otherwise select — silently losing folded state. With the
    * gate, a torn snapshot is invisible and the previous generation +
    * untrimmed log still serve (the r14 advice's crash hole).
    */
  private def numberedDirs(spark: SparkSession, path: String,
      prefix: String, committedOnly: Boolean): Seq[(Long, String)] = {
    val (fs, p) = hfs(spark, path)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(s => !committedOnly ||
        fs.exists(new HPath(s.getPath, "_SUCCESS")))
      .map(s => (s.getPath.getName.stripPrefix(prefix).toLong,
        s.getPath.toString))
      .sortBy(_._1)
  }

  /** Highest folded-through snapshot generation: `snap-b<N>` = state
    * with log batches [0, N) folded in. -1 if none (never happens —
    * the fixture seeds snap-b0). Only `_SUCCESS`-committed snapshots
    * count.
    */
  private def morFoldedThrough(spark: SparkSession, root: String): Long = {
    val committed = numberedDirs(spark, root, "snap-b",
      committedOnly = true).map(_._1)
    if (committed.isEmpty) {
      // distinguish "no store here" (caller's problem, path error)
      // from "snapshots exist but NONE carry _SUCCESS" — the latter is
      // almost always a writer with
      // mapreduce.fileoutputcommitter.marksuccessfuljobs=false (common
      // on object stores), under which every snapshot looks torn and
      // this would otherwise surface as a cryptic path-not-found on
      // snap-b-1
      val all = numberedDirs(spark, root, "snap-b",
        committedOnly = false)
      if (all.nonEmpty) sys.error(
        s"rollup MOR store at $root has ${all.size} snapshot dir(s) " +
          "but none carries the committer's _SUCCESS marker — if the " +
          "writer ran with " +
          "mapreduce.fileoutputcommitter.marksuccessfuljobs=false, " +
          "re-enable it (committed-generation discovery keys on the " +
          "marker to keep torn snapshots invisible); otherwise every " +
          "snapshot here is a torn write")
    }
    committed.foldLeft(-1L)(math.max)
  }

  /** Committed log batches ≥ `after`, fold order. A torn (un-committed)
    * batch dir is invisible to readers — streaming's retry overwrites
    * it idempotently; until then the read serves without it.
    */
  private def morLogBatches(spark: SparkSession, root: String,
      after: Long): Seq[String] =
    numberedDirs(spark, s"$root/log", "batch-", committedOnly = true)
      .filter(_._1 >= after).map(_._2)

  /** MOR serving read: snapshot ⊕ fold(unfolded log). Log batches
    * below the snapshot's folded-through watermark are IGNORED, which
    * is what makes [[rollupMorCheckpoint]] crash-safe: the new
    * snapshot lands first, and a crash before the log trim leaves
    * batches the read no longer applies (never a double fold).
    */
  private[graft] def rollupMorRead(spark: SparkSession,
      root: String): DataFrame = {
    val n = morFoldedThrough(spark, root)
    val snap = spark.read.parquet(s"$root/snap-b$n")
    val tail = morLogBatches(spark, root, after = n)
    if (tail.isEmpty) snap
    else FsOps.dirRollupFoldAgg(snap,
      spark.read.parquet(tail: _*)
        .groupBy("directory_path")
        .agg(sum("dsz").as("dsz"), sum("dfc").as("dfc")))
  }

  /** Checkpoint fold: materialize snapshot ⊕ log as the next
    * `snap-b<N>` generation, then trim the folded batches. Write
    * ORDER is the safety argument — new snapshot first (readers cut
    * over atomically on the max-generation rule), folded log dirs
    * dropped after (a crash in between leaves ignored debris, cleaned
    * on the next checkpoint). Cost is O(|snapshot|) ONCE per cadence
    * instead of per batch — the `fs_stream_index` →
    * `fs_stream_index_mor` economics applied to J3.
    */
  private[graft] def rollupMorCheckpoint(spark: SparkSession,
      root: String): Unit = {
    val (fs, _) = hfs(spark, root)
    def rm(p: String): Unit = fs.delete(new HPath(p), true): Unit
    val n = morFoldedThrough(spark, root)
    // below-watermark debris (a crashed trim, a batch retried after
    // its fold landed, or a TORN batch dir with no _SUCCESS) is
    // invisible to the read — sweep it here. The raw (ungated) listing
    // is used so torn dirs below the watermark are collected too.
    numberedDirs(spark, s"$root/log", "batch-", committedOnly = false)
      .filter(_._1 < n).map(_._2).foreach(rm)
    val tail = morLogBatches(spark, root, after = n)
    if (tail.isEmpty) return
    val through = tail.map(p =>
      p.split('/').last.stripPrefix("batch-").toLong).max + 1
    rollupMorRead(spark, root)
      .write.mode("overwrite").parquet(s"$root/snap-b$through")
    tail.foreach(rm)
  }

  /** [[streamRollup]]'s MERGE-ON-READ twin — the shape whose per-batch
    * write cost is O(|Δ| × depth) instead of O(|snapshot|): each
    * micro-batch appends its delta aggregate to the rollup log
    * ([[rollupMorStep]]); the snapshot folds forward only at
    * CHECKPOINT cadence ([[rollupMorCheckpoint]] — here after the
    * first half of the batches, so the serving read below exercises
    * snapshot ⊕ checkpoint ⊕ live log tail all at once). Shares
    * `fs_dir_rollup_incremental`'s oracle verbatim: fold points are
    * invisible in the result because deltas are abelian.
    */
  def streamRollupMor(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = StoreUtil.cachedTempDir(rollupMorCache, sfDir,
      "graft-streamrollupmor") { root =>
      FsOps.dirRollupPrior(spark, sfDir)
        .write.parquet(s"$root/snap-b0")
      FsOps.rollupChangeFeed(spark, sfDir)
        .repartition(4)
        .write.parquet(s"$root/feed")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$root/feed").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/feed")
      val q = src.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          rollupMorStep(root, batch, bid)
          // cadence: fold the log into a real snapshot generation
          // after batch 1 (half the feed) — batches 2-3 stay in the
          // log for the read path to fold on the fly
          if (bid == 1L) rollupMorCheckpoint(spark, root)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    SyntheticFs.entries(spark, sfDir)
      .filter(col("type") === "directory")
      .select(col("filepath").as("directory_path"))
      .join(rollupMorRead(spark, dir), Seq("directory_path"), "left")
      .select(col("directory_path"),
        coalesce(col("sz"), lit(0L)).as("total_size"),
        coalesce(col("fc"), lit(0L)).as("file_count"))
      .orderBy("directory_path")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_stream_hourly" -> streamHourly,
    "events_stream_sessionize" -> streamSessionize,
    "events_stream_distinct" -> streamDistinct,
    "events_stream_leaderboard" -> streamLeaderboard,
    "events_stream_conversion" -> streamConversion,
    "docs_stream_neardup" -> streamNearDup,
    "fs_stream_index" -> streamIndex,
    "fs_stream_index_mor" -> streamIndexMor,
    "ann_stream_indexed" -> annStreamIndexed,
    "docs_stream_indexed_deleted" -> streamIndexedDeleted,
    "fs_stream_rollup" -> streamRollup,
    "fs_stream_rollup_mor" -> streamRollupMor)

  def oracleSql: Map[String, String] = Map(
    "events_stream_hourly" -> EventsOps.hourlyWindowSql,
    "events_stream_sessionize" -> streamSessionizeSql,
    "events_stream_distinct" -> streamDistinctSql,
    "events_stream_leaderboard" -> streamLeaderboardSql,
    // the drained per-user firsts fold to the batch funnel exactly
    "events_stream_conversion" -> EventsOps.conversionLagSql,
    // drained band-state pairs = the batch banded candidate set
    "docs_stream_neardup" -> TextOps.minhashNearDupSql,
    "fs_stream_index" -> FsOps.mergeUpsertSql,
    // the MOR twin folds to the identical LWW snapshot — same oracle
    "fs_stream_index_mor" -> FsOps.mergeUpsertSql,
    // stream-fed vector store serves the batch binary top-k verbatim
    "ann_stream_indexed" -> VectorOps.binaryHammingSql,
    // stream-fed inserts + deletes fold to the batch post-delete BM25
    "docs_stream_indexed_deleted" -> TextOps.bm25TopkDeletedSql,
    // per-micro-batch delta folds reach the from-scratch recompute
    "fs_stream_rollup" -> FsOps.dirRollupIncrementalSql,
    // MOR cadence: log-append per batch, fold at checkpoint — fold
    // points are invisible (abelian deltas), so the SAME oracle
    "fs_stream_rollup_mor" -> FsOps.dirRollupIncrementalSql)
}
