package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WRITE-GENERATION counter + COMMIT WATERMARK for the durable serving
  * stores — the tiny pieces of state that make UPSERT-BY-ID
  * (last-writer-wins re-index) possible without a store rewrite AND
  * reader-atomic: every [[TermIndex.upsert]] / [[AnnIndex.upsert]] /
  * [[NearDupIndex.upsert]] RESERVES the next generation here, appends
  * its data stamped `gen` and its tombstones tagged writer-generation
  * `gen` (both INVISIBLE while the committed watermark is below `gen`
  * — see [[Tombstones]]), and finally [[commit]]s the generation with
  * ONE single-file append — the atomic flip that makes the tombstone
  * (hiding the old rows) and the data (the new rows) visible
  * together. A reader anywhere in the window serves the OLD version;
  * it never sees the upserted doc absent or doubled — the in-engine
  * mirror of the reference search sink's per-doc `{"index": {_id}}`
  * overwrite (elasticsearch_integration.py:403-409), which also never
  * exposes a gap.
  *
  * Layout: `dir/genmeta` holds one (gen: long) row per reservation —
  * the current generation is the max (0 for a store never upserted;
  * [[TermIndex.update]]/[[AnnIndex.update]] stamp their rows 0, so
  * plain insert-only stores never touch either table). `dir/gencommit`
  * holds one (gen: long) row per COMMITTED upsert; the watermark is
  * its max. A store without `gencommit` has no upsert in flight or
  * history under this discipline and reads ungated (the legacy fast
  * path — existence check only, pinned plan shapes untouched).
  *
  * Crash contract: the reservation row commits BEFORE any data write
  * (a crashed upsert re-runs at a STRICTLY HIGHER generation — over-
  * reserving is always safe, reusing a generation never is, which
  * [[reserve]] now ENFORCES with an atomic-create marker rather than
  * merely documenting single-writer discipline); the watermark row
  * commits LAST, so a torn upsert's data and tombstones stay invisible
  * forever — the re-run's `gen - 1` tombstone hides the torn rows the
  * moment its own commit raises the watermark past them.
  * [[consolidate]] (called by the stores' `compact`) folds both
  * tables down to one max row each, PRESERVING the counters —
  * resetting them would let a later delete's `gen`-threshold tombstone
  * miss still-live higher-generation rows.
  */
private[operators] object GenMeta {

  def path(dir: String): String = s"$dir/genmeta"

  def commitPath(dir: String): String = s"$dir/gencommit"

  /** The store's current write generation: max reserved, 0 if never
    * upserted. Reads a table with one tiny row per upsert since the
    * last compact — never the store.
    */
  def current(spark: SparkSession, dir: String): Long =
    maxGen(spark, path(dir))

  /** The COMMITTED watermark: rows stamped `gen` above it (and
    * tombstones written by a generation above it) are in-flight or
    * torn and must not serve. `None` = the store has never upserted
    * under the watermark discipline — read ungated (every row/
    * tombstone visible), the exact legacy semantics.
    */
  def committed(spark: SparkSession, dir: String): Option[Long] =
    // hasRows, not a bare dir check: a reader racing the very first
    // watermark write may see the dir with only a _temporary inside —
    // that store is still ungated (everything in it predates upserts)
    if (!hasRows(spark, commitPath(dir))) None
    else Some(maxGen(spark, commitPath(dir)))

  private def maxGen(spark: SparkSession, p: String): Long =
    if (!hasRows(spark, p)) 0L
    else spark.read.parquet(p).agg(max("gen")).head().getLong(0)

  /** Any data file present? (A crash between [[reserve]]'s marker and
    * its row can leave the dir holding only dot-files — reading that
    * as parquet would fail schema inference instead of meaning 0.)
    */
  private def hasRows(spark: SparkSession, p0: String): Boolean = {
    val p = new HPath(p0)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
  }

  /** Initialize the watermark table (idempotent) — the FIRST step of
    * an upsert on any store: once `gencommit` exists, readers gate on
    * it, so the rows the upsert is about to write stay invisible until
    * [[commit]]. Seeded with the current reserved max: everything
    * already in the store (all of it committed — single writer) stays
    * visible.
    */
  def initCommitted(spark: SparkSession, dir: String): Unit =
    if (!hasRows(spark, commitPath(dir)))
      writeRow(spark, commitPath(dir), current(spark, dir))

  /** Publish generation `g`: the single-file append whose one-rename
    * parquet commit is the upsert's ATOMIC visibility flip.
    */
  def commit(spark: SparkSession, dir: String, g: Long): Unit =
    writeRow(spark, commitPath(dir), g)

  private def writeRow(spark: SparkSession, p: String, g: Long): Unit = {
    import spark.implicits._
    Seq(g).toDF("gen").coalesce(1).write.mode("append").parquet(p)
  }

  /** Reserve and persist the next generation. Crash-safe (the row
    * lands before the caller writes any data — see the header) and
    * CONCURRENCY-CHECKED: a zero-byte marker `.g<g>.reserved` is
    * atomically created (create-fails-if-exists) before the row
    * commits, so two racing writers that both read max=g-1 cannot both
    * proceed at g — the loser fails fast instead of both half-writing
    * the same generation. Markers are dot-prefixed, so parquet readers
    * of the table never see them; [[consolidate]] sweeps them with the
    * folded row files.
    *
    * CRASH AUTO-HEAL (r13 verdict #6): a marker whose generation has
    * no genmeta row is torn — the writer died between the two steps —
    * and previously blocked that generation until manual surgery.
    * Healing never REUSES the generation (deleting the marker races a
    * writer that is merely slow between its two metadata writes, and
    * two writers sharing one generation is the unrecoverable state);
    * instead the torn generation is BURNED and the reservation takes
    * the next one — over-reserving is always safe (header contract).
    * Liveness is judged by marker age: a rowless marker older than
    * `staleMarkerMs` is declared dead; a FRESH rowless marker still
    * fails fast (mid-reserve writer — the single-writer discipline,
    * and the shape the TombstoneHygieneSpec lock test pins).
    *
    * The grace is deliberately GENEROUS (10 min): the marker→row
    * window is a distributed parquet write, not milliseconds — a
    * writer stalled on a GC pause or a busy cluster, or a shared
    * filesystem with clock skew, must not get its generation burned
    * while alive (burning never reuses the generation, but it does put
    * a second data writer next to a live one, which the store's
    * single-writer arguments assume away). Before burning, the healer
    * additionally sleeps a beat and RE-CHECKS that the row still has
    * not landed and the marker still exists un-refreshed — a writer
    * that completes or re-touches during the beat wins — and leaves a
    * `.g<g>.burned` record (healer host + time) beside the marker for
    * post-mortem diagnosis. Healing is a rare recovery path; the
    * extra seconds are free.
    */
  def reserve(spark: SparkSession, dir: String,
      staleMarkerMs: Long = 600000L,
      healRecheckMs: Long = 2000L): Long = {
    val p = new HPath(path(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    var g = current(spark, dir) + 1
    // bounded: each pass either returns or burns one torn generation;
    // >64 consecutive torn markers means something else is wrong
    (0 until 64).foreach { _ =>
      val marker = new HPath(p, s".g$g.reserved")
      val created =
        try { fs.create(marker, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (created) {
        writeRow(spark, path(dir), g)
        return g
      }
      def torn: Boolean =
        try {
          current(spark, dir) < g &&
            System.currentTimeMillis() -
              fs.getFileStatus(marker).getModificationTime >= staleMarkerMs
        } catch {
          // marker vanished (a compact swept it, or the writer cleaned
          // up): not torn — the fail-fast below names the live race
          case _: java.io.FileNotFoundException => false
        }
      require(torn,
        s"reserve: generation $g already reserved at $marker — a " +
          "concurrent writer holds it (the stores are single-writer); " +
          "re-run after it finishes")
      // confirmation beat: declare the writer dead only if nothing
      // about the reservation moved across the sleep
      Thread.sleep(healRecheckMs)
      require(torn,
        s"reserve: generation $g's writer progressed during the heal " +
          "re-check — it is alive; re-run after it finishes")
      val burnRecord = new HPath(p, s".g$g.burned")
      try {
        val os = fs.create(burnRecord, true)
        os.write((s"burned by ${java.net.InetAddress.getLocalHost.getHostName} " +
          s"at ${java.time.Instant.now()}\n").getBytes("UTF-8"))
        os.close()
      } catch { case _: java.io.IOException => () } // diagnostic only
      g += 1 // torn reservation: burn g, take the next generation
    }
    throw new IllegalStateException(
      s"reserve: 64 consecutive torn generation markers under $p")
  }

  /** Fold the per-reservation and per-commit rows to a single max row
    * each — append the consolidated file FIRST, then drop the captured
    * originals, so a crash at any point leaves a superset whose max is
    * unchanged.
    */
  def consolidate(spark: SparkSession, dir: String): Unit = {
    consolidateTable(spark, path(dir))
    consolidateTable(spark, commitPath(dir))
  }

  private def consolidateTable(spark: SparkSession, p0: String): Unit = {
    val p = new HPath(p0)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val old = fs.listStatus(p)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath)
    val (markers, rows) = old.partition(_.getName.startsWith("."))
    if (rows.length > 1) {
      writeRow(spark, p0, maxGen(spark, p0))
      rows.foreach(f => fs.delete(f, false): Unit)
    }
    markers.foreach(f => fs.delete(f, false): Unit)
  }
}
