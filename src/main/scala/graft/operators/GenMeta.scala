package graft.operators

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WRITE-GENERATION counter for the durable serving stores — the tiny
  * piece of state that makes UPSERT-BY-ID (last-writer-wins re-index)
  * possible without a store rewrite: every [[TermIndex.upsert]] /
  * [[AnnIndex.upsert]] RESERVES the next generation here, tombstones
  * the id set at `gen - 1` (hiding every older row of those ids, see
  * [[Tombstones]]) and appends its rows stamped `gen` — so the new
  * rows serve immediately while the old ones are subtracted, the
  * in-engine mirror of the reference search sink's `{"index": {_id}}`
  * overwrite-by-id actions (elasticsearch_integration.py:403-409) and
  * of `INSERT OR REPLACE` (direct_links.py:169-172).
  *
  * Layout: `dir/genmeta` holds one (gen: long) row per reservation;
  * the current generation is the max (0 for a store never upserted —
  * [[TermIndex.update]]/[[AnnIndex.update]] stamp their rows 0, so
  * plain insert-only stores never touch this table). The reservation
  * row commits BEFORE any data write: a crashed upsert re-runs at a
  * STRICTLY HIGHER generation, whose `gen - 1` tombstone hides the
  * torn partial rows — over-reserving is always safe, reusing a
  * generation never is (two half-written generations would both
  * serve). [[consolidate]] (called by the stores' `compact`) folds the
  * per-reservation rows down to one max row, PRESERVING the counter —
  * resetting it would let a later delete's `gen`-threshold tombstone
  * miss still-live higher-generation rows.
  */
private[operators] object GenMeta {

  def path(dir: String): String = s"$dir/genmeta"

  /** The store's current write generation: max reserved, 0 if never
    * upserted. Reads a table with one tiny row per upsert since the
    * last compact — never the store.
    */
  def current(spark: SparkSession, dir: String): Long =
    if (!StoreUtil.exists(spark, path(dir))) 0L
    else spark.read.parquet(path(dir)).agg(max("gen")).head().getLong(0)

  /** Reserve and persist the next generation (crash-safe: the row
    * lands before the caller writes any data — see the header).
    */
  def reserve(spark: SparkSession, dir: String): Long = {
    import spark.implicits._
    val g = current(spark, dir) + 1
    Seq(g).toDF("gen").coalesce(1).write.mode("append")
      .parquet(path(dir))
    g
  }

  /** Fold the per-reservation rows to a single max row — append the
    * consolidated file FIRST, then drop the captured originals, so a
    * crash at any point leaves a superset whose max is unchanged.
    */
  def consolidate(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val p = new HPath(path(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val old = fs.listStatus(p)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath)
    if (old.length <= 1) return
    val g = current(spark, dir)
    Seq(g).toDF("gen").coalesce(1).write.mode("append")
      .parquet(path(dir))
    old.foreach(f => fs.delete(f, false): Unit)
  }
}
