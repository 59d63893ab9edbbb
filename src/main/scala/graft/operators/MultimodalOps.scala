package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The actual media decode is STUBBED (this container ships no imaging
  * libraries): [[decodeMetaStub]] derives a deterministic fake
  * width/height/codec from the leading bytes, standing in for a real
  * header parse. Everything around the stub — the binary column, the
  * metadata struct schema, stride-based frame sampling, per-blob digests
  * and byte statistics — is real, distributed, codegen'd Spark.
  *
  * Scale notes: blobs never leave the executor (digest/stats reduce to
  * scalars per row); frame sampling is a per-row `transform`, no
  * shuffle; a real pipeline would partition by content-defined buckets
  * of the digest so downstream dedup joins are balanced.
  */
object MultimodalOps {

  /** Deterministic stand-in for an image-header parse: real decode would
    * go through an imaging library here (unavailable in this
    * environment); the schema and call shape are what a swap-in needs.
    */
  def decodeMetaStub(bin: Column): Column = struct(
    (pmod(crc32(bin), lit(1920)) + 1).cast("int").as("width"),
    (pmod(crc32(bin) * 7, lit(1080)) + 1).cast("int").as("height"),
    when(octet_length(bin) % 2 === 0, "rgb8").otherwise("yuv420")
      .as("codec"))

  /** Stride-sampled "frames": every `stride`-th byte starts a frame of
    * `frameLen` bytes (the real frame grab swaps in here; the array-of-
    * binary schema and bounds logic is the production plumbing). NOTE:
    * Spark's `sequence(1, n)` DESCENDS when n < 1, so the count is
    * clamped and sliced to stay empty-safe for tiny blobs.
    */
  def frameSample(binCol: String, stride: Int, frameLen: Int): Column =
    expr(s"""slice(
      |  transform(sequence(1, greatest(int(octet_length($binCol) / $stride), 1)),
      |    i -> substring($binCol, (i - 1) * $stride + 1, $frameLen)),
      |  1, int(octet_length($binCol) / $stride))""".stripMargin)

  /** One decoded media record (the schema a real decoder would fill). */
  final case class DecodedMedia(
      doc_id: Long, width: Int, height: Int, codec: String, n_bytes: Long)

  /** The batch-decode plumbing: `mapPartitions` with one decoder context
    * per partition (the Scala analog of a Pandas-batch UDF — the decoder
    * library would be initialized once per partition, rows streamed
    * through it). The decode itself is the deterministic stub; the
    * partitioning, per-partition init, and typed output schema are the
    * production shape.
    */
  def decodeBatched(df: DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import df.sparkSession.implicits._
    // undecodable rows (null id/blob) are dropped up front — dirty data
    // must not NPE a task (the expression form yields null structs for
    // the same rows)
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init happens HERE in a real pipeline
        // (imaging/audio library handle, GPU context, …)
        val crc = new java.util.zip.CRC32
        rows.map { case (id, bytes) =>
          crc.reset(); crc.update(bytes)
          val h = crc.getValue
          DecodedMedia(id, (h % 1920).toInt + 1, ((h * 7) % 1080).toInt + 1,
            if (bytes.length % 2 == 0) "rgb8" else "yuv420", bytes.length.toLong)
        }
      }
  }

  /** One dynamic inference batch: which rows ride together through the
    * (stubbed) model call, and how big the payload is.
    */
  final case class InferenceBatch(
      part_id: Int, batch_ord: Int, n_rows: Int, n_bytes: Long,
      doc_ids: Seq[Long])

  /** DYNAMIC BATCHING for model inference over opaque blobs — the
    * scheduler half of a GPU serving path (the decode half is
    * [[decodeBatched]]): within each partition, stream rows into the
    * current batch until adding the next row would exceed
    * `maxBatchBytes`, then seal it. An oversized single row becomes its
    * own batch (it must still be processed; the alternative is a stuck
    * pipeline). Batches preserve partition row order, so a downstream
    * `flatMap(batch => model(batch))` emits results in a deterministic
    * order per partition.
    *
    * Scale shape: map-only — no shuffle; the batch boundaries are a
    * pure fold over each partition's iterator, and executor memory is
    * bounded by ONE batch (`maxBatchBytes`), never the partition.
    */
  def inferenceBatches(df: DataFrame, idCol: String, binCol: String,
      maxBatchBytes: Long): org.apache.spark.sql.Dataset[InferenceBatch] = {
    import df.sparkSession.implicits._
    require(maxBatchBytes > 0, "maxBatchBytes must be positive")
    df.select(col(idCol).cast("long"), col(binCol))
      .filter(col(idCol).isNotNull && col(binCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        new Iterator[InferenceBatch] {
          private var ord = 0
          private var pending: Option[(Long, Array[Byte])] = None
          def hasNext: Boolean = pending.isDefined || rows.hasNext
          def next(): InferenceBatch = {
            val ids = Seq.newBuilder[Long]
            var bytes = 0L
            var n = 0
            var full = false
            while (!full && (pending.isDefined || rows.hasNext)) {
              val (id, b) = pending.getOrElse(rows.next())
              pending = None
              if (n > 0 && bytes + b.length > maxBatchBytes) {
                pending = Some((id, b)) // starts the NEXT batch
                full = true
              } else {
                ids += id; bytes += b.length; n += 1
                if (bytes >= maxBatchBytes) full = true
              }
            }
            val out = InferenceBatch(pid, ord, n, bytes, ids.result())
            ord += 1
            out
          }
        }
      }
  }

  /** Declared query: treat each document's text bytes as an opaque blob
    * and compute the binary-side statistics a media pipeline needs —
    * size, content digest, head bytes, and a stride-32 sample checksum
    * (all DuckDB-mirrorable, so the blob plumbing is oracle-checked).
    */
  def binaryStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("blob")).as("n_bytes"),
        sha2(col("blob"), 256).as("digest"),
        lower(hex(expr("substring(blob, 1, 8)"))).as("head_hex"),
        expr("""CASE WHEN octet_length(blob) < 32 THEN 0 ELSE aggregate(
          |  transform(sequence(1, int(octet_length(blob) / 32)),
          |            i -> ascii(substring(text, i * 32, 1))),
          |  0, (a, x) -> a + x) END""".stripMargin).as("sample_sum"))
      .orderBy("doc_id")

  val binaryStatsSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS digest,
      |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
      |  CAST(coalesce(list_sum(list_transform(
      |    generate_series(1, length(text) // 32),
      |    i -> ord(substr(text, i * 32, 1)))), 0) AS INT) AS sample_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Declared query: the frame-sample index — [[frameSample]] run as a
    * first-class distributed op (stride 32, 8-byte frames over each
    * document's bytes), emitting per-doc frame count and the first/last
    * frame bytes. This is the video-pipeline access pattern (sample
    * frames, index them for dedup/search) with the grab stubbed as a
    * byte slice; the count/bounds/empty-blob semantics are what the
    * oracle checks. Map-only: no shuffle, blobs never leave the row.
    */
  def frameIndex(spark: SparkSession, sfDir: String): DataFrame =
    frameIndexOf(Tables(spark, sfDir, "documents"))

  /** [[frameIndex]] over any `(doc_id, text)` frame — split out so the
    * empty/short-blob branch is spec-testable (the synthetic corpus has
    * no sub-32-byte docs, so the oracle gate alone never exercises it).
    * NOTE: `size(frames)` is 0 for a short blob and even
    * `try_element_at` THROWS on index 0 (ANSI: only out-of-RANGE is
    * forgiven, index 0 is malformed) — the `when` guard is load-bearing.
    */
  def frameIndexOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("frames", frameSample("blob", 32, 8))
      .select(
        col("doc_id"),
        size(col("frames")).as("n_frames"),
        lower(hex(when(size(col("frames")) > 0,
          expr("element_at(frames, 1)")))).as("first_frame_hex"),
        lower(hex(when(size(col("frames")) > 0,
          expr("element_at(frames, size(frames))")))).as("last_frame_hex"))
      .orderBy("doc_id")

  val frameIndexSql: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(length(text) // 32 AS INT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, n_frames,
      |  CASE WHEN n_frames >= 1
      |    THEN lower(hex(encode(substr(text, 1, 8)))) END AS first_frame_hex,
      |  CASE WHEN n_frames >= 1
      |    THEN lower(hex(encode(substr(text, (n_frames - 1) * 32 + 1, 8))))
      |    END AS last_frame_hex
      |FROM f ORDER BY doc_id""".stripMargin

  /** REAL feature extraction over the binary column — no stub needed:
    * the per-asset byte-value histogram folded to the fingerprint
    * fields a media pipeline actually gates on (byte diversity and the
    * dominant byte flag corruption, truncation, and container type —
    * e.g. a run of 0x00 padding or an all-0xFF dead sensor dominates
    * the mode). Distributed histogram shape: bytes EXPLODE to
    * (doc_id, byte) rows (∝ corpus bytes, the honest cost), the count
    * partial-aggregates map-side to ≤256 rows per doc, the mode is the
    * native [[graft.plans.GroupTopK]] (k=1, ties to the lower byte),
    * and diversity folds from the same counts — blobs never shuffle,
    * only (doc_id, byte, count) triples do. The `octet_length >= 1`
    * guard is load-bearing: Spark's `sequence(1, 0)` DESCENDS.
    */
  def byteHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    // byte i of the blob = 2-hex-char window [2i−1, 2i] of hex(blob) —
    // the one byte-extraction both engines express identically (DuckDB
    // has no substr/slice over BLOBs; character substr on the raw text
    // would split CHARACTERS, not bytes, on multi-byte input)
    val bytes = Tables(spark, sfDir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("hx", lower(hex(col("blob"))))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN octet_length(blob) >= 1 THEN
          |  transform(sequence(1, octet_length(blob)),
          |    i -> substring(hx, 2 * i - 1, 2))
          |ELSE cast(array() AS array<string>) END""".stripMargin))
        .as("byte"))
    val counts = bytes.groupBy("doc_id", "byte")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds the mode leg AND the fold leg
    val mode = graft.plans.GroupTopK.topK(counts,
      groupCols = Seq("doc_id"),
      orderKeys = Seq(("c", true), ("byte", false)), k = 1)
      .select(col("doc_id"), col("byte").as("mode_byte"),
        col("c").as("mode_count"))
    counts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_bytes"),
        sum("c").as("n_bytes"))
      .join(mode, "doc_id")
      .select("doc_id", "n_bytes", "n_distinct_bytes", "mode_byte",
        "mode_count")
      .orderBy("doc_id")
  }

  val byteHistogramSql: String =
    """WITH h AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS hx,
      |    octet_length(encode(text)) AS nb
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, substr(hx, 2 * t.i - 1, 2) AS byte
      |  FROM h, LATERAL unnest(generate_series(1, nb)) AS t(i)),
      |c AS (SELECT doc_id, byte, count(*) AS c FROM b GROUP BY 1, 2),
      |m AS (
      |  SELECT doc_id, byte AS mode_byte, c AS mode_count FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY c DESC, byte) AS rk
      |    FROM c)
      |  WHERE rk = 1),
      |a AS (
      |  SELECT doc_id, count(*) AS n_distinct_bytes,
      |    CAST(sum(c) AS BIGINT) AS n_bytes
      |  FROM c GROUP BY 1)
      |SELECT a.doc_id, a.n_bytes, a.n_distinct_bytes, m.mode_byte,
      |  m.mode_count
      |FROM a JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin

  /** NEAR-DUPLICATE media assets by shared sampled-frame fingerprints —
    * the video-dedup shape (two encodings of the same clip share most
    * sampled-frame hashes even when container bytes differ): each
    * asset's stride-32 8-byte frames (the [[frameSample]] grid, taken
    * over the HEX encoding so both engines slice identical BYTES —
    * the byteHistogram discipline) dedupe per asset, frames seen in
    * 2–64 assets anchor a pair join, and pairs sharing ≥ 2 frames
    * report the containment-style overlap `shared / min(|a|, |b|)`.
    *
    * Scale shape: the frame explode is ∝ corpus bytes / 32 (map-side,
    * distinct per asset before the explode); the pair join meets ONLY
    * through anchor frames and the 64-asset frequency cap bounds any
    * ubiquitous-frame fanout (the exactSubstrings discipline — a
    * black-padding frame shared by every video must not induce
    * all-pairs); output ∝ genuinely-overlapping pairs. Nothing
    * all-pairs, blobs never shuffle — only (doc, 16-hex-char) rows do.
    */
  def frameNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val fr = Tables(spark, sfDir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("hx", lower(hex(col("blob"))))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN octet_length(blob) >= 32 THEN
          |  array_distinct(transform(
          |    sequence(1, int(octet_length(blob) / 32)),
          |    i -> substring(hx, (i - 1) * 64 + 1, 16)))
          |ELSE cast(array() AS array<string>) END""".stripMargin))
        .as("frame"))
      // feeds the per-asset counts, the anchor filter, AND both sides
      // of the pair join — checkpoint so the blob explode runs once,
      // not four times (the byteHistogram counts discipline)
      .localCheckpoint(true)
    val nf = fr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val anchors = fr.groupBy("frame")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= 64)
      .select("frame")
    val af = fr.join(anchors, Seq("frame"))
    val pairs = af.select(col("frame"), col("doc_id").as("doc_a"))
      .join(af.select(col("frame"), col("doc_id").as("doc_b")),
        Seq("frame"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= 2)
    pairs
      .join(nf.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(nf.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared_frames"),
        col("n_a"), col("n_b"),
        round(col("shared_frames").cast("double") /
          least(col("n_a"), col("n_b")), 4).as("overlap"))
      .orderBy("doc_a", "doc_b")
  }

  val frameNeardupSql: String =
    """WITH h AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS hx,
      |    octet_length(encode(text)) AS nb
      |  FROM documents),
      |f AS (
      |  SELECT DISTINCT doc_id,
      |    substr(hx, (t.i - 1) * 64 + 1, 16) AS frame
      |  FROM h, LATERAL unnest(generate_series(1, nb // 32)) AS t(i)
      |  WHERE nb >= 32),
      |nf AS (SELECT doc_id, count(*) AS n FROM f GROUP BY doc_id),
      |a AS (
      |  SELECT frame FROM f GROUP BY frame
      |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND 64),
      |p AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    count(*) AS shared_frames
      |  FROM f x JOIN a ON x.frame = a.frame
      |    JOIN f y ON x.frame = y.frame AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT doc_a, doc_b, shared_frames, na.n AS n_a, nb2.n AS n_b,
      |  round(CAST(shared_frames AS DOUBLE) / least(na.n, nb2.n), 4)
      |    AS overlap
      |FROM p
      |JOIN nf na ON na.doc_id = doc_a
      |JOIN nf nb2 ON nb2.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  /** RESIZE plumbing — the fixed-target downsample every thumbnail
    * pipeline runs, with the pixel interpolation stubbed as byte
    * striding (a real resize swaps in per decoded frame; the
    * fixed-output-size contract, stride arithmetic, boundary handling
    * and digest accounting are the production shape): every asset
    * downsamples to ≤ 64 bytes at stride `⌈n/64⌉` — CEIL division, so
    * the sampled grid SPANS the asset at every size (a ⌊n/64⌋ floor
    * would sample only the first 64 bytes of a 65–127-byte asset:
    * prefix truncation, not a resize — ADVICE r9). Assets ≥ 64 bytes
    * emit 33–64 sampled bytes (⌈n/stride⌉), small assets pass through
    * whole. Byte extraction rides the hex
    * encoding ([[byteHistogram]]'s engine-exact byte slicing). Map-only
    * per-row HOFs: no shuffle, blobs never leave their row; the emitted
    * digest row is ~100 bytes/asset regardless of asset size — the
    * artifact a thumbnail store ingests.
    */
  def thumbnail(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("hx", lower(hex(col("blob"))))
      .withColumn("nb", octet_length(col("blob")).cast("long"))
      .withColumn("stride", greatest(lit(1L), expr("(nb + 63) div 64")))
      .withColumn("thumb_hex", expr(
        """CASE WHEN nb >= 1 THEN
          |  array_join(transform(
          |    sequence(1, int(least(64, (nb + stride - 1) div stride))),
          |    i -> substring(hx, int((i - 1) * stride) * 2 + 1, 2)), '')
          |ELSE '' END""".stripMargin))
      .select(col("doc_id"), col("nb").as("n_bytes"), col("stride"),
        (length(col("thumb_hex")) / 2).cast("long").as("thumb_bytes"),
        sha2(col("thumb_hex"), 256).as("thumb_digest"))
      .orderBy("doc_id")

  val thumbnailSql: String =
    """WITH h AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |s AS (SELECT doc_id, hx, nb,
      |        greatest(1, (nb + 63) // 64) AS stride FROM h),
      |t AS (
      |  SELECT doc_id, nb, stride,
      |    CASE WHEN nb >= 1 THEN
      |      array_to_string(list_transform(
      |        generate_series(1,
      |          least(64, (nb + stride - 1) // stride)),
      |        i -> substr(hx, CAST((i - 1) * stride AS INT) * 2 + 1, 2)),
      |        '')
      |    ELSE '' END AS thumb_hex
      |  FROM s)
      |SELECT doc_id, nb AS n_bytes, stride,
      |  CAST(length(thumb_hex) // 2 AS BIGINT) AS thumb_bytes,
      |  sha256(thumb_hex) AS thumb_digest
      |FROM t ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_stats" -> binaryStats,
    "mm_byte_histogram" -> byteHistogram,
    "mm_frame_index" -> frameIndex,
    "mm_frame_neardup" -> frameNeardup,
    "mm_thumbnail" -> thumbnail)

  def oracleSql: Map[String, String] = Map(
    "mm_binary_stats" -> binaryStatsSql,
    "mm_byte_histogram" -> byteHistogramSql,
    "mm_frame_index" -> frameIndexSql,
    "mm_frame_neardup" -> frameNeardupSql,
    "mm_thumbnail" -> thumbnailSql)
}
