package graft.model

import java.sql.Timestamp

/** Canonical filesystem-entry record — the reference's 11-field scan
  * contract (tests/scanner/test_parallel_scanner.py:64-77, produced at
  * scanner/scanner.py:185-198) plus the unified-store extras from
  * database/db_duckdb.py:157-172 folded into one schema (SURVEY.md §1.3
  * documents the two dialects; we unify on their union).
  */
case class FsEntry(
    id: String,
    name: String,
    relative_path: String,
    filepath: String,
    size_bytes: Option[Long],
    modified_time: Timestamp,
    creation_time: Timestamp,
    `type`: String,
    extension: String,
    checksum: String,
    direct_link: String,
    last_seen: Timestamp)

object FsEntry {
  val columns: Seq[String] = Seq(
    "id", "name", "relative_path", "filepath", "size_bytes",
    "modified_time", "creation_time", "type", "extension", "checksum",
    "direct_link", "last_seen")

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.types._

  /** Canonical store schema (unified dialect, SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("relative_path", StringType),
    StructField("filepath", StringType),
    StructField("size_bytes", LongType),
    StructField("modified_time", TimestampType),
    StructField("creation_time", TimestampType),
    StructField("type", StringType),
    StructField("extension", StringType),
    StructField("checksum", StringType),
    StructField("direct_link", StringType),
    StructField("last_seen", TimestampType)))

  /** §1.5 schema migration, non-destructively: the reference probes
    * information_schema and copy-migrates the whole table
    * (db_duckdb.py:369-503); here any frame — an old snapshot read with
    * mergeSchema, a scanner batch missing new fields — is normalized to
    * the canonical schema by adding missing columns as typed nulls,
    * casting drifted types, and dropping unknowns. Pure projection: no
    * rewrite of stored data is ever needed.
    */
  def normalize(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
