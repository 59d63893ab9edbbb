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
}
