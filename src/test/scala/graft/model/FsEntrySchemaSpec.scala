package graft.model

import java.nio.file.Files

import graft.SparkSpecBase

/** §1.5 schema evolution: old snapshots with missing/extra/drifted
  * columns normalize to the canonical schema without any copy-migration
  * (the reference migrates destructively, db_duckdb.py:421-503).
  */
class FsEntrySchemaSpec extends SparkSpecBase {

  test("normalize adds missing typed nulls, casts drift, drops unknowns") {
    import spark.implicits._
    // an "old dialect" frame: size as INT, missing direct_link/last_seen
    // etc., plus a legacy column the canonical schema doesn't know
    val old = Seq(("a", "f.txt", 42, "legacy"))
      .toDF("id", "name", "size_bytes", "old_flag")
    val n = FsEntry.normalize(old)
    assert(n.schema.map(f => (f.name, f.dataType)) ==
      FsEntry.schema.map(f => (f.name, f.dataType)))
    val row = n.collect()(0)
    assert(row.getAs[Long]("size_bytes") == 42L)
    assert(row.getAs[String]("direct_link") == null)
    assert(!n.columns.contains("old_flag"))
  }

  test("mergeSchema read of mixed-generation snapshots normalizes clean") {
    import spark.implicits._
    val dir = Files.createTempDirectory("schemaevo").toString
    // generation 1: no checksum column yet; generation 2: canonical-ish
    Seq(("a", "p/a", 1L)).toDF("id", "relative_path", "size_bytes")
      .write.parquet(s"$dir/part=g1")
    Seq(("b", "p/b", 2L, "sha"))
      .toDF("id", "relative_path", "size_bytes", "checksum")
      .write.parquet(s"$dir/part=g2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    val n = FsEntry.normalize(merged)
    assert(n.schema.map(f => (f.name, f.dataType)) ==
      FsEntry.schema.map(f => (f.name, f.dataType)))
    val byId = n.collect().map(r => r.getAs[String]("id") ->
      r.getAs[String]("checksum")).toMap
    assert(byId("a") == null && byId("b") == "sha")
  }
}
