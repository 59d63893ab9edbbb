package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Additive schema evolution on the snapshot store — the 100 TB way to
  * add a column (no base rewrite, on either write path):
  *
  *  - strict mode is unchanged: any mismatch still refuses fast;
  *  - `evolveSchema = true` admits NEW columns (never a drop or a
  *    retype) on both appendDelta (MOR) and upsert (CoW);
  *  - readMor resolves across schema eras over the union schema —
  *    rows null-fill the columns their era didn't have, LWW per key
  *    is otherwise untouched;
  *  - checkpointMor folds the evolved schema into the base, and time
  *    travel still reads each committed snapshot with the schema it
  *    was WRITTEN with (eras stay bit-faithful).
  */
class SchemaEvolutionSpec extends SparkSpecBase {

  private def baseRows = Seq(
    ("a/f1", 10L, 100L), ("a/f2", 20L, 100L), ("b/g1", 30L, 100L))

  private def mkStore(): ParquetIndex = {
    import spark.implicits._
    val idx = new ParquetIndex(
      Files.createTempDirectory("evo").toString, writeFiles = 2)
    idx.write(baseRows.toDF("relative_path", "size_bytes", "mt")): Unit
    idx
  }

  test("strict appendDelta still refuses a new column; evolveSchema " +
    "admits it and readMor null-fills the old era") {
    import spark.implicits._
    val idx = mkStore()
    val delta = Seq(("a/f1", 11L, 200L, "alice"), ("c/h1", 5L, 200L, "bob"))
      .toDF("relative_path", "size_bytes", "mt", "owner")
    intercept[IllegalArgumentException] {
      idx.appendDelta(spark, delta)
    }
    idx.appendDelta(spark, delta, evolveSchema = true)
    val mor = idx.readMor(spark, "relative_path", "mt").get
    assert(mor.columns.toSeq ==
      Seq("relative_path", "size_bytes", "mt", "owner"))
    val got = mor.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.getAs[String]("owner")))).toSet
    assert(got == Set(
      ("a/f1", 11L, Some("alice")), // delta wins by newer ts, carries owner
      ("a/f2", 20L, None), // old era: owner null-filled
      ("b/g1", 30L, None),
      ("c/h1", 5L, Some("bob")))) // insert from the evolved era
  }

  test("a second delta adding a DIFFERENT column composes; retype and " +
    "column-drop are refused") {
    import spark.implicits._
    val idx = mkStore()
    idx.appendDelta(spark,
      Seq(("a/f1", 11L, 200L, "alice"))
        .toDF("relative_path", "size_bytes", "mt", "owner"),
      evolveSchema = true)
    // additive-only: a batch missing a BASE column is refused even
    // under evolution (LWW with absent columns is ambiguous)
    intercept[IllegalArgumentException] {
      idx.appendDelta(spark,
        Seq(("a/f2", 300L)).toDF("relative_path", "mt"),
        evolveSchema = true)
    }
    // retype refused
    intercept[IllegalArgumentException] {
      idx.appendDelta(spark,
        Seq(("a/f2", "big", 300L)).toDF("relative_path", "size_bytes", "mt"),
        evolveSchema = true)
    }
    // retype of an EARLIER DELTA's addition refused too (both batches
    // pass the base check; without the cross-delta guard readMor would
    // fail later with an opaque union error)
    intercept[IllegalArgumentException] {
      idx.appendDelta(spark,
        Seq(("a/f2", 21L, 300L, 7L))
          .toDF("relative_path", "size_bytes", "mt", "owner"),
        evolveSchema = true)
    }
    // a different addition in a later delta: union schema carries both,
    // each row null-filled for the columns its era didn't have
    idx.appendDelta(spark,
      Seq(("b/g1", 31L, 300L, 0.9)).toDF("relative_path", "size_bytes",
        "mt", "score"),
      evolveSchema = true)
    val mor = idx.readMor(spark, "relative_path", "mt").get
    assert(mor.columns.toSeq ==
      Seq("relative_path", "size_bytes", "mt", "owner", "score"))
    val by = mor.collect()
      .map(r => r.getString(0) -> (Option(r.getAs[String]("owner")),
        Option(r.getAs[Any]("score")))).toMap
    assert(by("a/f1") == (Some("alice"), None))
    assert(by("b/g1") == (None, Some(0.9)))
    assert(by("a/f2") == (None, None))
  }

  test("checkpointMor folds the evolved schema into the base; time " +
    "travel reads each era with the schema it was written with") {
    import spark.implicits._
    val idx = mkStore()
    val preEvo = idx.currentId.get
    idx.appendDelta(spark,
      Seq(("a/f1", 11L, 200L, "alice"))
        .toDF("relative_path", "size_bytes", "mt", "owner"),
      evolveSchema = true)
    val view = idx.readMor(spark, "relative_path", "mt").get
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getAs[String]("owner")))).toSet
    idx.checkpointMor(spark, "relative_path", "mt")
    assert(idx.morEntries(idx.currentId.get).isEmpty)
    val folded = idx.read(spark).get
    assert(folded.columns.toSeq ==
      Seq("relative_path", "size_bytes", "mt", "owner"))
    assert(folded.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.getAs[String]("owner")))).toSet == view)
    // the pre-evolution snapshot is still readable AS WRITTEN
    val old = idx.readAsOf(spark, preEvo).get
    assert(old.columns.toSeq == Seq("relative_path", "size_bytes", "mt"))
    assert(old.count() == 3)
    // after the fold, owner is a BASE column: strict appends must
    // carry it, evolved appends compose further
    intercept[IllegalArgumentException] {
      idx.appendDelta(spark,
        Seq(("a/f2", 21L, 400L)).toDF("relative_path", "size_bytes", "mt"))
    }
  }

  test("evolved MOR resolution across three eras matches the " +
    "definitional LWW in both tie modes, incl. the revive case") {
    import spark.implicits._
    // era 1 (base): (k, ts, v) — MorIndexSpec's exact generation
    // structure (overlap, tie, delete, revive-with-older-ts), but era
    // 2 adds `owner` and era 3 adds `score` WITHOUT owner (additive
    // requires ⊇ the BASE columns only — owner is a delta-era column,
    // so a later delta may legitimately not know it). The winner's
    // columns are its own era's facts; everything else is null.
    val b0 = Seq(("a", 5L, "a0"), ("b", 3L, "b0"), ("c", 7L, "c0"),
      ("d", 1L, "d0")).toDF("k", "ts", "v")
    val b1 = Seq(("a", 6L, "a1", "o1"), ("b", 3L, "b1", "o2"),
      ("c", 2L, "c1", "o3"), ("e", 4L, "e1", "o4"))
      .toDF("k", "ts", "v", "owner")
    val delKeys = Seq("a", "d")
    val b2 = Seq(("a", 2L, "a2", 0.5), ("f", 9L, "f2", 0.7))
      .toDF("k", "ts", "v", "score")
    for (ties <- Seq(false, true)) {
      val idx = new ParquetIndex(
        Files.createTempDirectory(s"evo3-$ties").toString)
      idx.appendDelta(spark, b0): Unit // becomes the base
      idx.appendDelta(spark, b1, evolveSchema = true): Unit
      idx.appendDelete(spark, delKeys.toDF("k"), "k"): Unit
      idx.appendDelta(spark, b2, evolveSchema = true): Unit
      def state(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Long]("ts"),
          r.getAs[String]("v"), Option(r.getAs[String]("owner")),
          Option(r.getAs[Any]("score")))).toSet
      val tieB = // the only exact-ts tie: b@3 in eras 1 and 2
        if (ties) ("b", 3L, "b1", Some("o2"), None)
        else ("b", 3L, "b0", None, None)
      val expected = Set(
        ("a", 2L, "a2", None, Some(0.5)), // revived by era 3 after delete
        tieB,
        ("c", 7L, "c0", None, None), // era-1 row outlasts the era-2 update
        ("e", 4L, "e1", Some("o4"), None),
        ("f", 9L, "f2", None, Some(0.7)))
      val mor = idx.readMor(spark, "k", "ts", ties).get
      assert(mor.columns.toSeq == Seq("k", "ts", "v", "owner", "score"))
      assert(state(mor) == expected, s"ties=$ties")
      // and the fold serves the identical evolved state
      idx.checkpointMor(spark, "k", "ts", ties)
      assert(state(idx.read(spark).get) == expected, s"fold ties=$ties")
    }
  }

  test("a key predicate still pushes below the EVOLVED MOR resolution " +
    "into the base and delta scans") {
    import spark.implicits._
    val idx = mkStore()
    idx.appendDelta(spark,
      Seq(("a/f1", 11L, 200L, "alice"))
        .toDF("relative_path", "size_bytes", "mt", "owner"),
      evolveSchema = true)
    // the union-schema null-fill projections must not block the
    // key-from-grouping-column pushdown readMor's scaladoc promises
    val df = idx.readMor(spark, "relative_path", "mt").get
      .filter(col("relative_path") === "a/f1")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*relative_path[^\\]]*\\]".r
      .findAllIn(plan).toList
    assert(pushed.size >= 2, // the base scan AND the delta scan
      s"key predicate not pushed into both scans:\n$plan")
  }

  test("copy-on-write upsert evolves under the explicit flag and " +
    "refuses otherwise") {
    import spark.implicits._
    val idx = mkStore()
    val batch = Seq(("a/f2", 21L, 200L, "carol"))
      .toDF("relative_path", "size_bytes", "mt", "owner")
    intercept[IllegalArgumentException] {
      idx.upsert(spark, batch, "relative_path", "mt")
    }
    idx.upsert(spark, batch, "relative_path", "mt", evolveSchema = true)
    val snap = idx.read(spark).get
    assert(snap.columns.toSeq ==
      Seq("relative_path", "size_bytes", "mt", "owner"))
    val by = snap.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getAs[String]("owner")))).toMap
    assert(by("a/f2") == (21L, Some("carol")))
    assert(by("a/f1") == (10L, None))
  }
}
