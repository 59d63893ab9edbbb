package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase

/** J1/J2 merge semantics (scanner.py:225-244 conditional update;
  * db_duckdb.py:242-245 INSERT OR REPLACE) + idempotence.
  */
class MergeSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def df(rows: (String, Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("key", "size", "mtime")
  }

  private val existing = df(
    ("k1", 10L, ts("2020-01-01 00:00:00")),
    ("k2", 20L, ts("2020-01-02 00:00:00")))

  private val batch = df(
    ("k1", 11L, ts("2021-06-01 00:00:00")), // strictly newer → wins
    ("k2", 99L, ts("2020-01-02 00:00:00")), // same mtime, new size
    ("k3", 30L, ts("2022-01-01 00:00:00"))) // brand new → inserted

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getLong(1),
      r.getTimestamp(2))).toSet

  test("J1 conditional merge: existing row survives an mtime tie") {
    val out = rows(Merge.merge(existing, batch, "key", "mtime",
      batchWinsTies = false))
    assert(out == Set(
      ("k1", 11L, ts("2021-06-01 00:00:00")),
      ("k2", 20L, ts("2020-01-02 00:00:00")),
      ("k3", 30L, ts("2022-01-01 00:00:00"))))
  }

  test("J2 last-writer-wins: batch row replaces on tie") {
    val out = rows(Merge.merge(existing, batch, "key", "mtime",
      batchWinsTies = true))
    assert(out(("k2", 99L, ts("2020-01-02 00:00:00"))))
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val once = Merge.merge(existing, batch, "key", "mtime", false)
    val twice = Merge.merge(once, batch, "key", "mtime", false)
    assert(rows(once) == rows(twice))
  }

  test("mergeReconcile = merge restricted to scanned keys, one pass") {
    // k2 vanished from the scan: merge semantics for k1/k3, k2 dropped
    val scan = df(
      ("k1", 11L, ts("2021-06-01 00:00:00")),
      ("k3", 30L, ts("2022-01-01 00:00:00")))
    val out = Merge.mergeReconcile(existing, scan, "key", "mtime")
    assert(rows(out) == Set(
      ("k1", 11L, ts("2021-06-01 00:00:00")),
      ("k3", 30L, ts("2022-01-01 00:00:00"))))
    // equivalence with the two-step form (merge, then semi-join on scan)
    val twoStep = Merge.merge(existing, scan, "key", "mtime", false)
      .join(scan.select("key").distinct(), Seq("key"), "left_semi")
    assert(rows(out) == rows(twoStep.select("key", "size", "mtime")))
    // an older scan row must NOT clobber a newer stored row (J1 applies)
    val stale = df(("k2", 5L, ts("2019-01-01 00:00:00")))
    val kept = Merge.mergeReconcile(existing, stale, "key", "mtime")
    assert(rows(kept) == Set(("k2", 20L, ts("2020-01-02 00:00:00"))))
  }

  test("schema mismatch is rejected") {
    import spark.implicits._
    val bad = Seq(("k1", 1L)).toDF("key", "size")
    assertThrows[IllegalArgumentException] {
      Merge.merge(existing, bad, "key", "mtime", false)
    }
  }

  test("a null merge key is a value, not a black hole") {
    // an unmatched null-key batch row must emit ITSELF (the join-form
    // regression the r14 advice caught: key equality never matches a
    // null, and the old winner pick then projected the all-null
    // existing side)
    val b = df((null, 7L, ts("2023-01-01 00:00:00")))
    val out = rows(Merge.merge(existing, b, "key", "mtime", false))
    assert(out == Set(
      ("k1", 10L, ts("2020-01-01 00:00:00")),
      ("k2", 20L, ts("2020-01-02 00:00:00")),
      (null, 7L, ts("2023-01-01 00:00:00"))))
    // null keys on BOTH sides meet (null-safe join) and the ts rule
    // picks one winner — the old aggregate form's groupBy semantics
    val e2 = df((null, 1L, ts("2020-01-01 00:00:00")))
    val newer = rows(Merge.merge(e2, b, "key", "mtime", false))
    assert(newer == Set((null, 7L, ts("2023-01-01 00:00:00"))))
    val older = df((null, 9L, ts("2019-01-01 00:00:00")))
    assert(rows(Merge.merge(e2, older, "key", "mtime", false)) ==
      Set((null, 1L, ts("2020-01-01 00:00:00"))))
    // and reconcile keeps exactly the scanned (null) key
    assert(rows(Merge.mergeReconcile(existing, b, "key", "mtime")) ==
      Set((null, 7L, ts("2023-01-01 00:00:00"))))
  }

  test("validateUnique guard rejects a duplicate-key side") {
    val dup = df(
      ("k1", 1L, ts("2020-01-01 00:00:00")),
      ("k1", 2L, ts("2020-01-02 00:00:00")))
    spark.conf.set("spark.graft.merge.validateUnique", "true")
    try {
      val ex = intercept[IllegalArgumentException] {
        Merge.merge(existing, dup, "key", "mtime", false).collect()
      }
      assert(ex.getMessage.contains("dedupSides"))
      // duplicate NULL keys violate it too (null counts as one key)
      val dupNull = df(
        (null, 1L, ts("2020-01-01 00:00:00")),
        (null, 2L, ts("2020-01-02 00:00:00")))
      assertThrows[IllegalArgumentException] {
        Merge.merge(existing, dupNull, "key", "mtime", false).collect()
      }
      // dedupSides opts out of the guard by collapsing first
      val ok = rows(Merge.merge(existing, dup, "key", "mtime",
        batchWinsTies = false, dedupSides = true))
      assert(ok(("k1", 2L, ts("2020-01-02 00:00:00"))))
    } finally spark.conf.unset("spark.graft.merge.validateUnique")
  }
}
