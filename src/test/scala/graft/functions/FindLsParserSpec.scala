package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions.lit

import graft.SparkSpecBase

/** Parser goldens for P1/P2 (scanner/scanner.py:110-202: tokenization,
  * perms→type, size cast, year inference incl. future rollback,
  * malformed-line drop).
  */
class FindLsParserSpec extends SparkSpecBase {

  private val now = Timestamp.valueOf("2026-08-01 00:00:00")

  private def parse(lines: String*) = {
    import spark.implicits._
    FindLsParser.parse(lines.toDF("line"), lit(now)).collect()
      .map(r => (r.getAs[String]("relative_path"),
        r.getAs[String]("entry_type"), r.getAs[Long]("size_bytes"),
        r.getAs[Timestamp]("modified_time"), r.getAs[String]("name"),
        r.getAs[String]("extension")))
  }

  test("recent line: HH:MM format gets the current year") {
    val Array(r) = parse(
      "1234567 8 -rw-r--r-- 1 root root 2048 Mar 5 04:07 /data/x.TXT")
    assert(r == (("data/x.TXT", "file", 2048L,
      Timestamp.valueOf("2026-03-05 04:07:00"), "x.TXT", "txt")))
  }

  test("recent line in the future rolls back one year") {
    val Array(r) = parse(
      "1 2 -rw-r--r-- 1 u g 100 Dec 31 23:59 /x")
    assert(r._4 == Timestamp.valueOf("2025-12-31 23:59:00"))
  }

  test("old line: explicit year, midnight") {
    val Array(r) = parse(
      "1 2 drwxr-xr-x 3 u g 4096 Aug 18 2000 /data/dir")
    assert(r == (("data/dir", "directory", 4096L,
      Timestamp.valueOf("2000-08-18 00:00:00"), "dir", "")))
  }

  test("paths with spaces are rejoined") {
    val Array(r) = parse(
      "1 2 -rw-r--r-- 1 u g 100 Mar 5 04:07 /data/My File.txt")
    assert(r._1 == "data/My File.txt")
    assert(r._5 == "My File.txt")
  }

  test("structurally malformed lines are dropped (P10)") {
    assert(parse("garbage").isEmpty)
    assert(parse("1 2 -rw-r--r-- 1 u g NOTNUM Mar 5 04:07 /x").isEmpty)
  }

  test("unparseable date falls back to now instead of dropping (P2)") {
    val Array(r) = parse("1 2 -rw-r--r-- 1 u g 10 Xxx 5 04:07 /x")
    assert(r._4 == now) // scanner.py:163 fallback
    assert(r._3 == 10L)
  }

  test("dotfiles have no extension; multi-dot hidden files do (P6)") {
    val rows = parse(
      "1 2 -rw-r--r-- 1 u g 10 Mar 5 04:07 /home/.bashrc",
      "1 2 -rw-r--r-- 1 u g 10 Mar 5 04:07 /home/.archive.TAR")
    val ext = rows.map(r => r._1 -> r._6).toMap
    assert(ext("home/.bashrc") == "")
    assert(ext("home/.archive.TAR") == "tar")
  }
}
