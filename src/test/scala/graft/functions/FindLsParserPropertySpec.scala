package graft.functions

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}
import java.util.Locale

import org.apache.spark.sql.functions.lit
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** Fuzz round-trip: format a random entry the way `find -ls` would
  * (recent → `MMM d HH:mm`, old → `MMM d yyyy`, relative to a fixed
  * now), parse it back, and require the parsed fields to equal the
  * expected minute/day-truncated values.
  */
class FindLsParserPropertySpec extends SparkSpecBase {

  private val now = LocalDateTime.parse("2026-08-01T00:00:00")
  private val nowTs = Timestamp.valueOf(now)
  private val cutoff = now.minusMonths(6)

  private val seg: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('.', '-', '_')))
  } yield cs.mkString

  private val entryGen: Gen[(String, Long, LocalDateTime, Boolean)] = for {
    depth <- Gen.chooseNum(1, 4)
    segs <- Gen.listOfN(depth, seg)
    size <- Gen.chooseNum(0L, 1L << 40)
    // i64 minutes between 1995 and just-before-now
    mins <- Gen.chooseNum(0L, 60L * 24 * 365 * 31)
    isDir <- Gen.oneOf(true, false)
  } yield ("/" + segs.mkString("/"), size,
    LocalDateTime.parse("1995-01-01T00:00:00").plusMinutes(mins)
      .isBefore(now) match {
        case true => LocalDateTime.parse("1995-01-01T00:00:00")
          .plusMinutes(mins)
        case false => now.minusMinutes(1)
      }, isDir)

  private val recentFmt =
    DateTimeFormatter.ofPattern("MMM d HH:mm", Locale.ENGLISH)
  private val oldFmt =
    DateTimeFormatter.ofPattern("MMM d yyyy", Locale.ENGLISH)

  test("format→parse round-trips to minute/day-truncated fields") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(20, entryGen)) { entries0 =>
      val entries = entries0.distinctBy(_._1) // unique paths (map key)
      val lines = entries.map { case (path, size, mtime, isDir) =>
        val recent = mtime.isAfter(cutoff)
        val dateStr =
          if (recent) recentFmt.format(mtime) else oldFmt.format(mtime)
        val perms = if (isDir) "drwxr-xr-x" else "-rw-r--r--"
        s"99 8 $perms 1 root root $size $dateStr $path"
      }
      val parsed = FindLsParser.parse(lines.toDF("line"), lit(nowTs))
        .collect()
        .map(r => r.getAs[String]("filepath") ->
          ((r.getAs[String]("entry_type"), r.getAs[Long]("size_bytes"),
            r.getAs[Timestamp]("modified_time"))))
        .toMap
      entries.forall { case (path, size, mtime, isDir) =>
        val recent = mtime.isAfter(cutoff)
        val expectedTs = Timestamp.from(
          (if (recent) mtime.withSecond(0).withNano(0)
           else mtime.toLocalDate.atStartOfDay).toInstant(ZoneOffset.UTC))
        parsed.get(path).exists { case (t, s, m) =>
          t == (if (isDir) "directory" else "file") && s == size &&
            m == expectedTs
        }
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(result.passed, result.status.toString)
  }
}
