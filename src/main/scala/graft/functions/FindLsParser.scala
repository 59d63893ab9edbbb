package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-expression pipeline parsing `find -ls` output lines into file
  * records — the reference's scan front end (scanner/scanner.py:110-202:
  * whitespace tokenization, perms→type, size cast, 2-format timestamp
  * with year inference, basename/extension extraction; P1/P2/P6/P10/F14).
  *
  * Pure Catalyst expressions (split/try_cast/try_to_timestamp/when) — the
  * whole parse stays inside whole-stage codegen; malformed lines yield
  * nulls and are dropped (P10), countable via `observe`.
  *
  * `find -ls` layout (see scanner.py:119-137):
  * {{{
  *   inode blocks perms nlinks user group size  Mon D  (HH:MM | YYYY)  path...
  *     1     2      3     4     5    6    7      8  9      10           11+
  * }}}
  * Recent mtimes (< ~6 months old) print `HH:MM` with no year — the year
  * is inferred as `now`'s year, rolled back one year if that lands in the
  * future (scanner.py:148-163). `now` is an explicit column so tests and
  * parity queries are deterministic.
  */
object FindLsParser {

  /** Parse a DataFrame with a `line` string column; adds the parsed
    * columns and drops unparseable rows. Paths may contain spaces (tokens
    * 11+ are rejoined).
    */
  def parse(lines: DataFrame, now: Column): DataFrame = {
    // try_element_at: malformed short lines yield nulls (dropped at the
    // end) instead of ANSI index errors.
    val toks = split(trim(col("line")), "\\s+")
    val perms = try_element_at(toks, lit(3))
    val sizeTok = try_element_at(toks, lit(7))
    val mon = try_element_at(toks, lit(8))
    val day = try_element_at(toks, lit(9))
    val timeOrYear = try_element_at(toks, lit(10))
    // finite length: slice's start+length arithmetic overflows with
    // Int.MaxValue, silently yielding an empty array for 12+-token lines
    val path = array_join(slice(toks, 11, 1 << 20), " ")

    // P2: two formats. Recent lines carry HH:MM; try current year first,
    // roll back one year if the result is in the future.
    val withYear = try_to_timestamp(
      concat_ws(" ", mon, day, timeOrYear, year(now).cast("string")),
      lit("MMM d H:mm yyyy"))
    val recentTs = when(withYear > now, withYear - expr("INTERVAL 1 YEAR"))
      .otherwise(withYear)
    val oldTs = try_to_timestamp(concat_ws(" ", mon, day, timeOrYear),
      lit("MMM d yyyy"))
    // P2 fallback parity (scanner.py:155-163): a line with unparseable
    // date tokens keeps the row with mtime = now, it is NOT dropped.
    val mtime = coalesce(
      when(timeOrYear.contains(":"), recentTs).otherwise(oldTs), now)

    lines
      .withColumn("filepath", when(path =!= "", path))
      .withColumn("entry_type",
        when(substring(perms, 1, 1) === "d", "directory").otherwise("file"))
      .withColumn("size_bytes", sizeTok.try_cast("long"))
      .withColumn("modified_time", mtime)
      // P5: mount-point strip — leading '/' removed for the relative key.
      .withColumn("relative_path", expr("substring(filepath, 2)"))
      .withColumn("name", substring_index(col("filepath"), "/", -1))
      // P6: lowercased suffix without the dot. The leading `.` of the
      // pattern requires a character before the final dot, matching
      // Python Path(name).suffix: '.bashrc' has NO extension, while
      // '.archive.tar' → 'tar' (scanner.py:166).
      .withColumn("extension",
        lower(regexp_extract(col("name"), ".\\.([^./]+)$", 1)))
      // P10: structurally malformed rows (bad size, empty path) are
      // dropped; date-fallback rows survive with mtime = now.
      .filter(col("filepath").isNotNull && col("size_bytes").isNotNull)
  }
}
