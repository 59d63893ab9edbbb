package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

/** DataSourceV2 listing source: schema, filter pushdown (visible in the
  * plan AND enforced by pruned recursion), column pruning.
  */
class FsListingSourceSpec extends SparkSpecBase {

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("dsv2")
    Files.createDirectories(root.resolve("a/x"))
    Files.createDirectories(root.resolve("b"))
    Files.writeString(root.resolve("a/f1.txt"), "11")
    Files.writeString(root.resolve("a/x/f2.txt"), "222")
    Files.writeString(root.resolve("b/f3.txt"), "3")
    root
  }

  private def read(root: Path) =
    spark.read.format("fslisting").load(root.toString)

  test("full read lists the tree with the declared schema") {
    val root = mkTree()
    val df = read(root)
    assert(df.schema.fieldNames.toSeq == Seq("filepath", "name",
      "size_bytes", "modified_time", "entry_type", "depth"))
    val got = df.collect().map(_.getAs[String]("filepath")).toSet
    assert(got == Set("/a", "/a/x", "/b", "/a/f1.txt", "/a/x/f2.txt",
      "/b/f3.txt"))
  }

  test("prefix + type filters are pushed and enforced") {
    val root = mkTree()
    val df = read(root)
      .filter(col("filepath").startsWith("/a") &&
        col("entry_type") === "file")
    val got = df.collect().map(_.getAs[String]("filepath")).toSet
    assert(got == Set("/a/f1.txt", "/a/x/f2.txt"))
    // filters reached the scan (rendered by Scan.description) and there
    // is NO post-scan Filter node left — the source enforced them fully
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedPrefixes=/a"), plan)
    assert(plan.contains("pushedTypes=file"), plan)
    assert(!plan.contains("Filter ("))
  }

  test("multiple pushed conjuncts are ALL enforced, not last-wins") {
    val root = mkTree()
    // /a && /a/x: compatible prefixes — the longer one decides
    val both = read(root)
      .filter(col("filepath").startsWith("/a") &&
        col("filepath").startsWith("/a/x"))
    assert(both.collect().map(_.getAs[String]("filepath")).toSet ==
      Set("/a/x", "/a/x/f2.txt"))
    // /a && /b: contradictory prefixes — zero rows, not "/b wins"
    assert(read(root)
      .filter(col("filepath").startsWith("/a") &&
        col("filepath").startsWith("/b")).count() == 0)
    // file && directory: contradictory type equalities — zero rows
    assert(read(root)
      .filter(col("entry_type") === "file" &&
        col("entry_type") === "directory").count() == 0)
  }

  test("row set shape is independent of tree emptiness (root never emitted)") {
    val empty = Files.createTempDirectory("dsv2empty")
    assert(read(empty).count() == 0) // no phantom "/" row
    val root = mkTree()
    assert(!read(root).collect().map(_.getAs[String]("filepath"))
      .contains("/"))
    // nonexistent root: zero rows, not a phantom file entry
    assert(read(root.resolve("no/such/dir")).count() == 0)
  }

  test("partition planning skips subtrees outside the prefix") {
    val root = mkTree()
    val df = read(root).filter(col("filepath").startsWith("/a"))
    // seeds: only /a survives planInputPartitions pruning
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 4) // /a, /a/x, f1, f2
  }

  test("column pruning reaches the reader") {
    val root = mkTree()
    val df = read(root).select("name")
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("a", "x", "b", "f1.txt", "f2.txt", "f3.txt"))
    // the BatchScan's output is just the pruned column
    assert(df.queryExecution.executedPlan.toString
      .matches("(?s).*BatchScan[^\\n]*\\[name#\\d+\\].*"))
  }
}
