package graft.sources

import java.io.File
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 form of the listing source:
  * `spark.read.format("fslisting").load(root)`.
  *
  * This is the "custom source honoring pushed filters" tier of
  * SURVEY.md §4.3: Catalyst pushes `filepath STARTSWITH p` and
  * `entry_type = t` into the source, and the walker uses them to PRUNE
  * RECURSION — subtrees that cannot contain a matching path are never
  * visited, and partition seeds outside the prefix are never scheduled.
  * That is the Spark-native equivalent of the reference compiling skip
  * patterns into `find -not -path` arguments (scanner.py:334-347), but
  * driven by the query's own predicates instead of configuration.
  *
  * Column pruning is honored too (`SupportsPushDownRequiredColumns`):
  * a `select(name)` reads nothing but names — no stat calls for sizes.
  */
class FsListingSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fslisting"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FsListingSource.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FsListingTable(properties.get("path"))
}

object FsListingSource {
  val schema: StructType = StructType(Seq(
    StructField("filepath", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("modified_time", TimestampType, nullable = false),
    StructField("entry_type", StringType, nullable = false),
    StructField("depth", IntegerType, nullable = false)))
}

private[sources] class FsListingTable(root: String)
    extends Table with SupportsRead {
  require(root != null && root.nonEmpty,
    "fslisting requires a path: spark.read.format(\"fslisting\").load(root)")
  override def name(): String = s"fslisting(`$root`)"
  override def schema(): StructType = FsListingSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new FsListingScanBuilder(root)
}

private[sources] class FsListingScanBuilder(root: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var prefixes: Seq[String] = Nil
  private var entryTypes: Seq[String] = Nil
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FsListingSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case StringStartsWith("filepath", _) => true
      case EqualTo("entry_type", _: String) => true
      case _ => false
    }
    // The reader enforces EVERY accepted conjunct (not just the last of
    // each kind): all prefixes must match a row, all type equalities must
    // hold. Contradictory combinations (two incomparable prefixes, two
    // different entry_type values) therefore correctly yield zero rows —
    // which is exactly what "fully enforced, removed from the residual"
    // promises Spark.
    prefixes = accepted.collect { case StringStartsWith("filepath", p) => p }.toIndexedSeq
    entryTypes = accepted.collect { case EqualTo("entry_type", t: String) => t }.toIndexedSeq
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new FsListingScan(root, prefixes, entryTypes,
    required)
}

private[sources] case class FsListingPartition(seeds: Seq[String])
    extends InputPartition

private[sources] class FsListingScan(
    root: String,
    prefixes: Seq[String],
    entryTypes: Seq[String],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FsListingScan(root=$root, pushedPrefixes=${prefixes.mkString("|")}, " +
      s"pushedTypes=${entryTypes.mkString("|")}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  /** A directory at `path` can contain matches iff EVERY pushed prefix
    * and the path agree on their common length.
    */
  private def dirMayMatch(relPath: String): Boolean = prefixes.forall { p =>
    relPath.startsWith(p) || p.startsWith(relPath)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val rootFile = new File(root)
    if (rootFile.isDirectory) {
      // Seed-per-child, pruned at PLANNING time: directories that can't
      // contain a pushed prefix are dropped, and so are top-level FILES
      // that fail a pushed prefix outright (a task that would emit
      // nothing must not be scheduled). The root directory itself is
      // never emitted (matching FsListing.list), so an empty root means
      // zero partitions — NOT a fallback seed that would change the row
      // set's shape based on whether the tree is empty.
      val seeds = Option(rootFile.listFiles).toSeq.flatten
        .filter(f => !f.getName.startsWith("."))
        .filter { f =>
          val rp = "/" + f.getName
          if (FsListing.isRealDir(f)) dirMayMatch(rp)
          else prefixes.forall(rp.startsWith)
        }
        .map(_.getPath)
      if (seeds.isEmpty) Array.empty
      else {
        // cap scheduled tasks (FsListing.list parity): a 100k-child
        // root must not become 100k tasks — round-robin the seeds into
        // ≤64 multi-seed partitions
        val nPart = math.min(seeds.size, 64)
        seeds.zipWithIndex.groupBy(_._2 % nPart).toSeq.sortBy(_._1)
          .map { case (_, g) => FsListingPartition(g.map(_._1)) }
          .toArray[InputPartition]
      }
    } else if (rootFile.isFile) {
      // root is a single file: one partition listing just it
      Array(FsListingPartition(Seq(root)))
    } else {
      // nonexistent root: zero rows, not a phantom entry
      Array.empty
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FsListingReaderFactory(root, prefixes, entryTypes,
      required.fieldNames)
}

private[sources] class FsListingReaderFactory(
    root: String,
    prefixes: Seq[String],
    entryTypes: Seq[String],
    fields: Array[String]) extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val seeds = partition.asInstanceOf[FsListingPartition].seeds
    new FsListingReader(root, seeds, prefixes, entryTypes, fields)
  }
}

private[sources] class FsListingReader(
    root: String,
    seeds: Seq[String],
    prefixes: Seq[String],
    entryTypes: Seq[String],
    fields: Array[String]) extends PartitionReader[InternalRow] {

  import FsListingReader.Ent

  private def rel(f: File): String =
    f.getPath.stripPrefix(root) match {
      case "" => "/"
      case p if p.startsWith("/") => p
      case p => "/" + p
    }

  private def dirMayMatch(p: String): Boolean = prefixes.forall { pre =>
    p.startsWith(pre) || pre.startsWith(p)
  }

  private def emit(e: Ent): Boolean =
    prefixes.forall(e.relPath.startsWith) &&
      entryTypes.forall(t => (if (e.isDir) "directory" else "file") == t)

  private def walk(f: File): Iterator[Ent] = {
    if (f.getName.startsWith(".")) Iterator.empty
    else {
      val rp = rel(f)
      // real directories only — symlinked dirs are emitted (file-typed)
      // but never followed: `find -P` parity, and a `ln -s ..` cycle
      // must not loop the walk (same rule as FsListing.walk)
      val isLink = java.nio.file.Files.isSymbolicLink(f.toPath)
      if (!isLink && f.isDirectory) {
        if (!dirMayMatch(rp)) Iterator.empty // pushdown prunes HERE
        else Iterator(Ent(f, rp, isDir = true, isLink = false)) ++
          Option(f.listFiles).iterator.flatten.flatMap(walk)
      } else Iterator(Ent(f, rp, isDir = false, isLink))
    }
  }

  private val it = seeds.iterator.flatMap(s => walk(new File(s)))
    .filter(emit)
  private var cur: Ent = _

  override def next(): Boolean =
    if (it.hasNext) { cur = it.next(); true } else false

  override def get(): InternalRow = {
    // symlinks report the LINK's own lstat values, not the target's
    // (broken links would otherwise get size 0 / epoch mtime)
    lazy val linkStat = FsListing.lstat(cur.f)
    val values = fields.map {
      case "filepath" => UTF8String.fromString(cur.relPath)
      case "name" => UTF8String.fromString(cur.f.getName)
      case "size_bytes" =>
        if (cur.isLink) linkStat._1
        else if (cur.isDir) 0L else cur.f.length()
      case "modified_time" => // ms → µs
        (if (cur.isLink) linkStat._2 else cur.f.lastModified()) * 1000L
      case "entry_type" =>
        UTF8String.fromString(if (cur.isDir) "directory" else "file")
      case "depth" => cur.relPath.count(_ == '/')
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}

private[sources] object FsListingReader {
  /** One visited entry: path/type/link-ness resolved ONCE during the
    * walk (the walk needs them for recursion anyway); size/mtime stat
    * calls are left on the File so column pruning skips them entirely
    * for projections that don't read them.
    */
  final case class Ent(f: File, relPath: String, isDir: Boolean,
      isLink: Boolean)
}
