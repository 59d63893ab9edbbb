package graft.sinks

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{AnnIndex, NearDupIndex, TextOps}

/** Compaction must change the file layout and NOTHING else: band-store
  * updates and IVF searches return identical results before and after.
  */
class DirCompactionSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def parquetCount(dir: String): Int =
    Files.walk(Paths.get(dir)).iterator.asScala
      .count(_.getFileName.toString.endsWith(".parquet"))

  test("near-dup store: fragmented appends compact; results unchanged") {
    val dir = Files.createTempDirectory("ndc").toString
    val docs = graft.Tables(spark, sf, "documents")
    // 4 fragment updates (each appends its own files)
    (0 until 4).foreach { i =>
      NearDupIndex.update(spark, dir,
        docs.filter(col("doc_id") % 4 === i)): Unit
    }
    val before = parquetCount(s"$dir/bands")
    assert(before >= 4, s"expected fragmentation, got $before files")
    val compacted = DirCompaction.compact(spark, s"$dir/bands",
      maxFilesPerDir = 2)
    assert(compacted == 1)
    assert(parquetCount(s"$dir/bands") < before)
    // the compacted store must behave identically: replay the same
    // corpus into a FRESH store and compare a post-compaction probe
    val fresh = Files.createTempDirectory("ndc2").toString
    (0 until 4).foreach { i =>
      NearDupIndex.update(spark, fresh,
        docs.filter(col("doc_id") % 4 === i)): Unit
    }
    val probe = docs.limit(50)
    def pairs(d: String) = NearDupIndex.probe(spark, d, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(dir) == pairs(fresh))
  }

  test("recovery: a crash between the two swap renames is repaired") {
    import org.apache.spark.sql.SaveMode
    val root = Files.createTempDirectory("dcrash").toString
    val live = s"$root/bands"
    spark.range(100).selectExpr("id", "cast(id as string) AS s")
      .repartition(6).write.mode(SaveMode.Overwrite).parquet(live)
    val rows = spark.read.parquet(live).count()
    // simulate the compactor dying between rename(dir→old) and
    // rename(tmp→dir): tmp holds the COMPLETE compacted copy, old the
    // original, and the live name is missing
    spark.read.parquet(live).coalesce(1)
      .write.parquet(s"$live.compact-tmp")
    Files.move(Paths.get(live), Paths.get(s"$live.compact-old"))
    assert(!Files.exists(Paths.get(live)))
    // next run repairs before compacting: live restored from tmp,
    // no suffixed siblings left to corrupt partition discovery
    DirCompaction.compact(spark, root): Unit
    assert(Files.exists(Paths.get(live)))
    assert(!Files.exists(Paths.get(s"$live.compact-old")))
    assert(!Files.exists(Paths.get(s"$live.compact-tmp")))
    assert(spark.read.parquet(live).count() == rows)
  }

  test("recovery: orphans next to an intact live dir are swept") {
    import org.apache.spark.sql.SaveMode
    val root = Files.createTempDirectory("dcrash2").toString
    val live = s"$root/postings"
    spark.range(50).selectExpr("id")
      .write.mode(SaveMode.Overwrite).parquet(live)
    // crash AFTER the second rename but before rm(old): live is the
    // compacted result, old lingers (and an incomplete tmp from an
    // even earlier aborted write)
    spark.range(50).selectExpr("id")
      .write.parquet(s"$live.compact-old")
    Files.createDirectory(Paths.get(s"$live.compact-tmp")): Unit
    DirCompaction.compact(spark, root): Unit
    assert(Files.exists(Paths.get(live)))
    assert(!Files.exists(Paths.get(s"$live.compact-old")))
    assert(!Files.exists(Paths.get(s"$live.compact-tmp")))
    assert(spark.read.parquet(live).count() == 50)
  }

  test("IVF store: cell dirs compact in place; search identical") {
    val dir = Files.createTempDirectory("annc").toString
    val emb = graft.Tables(spark, sf, "embeddings")
    AnnIndex.build(spark, dir, emb.filter(col("vec_id") <= 8))
    (0 until 3).foreach { i =>
      AnnIndex.update(spark, dir,
        emb.filter(col("vec_id") > 8 && col("vec_id") % 3 === i)): Unit
    }
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)
    val before = AnnIndex.search(spark, dir, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(DirCompaction.compact(spark, s"$dir/postings",
      maxFilesPerDir = 1) >= 1)
    val after = AnnIndex.search(spark, dir, q, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(before == after)
  }
}
