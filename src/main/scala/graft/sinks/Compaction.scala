package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction through the write-audit-publish commit — the
  * OPTIMIZE half of the storage-maintenance story [[AtomicPublish]]
  * started: a long-lived table accretes small part-files (streaming
  * publishes, per-batch appends, over-parallel writes) until open cost
  * and scan scheduling dominate; compaction rewrites the published
  * snapshot into few right-sized files. Doing the rewrite THROUGH
  * [[AtomicPublish.publish]] is the point — readers resolve one
  * manifest and see entirely-old or entirely-new files, the row-count
  * audit runs over the read-back staged data before the pointer
  * flips, a crash mid-rewrite leaves the small-file snapshot
  * published, and [[AtomicPublish.vacuum]] reclaims the superseded
  * layout afterwards. At 100 TB the same plan holds per partition:
  * file counts are metadata-listing work, the rewrite is one
  * round-robin exchange sized by `targetFiles`, and the commit is one
  * pointer-sized operation regardless of data volume.
  */
object Compaction {

  final case class CompactStats(
      rows: Long,
      filesBefore: Int,
      filesAfter: Int,
      generation: Long,
      vacuumed: Seq[Long])

  /** Parquet part-file count of the published generation — pure
    * metadata listing, no Spark job.
    */
  def publishedFileCount(tableDir: String): Int = {
    val gen = AtomicPublish.currentGeneration(tableDir).getOrElse(
      throw new IllegalStateException(s"nothing published at $tableDir"))
    val p = new Path(s"$tableDir/gen=$gen")
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      .listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `srcTableDir`'s published snapshot into `targetFiles`
    * files at `dstTableDir` (which may be the same table): round-robin
    * repartition (layout clustering is [[graft.ext.Layout]]'s job —
    * q107; compaction only fixes file sizing), audited against the
    * source row count over the READ-BACK staged files, atomically
    * published, superseded generations vacuumed (published +
    * predecessor always survive).
    */
  def compactPublished(spark: SparkSession, srcTableDir: String,
                       dstTableDir: String, targetFiles: Int)
      : CompactStats = {
    require(targetFiles > 0)
    val src = AtomicPublish.readPublished(spark, srcTableDir)
    val srcRows = src.count()
    // capture BEFORE publish: when src == dst (same-table compaction)
    // the publish flips the manifest and the source's published
    // generation becomes the compacted one, so a post-publish count
    // would silently report filesAfter twice.
    val filesBefore = publishedFileCount(srcTableDir)
    val result = AtomicPublish.publish(
      src.repartition(targetFiles), dstTableDir,
      audit = staged =>
        if (staged.count() == srcRows) None
        else Some(s"row count drifted during rewrite"))
    result match {
      case AtomicPublish.Published(gen) =>
        val vacuumed = AtomicPublish.vacuum(dstTableDir)
        CompactStats(srcRows, filesBefore,
          publishedFileCount(dstTableDir), gen, vacuumed)
      case AtomicPublish.AuditRejected(gen, reason) =>
        throw new IllegalStateException(
          s"compaction audit rejected gen=$gen: $reason")
    }
  }
}
