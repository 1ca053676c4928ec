package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish atomic batch output (VERDICT r12 item 3) — the
  * generalization of [[graft.ext.AnnIndex]]'s generation stamps to an
  * arbitrary table sink. [[ObjectStore]]'s per-key puts are
  * idempotent, but a 100 TB batch REWRITE has a long window where a
  * concurrent reader sees a mix of old and new part-files; the fix is
  * the standard manifest-pointer commit (Iceberg/Delta's core move,
  * reduced to its essence):
  *
  *   - every write lands in a UNIQUE per-attempt staging directory
  *     (`_staging/<uuid>/`) — nothing in-place, old data untouched,
  *     and two concurrent publishers can never interleave part-files;
  *   - an audit runs over the STAGED data as read back from disk
  *     (what a reader would see, not the in-memory frame that
  *     produced it — a serialization bug would pass an input-side
  *     audit);
  *   - the stage then CLAIMS a generation number by an atomic
  *     no-overwrite rename to `gen=N/` (on collision with a racing
  *     publisher the claim retries at N+1 — the rename either moves
  *     the whole complete directory or fails, so `gen=` directories
  *     are complete by construction);
  *   - only on audit pass does the `_MANIFEST` pointer flip to N, in
  *     one atomic metadata operation.
  *
  * Readers resolve `_MANIFEST` first and then read exactly one
  * generation directory — old-or-new, never mixed. A crash anywhere
  * before the flip leaves the old view published and a dead staged or
  * claimed directory that the next publish skips past (generation
  * numbering takes `max(manifest, dirs)+1` and the claim rename never
  * overwrites) and [[vacuum]] reclaims. A failed audit never
  * publishes.
  *
  * Atomicity of the flip: on posix/HDFS, `FileContext.rename` with
  * OVERWRITE is atomic. On S3 the rename degrades to copy+delete, but
  * there the manifest flip maps to a single-key PUT (atomic in S3) —
  * the load-bearing property is that the COMMIT is one pointer-sized
  * operation, never proportional to the data. (On S3 the CLAIM rename
  * is copy-based too; there a real deployment swaps the claim for an
  * If-None-Match marker PUT — the interface is unchanged.) The
  * reference pipeline has no batch-output commit at all (its per-file
  * S3 puts are the K1 path); this is the engine-side gap a 100 TB
  * rewrite hits first.
  */
object AtomicPublish {

  sealed trait PublishResult { def generation: Long }
  /** Manifest flipped; `generation` is now the published snapshot. */
  final case class Published(generation: Long) extends PublishResult
  /** Audit failed; the previously published snapshot is untouched and
    * the staged data is left on disk under its claimed `gen=`
    * directory for debugging (vacuum reclaims it once superseded).
    */
  final case class AuditRejected(generation: Long, reason: String)
      extends PublishResult

  private val ManifestName = "_MANIFEST"

  private def fs(dir: String): FileSystem = {
    val f = FileSystem.get(new Path(dir).toUri, new Configuration())
    f.setWriteChecksum(false)
    f
  }

  private def genPath(tableDir: String, gen: Long) =
    new Path(s"$tableDir/gen=$gen")

  /** The currently published generation; None before the first publish
    * AND on a malformed manifest (short/corrupt content) — readers fail
    * with the clear [[readPublished]] error instead of a
    * NumberFormatException from deep inside a stream read. Reads to
    * EOF: short reads are legal on HDFS/object-store streams.
    */
  def currentGeneration(tableDir: String): Option[Long] = {
    val f = fs(tableDir)
    val p = new Path(s"$tableDir/$ManifestName")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        scala.util.Try(
          new String(out.toByteArray, "UTF-8").trim.toLong).toOption
      } finally in.close()
    }
  }

  /** Highest generation directory on disk (published, rejected or
    * crash-orphaned) — the numbering floor for the next claim, so a
    * dead stage is never re-entered. Merely advisory: the claim rename
    * is what actually guarantees exclusivity.
    */
  private def maxGenOnDisk(tableDir: String): Long = {
    val f = fs(tableDir)
    val root = new Path(tableDir)
    if (!f.exists(root)) -1L
    else f.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toLong).toOption)
      .foldLeft(-1L)(math.max)
  }

  /** Claim the next free generation number by renaming the staged
    * directory to `gen=N` WITHOUT overwrite — the rename is the atomic
    * claim (two racing publishers computing the same N: one wins the
    * rename, the other gets FileAlreadyExists and retries at N+1), so
    * no two publishers ever write into the same generation directory.
    */
  private def claimGeneration(tableDir: String, stage: Path): Long = {
    val ctx = FileContext.getFileContext(new Path(tableDir).toUri,
      new Configuration())
    var next = math.max(currentGeneration(tableDir).getOrElse(-1L),
      maxGenOnDisk(tableDir)) + 1
    var claimed = -1L
    while (claimed < 0) {
      try {
        ctx.rename(stage, genPath(tableDir, next))
        claimed = next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => next += 1
        case _: java.nio.file.FileAlreadyExistsException => next += 1
      }
    }
    claimed
  }

  /** Stage `df` under a unique attempt directory, audit the READ-BACK
    * staged data, claim the next generation atomically, and publish on
    * audit pass. `audit` returns None to admit or Some(reason) to
    * reject — compose it from [[graft.ext.Profile.audit]] for the
    * q132-style constraint set.
    */
  def publish(df: DataFrame, tableDir: String,
              audit: DataFrame => Option[String] = _ => None)
      : PublishResult = {
    val spark = df.sparkSession
    // staged under the hidden `_staging/` parent (invisible to any
    // accidental root scan) with a non-hidden uuid LEAF name (an
    // explicitly-addressed `_`-prefixed leaf trips Spark's hidden-path
    // filter warning on every write)
    val stage = new Path(
      s"$tableDir/_staging/${java.util.UUID.randomUUID().toString}")
    df.write.mode("overwrite").parquet(stage.toString)
    val staged = spark.read.parquet(stage.toString)
    // audit BEFORE the claim rename invalidates the stage path; the
    // claim still happens on rejection so the rejected data keeps a
    // stable numbered home for debugging and future numbering skips it
    val verdict = audit(staged)
    val gen = claimGeneration(tableDir, stage)
    verdict match {
      case Some(reason) => AuditRejected(gen, reason)
      case None =>
        flipManifest(tableDir, gen)
        Published(gen)
    }
  }

  /** One atomic pointer-sized commit: write `_MANIFEST.tmp.N`, rename
    * over `_MANIFEST` with OVERWRITE. The tmp name carries the
    * generation so two racing publishers cannot clobber each other's
    * tmp; each publisher's data lives in its own claimed `gen=`
    * directory, so whichever flip lands last publishes a complete
    * snapshot either way (the standard optimistic-commit outcome).
    */
  private def flipManifest(tableDir: String, gen: Long): Unit = {
    val f = fs(tableDir)
    val tmp = new Path(s"$tableDir/$ManifestName.tmp.$gen")
    val out = f.create(tmp, true)
    try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
    val ctx = FileContext.getFileContext(new Path(tableDir).toUri,
      new Configuration())
    ctx.rename(tmp, new Path(s"$tableDir/$ManifestName"),
      Options.Rename.OVERWRITE)
  }

  /** The published snapshot. Resolves the manifest ONCE and pins that
    * generation directory — every file this frame reads lives under a
    * single `gen=N/`, so a publish that lands mid-query cannot mix
    * generations into the result.
    */
  def readPublished(spark: SparkSession, tableDir: String): DataFrame = {
    val gen = currentGeneration(tableDir).getOrElse(
      throw new IllegalStateException(
        s"no published generation under $tableDir"))
    spark.read.parquet(genPath(tableDir, gen).toString)
  }

  /** Reclaim dead generations: everything at least `keepLatest`
    * generations behind the published one (default keeps the published
    * and its predecessor — in-flight readers that resolved just before
    * a flip still finish). Directories NEWER than the pointer are live
    * stages or audit-rejected evidence and are never touched;
    * `_staging/` attempt directories belong to in-flight publishers
    * and are never touched either (a crash-orphaned stage is reclaimed
    * manually — age-based GC needs wall-clock, which this sink
    * deliberately avoids).
    */
  def vacuum(tableDir: String, keepLatest: Int = 2): Seq[Long] = {
    require(keepLatest >= 1, "must keep at least the published generation")
    val published = currentGeneration(tableDir).getOrElse(return Nil)
    val f = fs(tableDir)
    val dead = f.listStatus(new Path(tableDir)).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toLong).toOption)
      .filter(_ <= published - keepLatest)
      .toSeq.sorted
    dead.foreach(g => f.delete(genPath(tableDir, g), true))
    dead
  }

  /** foreachBatch consumer — the publish-per-batch serving path: each
    * micro-batch's output (a COMPLETE replacement snapshot, e.g. a
    * complete-mode aggregate or a [[graft.streaming.StreamingCdcView]]
    * materialization) is staged, audited and atomically published, so
    * a downstream reader polling [[readPublished]] always sees one
    * whole snapshot — never a half-written micro-batch, never a mix of
    * two. Crash recovery composes with checkpointing: a replayed batch
    * re-publishes the same content as a fresh generation (an idempotent
    * no-op for readers), proven in CheckpointRecoverySpec.
    */
  def publishEachBatch(tableDir: String,
                       audit: DataFrame => Option[String] = _ => None)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => { publish(batch, tableDir, audit); () }
}
