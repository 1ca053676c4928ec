package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once cache for relationally SYNTHESIZED media fixtures
  * (q95 WAV, q173 PDF, q174 DOCX). The synthesis — endian-hex CTEs,
  * per-entry transform() lambdas — exists only because the testdata has
  * no real media column; in production the bytes arrive from storage.
  * Without this cache the bench row priced the synthesis, not the
  * parser (q174's 4.0 s row was ~¾ ZIP string-building — VERDICT r10
  * item 5): Bench's untimed warm-up pass populates the cache, so timed
  * passes measure the operator against materialized bytes.
  *
  * `localCheckpoint(eager = true)` truncates lineage and pins the
  * blocks executor-local (MEMORY_AND_DISK — safe in the single-JVM
  * bench/verify topology; fixtures never exist at production scale).
  * Keyed by (name, sfDir, partition regime, session): InvarianceSpec
  * re-runs queries under different `graft.test.inputPartitions` /
  * shuffle-partition regimes, and each regime must build its own frame
  * or the invariance check would compare a frame to itself.
  */
object FixtureCache {
  private val frames =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def materialized(spark: SparkSession, name: String, dir: String)(
      build: => DataFrame): DataFrame = {
    val regime = spark.conf.getOption("graft.test.inputPartitions")
      .getOrElse("-") + "|" +
      spark.conf.getOption("spark.sql.shuffle.partitions").getOrElse("-")
    // applicationId, NOT identityHashCode: an identity hash is reusable
    // after GC, so a later session could be served a checkpointed frame
    // whose blocks belong to a STOPPED context (the SharedClusterPass
    // key discipline)
    frames.getOrElseUpdate(
      s"$name|$dir|$regime|${spark.sparkContext.applicationId}",
      build.localCheckpoint(eager = true))
  }
}
