package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON metrics line. Results are materialized through the
  * `noop` sink — `count()` would let Catalyst prune every computed column
  * and under-measure; noop computes all output columns without write I/O.
  *
  * Methodology (round-3 hardening): each query is timed
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and the reported figure is
  * the per-query MINIMUM — the run least polluted by JIT warm-up, GC
  * pauses, and page-cache misses, i.e. the best estimate of the code's
  * intrinsic cost on this box (single runs on a shared JVM showed ±40%
  * swings on sub-5-s queries between byte-identical rounds; minima are
  * stable). All individual run times are preserved in the JSON file
  * output (SPARK_GRAFT_BENCH_OUT, default bench_out.json) so
  * noise-vs-regression questions can be answered from the artifact
  * itself; stdout still carries the single-line driver contract.
  */
object Bench {

  private def jnum(d: Double): String =
    // explicit Locale.ROOT: the f-interpolator uses the default locale,
    // which on a comma-decimal JVM would emit "12,3456" and corrupt the JSON
    if (d.isNaN || d.isInfinite) "null"
    else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/file-index initialization otherwise
    // lands entirely on whichever query runs first.
    val warm = new Tables(spark, sfDir)
    Seq(warm.lineitem, warm.orders, warm.events, warm.documents,
        warm.embeddings).foreach {
      _.write.format("noop").mode("overwrite").save()
    }
    // Dev aid: SPARK_GRAFT_BENCH_ONLY=q122,q80 restricts the run to the
    // named queries (matched on the short id before the first '_').
    // Unset in driver runs, so the recorded artifact always covers all.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(ids =>
        ids.contains(n) || ids.contains(n.takeWhile(_ != '_'))))
    // Untimed warm-up PASS (round-6 advisory): without it, each query's
    // first timed run pays its own codegen/JIT compilation — measured up
    // to ~50x on sub-second queries (q103 runs [52.4, 1.40, 1.08]) — so
    // min-of-3 was effectively min-of-2 real samples. One untimed
    // execution per query doubles the effective sample count for ~15%
    // wall cost; failures are ignored here and surface in the timed loop.
    for (name <- names)
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    // run-major order (all queries per pass, `runs` passes): consecutive
    // same-query runs would share hot caches and understate steady-state
    // cost; pass-major interleaving also means a transient JVM hiccup
    // degrades one PASS, not one query's whole sample
    val times = names.map(_ -> Array.fill(runs)(Double.NaN)).toMap
    val errors = scala.collection.mutable.Map[String, String]()
    for (r <- 0 until runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(name)(r) = (System.nanoTime() - t0) / 1e9
      } catch {
        // NonFatal only: an OOM/LinkageError means a damaged JVM whose
        // later timings would be plausible-looking garbage — abort the
        // whole run instead of recording them
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name run $r failed: ${e.getMessage}")
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    def minOf(name: String): Double = {
      val ok = times(name).filterNot(_.isNaN)
      if (ok.isEmpty) Double.NaN else ok.min
    }
    // STDOUT keys are the short query ids (q01, q02, …): the driver
    // captures only the trailing ~2000 bytes of console output, and the
    // full-name map outgrew that window at 83 queries (BENCH_r05 came
    // back "parsed": null with the line's head truncated). Short ids keep
    // the line parseable at any realistic query count; the short→full
    // name mapping is documented in BASELINE.md and the full-name map
    // (with all run samples) is always in the file artifact below.
    def shortId(n: String): String = n.takeWhile(_ != '_')
    require(names.map(shortId).distinct.size == names.size,
      "duplicate short query ids — stdout JSON keys would collide")
    val qsShort = names.map(n => "\"" + shortId(n) + "\":" + jnum(minOf(n)))
      .mkString("{", ",", "}")
    val qs = names.map(n => "\"" + n + "\":" + jnum(minOf(n)))
      .mkString("{", ",", "}")
    val total = names.map(minOf).filterNot(_.isNaN).sum
    val line = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qsShort,"sf":"$sfDir","runs":$runs,"aggregation":"min","names":"short ids; full map in $outPath"}"""
    // file artifact with the full sample, written BEFORE the stdout line
    // so a truncated/garbled console capture can always be reconstructed
    val detail = names.map { n =>
      val all = times(n).map(jnum).mkString("[", ",", "]")
      val err = errors.get(n)
        .map(m => ",\"error\":\"" + m.replaceAll("[\"\\\\\n\r]", " ") + "\"")
        .getOrElse("")
      "\"" + n + "\":{\"min\":" + jnum(minOf(n)) + ",\"runs\":" + all + err + "}"
    }.mkString("{", ",", "}")
    val fileJson =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"aggregation":"min","queries":$qs,"detail":$detail}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fileJson + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
