package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths,
  StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Deterministic ORC export of the `supplier` table — the columnar
  * cross-format fixture for q205 (VERDICT r12 item 5 / r13 item 3).
  * ORC ships with Spark (`spark.read.orc` is the same DataSource V1
  * path as parquet — pushdown, pruning, vectorized read all apply);
  * what needs PROVING is value fidelity across the write→read round
  * trip, against the parquet original. DuckDB has no ORC reader, so
  * the oracle gates the parquet side and the query pins the
  * cross-format agreement column TRUE (the q199 discipline).
  *
  * The export is a FIXTURE, not a query stage (supplier is
  * dimension-sized; the interesting path is the reader): written once
  * per sf dir, deterministic row order (sorted by key, one file),
  * write-to-temp + atomic directory rename so concurrent Verify/Bench
  * runs never observe a half-written table, skipped when present so
  * bench rows price the READER (the FixtureCache discipline).
  */
object OrcFixtures {

  val base = "/tmp/graft-orcsrc"

  def supplierOrc(spark: SparkSession, sfDir: String): String =
    synchronized {
      val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
      val target = Paths.get(s"$base/$tag/supplier.orc")
      if (Files.exists(target)) return target.toString
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempDirectory(target.getParent, ".graft-orc")
      val staged = tmp.resolve("out")
      spark.read.parquet(s"$sfDir/supplier.parquet")
        .orderBy("s_suppkey").coalesce(1)
        .write.mode("overwrite").orc(staged.toString)
      try Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // a concurrent process won the rename; its export is equivalent
        case _: FileAlreadyExistsException => ()
      }
      target.toString
    }
}
