package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Deterministic CSV + JSONL export of the `nation` table — the text
  * ingestion fixture for q199. Real engine users hit CSV/JSON files
  * before anything columnar, and text readers are where engines
  * disagree (quoting, escapes, null encodings, embedded newlines), so
  * the fixture deliberately exercises all of them: RFC 4180 doubled
  * quotes, embedded commas, a quoted field spanning LINES (every 7th
  * row), backslashes that must stay literal in CSV but escape in JSON,
  * an explicit `\N` null string for `score`, and booleans.
  *
  * The files live at a FIXED path: the DuckDB oracle SQL is a static
  * string, and `nation` is the same 25 rows at every scale factor
  * (TPC-H fixes it), so every run writes byte-identical content.
  * Writes are write-to-temp + ATOMIC_MOVE so concurrent Verify/Bench
  * runs can never observe a half-written file; once both files exist
  * the export is skipped (FixtureCache discipline — the bench row
  * prices the READERS, not the export).
  */
object TextFixtures {

  val dir = "/tmp/graft-textsrc"
  val csvPath = s"$dir/nation.csv"
  val jsonPath = s"$dir/nation.jsonl"
  val jsonGzPath = s"$dir/nation-gz.jsonl.gz"

  /** Quote/escape/newline-rich note, a pure function of the row. */
  def note(k: Int, name: String): String = {
    val base = s"""exported "$name", rank $k, path C:\\data\\$k"""
    if (k % 7 == 0) base + "\nline two of " + k else base
  }

  /** `\N`-encoded null every 5th row; k·0.25 is dyadic, so the decimal
    * text parses to the identical double in every engine.
    */
  def score(k: Int): Option[Double] =
    if (k % 5 == 0) None else Some(k * 0.25)

  private def csvQuote(s: String): String =
    "\"" + s.replace("\"", "\"\"") + "\""

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeAtomic(path: String, content: String): Unit =
    writeAtomicBytes(path, content.getBytes(StandardCharsets.UTF_8))

  private def writeAtomicBytes(path: String, bytes: Array[Byte]): Unit = {
    val target = Paths.get(path)
    val tmp = Files.createTempFile(target.getParent, ".graft-textsrc", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Deterministic gzip of `content`: java's GZIPOutputStream writes a
    * fixed header (mtime 0, no name/comment) and Deflater is
    * level-deterministic, so every run produces byte-identical output
    * — the same static-path contract as the plain files.
    */
  private def gzipBytes(content: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content.getBytes(StandardCharsets.UTF_8))
    gz.close()
    bos.toByteArray
  }

  /** Materialize both files if absent (25 nation rows — bounded by
    * construction, a fixture writer not a query stage).
    */
  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (Files.exists(Paths.get(csvPath)) &&
        Files.exists(Paths.get(jsonPath)) &&
        Files.exists(Paths.get(jsonGzPath))) return
    Files.createDirectories(Paths.get(dir))
    val rows = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    val csv = new StringBuilder(
      "nation_key,name,region_key,note,score,flag\n")
    val jsonl = new StringBuilder
    rows.foreach { case (k, name, rk) =>
      val n = note(k, name)
      val sc = score(k)
      csv ++= s"$k,$name,$rk,${csvQuote(n)}," +
        s"${sc.fold("\\N")(_.toString)},${k % 2 == 0}\n"
      jsonl ++= s"""{"nation_key":$k,"name":${jsonString(name)},""" +
        s""""region_key":$rk,"note":${jsonString(n)},""" +
        s""""score":${sc.fold("null")(_.toString)},"flag":${k % 2 == 0}}""" +
        "\n"
    }
    writeAtomic(csvPath, csv.toString)
    writeAtomic(jsonPath, jsonl.toString)
    // same JSONL bytes, gzipped: the q212 compressed-ingestion arm
    writeAtomicBytes(jsonGzPath, gzipBytes(jsonl.toString))
  }
}
