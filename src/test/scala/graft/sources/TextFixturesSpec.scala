package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the q199 text-ingestion fixture and Spark's readers over
  * it: the byte-level encodings (doubled quotes, `\N`, the multi-line
  * field) and the parsed values both readers must agree on.
  */
class TextFixturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val sch = StructType(Seq(
    StructField("nation_key", IntegerType),
    StructField("name", StringType),
    StructField("region_key", IntegerType),
    StructField("note", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType)))

  test("export is deterministic and byte-stable across ensure() calls") {
    TextFixtures.ensure(spark, sf)
    val csv1 = Files.readAllBytes(Paths.get(TextFixtures.csvPath))
    // force a rewrite by deleting, then compare bytes
    Files.delete(Paths.get(TextFixtures.csvPath))
    TextFixtures.ensure(spark, sf)
    val csv2 = Files.readAllBytes(Paths.get(TextFixtures.csvPath))
    assert(java.util.Arrays.equals(csv1, csv2))
    val text = new String(csv1, "UTF-8")
    assert(text.contains("\"\""), "doubled quotes must appear in the CSV")
    assert(text.contains("\\N"), "the null string must appear in the CSV")
  }

  test("spark.read.csv parses quotes, nulls, booleans, multi-line fields") {
    TextFixtures.ensure(spark, sf)
    val c = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("nullValue", "\\N").option("escape", "\"")
      .schema(sch).csv(TextFixtures.csvPath)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(c.size == 25)
    // row 0: score null (0 % 5 == 0), flag true, multi-line note (0 % 7)
    assert(c(0).isNullAt(4) && c(0).getBoolean(5))
    assert(c(0).getString(3).contains("\nline two of 0"))
    // row 3: quote-rich note round-trips the doubled quotes
    assert(c(3).getString(3) == TextFixtures.note(3, c(3).getString(1)))
    assert(c(3).getDouble(4) == 0.75)
    // every non-null score is k * 0.25 exactly (dyadic decimal text)
    c.values.filter(r => !r.isNullAt(4)).foreach { r =>
      assert(r.getDouble(4) == r.getInt(0) * 0.25)
    }
  }

  test("spark.read.json agrees with spark.read.csv on every field") {
    TextFixtures.ensure(spark, sf)
    val c = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("nullValue", "\\N").option("escape", "\"")
      .schema(sch).csv(TextFixtures.csvPath)
    val j = spark.read.schema(sch).json(TextFixtures.jsonPath)
    assert(j.count() == 25)
    val disagreements = c.alias("c")
      .join(j.alias("j"), col("c.nation_key") === col("j.nation_key"))
      .filter(!(col("c.name") <=> col("j.name") &&
        col("c.region_key") <=> col("j.region_key") &&
        col("c.note") <=> col("j.note") &&
        col("c.score") <=> col("j.score") &&
        col("c.flag") <=> col("j.flag")))
      .count()
    assert(disagreements == 0L)
  }
}
