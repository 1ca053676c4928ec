package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL registration of the engine's native functions, two ways:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) injects them at
  *    session build time — the standard extension-library packaging;
  *  - [[GraftFunctions.registerAll]] adds them to an already-running
  *    session (tests, notebooks).
  *
  * After either, `spark.sql("SELECT poly_hash(text) ...")` uses the same
  * codegen'd expressions as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name)

  /** Evaluate a literal integer argument leniently: SQL integer literals
    * arrive as Int, but `CAST(4 AS BIGINT)` or a typed long literal is a
    * perfectly reasonable spelling — accept any integral literal and
    * fail with the argument name, not a ClassCastException.
    */
  private def intArg(args: Seq[Expression], pos: Int, fn: String): Int = {
    require(args.length > pos,
      s"$fn expects at least ${pos + 1} arguments, got ${args.length}")
    val e = args(pos)
    require(e.foldable, s"$fn argument ${pos + 1} must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => Math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn argument ${pos + 1} must be an integer literal, got $other")
    }
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("poly_hash",
     info("poly_hash", "poly_hash(str) - rolling polynomial hash mod 1e9+7"),
     (args: Seq[Expression]) => PolyHash(args.head)),
    ("winnow",
     info("winnow", "winnow(str, k, w) - winnowing fingerprint hashes"),
     (args: Seq[Expression]) => Winnow(args.head,
       intArg(args, 1, "winnow"), intArg(args, 2, "winnow"))),
    ("simhash64",
     info("simhash64", "simhash64(str) - 64-bit simhash of whitespace tokens"),
     (args: Seq[Expression]) => SimHash64(args.head)),
    ("hashed_shingles",
     info("hashed_shingles",
          "hashed_shingles(str, n) - distinct xxhash64'd word n-grams"),
     (args: Seq[Expression]) => HashedShingles(args.head,
       intArg(args, 1, "hashed_shingles"))),
    ("minhash_signature",
     info("minhash_signature",
          "minhash_signature(hashes, k) - k-permutation minhash"),
     (args: Seq[Expression]) => MinhashSignature(args.head,
       intArg(args, 1, "minhash_signature"))),
    ("band_buckets",
     info("band_buckets",
          "band_buckets(sig, bands) - LSH band bucket hashes of a minhash signature"),
     (args: Seq[Expression]) => BandBuckets(args.head,
       intArg(args, 1, "band_buckets"))),
    ("sign_band_buckets",
     info("sign_band_buckets",
          "sign_band_buckets(vec, bandBits) - cosine-LSH band buckets over axis signs"),
     (args: Seq[Expression]) => SignBandBuckets(args.head,
       intArg(args, 1, "sign_band_buckets"))),
    ("quantized_cosine",
     info("quantized_cosine",
          "quantized_cosine(a, b) - exact-integer quantized cosine of float vectors"),
     (args: Seq[Expression]) => QuantizedCosine(args.head, args(1))),
    ("sorted_intersect",
     info("sorted_intersect",
          "sorted_intersect(a, b) - merge-intersection of two sorted BIGINT arrays"),
     (args: Seq[Expression]) => SortedIntersect(args.head, args(1))),
    ("repetition_stats",
     info("repetition_stats",
          "repetition_stats(str) - [top-2-gram fraction, dup-3-gram fraction]"),
     (args: Seq[Expression]) => RepetitionStats(args.head)),
    ("normalize_text",
     info("normalize_text",
          "normalize_text(str) - NFC + lowercase + punct strip + whitespace collapse"),
     (args: Seq[Expression]) => NormalizeText(args.head)),
    ("quality_score",
     info("quality_score",
          "quality_score(str) - one-pass document quality score on the 1e-4 grid"),
     (args: Seq[Expression]) => QualityScore(args.head)),
    ("bloom_might_contain",
     info("bloom_might_contain",
          "bloom_might_contain(bits, hash, k) - Bloom-filter membership probe"),
     (args: Seq[Expression]) => BloomMightContain(args.head, args(1),
       intArg(args, 2, "bloom_might_contain"))))

  /** Register on a live session (temp functions, session-scoped). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graft.bridge.registerFunction(spark, name, i, builder)
    }
}
