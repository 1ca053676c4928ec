package graft.ext
// SCRATCH measurement harness for the optimization round — never committed.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SketchFns

object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val t = new graft.Tables(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = t.documents
    val (id, text, n) = (col("doc_id"), col("text"), 3)

    def bandedKeys(): DataFrame = {
      val sigs = docs.select(id.as("id"),
        SketchFns.minhash_signature(
          SketchFns.hashed_shingles(text, n), 128).as("sig"))
      sigs.select(col("id"),
        posexplode(SketchFns.band_buckets(col("sig"), 64))
          .as(Seq("band", "bucket")))
    }
    def mpSemi(): DataFrame = {
      val banded = bandedKeys()
      val cand = Lsh.bucketPairs(banded).localCheckpoint(true)
      val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("__cid"))
        .distinct()
      val sh = docs.join(ids, id === col("__cid"), "left_semi")
        .select(id.as("__id"), SketchFns.hashed_shingles(text, n).as("__sh"))
        .localCheckpoint(true)
      val candidates = cand
        .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), "id_a")
        .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), "id_b")
      candidates
        .withColumn("intersection",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("size_a", size(col("sh_a")))
        .withColumn("size_b", size(col("sh_b")))
        .withColumn("jaccard",
          col("intersection").cast("double")
            / (col("size_a") + col("size_b") - col("intersection")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), col("intersection"),
                col("size_a"), col("size_b"), col("jaccard"))
    }
    noop(bandedKeys())
    noop(Dedup.minhashPairs(docs, id, text, 3, 0.8))
    noop(mpSemi())
    for (r <- 1 to 2) {
      time(s"bandedKeys only   run$r")(noop(bandedKeys()))
      time(s"bucketPairs       run$r")(noop(Lsh.bucketPairs(bandedKeys())))
      time(s"minhashPairs cur  run$r")(noop(Dedup.minhashPairs(docs, id, text, 3, 0.8)))
      time(s"minhashPairs semi run$r")(noop(mpSemi()))
    }
    // value agreement
    val a = Dedup.minhashPairs(docs, id, text, 3, 0.8)
      .orderBy(col("id_a"), col("id_b")).collect().map(_.toString)
    val b = mpSemi().orderBy(col("id_a"), col("id_b")).collect().map(_.toString)
    println(s"[probe] cur==semi: ${a.sameElements(b)} (${a.length} pairs)")
    spark.stop()
  }
}
