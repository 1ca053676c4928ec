package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.BpeFns

/** BPE tokenizer pins. q162 is rows-only (iterative merge training has
  * no ANSI-SQL oracle), so this spec carries the correctness burden:
  * hand-computed merge tables on a fixture small enough to derive on
  * paper, an INDEPENDENTLY-written reference encoder (recursive
  * best-pair splitting — a different algorithm shape than the kernel's
  * iterative rewrite) cross-checked on the real corpus, tie-break
  * determinism, and partition invariance of the registered query.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("trainMerges: hand-computed census, merge order, and rewrite") {
    // words: "abab"×2, "ab"×1.
    // pair census: (a,b) = 2·2 + 1 = 5, (b,a) = 1·2 = 2 → merge (a,b).
    // rewrite: abab→[ab,ab], ab→[ab]; census: (ab,ab) = 2 → merge it.
    // rewrite: abab→[abab]; no adjacent pairs remain anywhere → stop.
    val merges = Bpe.trainMerges(Seq("abab" -> 2L, "ab" -> 1L), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
  }

  test("trainMerges: ties break to the lexicographically smallest pair") {
    // "xy" and "xz" both have count 1 — (x,y) < (x,z)
    val merges = Bpe.trainMerges(Seq("xy" -> 1L, "xz" -> 1L), numMerges = 1)
    assert(merges == Seq(("x", "y")))
  }

  test("encode: greedy left-to-right, rank priority, word boundaries") {
    val merges = Seq(("a", "b"), ("ab", "ab"))
    def enc(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(BpeFns.bpe_tokens(col("text"), merges))
        .head().getSeq[String](0)
    // rank 0 merges all (a,b); rank 1 then pairs them left-to-right
    assert(enc("ababab") == Seq("abab", "ab"))
    // word boundary blocks merging; empty words from double spaces skipped
    assert(enc("ab  ab c") == Seq("ab", "ab", "c"))
    // symbols not in any merge pass through as characters
    assert(enc("cab") == Seq("c", "ab"))
    assert(enc("") == Seq())
  }

  /** Independent reference encoder: recursive splitting — apply the
    * LOWEST-rank pair present by splitting around its leftmost
    * occurrence, recurse on both sides of the merged token. Equivalent
    * to greedy iterative rewriting but a different code shape, so a
    * kernel bug cannot hide in both.
    */
  private def refEncodeWord(word: Seq[String],
                            rank: Map[(String, String), Int]): Seq[String] = {
    if (word.size < 2) return word
    val present = word.sliding(2).zipWithIndex
      .flatMap { case (Seq(a, b), i) => rank.get((a, b)).map(r => (r, i)) }
      .toSeq
    if (present.isEmpty) return word
    val (r, _) = present.minBy(identity)
    // merge ALL occurrences of that pair left-to-right, then recurse
    val (a, b) = rank.collectFirst { case (p, rr) if rr == r => p }.get
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.size) {
      if (i < word.size - 1 && word(i) == a && word(i + 1) == b) {
        out += a + b; i += 2
      } else { out += word(i); i += 1 }
    }
    refEncodeWord(out.toSeq, rank)
  }

  test("kernel encode matches the reference encoder on the real corpus") {
    val wf = Bpe.wordFrequencies(docs, col("text"), topK = 512)
    val merges = Bpe.trainMerges(wf.toIndexedSeq, numMerges = 32)
    val rank = merges.zipWithIndex.toMap
    val sample = docs.orderBy(col("doc_id")).limit(40)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kernelToks = docs.orderBy(col("doc_id")).limit(40)
      .select(col("doc_id"), BpeFns.bpe_tokens(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    sample.foreach { case (id, text) =>
      val ref = text.split(" ").filter(_.nonEmpty).toSeq.flatMap(w =>
        refEncodeWord(w.map(_.toString), rank))
      assert(kernelToks(id) == ref, s"doc $id tokens diverge")
    }
    // tokens reconstruct the text (BPE never drops characters)
    sample.foreach { case (id, text) =>
      assert(kernelToks(id).mkString ==
        text.split(" ").filter(_.nonEmpty).mkString)
    }
  }

  test("q162 is deterministic under repartitioning and merge count grows compression") {
    val base = Bpe.tokenStats(docs, col("doc_id"), col("text"), numMerges = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val re = Bpe.tokenStats(docs.repartition(7), col("doc_id"), col("text"),
        numMerges = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(base == re)
    // more merges can only keep or shrink every doc's token count
    val more = Bpe.tokenStats(docs, col("doc_id"), col("text"), numMerges = 64)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val fewer = base.map(t => t._1 -> t._3).toMap
    assert(more.forall { case (id, n) => n <= fewer(id) })
    // and tokenization genuinely compresses vs characters
    assert(base.map(_._3.toLong).sum < base.map(_._2.toLong).sum)
  }
}
