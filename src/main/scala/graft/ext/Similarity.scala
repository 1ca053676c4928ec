package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.SketchFns

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Numeric discipline: embeddings are quantized to integer ten-thousandths
  * before any arithmetic, so dot products and norms are EXACT integers
  * (order-independent, engine-independent) and only the final
  * cosine = dot/sqrt(na*nb) is a (deterministic) float op. That makes
  * similarity results reproducible run-to-run and hash-comparable against
  * an external oracle — floating-point fold order stops mattering.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus — one pass, no corpus shuffle except the final
  * per-query top-k. The IVF path pre-buckets the corpus by a coarse
  * quantizer so each query only scans its cell (probe-adjacent-cells is
  * the recall knob); at 100 TB the bucketed corpus would be written
  * partitioned by cell so a query reads one partition.
  */
object Similarity {

  /** Integer quantization (ten-thousandths): Array[Float] → Array[Long].
    * floor(x*10000 + 0.5) rather than round() — round ties differ across
    * engines; floor doesn't.
    */
  def quantize(e: Column): Column =
    transform(e, x => floor(x.cast("double") * 10000d + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized vectors (zip_with +
    * aggregate, map-side). |x|≤~2e4 ⇒ 64-dim dot ≤ ~2.6e10 — fits a long
    * even under ANSI mode. Column-API form; the hot paths below use the
    * codegen'd QuantizedCosine kernel on raw float arrays instead
    * (higher-order lambdas interpret per element).
    */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from quantized vectors; exact-integer dot/norms,
    * then one deterministic double division.
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      sqrt(dotQ(a, a).cast("double") * dotQ(b, b).cast("double"))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); `corpus` is
    * scanned once. Ties broken by neighbor id for determinism. Self-pairs
    * excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int)
      : DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
                           col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
                          col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", SketchFns.quantized_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** k-NN majority-vote label classification — the standard
    * embedding-quality eval (predict each query's label from its k
    * nearest corpus neighbors, compare to the true label). Fully
    * deterministic and oracle-checkable: quantized-integer cosine,
    * neighbor-id tie-breaks in the top-k, and (votes DESC, label ASC)
    * tie-breaks in the majority. Neighbor labels attach by broadcasting
    * the (queries × k)-row neighbor table into the corpus scan — the
    * corpus label column is read, never shuffled.
    */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val nbrs = bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val labeled = corpus.select(col("vec_id").as("neighbor_id"),
        col("label").as("nbr_label"))
      .join(broadcast(nbrs), "neighbor_id")
    val votes = labeled.groupBy(col("query_id"), col("nbr_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("nbr_label"))
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("label").as("true_label"))), "query_id")
      .select(col("query_id"), col("true_label"),
              col("nbr_label").as("predicted_label"), col("votes"),
              (col("nbr_label") === col("true_label")).as("correct"))
  }

  /** Coarse IVF cell id: sign bits of the first `bits` dimensions
    * (an axis-aligned hyperplane quantizer — deterministic, needs no
    * training pass; swap in k-means centroids for a data-adaptive one).
    */
  def ivfCell(e: Column, bits: Int = 4): Column =
    (0 until bits).map { j =>
      when(element_at(e, j + 1) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce((a, b) => a + b)

  /** Approximate top-k with multi-probe: each query scans every cell
    * within Hamming distance `probeRadius` of its own (radius 1 ⇒
    * bits+1 of the 2^bits cells). Scan cost ≈ (probed/2^bits) of the
    * corpus; recall vs [[bruteForceTopK]] is measured in the IVF spec —
    * sign-bit cells split true neighbors across adjacent cells often
    * enough that single-probe recall is poor (~0.14 on the test corpus),
    * radius-1 multi-probe is the standard fix.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 4,
              probeRadius: Int = 1): DataFrame =
    probedTopK(
      probeFanout(queries, bits, probeRadius),
      corpus.select(col("vec_id").as("neighbor_id"),
                    col("embedding").as("cv"),
                    ivfCell(col("embedding"), bits).as("cell")),
      k)

  /** Queries fanned out to their multi-probe cells: one row per
    * (query, probed cell), columns (query_id, qv, cell). Shared by
    * [[ivfTopK]] and [[graft.ext.AnnIndex.topK]] so the probe set is
    * identical by construction, not by parallel code.
    */
  private[ext] def probeFanout(queries: DataFrame, bits: Int,
                               probeRadius: Int): DataFrame = {
    val masks = (0 until (1 << bits))
      .filter(m => Integer.bitCount(m) <= probeRadius)
    queries.select(col("vec_id").as("query_id"),
                   col("embedding").as("qv"),
                   ivfCell(col("embedding"), bits).as("qcell"))
      .withColumn("cell",
        explode(array(masks.map(m => col("qcell").bitwiseXOR(lit(m))): _*)))
      .select(col("query_id"), col("qv"), col("cell"))
  }

  /** Score a probe fan-out against a celled corpus and take top-k per
    * query — the one implementation of the IVF tie-break/quantization
    * contract, regardless of where the corpus cells came from (computed
    * in-query, or read back from a partition-pruned index layout).
    */
  private[ext] def probedTopK(probes: DataFrame, celledCorpus: DataFrame,
                              k: Int): DataFrame = {
    val scored = celledCorpus.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", SketchFns.quantized_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              col("cosine"), col("cell"))
  }

  /** Data-adaptive IVF: coarse cells from k-means centroids instead of
    * axis signs. Each query probes its `probes` nearest centroids —
    * k-means cells track the data distribution, so recall at equal scan
    * fraction beats the sign-bit quantizer (measured in the IVF spec).
    *
    * Scale discipline: training fits on a DETERMINISTIC bounded sample
    * (the `maxTrainRows` ids with the smallest md5 — [[graft.functions
    * .BottomKByMd5]], mergeable and replayable), never the full corpus;
    * the fitted centroid set (nCells × dim doubles) rides into a native
    * codegen'd kernel ([[graft.functions.NearestCentroids]]) that
    * assigns cells in one fused pass — the interpreted
    * aggregate/zip_with form it replaces re-evaluated a boxed lambda per
    * centroid per row, and the in-query full-corpus MLlib fit it
    * replaces re-trained on every invocation. Fully deterministic: the
    * sample, the init, and the tie-breaks are all content-addressed.
    */
  def ivfKmeansTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    nCells: Int = 16, probes: Int = 3,
                    maxTrainRows: Int = 2048): DataFrame = {
    val centroids = fitCellCentroids(corpus, nCells, maxTrainRows)
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        explode(SketchFns.nearest_centroids(col("embedding"), centroids,
          probes)).as("cell"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"),
        element_at(SketchFns.nearest_centroids(col("embedding"), centroids,
          1), 1).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", SketchFns.quantized_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic bounded training sample: the `maxTrainRows` vectors
    * with the smallest md5-of-id ([[graft.functions.BottomKByMd5]] —
    * mergeable, order-independent, so the sample and every model fitted
    * on it are identical no matter how the corpus is partitioned or how
    * large it grows), returned in md5-of-id order — a pseudo-random,
    * partition-independent shuffle that makes "first k points" a valid
    * k-means init. Bounded by construction, so collecting it to the
    * driver for local Lloyd iterations is scale-safe (maxTrainRows × dim
    * doubles); distributed k-means over a driver-sized sample would pay
    * one Spark job PER ITERATION in scheduling alone. Shared by
    * [[ivfKmeansTopK]], [[pqTopK]], and [[semanticDedupKmeans]].
    */
  private def md5Sample(corpus: DataFrame,
                        maxTrainRows: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampler = new graft.functions.BottomKByMd5[Long](maxTrainRows, identity)
    val sampleIds = corpus.select(col("vec_id")).as[Long]
      .select(sampler.toColumn).head().toSet
    corpus.filter(col("vec_id").isInCollection(sampleIds))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(r => graft.functions.SketchKernels.hex(
        java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))))
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
  }

  /** Coarse k-means cell centroids fitted on the [[md5Sample]]. */
  private[ext] def fitCellCentroids(corpus: DataFrame, nCells: Int,
                                    maxTrainRows: Int): Array[Array[Double]] =
    lloyd(md5Sample(corpus, maxTrainRows), nCells, iterations = 8)

  /** PQ codebooks: one local Lloyd run per subspace over the SAME
    * [[md5Sample]] rows. Shared by [[pqTopK]] (train+apply in one query)
    * and the frozen-model generator behind [[ivfKmeansApply]]/[[pqApply]].
    */
  private[ext] def fitPqCodebooks(corpus: DataFrame, subspaces: Int,
      codebookSize: Int, maxTrainRows: Int): Array[Array[Array[Double]]] = {
    val sample = md5Sample(corpus, maxTrainRows)
    val dim = sample.head.length
    require(dim % subspaces == 0,
      s"dim $dim not divisible into $subspaces subspaces")
    val ds = dim / subspaces
    Array.tabulate(subspaces) { s =>
      lloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * ds, (s + 1) * ds)),
        codebookSize, iterations = 8)
    }
  }

  /** Embedding floor-quantized to integer ten-thousandths, kept as
    * ARRAY<FLOAT> (|x|·10⁴ < 2²⁴, so every value is float-exact). The
    * frozen-model apply paths assign cells/codes on THIS vector against
    * integer centroids, which makes every squared-L2 distance an
    * integer-valued double — exact, summation-order-independent, and
    * therefore bit-identical in any engine (the train-time kernels
    * assign on raw floats, where double-rounding is order-sensitive and
    * only reproducible within one engine).
    */
  private def quantFloat(e: Column): Column =
    transform(e, x => floor(x.cast("double") * 10000d + 0.5d).cast("float"))

  /** IVF apply half under a FROZEN centroid table (integer
    * ten-thousandths): cell assignment + multi-probe + exact re-score,
    * no training — the serve-time path of [[ivfKmeansTopK]] once a model
    * is trained and pinned (train once, serve anywhere). Assignment is
    * integer-exact (see [[quantFloat]]), so results are oracle-checkable
    * end-to-end; output mirrors [[ivfTopK]] (`cell` column included).
    */
  def ivfKmeansApply(queries: DataFrame, corpus: DataFrame, k: Int,
                     centroidsQ: Array[Array[Long]], probes: Int): DataFrame = {
    val cents = centroidsQ.map(_.map(_.toDouble))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"),
      explode(SketchFns.nearest_centroids(quantFloat(col("embedding")),
        cents, probes)).as("cell"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"),
      element_at(SketchFns.nearest_centroids(quantFloat(col("embedding")),
        cents, 1), 1).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", SketchFns.quantized_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("cell").cast("int").as("cell"))
  }

  /** Plain deterministic Lloyd iterations over a local sample: init from
    * the first k points (the caller hands the sample in md5-shuffled
    * order), assign by squared L2 with ties to the lower index — the same
    * rule as [[graft.functions.NearestCentroids]] — and keep a centroid
    * unchanged if its cell empties.
    */
  private def lloyd(points: Array[Array[Double]], k: Int,
                    iterations: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "empty training sample")
    val dim = points.head.length
    var centroids = points.take(k).map(_.clone())
    val kk = centroids.length
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      points.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0d
          var i = 0
          while (i < dim) {
            val diff = p(i) - centroids(c)(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centroids
  }

  /** Product-quantization (PQ) approximate k-NN — the memory-compression
    * scale path for ANN serving (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): each corpus vector is stored
    * as `subspaces` small codes plus one exact norm (default 16 codes
    * over 16-entry codebooks ≈ 16 bytes + 8 vs 256 bytes of floats), and
    * query scoring reads ONLY the codes through a per-query lookup table
    * (asymmetric distance computation, ADC).
    *
    * Determinism mirrors [[ivfKmeansTopK]]'s contract: a
    * bottom-k-by-md5 training sample (bounded by construction — the only
    * collect), one local Lloyd run PER SUBSPACE over the same sample,
    * centroids quantized to integer ten-thousandths. Encoding, the ADC
    * lookup tables, and all partial dots/norms are then exact longs; the
    * single float op is the final cosine division — so codes, scores and
    * results are partition- and replay-invariant.
    *
    * Retrieval quality: ADC ranks candidates, and the top `rerank · k`
    * per query are re-scored with the EXACT quantized cosine on the
    * original vectors (one keyed join back to the corpus). The final
    * ordering among survivors is exact — PQ approximation only decides
    * which candidates reach the re-rank pool (recall measured in
    * ExtSpec).
    *
    * Scale shape: the corpus is encoded in one map-side pass and scored
    * as a broadcast join streamed over the CODES — corpus floats never
    * shuffle; the re-rank join touches rerank·k·|queries| rows. At
    * 100 TB the coded table (vec_id, 16 bytes of codes, one long norm)
    * is ~10× smaller than the float corpus and is the only thing the
    * query path scans.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             subspaces: Int = 16, codebookSize: Int = 16,
             rerank: Int = 4, maxTrainRows: Int = 2048): DataFrame = {
    require(k > 0 && subspaces > 0 && codebookSize > 1 && rerank >= 1)
    // independent codebook per subspace, trained on the same sample rows
    val codebooks: Array[Array[Array[Double]]] =
      fitPqCodebooks(corpus, subspaces, codebookSize, maxTrainRows)
    val ds = codebooks.head.head.length
    // integer ten-thousandths of every centroid
    val cq: Array[Array[Array[Long]]] =
      codebooks.map(_.map(_.map(x => math.floor(x * 10000d + 0.5d).toLong)))
    // encode: per subspace, nearest centroid of the slice (native kernel)
    val codeCols = (0 until subspaces).map { s =>
      element_at(SketchFns.nearest_centroids(
        slice(col("embedding"), s * ds + 1, ds), codebooks(s), 1), 1)
        .cast("int")
    }
    pqScore(queries, corpus, k, rerank, codeCols, cq)
  }

  /** Cluster-balanced diversity sampling — the "select a representative
    * subset" curation stage (SemDeDup's complement: instead of dropping
    * near-duplicates, KEEP a bounded, spread-out sample): assign every
    * vector to its frozen k-means cell (integer-exact, the q178
    * discipline) and keep the `perCell` members with the smallest
    * md5-of-id per cell — content-addressed, so the sample is identical
    * under any partitioning or corpus growth ordering.
    *
    * Scale shape: the per-cell take runs through [[graft.functions
    * .BottomKByMd5]] typed aggregation — partial buffers are trimmed to
    * `perCell` entries map-side, so the shuffle carries ≤ perCell ids
    * per partition per cell and the corpus itself NEVER shuffles (a
    * window over cells would re-sort the whole corpus on an
    * nCells-sized key — unusable skew at 100 TB).
    * Output: `cell, vec_id, cell_rank (md5 order), cell_size`.
    */
  def diversitySample(corpus: DataFrame, centroidsQ: Array[Array[Long]],
                      perCell: Int): DataFrame = {
    require(perCell >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroidsQ.map(_.map(_.toDouble))
    val celled = corpus.select(
      element_at(SketchFns.nearest_centroids(quantFloat(col("embedding")),
        cents, 1), 1).as("cell"),
      col("vec_id"))
    val sampler = new graft.functions.BottomKByMd5[(Int, Long)](perCell, _._2)
    celled.as[(Int, Long)]
      .groupByKey(_._1)
      .agg(sampler.toColumn.name("kept"),
           count(lit(1)).as((Encoders.scalaLong)).name("cell_size"))
      .toDF("cell", "kept", "cell_size")
      .select(col("cell").cast("int").as("cell"), col("cell_size"),
        posexplode(col("kept")).as(Seq("pos", "vec_id")))
      .select(col("cell"), col("vec_id"),
        (col("pos") + 1).cast("int").as("cell_rank"), col("cell_size"))
  }

  /** PQ apply half under FROZEN integer codebooks: encode + ADC + exact
    * re-rank, no training — [[pqTopK]]'s serve path once codebooks are
    * pinned. Encoding assigns the [[quantFloat]] slice against the
    * integer centroids, so codes — and with them every ADC score — are
    * integer-exact and oracle-checkable (pqTopK's train-time encoding
    * assigns on raw floats, reproducible only within one engine).
    */
  def pqApply(queries: DataFrame, corpus: DataFrame, k: Int,
              codebooksQ: Array[Array[Array[Long]]], rerank: Int): DataFrame = {
    val subspaces = codebooksQ.length
    val ds = codebooksQ.head.head.length
    val cbD = codebooksQ.map(_.map(_.map(_.toDouble)))
    val codeCols = (0 until subspaces).map { s =>
      element_at(SketchFns.nearest_centroids(
        slice(quantFloat(col("embedding")), s * ds + 1, ds), cbD(s), 1), 1)
        .cast("int")
    }
    pqScore(queries, corpus, k, rerank, codeCols, codebooksQ)
  }

  /** Shared PQ scoring tail: coded corpus + per-query ADC lookup tables
    * (`cq` = integer ten-thousandths centroids), broadcast ADC join over
    * the codes, approx top `rerank·k` pool, exact quantized-cosine
    * re-rank. `codeCols` is the per-subspace encode column — the ONE
    * thing train-path and frozen-apply-path PQ differ on.
    */
  private def pqScore(queries: DataFrame, corpus: DataFrame, k: Int,
      rerank: Int, codeCols: Seq[Column],
      cq: Array[Array[Array[Long]]]): DataFrame = {
    val subspaces = cq.length
    val codebookSize = cq.head.length
    val ds = cq.head.head.length
    // the stored norm² is EXACT (one long per vector, computed from the
    // original floats at encode time) — PQ approximation is confined to
    // the dot product; an approximate norm would additionally distort
    // every score by the per-vector reconstruction error
    val vQuant = transform(col("embedding"),
      x => floor(x.cast("double") * 10000d + 0.5d).cast("long"))
    val coded = corpus
      .select(col("vec_id").as("neighbor_id"),
        array(codeCols: _*).as("codes"),
        aggregate(transform(vQuant, x => x * x), lit(0L), (a, v) => a + v)
          .as("cn2"))
    // query-side ADC lookup table: partial integer dot of each query
    // slice with every centroid of that subspace (m × codebookSize longs
    // per query — broadcast with the query set)
    val qQuant = vQuant
    val lutCols = (0 until subspaces).map { s =>
      val qs = slice(qQuant, s * ds + 1, ds)
      array((0 until codebookSize).map { j =>
        aggregate(zip_with(qs, typedLit(cq(s)(j).toSeq), (x, y) => x * y),
          lit(0L), (a, v) => a + v)
      }: _*)
    }
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), array(lutCols: _*).as("lut"),
      aggregate(transform(qQuant, x => x * x), lit(0L), (a, v) => a + v)
        .as("qn2"))
    // ADC scoring over codes only; corpus floats are not in this join
    val scored = coded.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", SketchFns.adc_dot(col("codes"), col("lut")))
      .withColumn("approx", col("adc").cast("double") /
        sqrt(col("cn2").cast("double") * col("qn2").cast("double")))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val pool = scored
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * rerank)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    // exact re-rank of the survivor pool on the original vectors
    val withVec = pool.join(
        corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv")), "neighbor_id")
      .withColumn("cosine", SketchFns.quantized_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    withVec.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Semantic deduplication (SemDeDup — Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * 2023): partition the corpus into coarse cells, compare embeddings
    * ONLY within a cell, and drop every vector that has a ≥-threshold
    * cosine near-duplicate with a SMALLER id in its cell — the
    * embedding-space complement of the lexical MinHash dedup (q28): it
    * removes semantic re-tellings that share no shingles.
    *
    * Canonical rule (deterministic, oracle-expressible): a vector is
    * dropped iff a smaller-id ≥-threshold neighbor shares its cell;
    * `canonical_id` is the SMALLEST such neighbor — a direct
    * attribution, not a transitive cluster root (that's the [[Dedup]]
    * connected-components job's contract).
    *
    * Scale shape: one cell-keyed exchange of (id, vec); within-cell
    * verification is the same codegen'd [[graft.functions.SketchFns
    * .bucket_cosine_pairs]] kernel as [[denseNearDupPairs]] — candidate
    * pairs never exist as rows, and the pair stream that leaves the
    * kernel is already threshold-filtered. Never all-pairs: cost is
    * Σ_cell |cell|², which the SemDeDup recipe keeps near-linear by
    * growing the cell count with the corpus (k ∝ √N ⇒ E|cell| = √N
    * fixed work per cell; at 100 TB the celled corpus would be written
    * partitioned by cell and each task deduplicates one partition).
    * Per-cell memory is the collect_list of one cell's vectors — the
    * accepted dense-bucket bound, sized by the same k knob.
    *
    * Output: (vec_id, cell, is_kept, canonical_id) for EVERY corpus row
    * — the kept set is `is_kept`, the audit trail of each drop is its
    * canonical attribution.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    cell: Column): DataFrame = {
    val celled = corpus.select(col("vec_id"), col("embedding"),
      cell.as("cell"))
    val dropped = celled
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("id"), col("embedding").as("vec"))))
        .as("entries"))
      .filter(size(col("entries")) > 1)
      .select(explode(
        SketchFns.bucket_cosine_pairs(col("entries"), threshold)).as("p"))
      // entries are id-sorted, so the kernel's id_a < id_b IS the
      // keep-first orientation; min over colliding elders = canonical
      .groupBy(col("p.id_b").as("vec_id"))
      .agg(min(col("p.id_a")).as("canon"))
    celled
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("canon").isNull.as("is_kept"),
        coalesce(col("canon"), col("vec_id")).as("canonical_id"))
  }

  /** Contrastive triplet mining over the embedding corpus: for every
    * anchor with at least one ≥`threshold`-cosine neighbor in its
    * coarse cell, emit (anchor, positive, hard negatives) — the
    * training-pair product a contrastive/embedding-finetune pipeline
    * consumes. The positive is the anchor's HIGHEST-cosine in-cell
    * neighbor at or above the threshold; the negatives are the top
    * `negatives` in-cell neighbors strictly BELOW it — i.e. hard
    * negatives by construction: same coarse region, highest
    * sub-threshold similarity (the mining rule that makes triplet
    * losses learn anything; random negatives are trivially separable).
    * All ties break by candidate id, so the triplet set is a pure
    * function of the corpus.
    *
    * Scale shape: the candidate join is CELL-LOCAL (the [[semanticDedup]]
    * regime — Σ|cell|² work, kept near-linear by growing the cell count
    * with the corpus; swap the sign-bit cell for the k-means celling at
    * production scale), then two keyed windows over anchor-partitioned
    * pairs pick the positive and the negative band — bounded output of
    * ≤ `negatives` rows per anchor, no corpus-wide window anywhere.
    * Cosines ride the exact quantized kernel, so the whole product is
    * hash-comparable against a SQL oracle.
    *
    * Output: (anchor_id, positive_id, pos_cosine, negative_id,
    * neg_rank, neg_cosine) — one row per (anchor, negative rank).
    */
  def contrastiveTriplets(corpus: DataFrame, threshold: Double,
                          negatives: Int, cell: Column): DataFrame = {
    require(negatives >= 1, "need at least one negative per anchor")
    val q = corpus.select(col("vec_id"), col("embedding"), cell.as("cell"))
    val pairs = q.as("a").join(q.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor_id"),
        col("b.vec_id").as("cand_id"),
        SketchFns.quantized_cosine(col("a.embedding"), col("b.embedding"))
          .as("cosine"))
      // the cell-local join + per-pair cosine kernel is the dominant
      // Σ|cell|² stage and feeds BOTH the pos and neg branches below —
      // differently-filtered subtrees that exchange reuse cannot merge;
      // materialize once (the prefixJaccardPairs precedent)
      .localCheckpoint()
    val byAffinity = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val pos = pairs.filter(col("cosine") >= threshold)
      .withColumn("rn", row_number().over(byAffinity))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("cand_id").as("positive_id"),
        col("cosine").as("pos_cosine"))
    val neg = pairs.filter(col("cosine") < threshold)
      .withColumn("neg_rank", row_number().over(byAffinity))
      .filter(col("neg_rank") <= negatives)
      .select(col("anchor_id"), col("cand_id").as("negative_id"),
        col("neg_rank"), col("cosine").as("neg_cosine"))
    pos.join(neg, "anchor_id")
      .select(col("anchor_id"), col("positive_id"), col("pos_cosine"),
        col("negative_id"), col("neg_rank"), col("neg_cosine"))
  }

  /** [[semanticDedup]] with data-adaptive k-means cells — the SemDeDup
    * paper's own configuration (cells from clustering, not axis signs),
    * trained exactly like [[ivfKmeansTopK]]'s quantizer: bounded
    * md5-sample, deterministic local Lloyd, native nearest-centroid
    * assignment. Centroids depend on the fitted model, so this variant
    * is spec-pinned (recall vs the exact [[cosineNearDupPairs]], and ≥
    * the sign-bit celling) rather than SQL-oracle-gated — the q48-vs-q31
    * relationship, replayed for dedup.
    */
  def semanticDedupKmeans(corpus: DataFrame, threshold: Double,
                          nCells: Int = 16,
                          maxTrainRows: Int = 2048): DataFrame = {
    val centroids = fitCellCentroids(corpus, nCells, maxTrainRows)
    semanticDedup(corpus, threshold,
      element_at(SketchFns.nearest_centroids(col("embedding"), centroids, 1),
        1).cast("int"))
  }

  /** Embedding similar/near-duplicate pairs: every corpus pair with
    * cosine ≥ threshold that shares at least one sign-bit LSH band
    * bucket, verified with the exact quantized cosine.
    *
    * Candidate generation is banded random-hyperplane LSH over the
    * 64-bit axis-sign word: 64/bandBits contiguous band tables plus the
    * same windows offset by bandBits/2 (2·64/bandBits tables total,
    * 2^bandBits buckets each — [[graft.functions.SignBandBuckets]]).
    * P[two vectors agree on one sign bit] = 1 − θ/π, so `bandBits` is
    * the precision/recall knob: at near-dup thresholds (≥0.9, bit-agree
    * ≈0.86) wide bands prune almost everything; at weak thresholds like
    * 0.4 (bit-agree ≈0.64) candidate pruning is information-theoretically
    * thin — the offset tables are what carry measured recall to 1.0 on
    * the test corpus (see ExtSpec) while still scanning strictly less
    * than all pairs. The fixed-16-cell all-pairs form this replaces was
    * N²/16 regardless of threshold; here candidate volume tracks the
    * actual collision probability and shrinks exponentially in bandBits.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         bandBits: Int = 4): DataFrame = {
    // physical strategy by banding selectivity (the optimizer move —
    // same logical op, two plans): an unrelated pair collides in some
    // band with probability ~1-(1-2^-bandBits)^tables. Narrow bands
    // (high-recall / weak-threshold configs) collide almost everywhere,
    // so candidate-id joins would materialize nearly all pairs as rows;
    // verifying INSIDE each bucket then beats them. Wide bands collide
    // rarely, and shipping vectors 2·64/bandBits× through the bucket
    // exchange would cost more than fetching them for the few survivors.
    val tables = 2.0 * 64 / bandBits
    val randomCollisionFrac =
      1.0 - math.pow(1.0 - math.pow(2.0, -bandBits), tables)
    if (randomCollisionFrac > 0.05)
      denseNearDupPairs(corpus, threshold, bandBits)
    else
      sparseNearDupPairs(corpus, threshold, bandBits)
  }

  /** Dense-collision plan: (id, vec) ride the ONE bucket exchange
    * (2·64/bandBits copies of the corpus — linear, never quadratic) and
    * a native kernel verifies all pairs inside each bucket, emitting
    * only survivors. Candidate pairs never exist as rows.
    */
  private[ext] def denseNearDupPairs(corpus: DataFrame, threshold: Double,
                                bandBits: Int): DataFrame = {
    val banded = corpus.select(col("vec_id").as("id"),
      col("embedding").as("vec"),
      posexplode(SketchFns.sign_band_buckets(col("embedding"), bandBits))
        .as(Seq("band", "bucket")))
    val buckets = banded
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("vec"))))
        .as("entries"))
      .filter(size(col("entries")) > 1)
    val survivors = buckets
      .select(explode(
        SketchFns.bucket_cosine_pairs(col("entries"), threshold)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.cosine"))
    // duplicates across bands carry bit-identical cosines → keep-any
    survivors.dropDuplicates("id_a", "id_b")
  }

  /** Sparse-collision plan: buckets carry only 8-byte ids; candidate
    * pairs (few, by the selectivity bound) fetch their vectors back by
    * id join and verify with the scalar kernel. Verification precedes
    * the cross-band dedup — re-verifying a pair once per colliding band
    * is cheaper than pushing the candidate stream through a distinct,
    * and collision multiplicity concentrates on the pairs that survive
    * anyway.
    */
  private[ext] def sparseNearDupPairs(corpus: DataFrame, threshold: Double,
                                 bandBits: Int): DataFrame = {
    val banded = corpus.select(col("vec_id").as("id"),
      posexplode(SketchFns.sign_band_buckets(col("embedding"), bandBits))
        .as(Seq("band", "bucket")))
    val verified = Lsh.bucketPairsRaw(banded)
      .join(corpus.select(col("vec_id").as("id_a"),
        col("embedding").as("va")), "id_a")
      .join(corpus.select(col("vec_id").as("id_b"),
        col("embedding").as("vb")), "id_b")
      .withColumn("cosine", SketchFns.quantized_cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
    Lsh.dedup(verified)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding outlier audit: per label, the `k` vectors FARTHEST from
    * their own label's centroid — the mislabeled/noise-pruning pass an
    * embedding-curation pipeline runs before contrastive training
    * (the distance-to-class-center filter of CLIP-score-style cleaning,
    * on the corpus' own geometry).
    *
    * Exactness (the q146 centroid discipline, extended to distances):
    * vectors quantize to integer ten-thousandths; the label centroid is
    * kept as the RATIONAL (S_k, n) — never divided — and the squared
    * L2 distance is cleared of denominators:
    * d2·n² = Σ_k (n·q_k − S_k)², an exact integer computed in
    * decimal(38,0) (a 1e9-vector label at dim 64 peaks ~1e35 ≪ 10^38).
    * Ranking compares the exact decimals; the ONE double conversion is
    * the emitted `dist2_scaled` (decimal→double is correctly rounded in
    * both engines — q146's dot discipline).
    *
    * Scale shape: the centroid census explodes positions once
    * (map-side partial sums; labels×dim reduce rows), the centroid
    * table (#labels rows) broadcasts back, distances are map-side
    * zip_with, and only (label, vec_id, d2) enters the per-label
    * ranking. The rank window partitions on `label` — fine while
    * labels × corpus/label rows fit a task's sort spill; at 100 TB
    * swap the window for a per-label TopKByScore aggregate on the
    * micro-quantized distance ([[graft.functions.TopKByScore]], the
    * q96 pattern) so each partition forwards ≤ k candidates.
    *
    * Output: (label, vec_id, out_rank, n_label, dist2_scaled), rank 1 =
    * farthest, `dist2_scaled` = d2·n²·10⁸ in quantized units.
    */
  def outlierAudit(embeddings: DataFrame, k: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val sums = embeddings
      .select(col("label"), posexplode(quantize(col("embedding")))
        .as(Seq("pos", "qv")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("qv")).as("s"))
    val centroids = sums.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"),
        col("s")))), c => c("s")).as("cent"))
    val counts = embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n_label"))
    val d2 = embeddings
      .select(col("label"), col("vec_id"), quantize(col("embedding")).as("q"))
      .join(broadcast(centroids), "label")
      .join(broadcast(counts), "label")
      .withColumn("d2", aggregate(
        zip_with(col("q"), col("cent"),
          (x, s) => (x * col("n_label") - s).cast(dec) *
                    (x * col("n_label") - s)),
        lit(0).cast(dec), (a, v) => a + v))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("d2").desc, col("vec_id"))
    d2.withColumn("out_rank", row_number().over(w))
      .filter(col("out_rank") <= k)
      .select(col("label"), col("vec_id"),
        col("out_rank").cast("int").as("out_rank"), col("n_label"),
        col("d2").cast("double").as("dist2_scaled"))
  }
}
