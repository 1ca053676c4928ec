package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch kernels for the dedup operators.
  *
  * Why native expressions and not higher-order functions: Spark's
  * `transform`/`aggregate` lambdas have NO codegen path — they evaluate
  * interpreted with per-element boxing, and Catalyst's CollapseProject
  * happily duplicates them into every consumer. A 128-permutation MinHash
  * over ~500 shingles per document costs ~64k modular ops/row; interpreted
  * that dominated the whole benchmark (~18 s at sf0.1), while these
  * JIT-compiled loops run it in well under a second. Each expression's
  * `doGenCode` emits a single call into [[SketchKernels]], so the
  * surrounding whole-stage codegen span stays intact and Janino never sees
  * the loop bodies.
  */
object SketchKernels extends Serializable {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Lookup-table hex encoding — "%02x".format per byte costs a full
    * format-string parse per call and dominates per-row digest work.
    */
  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  // precompiled per-JVM: Pattern.compile per row would dominate the
  // normalization kernel
  private val punctRun = java.util.regex.Pattern.compile("[.,;:!?'\"()#]")
  private val spaceRun = java.util.regex.Pattern.compile("\\s+")

  /** Pretraining text normalization: NFC → lowercase (ROOT locale) →
    * strip sentence punctuation → collapse whitespace runs → trim. The
    * step order is the contract — the DuckDB oracle twin is
    * `trim(regexp_replace(regexp_replace(lower(nfc_normalize(x)), punct,
    * '', 'g'), '\s+', ' ', 'g'))`, byte-identical on ASCII; non-ASCII
    * lowercasing follows Java's ROOT locale (documented, deterministic).
    */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val noPunct = punctRun.matcher(lower).replaceAll("")
    val collapsed = spaceRun.matcher(noPunct).replaceAll(" ").trim
    UTF8String.fromString(collapsed)
  }

  /** One-pass quality score — the native kernel behind
    * [[graft.ext.TextAnalysis.qualityScore]]. Bit-exact twin of the
    * Column formula it replaces (and of the DuckDB oracle): character
    * count, single-space word segmentation (trailing/empty segments
    * kept, Spark split limit=-1 semantics), stopword membership,
    * sentence-punctuation and uppercase counts — all from ONE byte scan
    * (the ASCII classes [.,;:!?] / [A-Z] / 0x20 never match UTF-8
    * continuation bytes; the character count is numChars), then the
    * exact weighted sum with the same left-associated double arithmetic
    * and floor(x·1e4+0.5) grid quantization. Replaces three regex
    * passes and a higher-order stopword filter per row.
    */
  def qualityScore(s: UTF8String): Double = {
    val nc = s.numChars().toDouble
    if (nc == 0) return 0d
    val b = s.getBytes
    var spaces = 0; var punct = 0; var upper = 0; var nstop = 0
    var segStart = 0
    // the five stopwords of the scoring contract: the a of and to
    def isStop(st: Int, en: Int): Boolean = (en - st) match {
      case 1 => b(st) == 'a'
      case 2 => (b(st) == 'o' && b(st + 1) == 'f') ||
                (b(st) == 't' && b(st + 1) == 'o')
      case 3 => (b(st) == 't' && b(st + 1) == 'h' && b(st + 2) == 'e') ||
                (b(st) == 'a' && b(st + 1) == 'n' && b(st + 2) == 'd')
      case _ => false
    }
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == ' ') {
        spaces += 1
        if (isStop(segStart, i)) nstop += 1
        segStart = i + 1
      } else if (c == '.' || c == ',' || c == ';' || c == ':' ||
                 c == '!' || c == '?') punct += 1
      else if (c >= 'A' && c <= 'Z') upper += 1
      i += 1
    }
    if (isStop(segStart, b.length)) nstop += 1
    val nw = (spaces + 1).toDouble
    val meanWordLen = (nc - (nw - 1d)) / nw
    val lengthOk = if (nc >= 100d && nc <= 10000d) 1d else 0.3
    val wordLenOk = if (meanWordLen >= 3d && meanWordLen <= 10d) 1d else 0.4
    val raw = 0.35 * lengthOk + 0.25 * wordLenOk +
      0.2 * math.min(nstop / nw * 5d, 1d) +
      0.1 * (1d - punct / nc) + 0.1 * (1d - upper / nc)
    math.floor(raw * 10000d + 0.5d) / 10000d
  }

  /** xxhash64 (seed 42) of a UTF8String's bytes — same function Spark's
    * xxhash64 SQL expression applies to string input, so results are
    * interchangeable with SQL-computed hashes.
    */
  def xx64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  /** Distinct hashed word n-gram shingles of a text (split on single
    * spaces, n-gram join with spaces, xxhash64).
    */
  def hashedShingles(text: UTF8String, n: Int): Array[Long] = {
    val words = text.split(UTF8String.fromString(" "), -1)
    val count = math.max(words.length - n + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](math.min(n, words.length - i) * 2 - 1)
      var j = 0
      var p = 0
      while (j < n && i + j < words.length) {
        if (j > 0) { parts(p) = UTF8String.fromString(" "); p += 1 }
        parts(p) = words(i + j); p += 1
        j += 1
      }
      val h = xx64(UTF8String.concat(parts: _*))
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Intersection of two ASCENDING-sorted long arrays by linear merge —
    * O(|a|+|b|) with no per-call hash set (`array_intersect` builds one
    * per ROW, which dominates when the operator evaluates millions of
    * times over adjacency lists). Inputs must be sorted and duplicate-
    * free (both hold for `sort_array(collect_list(...))` over distinct
    * edges); output is sorted.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var m = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(m) = x; m += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private[functions] def splitmix64(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fixed per-permutation seeds (same derivation for every run). */
  def perms(numHashes: Int): Array[Long] = {
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      seeds(i) = splitmix64(0x5eed0000L + i)
      i += 1
    }
    seeds
  }

  /** MinHash signature from hashed shingles: sig_i = min over shingles of
    * splitmix64(h XOR seed_i). splitmix64 is a well-mixed 64-bit
    * bijection, so each seed induces an (approximately) independent
    * uniform ordering of the shingle space — the property minhash needs:
    * P[sig_i(A) == sig_i(B)] = J(A,B). An affine (a*h+b) mod p family
    * over a domain much smaller than p is monotone in h for most
    * coefficient draws (no wrap ⇒ every "permutation" selects the same
    * min shingle), which a sketch-quality property test caught: signature
    * agreement sat far from the true Jaccard.
    */
  def minhash(hashes: Array[Long], seeds: Array[Long]): Array[Long] = {
    val k = seeds.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < k) {
        val v = splitmix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Low byte of each minhash component (see SigBytes). */
  def sigBytes(sig: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](sig.length)
    var i = 0
    while (i < sig.length) {
      out(i) = (sig(i) & 0xffL).toByte
      i += 1
    }
    out
  }

  /** Integer-quantized cosine of two float vectors (see QuantizedCosine). */
  def quantizedCosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
                      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    // bound by the shorter vector: reading past an UnsafeArrayData's
    // length is an unchecked access returning garbage
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val qa = math.floor(a.getFloat(i).toDouble * 10000d + 0.5d).toLong
      val qb = math.floor(b.getFloat(i).toDouble * 10000d + 0.5d).toLong
      dot += qa * qb; na += qa * qa; nb += qb * qb
      i += 1
    }
    // zero-norm guard: 0/0 would be NaN, and Spark sorts NaN LARGEST, so a
    // zero vector would rank as everyone's best neighbor under
    // orderBy(cosine.desc) and pass every >= threshold filter
    if (na == 0L || nb == 0L) 0d
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** Array[Float] overload of [[quantizedCosine]] for JVM-side callers
    * (the streaming semantic-dedup processor) — identical formula, kept
    * adjacent so the two cannot drift; batch/stream cosine parity is a
    * formula identity, not a test hope.
    */
  def quantizedCosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val qa = math.floor(a(i).toDouble * 10000d + 0.5d).toLong
      val qb = math.floor(b(i).toDouble * 10000d + 0.5d).toLong
      dot += qa * qb; na += qa * qa; nb += qb * qb
      i += 1
    }
    if (na == 0L || nb == 0L) 0d
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** PQ asymmetric-distance lookup: Σ_s lut[s][codes[s]] (0-based). */
  def adcDot(codes: org.apache.spark.sql.catalyst.util.ArrayData,
             lut: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(codes.numElements(), lut.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += lut.getArray(i).getLong(codes.getInt(i))
      i += 1
    }
    s
  }

  /** Deterministic ±1 Johnson-Lindenstrauss projection of a quantized
    * float vector to `k` dims: y_j = Σ_i q_i · s(i,j), with q_i =
    * floor(x_i·1e4 + 0.5) and s(i,j) = +1 iff (i·2654435761 + j·40503)
    * mod 1009 is even — the same arithmetic formula the DuckDB oracle
    * evaluates, no stored matrix, no RNG.
    */
  def randomProject(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                    k: Int): Array[Long] = {
    val n = vec.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(vec.getFloat(i).toDouble * 10000d + 0.5d).toLong
      i += 1
    }
    val y = new Array[Long](k)
    var j = 0
    while (j < k) {
      var s = 0L
      i = 0
      while (i < n) {
        val pos = (i * 2654435761L + j * 40503L) % 1009L % 2L == 0L
        s += (if (pos) q(i) else -q(i))
        i += 1
      }
      y(j) = s
      j += 1
    }
    y
  }

  /** Sign-bit band buckets for cosine LSH: bit i of a 64-bit word is
    * sign(vec[i] >= 0); buckets are `bandBits`-wide windows of that word —
    * the contiguous bands first, then the same windows over the word
    * rotated by bandBits/2 (offset bands double the table count, which is
    * what pushes weak-threshold recall to 1; see Similarity scaladoc).
    * Bucket b (contiguous): bits [b*bandBits, (b+1)*bandBits);
    * bucket B+b (offset): bits [(b*bandBits + bandBits/2) mod 64, ...).
    */
  def signBandBuckets(vec: ArrayData, bandBits: Int): Array[Long] = {
    val n = math.min(64, vec.numElements())
    var word = 0L
    var i = 0
    while (i < n) {
      if (vec.getFloat(i) >= 0f) word |= (1L << i)
      i += 1
    }
    val mask = if (bandBits >= 64) -1L else (1L << bandBits) - 1
    // bands must never span beyond the vector's real sign bits: for
    // dim < 64 the pad bits are constant 0, so a band covering them is a
    // (near-)constant bucket — the whole corpus collides there and the
    // banded index silently degenerates into an all-pairs plan. Clamp
    // the band count to the bits that exist (≥1, so very short vectors
    // still hash their whole word once) and rotate the offset tables
    // WITHIN those bits; dim ≥ 64 keeps the original full-word layout
    // bit-for-bit.
    val nb = if (n >= 64) 64 / bandBits else math.max(1, n / bandBits)
    val rot =
      if (n >= 64) java.lang.Long.rotateRight(word, bandBits / 2)
      else if (n == 0) 0L
      else {
        val s = (bandBits / 2) % n
        ((word >>> s) | (word << (n - s))) & ((1L << n) - 1)
      }
    val out = new Array[Long](2 * nb)
    var b = 0
    while (b < nb) {
      out(b) = (word >>> (b * bandBits)) & mask
      out(nb + b) = (rot >>> (b * bandBits)) & mask
      b += 1
    }
    out
  }

  /** Indices of the `probes` nearest centroids (squared L2, ties by
    * centroid index) for a float vector. `centroids` is row-major
    * (nCells × dim). Insertion sort over a probes-sized window — probes
    * is tiny (1..8).
    */
  def nearestCentroids(vec: ArrayData, centroids: Array[Double], dim: Int,
                       probes: Int): Array[Int] = {
    val nCells = centroids.length / dim
    val n = math.min(dim, vec.numElements())
    val p = math.min(probes, nCells)
    val bestD = new Array[Double](p)
    val bestI = new Array[Int](p)
    java.util.Arrays.fill(bestD, Double.MaxValue)
    java.util.Arrays.fill(bestI, Int.MaxValue)
    var c = 0
    while (c < nCells) {
      var d = 0d
      var i = 0
      val off = c * dim
      while (i < n) {
        val diff = vec.getFloat(i).toDouble - centroids(off + i)
        d += diff * diff
        i += 1
      }
      // strict < keeps the smallest index on exact distance ties
      if (d < bestD(p - 1)) {
        var j = p - 1
        while (j > 0 && bestD(j - 1) > d) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d; bestI(j) = c
      }
      c += 1
    }
    java.util.Arrays.copyOf(bestI, p)
  }

  /** All C(f,2) ordered pairs of a sorted id array, as struct rows —
    * native replacement for the nested transform/slice lambda form,
    * whose per-element boxing dominates on dense LSH buckets.
    */
  def pairStructs(ids: ArrayData): ArrayData = {
    val f = ids.numElements()
    // Long math: f*(f-1)/2 wraps negative in Int past ~46K occupants, and
    // a bucket that size means the banding is far too coarse — say so
    // instead of dying with NegativeArraySizeException inside codegen
    val nPairs = f.toLong * (f - 1) / 2
    require(nPairs <= Int.MaxValue,
      s"LSH bucket with $f co-hashed ids would expand to $nPairs pairs; " +
        "run exact dedup upstream or widen the bands")
    val out = new Array[Any](nPairs.toInt)
    var m = 0
    var i = 0
    while (i < f) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < f) {
        out(m) = org.apache.spark.sql.catalyst.InternalRow(a, ids.getLong(j))
        m += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All ≥-threshold cosine pairs inside one LSH bucket: ids sorted
    * ascending, vectors parallel to ids. Quantizes each vector once,
    * then runs the all-pairs integer dot/norm loop and emits only the
    * survivors as (id_a, id_b, cosine) rows — candidate pairs never
    * materialize outside this kernel.
    */
  def bucketCosinePairs(entries: ArrayData, threshold: Double): ArrayData = {
    val f = entries.numElements()
    val ids = new Array[Long](f)
    val vecs = new Array[Array[Long]](f)
    // prefix sums of squares: norm over any shared-length prefix is an
    // O(1) lookup, so mixed-dimension pairs use EXACTLY the same
    // min-length semantics as quantizedCosine — the sparse plan must
    // stay bit-equal to this one
    val prefixSq = new Array[Array[Double]](f)
    var i = 0
    while (i < f) {
      val row = entries.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1)
      val n = v.numElements()
      val q = new Array[Long](n)
      val ps = new Array[Double](n + 1)
      var acc = 0L
      var j = 0
      while (j < n) {
        val x = math.floor(v.getFloat(j).toDouble * 10000d + 0.5d).toLong
        q(j) = x; acc += x * x; ps(j + 1) = acc.toDouble; j += 1
      }
      vecs(i) = q
      prefixSq(i) = ps
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < f) {
      var k = i + 1
      while (k < f) {
        val a = vecs(i); val b = vecs(k)
        val n = math.min(a.length, b.length)
        var dot = 0L
        var j = 0
        while (j < n) { dot += a(j) * b(j); j += 1 }
        val na = prefixSq(i)(n); val nb = prefixSq(k)(n)
        val cos =
          if (na == 0d || nb == 0d) 0d
          else dot.toDouble / math.sqrt(na * nb)
        if (cos >= threshold)
          out += org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(k), cos)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** LSH band buckets of a minhash signature: bucket_b = xxhash64 chain
    * over rows [b*r, (b+1)*r) seeded by the band index (r = len/bands).
    * One pass, no per-band array slicing — replaces `bands` separate
    * xxhash64(slice(sig, ...)) expressions.
    */
  def bandBuckets(sig: ArrayData, bands: Int): Array[Long] = {
    val len = sig.numElements()
    // the SQL surface reaches this without minhashPairs' static require:
    // a non-divisor band count would silently drop the signature tail
    // (skewed collision probabilities), and bands > len would make every
    // bucket the constant band index (all documents collide everywhere)
    require(bands <= len && len % bands == 0,
      s"bands ($bands) must divide the signature length ($len)")
    val r = len / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var i = b * r
      val end = i + r
      while (i < end) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Within-document repetition stats over word n-grams (the
    * Gopher/C4-style curation signals): returns
    * [top-2-gram fraction, duplicated-3-gram fraction]. Counts are keyed
    * by chained xxhash64 of the word hashes — equal word sequences hash
    * equal; cross-gram collisions within one document are ~|grams|²/2⁶⁴.
    */
  def repetitionStats(text: UTF8String): Array[Double] = {
    val words = text.split(UTF8String.fromString(" "), -1)
    val len = words.length
    val wordHashes = new Array[Long](len)
    var i = 0
    while (i < len) { wordHashes(i) = xx64(words(i)); i += 1 }
    def gramCounts(n: Int): java.util.HashMap[Long, Int] = {
      val total = len - n + 1
      val m = new java.util.HashMap[Long, Int](math.max(total, 4) * 2)
      var i = 0
      while (i < total) {
        var h = n.toLong
        var j = 0
        while (j < n) {
          h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(wordHashes(i + j), h)
          j += 1
        }
        m.merge(h, 1, (a, b) => a + b)
        i += 1
      }
      m
    }
    val top2 = {
      val total = len - 1
      if (total <= 0) 0d
      else {
        var top = 0
        val it = gramCounts(2).values().iterator()
        while (it.hasNext) { val c = it.next(); if (c > top) top = c }
        // a gram that occurs once is not repetition: without this guard
        // every short document scores 1/total and trips the threshold
        if (top < 2) 0d else top.toDouble / total
      }
    }
    val dup3 = {
      val total = len - 2
      if (total <= 0) 0d
      else {
        var dup = 0
        val it = gramCounts(3).values().iterator()
        while (it.hasNext) { val c = it.next(); if (c > 1) dup += c }
        dup.toDouble / total
      }
    }
    Array(top2, dup3)
  }

  /** 64-bit SimHash over whitespace-token hashes of the text. */
  def simhash(text: UTF8String): Long = {
    val words = text.split(UTF8String.fromString(" "), -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = xx64(words(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** hashed_shingles(text, n): distinct xxhash64'd word n-grams. */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchKernels.hashedShingles(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.hashedShingles($c, $n));")
  }
  override protected def withNewChildInternal(c: Expression): HashedShingles =
    copy(child = c)
}

/** minhash_signature(hashedShingles, k): k-permutation MinHash. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  @transient private lazy val seeds = SketchKernels.perms(numHashes)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchKernels.minhash(input.asInstanceOf[ArrayData].toLongArray(), seeds))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    val sd = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.minhash($c.toLongArray(), $sd));")
  }
  override protected def withNewChildInternal(c: Expression): MinhashSignature =
    copy(child = c)
}

/** simhash64(text): 64-bit SimHash of the whitespace tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SketchKernels.simhash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.simhash($c);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** band_buckets(sig, bands): per-band LSH bucket hashes (ARRAY<BIGINT>). */
case class BandBuckets(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_buckets requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchKernels.bandBuckets(input.asInstanceOf[ArrayData], bands))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.bandBuckets($c, $bands));")
  }
  override protected def withNewChildInternal(c: Expression): BandBuckets =
    copy(child = c)
}

/** random_project(vec, k): deterministic ±1 JL projection to k dims —
  * see [[SketchKernels.randomProject]] for the formula contract.
  */
case class RandomProject(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "random_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_project requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SketchKernels.randomProject(
      input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k2 = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k2.randomProject($c, $k));")
  }
  override protected def withNewChildInternal(c: Expression): RandomProject =
    copy(child = c)
}

/** quality_score(str): one-pass document quality score in [0,1] on the
  * 1e-4 grid — see [[SketchKernels.qualityScore]] for the contract.
  */
case class QualityScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quality_score requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      SketchKernels.qualityScore(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.qualityScore($c);")
  }
  override protected def withNewChildInternal(c: Expression): QualityScore =
    copy(child = c)
}

/** normalize_text(str): NFC + lowercase + punctuation strip + whitespace
  * collapse — the canonical form normalized-dedup keys on.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.normalizeText($c);")
  }
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

/** pair_structs(sortedIds): all C(f,2) (id_a, id_b) pairs of a bucket's
  * sorted occupant list.
  */
case class PairStructs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
                   StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_structs requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.pairStructs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.pairStructs($c);")
  }
  override protected def withNewChildInternal(c: Expression): PairStructs =
    copy(child = c)
}

/** bucket_cosine_pairs(entries, threshold): all ≥-threshold cosine pairs
  * within one LSH bucket's (id, vec) entries — the dense-candidate
  * verification kernel (see Similarity.cosineNearDupPairs).
  */
case class BucketCosinePairs(child: Expression, threshold: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
                   StructField("id_b", LongType, nullable = false),
                   StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bucket_cosine_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "bucket_cosine_pairs requires ARRAY<STRUCT<BIGINT, ARRAY<FLOAT>>> " +
        s"input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.bucketCosinePairs(input.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $k.bucketCosinePairs($c, $threshold);")
  }
  override protected def withNewChildInternal(c: Expression): BucketCosinePairs =
    copy(child = c)
}

/** repetition_stats(text): [top-2-gram fraction, dup-3-gram fraction]
  * over whitespace words — the within-document repetition signals a
  * Gopher-style quality filter thresholds on.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchKernels.repetitionStats(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.repetitionStats($c));")
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** sign_band_buckets(vec, bandBits): cosine-LSH band buckets over the
  * 64-bit axis-sign word (contiguous + half-band-offset band tables).
  */
case class SignBandBuckets(child: Expression, bandBits: Int)
    extends UnaryExpression {
  require(bandBits > 0 && 64 % bandBits == 0, "bandBits must divide 64")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_band_buckets requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchKernels.signBandBuckets(input.asInstanceOf[ArrayData], bandBits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.signBandBuckets($c, $bandBits));")
  }
  override protected def withNewChildInternal(c: Expression): SignBandBuckets =
    copy(child = c)
}

/** sig_bytes(sig): the low byte of each minhash component, as BINARY —
  * the compact verification signature the STREAMING MinHash dedup
  * shuffles and stores. Component agreement is what the estimator
  * counts, and P[bytes agree | longs differ] = 1/256, so the estimate
  * inflates by at most (1−j)/256 ≈ 0.0008 at j = 0.8 — an order of
  * magnitude under the 128-hash standard error (~0.035) — while state
  * and shuffle shrink 8× (128 B vs 1 KB per signature). The BATCH
  * pipeline keeps full longs: it re-verifies with exact Jaccard anyway.
  */
case class SigBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sig_bytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sig_bytes requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.sigBytes(input.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $k.sigBytes($c.toLongArray());")
  }
  override protected def withNewChildInternal(c: Expression): SigBytes =
    copy(child = c)
}

/** nearest_centroids(vec, probes): indices of the `probes` nearest
  * broadcast centroids by squared L2 (row-major flattened centroid
  * matrix rides along as a codegen reference object — the centroid set
  * is nCells × dim doubles, tiny by construction).
  */
case class NearestCentroids(child: Expression, centroids: Array[Double],
                            dim: Int, probes: Int) extends UnaryExpression {
  require(dim > 0 && probes > 0 && centroids.length % dim == 0)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires ARRAY<FLOAT> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SketchKernels.nearestCentroids(
      input.asInstanceOf[ArrayData], centroids, dim, probes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    val cen = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.nearestCentroids($c, $cen, $dim, $probes));")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

object SketchFns {
  import org.apache.spark.sql.graft.bridge
  def hashed_shingles(text: Column, n: Int): Column =
    bridge.column(HashedShingles(bridge.expression(text), n))
  def minhash_signature(hashes: Column, k: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(hashes), k))
  def simhash64(text: Column): Column =
    bridge.column(SimHash64(bridge.expression(text)))
  def quantized_cosine(a: Column, b: Column): Column =
    bridge.column(QuantizedCosine(bridge.expression(a), bridge.expression(b)))
  def sorted_intersect(a: Column, b: Column): Column =
    bridge.column(SortedIntersect(bridge.expression(a), bridge.expression(b)))
  def band_buckets(sig: Column, bands: Int): Column =
    bridge.column(BandBuckets(bridge.expression(sig), bands))
  def pair_structs(sortedIds: Column): Column =
    bridge.column(PairStructs(bridge.expression(sortedIds)))
  def repetition_stats(text: Column): Column =
    bridge.column(RepetitionStats(bridge.expression(text)))
  def bucket_cosine_pairs(entries: Column, threshold: Double): Column =
    bridge.column(BucketCosinePairs(bridge.expression(entries), threshold))

  /** Pigeonhole chunk structs (chunk, v) of a 64-bit simhash: any pair
    * within Hamming distance maxDistance agrees on ≥1 of the
    * maxDistance+1 chunks. The ONE decomposition shared by the batch
    * ([[graft.ext.Dedup.simhashPairs]]) and streaming
    * ([[graft.streaming.StreamingDedup]]) near-dup paths — their parity
    * depends on it being identical.
    */
  def simhash_chunks(sig: Column, maxDistance: Int): Column = {
    import org.apache.spark.sql.functions._
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    // 1L << 64 wraps to 1; a full-width chunk needs an explicit all-ones
    // mask (maxDistance=0 -> one 64-bit chunk = the whole signature)
    val mask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    array((0 until chunks).map(c =>
      struct(lit(c).as("chunk"),
             shiftrightunsigned(sig, c * bitsPer)
               .bitwiseAND(mask).as("v"))): _*)
  }
  def sig_bytes(sig: Column): Column =
    bridge.column(SigBytes(bridge.expression(sig)))
  def sign_band_buckets(vec: Column, bandBits: Int): Column =
    bridge.column(SignBandBuckets(bridge.expression(vec), bandBits))
  def normalize_text(text: Column): Column =
    bridge.column(NormalizeText(bridge.expression(text)))
  def quality_score(text: Column): Column =
    bridge.column(QualityScore(bridge.expression(text)))
  def adc_dot(codes: Column, lut: Column): Column =
    bridge.column(AdcDot(bridge.expression(codes), bridge.expression(lut)))
  def random_project(vec: Column, k: Int): Column =
    bridge.column(RandomProject(bridge.expression(vec), k))
  def bloom_might_contain(bloom: Column, hash: Column, numHashes: Int): Column =
    bridge.column(BloomMightContain(bridge.expression(bloom),
      bridge.expression(hash), numHashes))
  def nearest_centroids(vec: Column, centroids: Array[Array[Double]],
                        probes: Int): Column = {
    val dim = centroids.head.length
    bridge.column(NearestCentroids(bridge.expression(vec),
      centroids.flatten, dim, probes))
  }
}

/** quantized_cosine(a, b) over float-array embeddings: floor-quantizes to
  * integer ten-thousandths, exact integer dot/norms, one deterministic
  * double division — the native kernel behind graft.ext.Similarity (the
  * higher-order-function form interpreted per element and re-quantized
  * both vectors for every candidate pair).
  */
/** adc_dot(codes, lut): product-quantization asymmetric-distance lookup —
  * Σ_s lut[s][codes[s]]. The native form of
  * `aggregate(zip_with(codes, lut, (c, l) -> l[c+1]), 0, +)`, which
  * interprets two lambdas per element on the ANN serving path's hottest
  * loop (|corpus| · |queries| evaluations).
  */
case class AdcDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "adc_dot requires ARRAY<INT> codes and ARRAY<ARRAY<BIGINT>> lut, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(SketchKernels.adcDot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $k.adcDot($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}

/** sorted_intersect(a, b): merge-intersection of two sorted long arrays.
  * See [[SketchKernels.sortedIntersect]] for the precondition. PRECONDITION
  * (ad-hoc SQL callers too): both arrays ascending-sorted — unsorted input
  * returns an arbitrary subset of the true intersection, not an error.
  * Null ELEMENTS are rejected at analysis time: `ArrayData.getLong` on a
  * null slot would silently read 0, so only `containsNull = false` arrays
  * (e.g. `sort_array(collect_set(...))`, `array_sort` of non-null data)
  * type-check.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l @ ArrayType(LongType, _), r @ ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "sorted_intersect requires arrays that cannot contain null " +
            "elements (a null slot would silently read as 0); got " +
            s"${l.catalogString} and ${r.catalogString} with " +
            "containsNull = true — wrap with array_compact or build via " +
            "sort_array(collect_set(...))")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect requires two ARRAY<BIGINT> inputs, got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.sortedIntersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $k.sortedIntersect($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

case class QuantizedCosine(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantized_cosine requires two ARRAY<FLOAT> inputs, got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(SketchKernels.quantizedCosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[SketchKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $k.quantizedCosine($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}
