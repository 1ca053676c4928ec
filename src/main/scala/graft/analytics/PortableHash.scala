package graft.analytics

/** DuckDB-portable re-derivations of the two hash kernels that kept
  * q29/q36/q47 rows-only for nine rounds — "not reproducible in ANSI
  * SQL" turned out to be a wraparound-arithmetic problem, not an
  * impossibility:
  *
  *  - **xxhash64 (seed 42 — Spark SQL's default)**: 64-bit wrap
  *    multiplication ports to HUGEINT via 32-bit half-word products
  *    (`a·b mod 2^64 = aLo·bLo + ((aLo·bHi + aHi·bLo) mod 2^32)·2^32`,
  *    every intermediate < 2^97 — a naive HUGEINT product of two
  *    64-bit operands can overflow even 128 bits), rotations via
  *    div/mod by powers of two, XOR natively. The < 32-byte tail path
  *    (3 unrolled 8-byte lanes + 4-byte + 3 byte steps + avalanche) is
  *    generated as a CTE chain; ≥ 32-byte inputs raise a loud
  *    `error()` rather than a silent wrong hash — the vocabulary this
  *    gates is whitespace WORDS, and the full 4-accumulator stripe
  *    loop would be mechanical but unexercised. Verified byte-for-byte
  *    against Spark's `xxhash64` on empty/1/4/7/8/9/16/17/31-byte
  *    vectors before wiring; the oracle gate then re-verifies every
  *    corpus word every round (a single hash bit off moves signatures,
  *    votes, and the pair set — there is no partial credit).
  *  - **poly/winnow (mod 1e9+7)**: no wraparound at all (products
  *    < 2^35), so the k-gram rolling hash and the MOSS winnowing
  *    selection (rightmost window minimum, consecutive-index dedup)
  *    are plain BIGINT list comprehensions.
  *
  * Both builders emit CTE FRAGMENTS the q29/q36/q47 oracles splice, so
  * the one validated implementation serves all three gates. The house
  * constant-interpolation discipline (q168 Lehmer multipliers) applies:
  * the primes below are the published xxHash constants, not values
  * computed by the kernel under test.
  */
private[analytics] object PortableHash {

  private val P64 = "18446744073709551616" // 2^64
  private val P32 = "4294967296" // 2^32
  private val PRIME1 = "11400714785074694791"
  private val PRIME2 = "14029467366897019727"
  private val PRIME3 = "1609587929392839161"
  private val PRIME4 = "9650029242287828579"
  private val PRIME5 = "2870177450012600261"

  private def mul64(a: String, b: String): String =
    s"((($a) % $P32) * (($b) % $P32)" +
      s" + (((($a) % $P32) * (($b) // $P32)" +
      s" + (($a) // $P32) * (($b) % $P32)) % $P32) * $P32) % $P64"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    val hi = BigInt(1) << r
    s"((($x) % $lo) * $hi + (($x) // $lo))"
  }

  private def xor(a: String, b: String): String =
    s"xor(CAST(($a) AS HUGEINT), CAST(($b) AS HUGEINT))"
  private def add(a: String, b: String): String = s"((($a) + ($b)) % $P64)"
  private def shr(x: String, n: Int): String =
    s"(($x) // ${BigInt(1) << n})"

  /** Byte `i` (0-based expression) of the hex column `hx`. */
  private def byteAt(i: String): String =
    s"(strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"

  private def readLe(pos: String, nBytes: Int): String =
    (0 until nBytes).map(k =>
      s"CAST(${byteAt(s"$pos+$k")} AS HUGEINT) * ${BigInt(256).pow(k)}")
      .mkString("(", " + ", ")")

  private def lane(h: String, pos: String): String = {
    val k1 = mul64(rotl(mul64(readLe(pos, 8), PRIME2), 31), PRIME1)
    add(mul64(rotl(xor(h, k1), 27), PRIME1), PRIME4)
  }

  /** CTE chain from a relation `vocab(word)` to `wh(word, h)` where `h`
    * is the UNSIGNED xxhash64(word, seed 42) as HUGEINT (callers map to
    * Spark's signed long with [[toSigned]] where needed). Splice after
    * a `vocab` CTE; continues with a trailing comma.
    */
  def xx64Ctes: String = s"""
        x0 AS (SELECT word, hex(encode(word)) AS hx,
                 CASE WHEN octet_length(encode(word)) >= 32
                      THEN CAST(error('xx64 oracle handles words < 32 bytes')
                        AS BIGINT)
                      ELSE octet_length(encode(word)) END AS len
               FROM vocab),
        x1 AS (SELECT word, hx, len,
                 CAST((${add(s"42 + $PRIME5", "len")}) AS HUGEINT) AS h
               FROM x0),
        xl1 AS (SELECT word, hx, len,
                 CASE WHEN len >= 8 THEN ${lane("h", "0")} ELSE h END AS h
                FROM x1),
        xl2 AS (SELECT word, hx, len,
                 CASE WHEN len >= 16 THEN ${lane("h", "8")} ELSE h END AS h
                FROM xl1),
        xl3 AS (SELECT word, hx, len,
                 CASE WHEN len >= 24 THEN ${lane("h", "16")} ELSE h END AS h
                FROM xl2),
        x4 AS (SELECT word, hx, len, (len // 8) * 8 AS p8,
                 CASE WHEN len % 8 >= 4 THEN
                   ${add(mul64(rotl(xor("h",
                     mul64(readLe("(len // 8) * 8", 4), PRIME1)), 23),
                     PRIME2), PRIME3)}
                 ELSE h END AS h FROM xl3),
        x5 AS (SELECT word, hx, len,
                 p8 + CASE WHEN len % 8 >= 4 THEN 4 ELSE 0 END AS pb, h
               FROM x4),
        xb1 AS (SELECT word, hx, len, pb,
                 CASE WHEN len - pb >= 1 THEN ${byteStep("pb")}
                 ELSE h END AS h FROM x5),
        xb2 AS (SELECT word, hx, len, pb,
                 CASE WHEN len - pb >= 2 THEN ${byteStep("pb+1")}
                 ELSE h END AS h FROM xb1),
        xb3 AS (SELECT word, hx, len, pb,
                 CASE WHEN len - pb >= 3 THEN ${byteStep("pb+2")}
                 ELSE h END AS h FROM xb2),
        xa1 AS (SELECT word, ${mul64(xor("h", shr("h", 33)), PRIME2)} AS h
                FROM xb3),
        xa2 AS (SELECT word, ${mul64(xor("h", shr("h", 29)), PRIME3)} AS h
                FROM xa1),
        wh AS (SELECT word, ${xor("h", shr("h", 32))} AS h FROM xa2),"""

  private def byteStep(pos: String): String =
    mul64(rotl(xor("h",
      mul64(s"CAST(${byteAt(pos)} AS HUGEINT)", PRIME5)), 11), PRIME1)

  /** Map an unsigned-HUGEINT 64-bit value expression to Spark's signed
    * BIGINT. */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808 THEN ($u) - $P64" +
      s" ELSE ($u) END AS BIGINT)"

  /** SimHash signature CTEs: from `dwc(doc_id, word, c)` (per-doc word
    * multiplicities) and `wh(word, h)` to `sig64(doc_id, sig)` — the
    * 64-bit bit-vote signature as Spark's signed long. The vote stage
    * is COLUMNAR (64 SUM aggregates over one doc-keyed GROUP BY, all
    * signed-BIGINT masks — HUGEINT leaves the query at the vocab-sized
    * `whs`) and `sig64` is MATERIALIZED: it is referenced three times
    * downstream, and DuckDB 1.0 otherwise INLINES the whole vote
    * pipeline per reference — the triplicated evaluation is what blew
    * the one-connection gate's allocation budget before this shape.
    * Bit 63 is the sign bit on both sides (`hs < 0` as the mask,
    * Long.MinValue as the weight), so no shift ever overflows.
    */
  def simhashSigCtes: String = {
    def mask(b: Int): String =
      if (b == 63) "whs.hs < 0"
      else s"(whs.hs & ${1L << b}) != 0"
    val vcols = (0 until 64).map(b =>
      s"SUM(CASE WHEN ${mask(b)} THEN dwc.c ELSE -dwc.c END) AS v$b")
      .mkString(",\n                 ")
    def sigTerm(b: Int): String = {
      val w = if (b == 63) Long.MinValue else 1L << b
      s"(CASE WHEN v$b > 0 THEN CAST($w AS BIGINT) ELSE 0 END)"
    }
    val sigSum = (0 until 64).map(sigTerm).mkString("\n                   + ")
    s"""
        whs AS (SELECT word, ${toSigned("h")} AS hs FROM wh),
        votes AS (
          SELECT dwc.doc_id,
                 $vcols
          FROM dwc JOIN whs USING (word)
          GROUP BY dwc.doc_id),
        sig64 AS MATERIALIZED (
          SELECT doc_id,
                 CAST($sigSum AS BIGINT) AS sig
          FROM votes),"""
  }

  // --------------------------------------------------------- winnow

  /** CTE chain from a relation `docs(doc_id, text)` (null texts already
    * filtered) to `fps(doc_id, fp)` where `fp` is the ORDERED winnowing
    * fingerprint list of the text — k-gram (k=8) polynomial hashes mod
    * 1e9+7, rightmost minimum per window of w=4, consecutive selected
    * INDICES deduplicated — exactly `graft.functions.Winnow(text, 8, 4)`.
    * Splice after `docs`; continues with a trailing comma.
    */
  def winnowCtes: String = {
    val gram = (0 until 8).foldLeft("CAST(0 AS BIGINT)") {
      (e, j) => s"(($e) * 31 + bl[i + $j + 1]) % 1000000007"
    }
    s"""
        b0 AS (SELECT doc_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS n FROM docs),
        b1 AS (SELECT doc_id, n,
                 list_transform(range(0, n), j ->
                   (strpos('0123456789ABCDEF', substr(hx, 2*j+1, 1)) - 1)
                     * 16
                   + (strpos('0123456789ABCDEF', substr(hx, 2*j+2, 1)) - 1))
                   AS bl
               FROM b0),
        g0 AS (SELECT doc_id, greatest(n - 8 + 1, 0) AS ng,
                 CASE WHEN n >= 8 THEN
                   list_transform(range(0, n - 8 + 1), i -> $gram)
                 ELSE [] END AS g
               FROM b1),
        s0 AS (SELECT doc_id, ng, g,
                 CASE WHEN ng = 0 THEN []
                 ELSE list_transform(range(0, ng - least(4, ng) + 1), s ->
                   CASE
                     WHEN s + 3 < ng AND g[s+4] =
                       least(g[s+1], g[s+2], g[s+3], g[s+4]) THEN s + 3
                     WHEN s + 2 < ng AND g[s+3] = least(g[s+1], g[s+2],
                       g[s+3],
                       CASE WHEN s + 3 < ng THEN g[s+4] ELSE g[s+3] END)
                       THEN s + 2
                     WHEN s + 1 < ng AND g[s+2] = least(g[s+1], g[s+2],
                       CASE WHEN s + 2 < ng THEN g[s+3] ELSE g[s+2] END,
                       CASE WHEN s + 3 < ng THEN g[s+4] ELSE g[s+2] END)
                       THEN s + 1
                     ELSE s
                   END)
                 END AS sel
               FROM g0),
        fps AS (SELECT doc_id, ng, g,
                  list_transform(
                    list_filter(range(0, len(sel)), si ->
                      si = 0 OR sel[si + 1] != sel[si]),
                    si -> g[sel[si + 1] + 1]) AS fp
                FROM s0),"""
  }
}
