package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Codegen-native kernels for the hot integer-vector and MinHash paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * interpret their lambda per element per row — correct, but the quantized
  * dot products (x3 similarity family) and MinHash signatures (x2 dedup
  * family) sit in per-row inner loops over 64-element arrays, where lambda
  * interpretation dominates. These Expressions evaluate the same integer
  * arithmetic in a tight JVM loop and stay inside whole-stage codegen via a
  * static kernel call — SURVEY §7.3's "graduate hot scalar paths to native
  * Expressions" step, same pattern as [[IpRender]]/[[IpInCidr]].
  *
  * Parity contract: results are BIT-IDENTICAL to the higher-order-function
  * formulations they replace (exact integer arithmetic; same null
  * semantics: null array, length mismatch, or null element → null result —
  * what `aggregate(zip_with(...))` yields on those inputs), pinned by
  * KernelSpec. The DuckDB oracles never see signatures or partial dots, but
  * the downstream pair/top-k results they DO hash are unchanged.
  */
object VecKernel {
  /** Σ a(i)·b(i) into out(0); false = null result (shape/null mismatch).
    * Overflow THROWS (exact arithmetic), like the ANSI-mode lambda
    * formulation — a silent wrap would be a wrong answer on the public
    * SQL surface.
    */
  def dotInto(a: ArrayData, b: ArrayData, out: Array[Long]): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    out(0) = s
    true
  }

  /** Banded (Sakoe–Chiba) DTW distance between two equal-length
    * ARRAY<DOUBLE> series into out(0); false = null result (shape/null
    * mismatch). Cost = |aᵢ − bⱼ|, recurrence
    * d[i][j] = cost + min(d[i−1][j], d[i][j−1], d[i−1][j−1]), cells with
    * |i − j| > band pinned at the 1e30 sentinel (the band keeps a
    * feasible diagonal path, so the sentinel never reaches the answer).
    * The arithmetic ORDER is fixed (row-major, one rounding per cell:
    * the add; min is exact), which is what lets the DuckDB oracle replay
    * the identical doubles cell for cell.
    */
  def dtwBandInto(a: ArrayData, b: ArrayData, band: Int,
      out: Array[Double]): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n || n == 0) return false
    val av = new Array[Double](n)
    val bv = new Array[Double](n)
    var x = 0
    while (x < n) {
      if (a.isNullAt(x) || b.isNullAt(x)) return false
      av(x) = a.getDouble(x); bv(x) = b.getDouble(x); x += 1
    }
    val INF = 1e30
    // clamp: band >= n is the unbanded DP, and an unclamped huge band
    // would Int-overflow the i+band pin below (r15 review)
    val bnd = math.min(band, n)
    var prev = new Array[Double](n + 1)
    var cur = new Array[Double](n + 1)
    prev(0) = 0.0
    var j = 1
    while (j <= n) { prev(j) = INF; j += 1 }
    var i = 1
    while (i <= n) {
      // true O(n·band): only the in-band cells [lo, hi] are computed;
      // the two cells the recurrence can read just OUTSIDE the band are
      // pinned to the sentinel (cur(lo-1) left of this row's range, and
      // prev(i+band) one above the previous row's range — everything
      // else out-of-band is never read), so the result is cell-for-cell
      // identical to the full-row sweep (DtwSpec pins bit-equality
      // against the full-matrix reference)
      val lo = math.max(1, i - bnd)
      val hi = math.min(n, i + bnd)
      cur(lo - 1) = INF
      if (i + bnd <= n) prev(i + bnd) = INF
      j = lo
      while (j <= hi) {
        cur(j) = math.abs(av(i - 1) - bv(j - 1)) +
          math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    out(0) = prev(n)
    true
  }

  /** All numBands×bandBits Rademacher plane sign bits of `qe` in one
    * pass, packed into per-band keys (bit j of band b set iff
    * Σ qe(i)·planes(b·bandBits+j)(i) ≥ 0). `planes` is the flat ±1 sign
    * table (plane-major). A dimension mismatch or a null element yields
    * ALL-ZERO keys — exactly what the when/otherwise Column form produces
    * when each dot is null. Overflow throws (exact arithmetic).
    */
  private def rademacherKeys(qe: ArrayData, planes: Array[Byte],
      numBands: Int, bandBits: Int): Array[Int] = {
    val nPlanes = numBands * bandBits
    val keys = new Array[Int](numBands)
    val dim = qe.numElements()
    if (dim == 0 || nPlanes.toLong * dim != planes.length) return keys
    var i = 0
    while (i < dim) {
      if (qe.isNullAt(i)) return keys
      i += 1
    }
    val acc = new Array[Long](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var s = 0L
      val base = p * dim
      var j = 0
      while (j < dim) {
        val v = qe.getLong(j)
        s = if (planes(base + j) > 0) Math.addExact(s, v)
            else Math.subtractExact(s, v)
        j += 1
      }
      acc(p) = s
      p += 1
    }
    var b = 0
    while (b < numBands) {
      var k = 0
      var j = 0
      while (j < bandBits) {
        if (acc(b * bandBits + j) >= 0) k |= (1 << j)
        j += 1
      }
      keys(b) = k
      b += 1
    }
    keys
  }

  /** [[rademacherKeys]] as STRUCT<k0..k{B-1}> (the x2e signature). */
  def rademacherStruct(qe: ArrayData, planes: Array[Byte],
      numBands: Int, bandBits: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val keys = rademacherKeys(qe, planes, numBands, bandBits)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      keys.map(k => k: Any))
  }

  /** [[rademacherKeys]] as ARRAY<STRUCT<band, key>> (the x7e explode shape). */
  def rademacherBandStructs(qe: ArrayData, planes: Array[Byte],
      numBands: Int, bandBits: Int): ArrayData = {
    val keys = rademacherKeys(qe, planes, numBands, bandBits)
    new GenericArrayData((0 until numBands).map(b =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, keys(b)))).toArray[Any])
  }

  /** Rademacher random projection: out(p) = Σᵢ v(i)·planes(p·dim+i) for
    * each of the planes.length/dim output dimensions — the
    * Johnson–Lindenstrauss sketch of an exact-integer vector, itself
    * exact-integer (±1 coefficients, so the projection is pure add/sub;
    * overflow throws). One vector scan per output dim, no intermediate
    * allocation beyond the output. Null element / dim mismatch → null
    * result (the x3s query never produces either; the contract mirrors
    * [[dotInto]]).
    */
  def rpProject(v: ArrayData, planes: Array[Byte]): ArrayData = {
    val dim = v.numElements()
    if (dim == 0 || planes.length % dim != 0) return null
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val outDim = planes.length / dim
    val out = new Array[Long](outDim)
    var p = 0
    while (p < outDim) {
      var s = 0L
      val base = p * dim
      var j = 0
      while (j < dim) {
        val x = v.getLong(j)
        s = if (planes(base + j) > 0) Math.addExact(s, x)
            else Math.subtractExact(s, x)
        j += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Σ (a(i)−b(i))² into out(0); false = null result; overflow throws. */
  def dist2Into(a: ArrayData, b: ArrayData, out: Array[Long]): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    out(0) = s
    true
  }

  /** Float array → fixed-point BIGINT at 2^20, replicating
    * `round(x.cast(double) * 1048576, 0).cast(long)` per element: float →
    * double widening (exact), double multiply, BigDecimal.valueOf HALF_UP
    * round (Spark's `Round` path for doubles), double → long cast. Null
    * element → null result; non-finite input throws like an ANSI cast.
    */
  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble * 1048576d
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
        throw new ArithmeticException(s"float_vec_quant: non-finite value $d")
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a string array, replicating the vote formulation
    * exactly: per shingle h = xxhash64(shingle) (seed 42); per bit i the
    * vote is +1 if bit i of h is set else −1; output bit i is set iff the
    * vote total is > 0. A null shingle votes as h = 42 — exactly what
    * `xxhash64(null)` (= the untouched seed) contributes in the agg form.
    */
  def simhash64(sh: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      // null shingle: xxhash64(null) leaves the seed untouched, so the agg
      // formulation hashes it as 42 — vote the same way, not skip
      val h = if (sh.isNullAt(j)) 42L else XXH64.hashUTF8String(sh.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sim |= 1L << i
      i += 1
    }
    sim
  }

  /** k-permutation MinHash signature of a string array, replicating the
    * composed built-in hashes exactly: h = xxhash64(shingle) (seed 42, as
    * `functions.xxhash64`), permutation p_i = xxhash64(h, i) =
    * hashInt(i, hashLong(h, 42)) — so kernel signatures equal the explode +
    * elementwise-min formulation ([[graft.ext.DedupQueries.minhashSigsAgg]])
    * element for element — including null shingles, which fold as h = 42
    * (`xxhash64(null)` = the untouched seed) rather than being skipped.
    * An empty array yields Long.MaxValue sentinels.
    */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      // null shingle: xxhash64(null) = the seed (42) in the agg
      // formulation's transform — fold the same value, not skip
      val h = if (sh.isNullAt(j)) 42L else XXH64.hashUTF8String(sh.getUTF8String(j), 42L)
      val base = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < k) {
        val p = XXH64.hashInt(i, base)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Md5 hex digests of every n-token sliding window, replicating
    * `transform(sequence(1, size(w)-n+1), i =>
    * md5(concat_ws(" ", slice(w, i, n))))` bit-for-bit — including
    * concat_ws's null-element skipping — in ONE pass over the token bytes;
    * with `dedup` the result is `array_distinct` of that (first-occurrence
    * order). The HOF formulation is interpreted per element and, worse,
    * any projection alias for the token array collapses INTO the lambda
    * body, so each window re-tokenizes the document; per-doc cost goes
    * quadratic in practice. Short inputs (< n tokens) yield an empty
    * array.
    */
  def windowMd5(w: ArrayData, n: Int, dedup: Boolean): ArrayData = {
    val cnt = w.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Any](0))
    // token bytes materialized once; null tokens are SKIPPED by concat_ws
    // (no separator either), so pre-filter exactly like the join would
    val toks = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = if (w.isNullAt(i)) null else w.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    val all = new scala.collection.mutable.ArrayBuffer[org.apache.spark.unsafe.types.UTF8String]
    val hex = "0123456789abcdef".getBytes
    i = 0
    while (i <= cnt - n) {
      md.reset()
      var first = true
      var j = i
      while (j < i + n) {
        if (toks(j) != null) {
          if (!first) md.update(' '.toByte)
          md.update(toks(j))
          first = false
        }
        j += 1
      }
      val dig = md.digest()
      val out = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        out(2 * k) = hex((dig(k) >> 4) & 0xf)
        out(2 * k + 1) = hex(dig(k) & 0xf)
        k += 1
      }
      val digest = org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
      if (dedup) seen.add(digest) else all += digest
      i += 1
    }
    if (dedup) new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    else new GenericArrayData(all.toArray[AnyRef].asInstanceOf[Array[Any]])
  }

  /** |a ∩ b| of two SORTED-ascending distinct string arrays via a merge
    * scan — O(|a|+|b|) direct byte compares, no per-call hash-set build
    * (which is what `size(array_intersect(a, b))` pays twice per pair in
    * the all-pairs verification joins). Nulls follow `array_sort` order
    * (last) and match each other once, exactly as `array_intersect` counts
    * a null∩null element.
    */
  private val Log2 = math.log(2.0)

  /** One-pass token statistics of a raw text column: token count, distinct
    * token count, and Shannon entropy (bits) of the token distribution —
    * the vocabulary-diversity quality signal. Tokenization replicates
    * `split(text, " ")` exactly (single-space boundaries; empty tokens
    * from leading/consecutive/trailing spaces are KEPT, matching both
    * Spark's regex split with limit -1 and DuckDB's string_split), so the
    * counts agree byte-for-byte with the explode/groupBy formulation this
    * kernel replaces — which shuffles one row PER TOKEN per document
    * through two aggregations, versus zero shuffle here.
    *
    * Entropy = log2(n) − (Σ c·log2(c))/n, with log2 = ln/ln2 (Spark's own
    * `log2` semantics). The Σ order follows hash-map iteration; engines
    * summing in other orders differ by ulps, so oracles must compare at a
    * rounded precision (x4g ships round(H·10⁴) as BIGINT).
    */
  private val RuleTooShort =
    org.apache.spark.unsafe.types.UTF8String.fromString("too_short")
  private val RuleLongWords =
    org.apache.spark.unsafe.types.UTF8String.fromString("long_words")
  private val RuleRepetitive =
    org.apache.spark.unsafe.types.UTF8String.fromString("repetitive")
  private val RuleLowDiversity =
    org.apache.spark.unsafe.types.UTF8String.fromString("low_diversity")
  private val RuleKept =
    org.apache.spark.unsafe.types.UTF8String.fromString("kept")

  /** One-pass x4j funnel verdict: token count, duplicate-bigram ppm,
    * type-token-ratio ppm, and the FIRST-failing-rule attribution, all in
    * a single scan of the space-token stream. Byte-for-byte the same
    * arithmetic as the expression formulation it replaces (split +
    * transform + array_distinct + ppm floor-divs; the DuckDB oracle CTE is
    * unchanged): consecutive spaces yield empty tokens exactly like
    * `split(text, ' ')`, bigrams are the ' '-joined adjacent token pairs
    * (injective — tokens cannot contain the separator), and all ppm math
    * is non-negative integer floor division.
    *
    * Why a kernel: the verdict is FILTERED on at ingest (q52x/q52h), and
    * Catalyst pushes that predicate below the stacked withColumn projects
    * by inlining every alias — the expression formulation expands to ~15
    * `split(text)` + 3 `array_distinct` evaluations per row inside the
    * predicate (measured 0.4 s → 6.3 s on the sf0.1 corpus). Inlining
    * THIS expression costs one pass. Null text/n_chars now yields a null
    * verdict (nullSafeEval) instead of the CASE chain's 'kept'; the
    * corpus schema declares both non-null.
    */
  def funnelStats(s: org.apache.spark.unsafe.types.UTF8String,
      nChars: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val toks = new java.util.HashSet[String]()
    val bgs = new java.util.HashSet[String]()
    val len = str.length
    var n = 0L
    var nbg = 0L
    var nbgDup = 0L
    var start = 0
    var i = 0
    var prev: String = null
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        toks.add(tok)
        if (prev != null) {
          nbg += 1
          if (!bgs.add(prev + " " + tok)) nbgDup += 1
        }
        prev = tok
        n += 1
        start = i + 1
      }
      i += 1
    }
    val dbPpm = if (nbg > 0) nbgDup * 1000000L / nbg else 0L
    val ttrPpm = toks.size.toLong * 1000000L / n
    val rule =
      if (n < 20L) RuleTooShort
      else if (nChars * 100L / n >= 600L) RuleLongWords
      else if (dbPpm >= 200000L) RuleRepetitive
      else if (ttrPpm < 300000L) RuleLowDiversity
      else RuleKept
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, dbPpm, ttrPpm, rule))
  }

  def tokenStats(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Integer]()
    val len = str.length
    var n = 0L
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        val prev = counts.get(tok)
        counts.put(tok, if (prev == null) 1 else prev + 1)
        n += 1
        start = i + 1
      }
      i += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * (math.log(c) / Log2)
    }
    val h = math.log(n.toDouble) / Log2 - sum / n
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, h))
  }

  /** Morton / Z-order bit interleave of the low 31 bits of two nonnegative
    * longs: x occupies the even output bits, y the odd — so sorting by the
    * result clusters rows that are close in BOTH dimensions (the multi-
    * column data-layout trick behind Delta's OPTIMIZE ZORDER and Hudi's
    * space-filling-curve clustering). 2×31 bits keeps the result strictly
    * positive, so z-order and unsigned bit order agree.
    *
    * Magic-mask bit spreading (5 shift+mask steps per coordinate) instead
    * of a 31-iteration loop — this sits in the per-row layout path of a
    * full-corpus rewrite.
    */
  private def spreadBits(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleaveBits(x: Long, y: Long): Long =
    spreadBits(x) | (spreadBits(y) << 1)

  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(j)
      if (an && bn) { c += 1; i += 1; j += 1 }
      else if (an) j += 1 // nulls sort last: b(j) < every remaining a
      else if (bn) i += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** One-pass boilerplate scrub: drop every token covered by a window
    * `[s, s + span)` for some `s` in `starts` (sorted ascending,
    * duplicates allowed). A merge scan — a cursor over `starts` folds
    * the running max coverage end while the token pointer advances — so
    * per-doc cost is O(|tok| + |starts|) where the HOF
    * `filter(tok, (_, i) -> !array_contains(bad, i))` over the
    * 8×-exploded position set pays O(|tok| · |bad|): quadratic in doc
    * length when most of a long document is boilerplate, the exact
    * regime a crawl scrub runs in.
    */
  def scrubTokens(tok: ArrayData, starts: ArrayData, span: Int): ArrayData = {
    val n = tok.numElements()
    val m = starts.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var p = 0
    var maxEnd = -1L
    var i = 0
    while (i < n) {
      // a null start contributes no window and is SKIPPED — stopping the
      // cursor at it would silently ignore every later window (r14
      // review; call sites can't produce nulls, but the Column API's
      // contract must not degrade silently on adversarial input)
      while (p < m && (starts.isNullAt(p) || starts.getInt(p) <= i)) {
        if (!starts.isNullAt(p)) {
          val e = starts.getInt(p).toLong + span
          if (e > maxEnd) maxEnd = e
        }
        p += 1
      }
      if (i >= maxEnd) {
        out += (if (tok.isNullAt(i)) null else tok.getUTF8String(i))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Greedy BPE merge application: tokenize the input (per-CHARACTER when
    * `fromChars`, else split the space-padded symbol string), then for
    * each merge rule in rank order run ONE greedy left-to-right
    * non-overlapping pass, and return the space-padded symbol string.
    *
    * The greedy pass is the left fold `if (out.last == l && t == r)
    * out.last = l+r else out += t` — equal to the textbook scan-and-skip
    * because a token just merged THIS pass can never re-merge: the merged
    * token `l+r` is strictly longer than `l`, so `out.last == l` is false
    * right after a merge (BpePropertySpec hammers the equivalence;
    * BpeSpec pins the `l == r` run cases ' a a a a a ' → ' aa aa a ' that
    * the previous two-chained-`replace` formulation got WRONG — the
    * consumed-delimiter miss phase-shifts pass 2 onto the wrong pair,
    * ADVICE r13). `merges` is laid out flat as (l, r, l+r) triples so the
    * codegen reference object is a plain String[].
    */
  def bpeApply(s: org.apache.spark.unsafe.types.UTF8String,
      merges: Array[String], fromChars: Boolean): org.apache.spark.unsafe.types.UTF8String = {
    val toks = new java.util.ArrayList[String]()
    if (fromChars) {
      // split by Unicode CODE POINT, not UTF-16 unit: training
      // (Spark substring/char_length), the vocab table, and the DuckDB
      // oracles all treat a supplementary-plane character (emoji, plane-1
      // math letters) as ONE symbol — a charAt split would emit two lone
      // surrogates here, silently dropping those tokens at x4m's vocab
      // join and flipping x4q's roundtrip digest (r14 review finding)
      val str = s.toString
      var i = 0
      while (i < str.length) {
        val n = Character.charCount(str.codePointAt(i))
        toks.add(str.substring(i, i + n))
        i += n
      }
    } else {
      val t = s.toString.trim
      if (t.nonEmpty) {
        var start = 0
        var i = 0
        while (i <= t.length) {
          if (i == t.length || t.charAt(i) == ' ') {
            toks.add(t.substring(start, i))
            start = i + 1
          }
          i += 1
        }
      }
    }
    var mi = 0
    while (mi < merges.length) {
      val l = merges(mi)
      val r = merges(mi + 1)
      val m = merges(mi + 2)
      // in-place greedy fold with a write pointer
      var w = 0
      var i = 0
      val n = toks.size
      while (i < n) {
        val t = toks.get(i)
        if (w > 0 && toks.get(w - 1) == l && t == r) toks.set(w - 1, m)
        else { toks.set(w, t); w += 1 }
        i += 1
      }
      while (toks.size > w) toks.remove(toks.size - 1)
      mi += 3
    }
    val sb = new java.lang.StringBuilder(s.numBytes + 2)
    sb.append(' ')
    var i = 0
    while (i < toks.size) { sb.append(toks.get(i)).append(' '); i += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

/** `float_vec_quant(a)` — float array → fixed-point BIGINT array at 2^20
  * resolution, the quantization at the head of every similarity query.
  * Replicates `transform(a, x => round(x.cast(double) * 1048576).cast(long))`
  * bit-for-bit: [[VecKernel.quantize]] rounds via BigDecimal HALF_UP, the
  * same path Spark's `Round` takes for doubles (pinned by KernelSpec,
  * including half-way cases). As a native Expression the whole
  * scan → quantize → dot pipeline stays inside one codegen stage (a
  * higher-order `transform` in the project is CodegenFallback and breaks
  * the stage). Divergence from the lambda form, by declaration: a null
  * ELEMENT nulls the whole result (the array type is containsNull=false);
  * the fixture schema carries no null elements.
  */
case class FloatVecQuant(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on a null ELEMENT, even if child is non-null
  override def prettyName: String = "float_vec_quant"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    VecKernel.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.VecKernel.quantize($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `long_vec_dot(a, b)` — exact integer dot product over two BIGINT arrays. */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on shape/null-element mismatch
  override def prettyName: String = "long_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[ArrayType]) &&
        Seq(left, right).forall(_.dataType.asInstanceOf[ArrayType].elementType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val out = new Array[Long](1)
    if (VecKernel.dotInto(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], out)) out(0)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "dotBuf", v => s"$v = new long[1];")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VecKernel.dotInto($a, $b, $buf)) {
        ${ev.value} = $buf[0];
      } else {
        ${ev.isNull} = true;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `dtw_band(a, b, band)` — Sakoe–Chiba-banded dynamic-time-warping
  * distance of two equal-length ARRAY<DOUBLE> series (|·| point cost).
  * The imperative O(n·band) DP is exactly the loop a SQL engine cannot
  * express declaratively — the (c)-tier custom-Expression case: one
  * kernel call per pair, inside whole-stage codegen via the static
  * [[VecKernel.dtwBandInto]] helper.
  */
case class DtwBand(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {
  require(band >= 1, s"dtw_band: band must be >= 1, got $band")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dtw_band"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType ==
          org.apache.spark.sql.types.DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val out = new Array[Double](1)
    if (VecKernel.dtwBandInto(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], band, out)) out(0)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("double[]", "dtwBuf", v => s"$v = new double[1];")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VecKernel.dtwBandInto($a, $b, $band, $buf)) {
        ${ev.value} = $buf[0];
      } else {
        ${ev.isNull} = true;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `long_vec_dist2(a, b)` — exact integer squared Euclidean distance. */
case class LongVecDist2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_vec_dist2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[ArrayType]) &&
        Seq(left, right).forall(_.dataType.asInstanceOf[ArrayType].elementType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val out = new Array[Long](1)
    if (VecKernel.dist2Into(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], out)) out(0)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "dist2Buf", v => s"$v = new long[1];")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.functions.VecKernel.dist2Into($a, $b, $buf)) {
        ${ev.value} = $buf[0];
      } else {
        ${ev.isNull} = true;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `minhash_sig(shingles)` — the per-row 64-permutation MinHash signature.
  * Replaces an explode → 64-hash transform → shuffled elementwise-min
  * aggregation with a single map-side expression: signatures never touch a
  * shuffle at all (the LSH band join downstream is the first exchange).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")
  }

  override protected def nullSafeEval(sh: Any): Any =
    VecKernel.minhashSig(sh.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sh => s"graft.functions.VecKernel.minhashSig($sh, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_sig(shingles)` — the per-row 64-bit SimHash. Replaces an
  * explode → 64 vote-sum columns → bit-pack aggregation with a single
  * map-side expression (same no-signature-shuffle rationale as
  * [[MinHashSig]]).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(sh: Any): Any =
    VecKernel.simhash64(sh.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sh => s"graft.functions.VecKernel.simhash64($sh)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `window_md5(tokens, n)` — distinct md5 hex digests of every n-token
  * sliding window, the span-dedup signature (x2g / the Lee-et-al
  * exact-substring shape). One native pass per row; see
  * [[VecKernel.windowMd5]] for why the HOF formulation it replaces was
  * effectively quadratic per document.
  */
case class WindowMd5(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input and n > 0, got " +
        s"${child.dataType.simpleString}, n=$n")
  }

  override protected def nullSafeEval(w: Any): Any =
    VecKernel.windowMd5(w.asInstanceOf[ArrayData], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      w => s"graft.functions.VecKernel.windowMd5($w, $n, $dedup)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `scrub_tokens(tok, starts, span)` — the tokens of `tok` NOT covered
  * by any `span`-token window starting at a position in `starts`
  * (sorted ascending INT positions, duplicates allowed; x2k's
  * hot-window starts). One merge scan per document
  * ([[VecKernel.scrubTokens]]); order-preserving.
  */
case class ScrubTokens(left: Expression, right: Expression, span: Int)
    extends BinaryExpression {
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "scrub_tokens"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if span > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, ARRAY<INT> inputs and " +
        s"span > 0, got ${left.dataType.simpleString} / " +
        s"${right.dataType.simpleString}, span=$span")
  }

  override protected def nullSafeEval(tok: Any, starts: Any): Any =
    VecKernel.scrubTokens(tok.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (tok, st) =>
      s"graft.functions.VecKernel.scrubTokens($tok, $st, $span)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_size(a, b)` — intersection cardinality of two
  * sorted-ascending distinct string arrays (merge scan). The all-pairs
  * similarity verifiers (x2c brute-force Jaccard and the LSH recall
  * audits) evaluate set intersections once per CANDIDATE PAIR — a hash-set
  * array_intersect there allocates and rehashes both arrays per pair,
  * where the merge scan is a single pass of pointer compares over data
  * each side sorted exactly once. Contract: inputs must be
  * `array_sort(array_distinct(...))`-shaped or the count is undefined;
  * equals `size(array_intersect(a, b))` on such inputs (KernelSpec).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRING> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.sortedIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernel.sortedIntersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `token_stats(text)` — STRUCT<n_tok BIGINT, n_distinct BIGINT, entropy
  * DOUBLE> of the space-token distribution, one native pass per document
  * (see [[VecKernel.tokenStats]]). The explode/groupBy formulation it
  * replaces amplifies every document into one row per token and shuffles
  * them twice; this is a pure map inside whole-stage codegen.
  */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("entropy",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    VecKernel.tokenStats(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.VecKernel.tokenStats($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `funnel_stats(text, n_chars)` — STRUCT<n_tok BIGINT, db_ppm BIGINT,
  * ttr_ppm BIGINT, drop_rule STRING>: the x4j quality-funnel metrics and
  * first-failing-rule verdict in one native pass
  * (see [[VecKernel.funnelStats]] for semantics and why this is a kernel).
  */
case class FunnelStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("db_ppm", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ttr_ppm", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("drop_rule", StringType,
      nullable = false)))
  override def prettyName: String = "funnel_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, BIGINT) inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(s: Any, c: Any): Any =
    VecKernel.funnelStats(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, c) => s"graft.functions.VecKernel.funnelStats($s, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `interleave_bits(x, y)` — Morton/Z-order code of two nonnegative BIGINT
  * coordinates (low 31 bits each; see [[VecKernel.interleaveBits]]).
  * Inputs outside [0, 2³¹) are NULL — a silent mask would reorder large
  * keys arbitrarily, which for a layout key is a wrong answer, not a
  * convenience.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on out-of-range input
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  private def inRange(v: Long): Boolean = v >= 0L && v <= 0x7fffffffL

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (inRange(x) && inRange(y)) VecKernel.interleaveBits(x, y) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (($a | $b) >= 0L && $a <= 2147483647L && $b <= 2147483647L) {
        ${ev.value} = graft.functions.VecKernel.interleaveBits($a, $b);
      } else {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `rademacher_sig(qe)` — ALL random-hyperplane signs of a quantized
  * vector in one pass: the x2e/x7e signature stage. The composed-Column
  * formulation evaluates 64 separate `long_vec_dot(qe, plane_literal)`
  * calls per row — 64 array scans, 64 64-element literals in the plan,
  * and a codegen method large enough to brush JIT limits. This kernel
  * scans the vector once per plane with ±1 add/sub (no multiplies) from
  * one flat sign table, and packs the [[graft.ext.SimilarityQueries]]
  * band keys directly:
  *
  *   - `asBandStructs = false` → STRUCT<k0..k{B-1}: INT> — the full
  *     signature x2e collapses on;
  *   - `asBandStructs = true`  → ARRAY<STRUCT<band: INT, key: INT>> —
  *     the explode-ready shape x7e's cross-split band join consumes.
  *
  * Either shape is ONE expression with ONE consumer, so CollapseProject
  * cannot duplicate the evaluation per field (the x4d lesson).
  *
  * Parity contract: bit-identical to the
  * `when(long_vec_dot(qe, plane) >= 0, 1<<j).otherwise(0)` sum for every
  * non-null input — integer arithmetic, overflow throws like the ANSI
  * form; a DIMENSION MISMATCH yields all-zero keys exactly like the
  * when/otherwise chain does on null dots (pinned in KernelSpec).
  * Declared divergence (FloatVecQuant precedent): a NULL input vector
  * yields a null result where the Column form yields zero keys — no
  * caller feeds nullable vectors.
  */
case class RademacherSig(child: Expression, planes: Array[Byte],
    numBands: Int, bandBits: Int, asBandStructs: Boolean)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType =
    if (asBandStructs)
      ArrayType(StructType(Seq(
        StructField("band", IntegerType, nullable = false),
        StructField("key", IntegerType, nullable = false))), containsNull = false)
    else
      StructType((0 until numBands).map(b =>
        StructField(s"k$b", IntegerType, nullable = false)))
  override def prettyName: String = "rademacher_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numBands > 0 && bandBits > 0 &&
        planes.length % (numBands * bandBits) == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input and a plane table " +
        s"divisible by numBands*bandBits, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(qe: Any): Any =
    if (asBandStructs)
      VecKernel.rademacherBandStructs(qe.asInstanceOf[ArrayData], planes, numBands, bandBits)
    else
      VecKernel.rademacherStruct(qe.asInstanceOf[ArrayData], planes, numBands, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rademacherPlanes", planes, "byte[]")
    val fn = if (asBandStructs) "rademacherBandStructs" else "rademacherStruct"
    defineCodeGen(ctx, ev, qe =>
      s"graft.functions.VecKernel.$fn($qe, $planesRef, $numBands, $bandBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rp_project(v, planes)` — Johnson–Lindenstrauss Rademacher projection
  * of an ARRAY<BIGINT> vector to planes.length/dim output dimensions (the
  * x3s dimensionality-reduction ranker). The ±1 plane table rides into
  * codegen as one plan-referenced byte[] — same device as
  * [[RademacherSig]]; the seeded draw is embedded as literals in the
  * DuckDB oracle so both engines project bit-identically.
  */
case class RpProject(child: Expression, planes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on shape/null-element mismatch
  override def prettyName: String = "rp_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if planes.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input and a non-empty plane " +
        s"table, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VecKernel.rpProject(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rpPlanes", planes, "byte[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.VecKernel.rpProject($v, $planesRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_apply(s, merges, fromChars)` — greedy BPE tokenization: apply the
  * trained merge rules in rank order to a word (`fromChars = true`, the
  * x4l serving path) or to an already-tokenized space-padded symbol
  * string (`fromChars = false`, the per-round trainer rewrite), returning
  * the space-padded symbol string (see [[VecKernel.bpeApply]] for the
  * greedy-fold semantics and why the two-pass `replace` it replaces was
  * wrong on `l == r` runs). The merge table rides into codegen as ONE
  * plan-referenced String[] — at a production vocab (32k merges) that is
  * a single broadcast-with-the-plan object and one kernel call per word,
  * where the previous formulation was 2×|merges| nested `replace`
  * expressions (a plan that does not survive past a few dozen merges).
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)],
    fromChars: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"

  // flat (l, r, l+r) triples: a String[] codegen reference object
  private lazy val flat: Array[String] =
    merges.flatMap { case (l, r) => Seq(l, r, l + r) }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.forall { case (l, r) =>
        l.nonEmpty && r.nonEmpty && !l.contains(' ') && !r.contains(' ') } =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName merge symbols must be non-empty and space-free")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    VecKernel.bpeApply(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], flat, fromChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.VecKernel.bpeApply($s, $mergesRef, $fromChars)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Kernels {
  /** Column API: fixed-point 2^20 quantization of an ARRAY<FLOAT> column. */
  def float_vec_quant(a: Column): Column =
    Shim.column(FloatVecQuant(Shim.expression(a)))

  /** Column API: exact integer dot product of two ARRAY<BIGINT> columns. */
  def long_vec_dot(a: Column, b: Column): Column =
    Shim.column(LongVecDot(Shim.expression(a), Shim.expression(b)))

  /** Column API: exact integer squared distance of two ARRAY<BIGINT> columns. */
  def long_vec_dist2(a: Column, b: Column): Column =
    Shim.column(LongVecDist2(Shim.expression(a), Shim.expression(b)))

  /** Column API: k-permutation MinHash signature of an ARRAY<STRING> column. */
  def minhash_sig(shingles: Column, k: Int): Column =
    Shim.column(MinHashSig(Shim.expression(shingles), k))

  /** Column API: 64-bit SimHash of an ARRAY<STRING> column. */
  def simhash_sig(shingles: Column): Column =
    Shim.column(SimHashSig(Shim.expression(shingles)))

  /** Column API: Sakoe–Chiba-banded DTW distance of two equal-length
    * ARRAY<DOUBLE> series.
    */
  def dtw_band(a: Column, b: Column, band: Int): Column =
    Shim.column(DtwBand(Shim.expression(a), Shim.expression(b), band))

  /** Column API: merge-scan |a ∩ b| of two sorted distinct ARRAY<STRING>
    * columns.
    */
  def sorted_intersect_size(a: Column, b: Column): Column =
    Shim.column(SortedIntersectSize(Shim.expression(a), Shim.expression(b)))

  /** Column API: drop the tokens covered by any `span`-token window
    * starting at a sorted position in `starts` ([[ScrubTokens]]).
    */
  def scrub_tokens(tok: Column, starts: Column, span: Int): Column =
    Shim.column(ScrubTokens(Shim.expression(tok), Shim.expression(starts), span))

  /** Column API: md5 hex digests of every n-token sliding window of an
    * ARRAY<STRING> column (distinct by default; `dedup = false` keeps
    * per-window multiplicity for frequency counting).
    */
  def window_md5(tokens: Column, n: Int, dedup: Boolean = true): Column =
    Shim.column(WindowMd5(Shim.expression(tokens), n, dedup))

  /** Column API: one-pass token count / distinct count / Shannon entropy
    * of a STRING column's space-token distribution.
    */
  def token_stats(text: Column): Column =
    Shim.column(TokenStats(Shim.expression(text)))

  /** Column API: one-pass x4j funnel metrics + first-failing-rule verdict
    * over a STRING column and its BIGINT char count.
    */
  def funnel_stats(text: Column, nChars: Column): Column =
    Shim.column(FunnelStats(Shim.expression(text), Shim.expression(nChars)))

  /** Column API: Morton/Z-order interleave of two nonnegative BIGINT
    * columns (low 31 bits each); null outside [0, 2³¹).
    */
  def interleave_bits(x: Column, y: Column): Column =
    Shim.column(InterleaveBits(Shim.expression(x), Shim.expression(y)))

  /** Column API: one-pass Rademacher LSH signature of an ARRAY<BIGINT>
    * column as STRUCT<k0..k{B-1}> ([[RademacherSig]]).
    */
  def rademacher_sig(qe: Column, planes: Array[Byte],
      numBands: Int, bandBits: Int): Column =
    Shim.column(RademacherSig(Shim.expression(qe), planes, numBands, bandBits,
      asBandStructs = false))

  /** Column API: JL Rademacher projection to planes.length/dim dims. */
  def rp_project(v: Column, planes: Array[Byte]): Column =
    Shim.column(RpProject(Shim.expression(v), planes))

  /** Column API: the same signature as ARRAY<STRUCT<band, key>> for
    * band-join explodes.
    */
  def rademacher_band_structs(qe: Column, planes: Array[Byte],
      numBands: Int, bandBits: Int): Column =
    Shim.column(RademacherSig(Shim.expression(qe), planes, numBands, bandBits,
      asBandStructs = true))

  /** Column API: greedy BPE merge application — rank-ordered merges over
    * a raw word (`fromChars = true`) or a space-padded symbol string,
    * returning the space-padded symbol string ([[BpeApply]]).
    */
  def bpe_apply(s: Column, merges: Seq[(String, String)],
      fromChars: Boolean): Column =
    Shim.column(BpeApply(Shim.expression(s), merges, fromChars))
}
