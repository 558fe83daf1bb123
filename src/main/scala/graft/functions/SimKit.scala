package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels behind the similarity expressions (SimExprs.scala).
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) run
  * their lambdas on the INTERPRETED expression path — round-1 profiling put
  * t31/t32 at 12-27× the oracle purely on that overhead. These kernels are
  * plain static JVM methods invoked from generated code, so the whole
  * pipeline stays inside whole-stage codegen and the per-row cost is one
  * JIT-compiled tight loop.
  *
  * Numeric contract (graft determinism rules): every accumulation is a
  * SEQUENTIAL double/long fold in ascending element order, bit-identical to
  * both the previous higher-order-function formulation and the DuckDB
  * oracle's `list_sum(list_transform(...))`.
  */
object SimKit {

  private val ws: Pattern = Pattern.compile("\\S+")

  private val md5tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes of `s`'s UTF-8 encoding as an unsigned 32-bit value —
    * exactly `CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)`. */
  private def md5Head(bytes: Array[Byte]): Long = {
    val d = md5tl.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** Distinct sorted char-3-gram shingle hashes of an (already lowercased)
    * string: one hash per code-point position i ∈ [0, max(cpLen-2, 1)), each
    * `md5Head(substring(s, i, 3)) % 2147483647` — the same value set as the
    * r1 HOF formulation `transform(sequence(1, greatest(len-2, 1)), i ->
    * conv(substring(md5(substring(t, i, 3)), 1, 8), 16, 10) % 2147483647)`
    * followed by array_distinct + array_sort. Code-point stepping matches
    * Spark/DuckDB `substring` semantics on non-BMP text.
    */
  def charShingles(text: UTF8String): ArrayData = {
    val s = text.toString
    // code-point start offsets (in chars) — ASCII fast path is just i
    val n = s.length
    val starts = new Array[Int](n + 1)
    var cp = 0
    var ci = 0
    while (ci < n) {
      starts(cp) = ci
      ci += Character.charCount(s.codePointAt(ci))
      cp += 1
    }
    starts(cp) = n
    val cpLen = cp
    val count = math.max(cpLen - 2, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val to = starts(math.min(i + 3, cpLen))
      out(i) = md5Head(s.substring(from, to).getBytes("UTF-8")) % 2147483647L
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedupe in place over the sorted array
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || out(w - 1) != out(r)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Per-document intra-repetition counts (t166): tokenize the (already
    * lowercased) string as maximal `[a-z]+` runs — a byte scan, equivalent
    * to `regexp_extract_all(lower(text), '[a-z]+')` because multi-byte
    * UTF-8 units are ≥ 0x80 and never match — then for each n ∈ {2, 3, 4}
    * count word-n-grams and DISTINCT word-n-grams. Returns
    * [t2, s2, t3, s3, t4, s4]. Only within-document hash EQUALITY matters
    * (the counts are what surfaces), so grams are keyed by an FNV-1a token
    * hash folded across the window — equal token sequences always collide,
    * different ones with P ≈ m²/2⁶⁵ per doc (t117's collision argument; a
    * hit would be a deterministic, visible gate failure, not a flake). */
  def intraDupCounts(text: UTF8String): ArrayData = {
    val b = text.getBytes
    // token hashes: FNV-1a over each [a-z]+ run
    var toks = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < b.length) {
      if (b(i) >= 'a' && b(i) <= 'z') {
        var h = -3750763034362895579L // FNV-1a offset basis
        while (i < b.length && b(i) >= 'a' && b(i) <= 'z') {
          h = (h ^ (b(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        if (nTok == toks.length) toks = java.util.Arrays.copyOf(toks, nTok * 2)
        toks(nTok) = h
        nTok += 1
      } else i += 1
    }
    val out = new Array[Long](6)
    var n = 2
    while (n <= 4) {
      val count = nTok - n + 1
      if (count > 0) {
        val g = new Array[Long](count)
        var j = 0
        while (j < count) {
          var h = -7046029254386353131L
          var k = 0
          while (k < n) { h = (h ^ toks(j + k)) * -7070675565921424023L; k += 1 }
          g(j) = h
          j += 1
        }
        java.util.Arrays.sort(g)
        var distinct = 0
        j = 0
        while (j < count) {
          if (j == 0 || g(j - 1) != g(j)) distinct += 1
          j += 1
        }
        out((n - 2) * 2) = count.toLong
        out((n - 2) * 2 + 1) = distinct.toLong
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** First 8 md5 bytes as a big-endian 64-bit value (the signed Long carries
    * the same bit pattern the oracle reads as
    * `CAST('0x' || substring(md5(s), 1, 16) AS UBIGINT)`). */
  private def md5Head64(bytes: Array[Byte]): Long = {
    val d = md5tl.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v
  }

  /** 64-bit md5Head of every `\S+` token, in match order, feeding the 64-bit
    * simhash — the oracle's `CAST('0x' || substring(md5(tok), 1, 16) AS
    * UBIGINT)` bit pattern carried in a signed Long. */
  def tokenHashes64(text: UTF8String): ArrayData = {
    val s = text.toString
    val m = ws.matcher(s)
    val buf = new java.util.ArrayList[Long]()
    while (m.find()) buf.add(md5Head64(s.substring(m.start(), m.end()).getBytes("UTF-8")))
    val out = new Array[Long](buf.size())
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct sorted 64-bit md5Head hashes of every word n-gram (`\S+`
    * tokens joined by single spaces) — the oracle's
    * `CAST('0x' || substring(md5(t[i] || ' ' || …), 1, 16) AS UBIGINT)` bit
    * pattern carried in a signed Long. Used as contamination-check join keys
    * (t48) where only equality matters, so the sign never surfaces. */
  def wordNgramHashes64(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val m = ws.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(s.substring(m.start(), m.end()))
    val count = toks.size() - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks.get(i + k)); k += 1 }
      out(i) = md5Head64(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || out(w - 1) != out(r)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  // ---- positional k-gram fingerprints (round-14 kernel) -------------------
  // DupSpans/TemplateGrams keyed their k-grams as xxhash64(concat_ws(...))
  // over a per-window slice: three allocations (slice array, joined string,
  // byte copy) and O(k·token_len) hashed bytes PER WINDOW POSITION. These
  // fingerprints are internal only (never mirrored in an oracle — DupSpans
  // string-verifies candidates, TemplateGrams surfaces only counts), so the
  // hash is free to change: hash each token ONCE, then combine k consecutive
  // token hashes with a multiply-xor polynomial + an avalanche finish —
  // O(k) word ops per window, zero per-window allocation. Collision quality
  // is the same 64-bit-birthday class as the old xxhash64 (t117's argument),
  // and two windows collide in the polynomial only with fmix64-grade
  // randomness since every token hash is already avalanched.

  /** murmur3 64-bit finalizer — full-entropy avalanche. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** FNV-1a 64 over the token's UTF-8 bytes, avalanched. */
  private def tokenFp(tok: UTF8String): Long = {
    val b = tok.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    fmix64(h)
  }

  private final val KgramPrime = 0x9e3779b97f4a7c15L

  /** One 64-bit fingerprint per k-gram start position (1-based position i
    * covers tokens [i, i+k-1]); array length = numTokens − k + 1. Callers
    * must ensure numTokens ≥ k (DupSpans/TemplateGrams filter first). */
  def kgramHashesAt(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      th(i) = if (t == null) 0L else tokenFp(t)
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Long](if (m > 0) m else 0)
    i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h ^ th(i + j)) * KgramPrime; j += 1 }
      out(i) = fmix64(h ^ k.toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct sorted [[kgramHashesAt]] — per-ROW gram dedup, so callers
    * that only need the per-document gram SET skip the corpus-wide
    * distinct() exchange the explode-then-distinct shape paid. */
  def kgramHashesDistinct(toks: ArrayData, k: Int): ArrayData = {
    val at = kgramHashesAt(toks, k)
    val n = at.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = at.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || a(w - 1) != a(r)) { a(w) = a(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(a, w))
  }

  // ---- BPE merge passes (round-14 kernel) ---------------------------------
  // The trainer/encoder merge fold was an `aggregate(slice(...))` HOF —
  // Spark evaluates higher-order lambdas on the INTERPRETED path, and the
  // fold runs once per vocabulary word per rule (encode: per round). These
  // are the same leftmost-greedy semantics as the HOF form: a just-merged
  // symbol never immediately re-merges, and in the single-pass batch form
  // at most one rule can match per step (acceptBatch's C1/C2 disjointness).

  /** One leftmost-greedy non-overlapping pass applying whichever of the
    * pairwise-disjoint rules matches at each step (the trainer's batch
    * form). `lhs`/`rhs`/`merged` are parallel arrays. */
  def applyMergesBatch(
      toks: ArrayData,
      lhs: Array[UTF8String],
      rhs: Array[UTF8String],
      merged: Array[UTF8String]): ArrayData = {
    val n = toks.numElements()
    if (n <= 1) return toks.copy()
    val out = new Array[AnyRef](n)
    out(0) = toks.getUTF8String(0)
    var w = 1
    var i = 1
    while (i < n) {
      val x = toks.getUTF8String(i)
      val last = out(w - 1).asInstanceOf[UTF8String]
      var r = 0
      var hit = -1
      while (hit < 0 && r < lhs.length) {
        if (lhs(r).equals(last) && rhs(r).equals(x)) hit = r
        r += 1
      }
      if (hit >= 0) out(w - 1) = merged(hit)
      else { out(w) = x; w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** The encoder's form: apply each rule as its OWN full leftmost-greedy
    * pass, in learned order — identical to chaining one fold per rule. */
  def applyMergesSeq(
      toks: ArrayData,
      lhs: Array[UTF8String],
      rhs: Array[UTF8String],
      merged: Array[UTF8String]): ArrayData = {
    val n0 = toks.numElements()
    var cur = new Array[AnyRef](n0)
    var n = n0
    var i = 0
    while (i < n0) { cur(i) = toks.getUTF8String(i); i += 1 }
    var r = 0
    while (r < lhs.length && n > 1) {
      val a = lhs(r); val b = rhs(r); val ab = merged(r)
      val out = new Array[AnyRef](n)
      out(0) = cur(0)
      var w = 1
      i = 1
      while (i < n) {
        val x = cur(i).asInstanceOf[UTF8String]
        if (a.equals(out(w - 1).asInstanceOf[UTF8String]) && b.equals(x)) out(w - 1) = ab
        else { out(w) = x; w += 1 }
        i += 1
      }
      cur = out
      n = w
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cur, n))
  }

  /** MinHash permutation constants: a_k = ((2k+1)·1103515245) mod p,
    * b_k = 12345k+7, p = 2^31-1 (SURVEY §2 minhash spec; mirrored verbatim
    * in the t31 oracle SQL). */
  final val MinHashK = 32
  final val P31 = 2147483647L
  private val mhA: Array[Long] =
    Array.tabulate(MinHashK)(k => ((2L * k + 1L) * 1103515245L) % P31)
  private val mhB: Array[Long] =
    Array.tabulate(MinHashK)(k => 12345L * k + 7L)

  /** K=32 minhash signature over a shingle-hash array: for each k,
    * min over h of (a_k·h + b_k) mod p. All intermediates < 2^62. */
  def minhashSig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](MinHashK)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = shingles.getLong(i)
      var k = 0
      while (k < MinHashK) {
        val v = (mhA(k) * h + mhB(k)) % P31
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit majority-vote simhash over 64-bit token hashes: bit j set iff
    * Σ_tokens (bit j of hash ? +1 : -1) > 0 — the oracle's per-bit SUM/CASE,
    * exactly. Wide fingerprints keep the pigeonhole band key domain
    * corpus-scaled (7 bands of 9–10 bits = 512–1024 values/band vs a 32-bit
    * version's 16–32): band-bucket occupancy is corpus/2^bandBits, so the
    * in-bucket pair join stays near-linear far longer (Manku et al.,
    * WWW'07 §3). */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  /** Cosine similarity of two float arrays in double: three sequential folds
    * (dot, then each norm) then dot / (√na·√nb) — element order and operation
    * sequence identical to the r1 zip_with/aggregate version and DuckDB's
    * list_sum folds.
    *
    * Edge contract: RAGGED inputs (length mismatch) and NULL elements RAISE
    * rather than degrade — the earlier min-length/null-as-0.0 behavior
    * silently masked malformed embeddings with a plausible-looking score,
    * and the oracle formulation diverges on such rows anyway. A zero-norm
    * vector yields NaN (0/0), matching both engines' arithmetic. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    if (an != bn)
      throw new IllegalArgumentException(s"cosine: ragged vectors ($an vs $bn elements)")
    var dot = 0.0
    var i = 0
    while (i < an) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"cosine: null element at index $i")
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < an) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < bn) { val x = b.getFloat(i).toDouble; nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sequential-index-order dot product of two float vectors (same edge
    * contract as the cosine kernels: raise on ragged/null-element).
    * Left-fold order is bit-identical to DuckDB's
    * `list_sum(list_transform(...))` — the property the PCA power
    * iteration's zero-tolerance oracle rests on. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    if (an != bn)
      throw new IllegalArgumentException(s"dot: ragged vectors ($an vs $bn elements)")
    var dot = 0.0
    var i = 0
    while (i < an) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot: null element at index $i")
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** Same dot kernel (and same edge contract) for double arrays. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    if (an != bn)
      throw new IllegalArgumentException(s"dot: ragged vectors ($an vs $bn elements)")
    var dot = 0.0
    var i = 0
    while (i < an) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot: null element at index $i")
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  /** Same kernel (and same edge contract) for double arrays. */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    if (an != bn)
      throw new IllegalArgumentException(s"cosine: ragged vectors ($an vs $bn elements)")
    var dot = 0.0
    var i = 0
    while (i < an) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"cosine: null element at index $i")
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < an) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < bn) { val x = b.getDouble(i); nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** L2 norm of a float vector, or null if any element is NULL — the
    * REPORTING variant of the cosine kernels' raise-on-malformed contract
    * (a health check counts malformed vectors instead of dying on the
    * first one). Sequential index-order double fold, bit-identical to
    * DuckDB's `sqrt(list_sum(list_transform(emb, x -> x*x)))`. */
  def l2NormOrNull(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  /** Deterministic ±1 sign-random-projection planes (32 × 64), by the fixed
    * LCG-style formula embedded as a literal in the oracle SQL — bucket
    * assignment is bit-identical across engines. 32 planes give headroom to
    * scale `nBits` with corpus size (nBits ≈ log2(corpus / targetOccupancy),
    * so ~2^32·8 vectors before the plane pool itself needs to grow); each
    * query requests only the low `nBits` planes, so widening the pool never
    * changes existing bucket assignments. */
  final val SrpBits = 32
  final val SrpDims = 64
  val srpPlanes: Array[Array[Double]] =
    Array.tabulate(SrpBits, SrpDims) { (j, i) =>
      if ((((j * 2654435761L + i * 40503L + 12345L) % 97L) % 2L) == 0L) 1.0 else -1.0
    }

  /** SRP bucket of a float-array embedding: bit j of the result is set iff
    * the sequential dot product with plane j is ≥ 0. `nBits` ≤ [[SrpBits]]. */
  def srpBucket(emb: ArrayData, nBits: Int): Long = {
    val n = math.min(emb.numElements(), SrpDims)
    // raise-on-malformed like the cosine/dot kernels: a null element would
    // otherwise NPE on the Generic path or silently read 0.0f on the
    // Unsafe path — a representation-dependent bucket is worse than a
    // loud failure
    var i0 = 0
    while (i0 < n) {
      if (emb.isNullAt(i0))
        throw new IllegalArgumentException(s"srpBucket: null element at index $i0")
      i0 += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      val plane = srpPlanes(j)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += emb.getFloat(i).toDouble * plane(i); i += 1 }
      if (acc >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Code points of `s` — band DP below compares code points so non-BMP
    * text (surrogate pairs) counts one edit per character, matching the
    * builtin `levenshtein`'s code-point semantics. */
  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Banded Levenshtein with early exit (Ukkonen '85): the exact edit
    * distance when it is ≤ t, −1 otherwise — the builtin
    * `levenshtein(l, r, t)` contract, reimplemented as a tight
    * two-int-row band DP because this is the t130 verify hot loop
    * (candidate_pairs × len² cells): only cells with |i−j| ≤ t are
    * touched (O((2t+1)·len) not O(len²)), a length gap > t exits in
    * O(1), and a band row whose minimum exceeds t exits early — sound
    * because DP values never decrease along a path and any path crosses
    * every row, while out-of-band cells are ≥ |i−j| > t by construction.
    */
  def editDistBanded(au: UTF8String, bu: UTF8String, t: Int): Int = {
    if (t < 0) return -1
    var x = codePoints(au.toString)
    var y = codePoints(bu.toString)
    if (x.length < y.length) { val tmp = x; x = y; y = tmp } // distance is symmetric
    val n = x.length
    val m = y.length
    if (n - m > t) return -1
    if (m == 0) return n // n - 0 ≤ t already established
    val Inf = Int.MaxValue / 2
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, Inf)
    var j = 0
    while (j <= m && j <= t) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i - t > 1) i - t else 1
      val hi = if (i + t < m) i + t else m
      // no full-row reset (it would cost as much as the band itself): the
      // next row only ever reads prev[lo..hi+1] of THIS row, so priming
      // the two sentinel cells at the band edges is sufficient
      cur(lo - 1) = if (lo == 1 && i <= t) i else Inf
      if (hi + 1 <= m) cur(hi + 1) = Inf
      var best = cur(lo - 1)
      var jj = lo
      while (jj <= hi) {
        val cost = if (x(i - 1) == y(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best > t) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= t) prev(m) else -1
  }
}
