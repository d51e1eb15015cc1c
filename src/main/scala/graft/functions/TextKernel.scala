package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Text / vector sketching kernel behind the dedup & similarity expressions.
  * Static, allocation-lean, deterministic (fixed seeds — results reproducible
  * across runs and cluster topologies; no java.util.Random).
  */
object TextKernel {

  /** splitmix64 finalizer — fast, well-mixed 64-bit hash step. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seed-mixed 64-bit hash of a whole string: [[hashRange]] over every char,
    * xor'd with `seed` and re-mixed. Drives the HyperLogLog sketch
    * ([[graft.operators.Sketch]]); mirrored in SQL by OracleSql's
    * hashFold/codesOf (BMP code units, like every text mirror here).
    */
  def stringHash64(text: UTF8String, seed: Long): Long = {
    val s = text.toString
    mix64(hashRange(s, 0, s.length) ^ seed)
  }

  /** 64-bit hash of chars [from, until) of `s` (simple polynomial + mix). */
  private def hashRange(s: String, from: Int, until: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < until) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  // ---- char-bigram language model (CCNet-style LM quality filter) --------

  /** Alphabet for the bigram LM: ' '→0, other→1, a-z→2..27, 0-9→28..37.
    * Normalization first maps every codepoint outside [a-zA-Z0-9 ] to the
    * `other` class and ASCII-lowercases — so the whole downstream pipeline is
    * ASCII-pure and mirrors exactly to SQL's
    * `lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '_', 'g'))` (both iterate
    * CODEPOINTS: an emoji is one `other`, not two UTF-16 halves).
    */
  final val BigramAlphabet = 38

  @inline private def bigramClass(cp: Int): Int =
    if (cp == ' ') 0
    else if (cp >= 'a' && cp <= 'z') cp - 'a' + 2
    else if (cp >= 'A' && cp <= 'Z') cp - 'A' + 2
    else if (cp >= '0' && cp <= '9') cp - '0' + 28
    else 1

  /** Bigram ids (prev*38 + cur) over the normalized codepoint stream — the
    * distributed-fit side (explode + count collapses map-side to ≤ 1444
    * groups per partition).
    */
  def bigramIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < 2) return new GenericArrayData(Array.emptyIntArray)
    val ids = new Array[Int](n - 1)
    var i = 0
    var k = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = bigramClass(cp)
      if (prev >= 0) { ids(k) = prev * BigramAlphabet + c; k += 1 }
      prev = c
      i += Character.charCount(cp)
    }
    new GenericArrayData(ids)
  }

  /** Mean log-probability of the text's bigrams under `logp` (flat 38×38
    * array; fit by [[graft.operators.TextAnalysis.bigramLmFit]]). NaN for
    * texts with no bigram (callers null it out) — perplexity is
    * exp(-score).
    */
  def bigramScore(text: UTF8String, logp: ArrayData): Double = {
    val s = text.toString
    var i = 0
    var prev = -1
    var sum = 0.0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = bigramClass(cp)
      if (prev >= 0) { sum += logp.getDouble(prev * BigramAlphabet + c); n += 1 }
      prev = c
      i += Character.charCount(cp)
    }
    if (n == 0) Double.NaN else sum / n
  }

  /** MinHash signature over character `shingle`-grams, double-hashing scheme
    * (Kirsch–Mitzenmacher): h_i(x) = h1(x) + i·h2(x), so each shingle costs
    * numHashes adds instead of numHashes full hashes. One pass over the text,
    * running minima — no shingle materialization.
    */
  def minhashSig(text: UTF8String, numHashes: Int, shingle: Int): ArrayData = {
    val s = text.toString
    val sig = Array.fill(numHashes)(Long.MaxValue)
    def offer(h: Long): Unit = {
      val h2 = mix64(h ^ 0x1b873593c2b2ae35L) | 1L // odd stride
      var v = h
      var i = 0
      while (i < numHashes) {
        if (v < sig(i)) sig(i) = v
        v += h2
        i += 1
      }
    }
    val n = s.length
    if (n < shingle) offer(hashRange(s, 0, n))
    else {
      var p = 0
      while (p + shingle <= n) { offer(hashRange(s, p, p + shingle)); p += 1 }
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over whitespace/punct-split lowercase tokens. */
  def simhash64(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(s.charAt(i))) i += 1
      val start = i
      while (i < n && Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i > start) {
        val h = hashRange(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Distinct hashed word `n`-grams (sorted) — feed to array_intersect /
    * array_union for exact n-gram Jaccard verification.
    */
  def ngramsHashed(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val words = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !Character.isLetterOrDigit(s.charAt(i))) i += 1
      val start = i
      while (i < len && Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i > start) words += hashRange(s, start, i)
    }
    val grams = scala.collection.mutable.TreeSet[Long]()
    var j = 0
    while (j + n <= words.length) {
      var h = 0L
      var k = 0
      while (k < n) { h = mix64(h ^ words(j + k)); k += 1 }
      grams += h
      j += 1
    }
    if (grams.isEmpty && words.nonEmpty) { // shorter than n: one gram of all words
      var h = 0L
      words.foreach(w => h = mix64(h ^ w))
      grams += h
    }
    new GenericArrayData(grams.toArray)
  }

  /** Random-hyperplane (Rademacher ±1 components) sign sketch of a float
    * vector: bit p of the result = sign of <v, w_p>, w_p,d = ±1 from
    * mix64(seed, p, d). Up to 64 planes.
    */
  def vecSimhash(vec: ArrayData, nPlanes: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val w = if ((mix64(seed ^ (p.toLong << 32) ^ d) & 1L) == 0L) 1.0 else -1.0
        dot += w * vec.getFloat(d)
        d += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Johnson–Lindenstrauss Rademacher projection: `out(j) = (1/√outDim) ·
    * Σ_d ±v(d)`, signs drawn from the SAME mix64 plane family as
    * [[vecSimhash]] (so the oracle mirrors both with one weight CTE).
    * Distance-preserving to within the JL bound — project once, run any
    * bucketed ANN on the narrower vectors.
    */
  def vecProject(vec: ArrayData, outDim: Int, seed: Long): ArrayData = {
    val n = vec.numElements()
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var p = 0
    while (p < outDim) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val w = if ((mix64(seed ^ (p.toLong << 32) ^ d) & 1L) == 0L) 1.0 else -1.0
        dot += w * vec.getFloat(d)
        d += 1
      }
      out(p) = dot * inv
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Intersection size of two strictly-increasing int arrays — the verify
    * kernel of the set-similarity joins. Each side's token set is
    * dictionary-encoded to its global rare-first rank and sorted, so
    * |a ∩ b| is one O(n+m) merge scan in codegen instead of Spark's
    * interpreted `array_intersect` (hash build + string equality) per
    * candidate pair. Cardinality only — the dictionary is a bijection, so
    * the count equals the token-set intersection size exactly.
    */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Left-to-right dot product of two double arrays — the codegen'd twin of
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (bit-identical fold order),
    * for pair loops where the interpreted higher-order functions dominate
    * (measured ~10× on a million-pair verify).
    */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Cosine of two double arrays, zero-norm → 0.0 — the codegen'd twin of
    * [[graft.operators.Similarity.cosineSim]]'s three-fold shape: each
    * accumulator runs left-to-right independently, so results are
    * bit-identical to the HOF composition (the oracles' value-exact
    * contract survives the swap).
    */
  def vecCosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  /** Argmax-dot cell assignment against a FLAT row-major centroid matrix
    * (`cents` holds nlist·dim doubles): first index of the maximum dot —
    * the codegen'd replacement for a per-row CreateArray of nlist·dim
    * literal expressions, which both evaluates thousands of literals per
    * row and trips codegen limits past a few dozen cells.
    */
  def vecArgmaxDot(v: ArrayData, cents: ArrayData, dim: Int): Int = {
    val n = cents.numElements() / dim
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < n) {
      val off = c * dim
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += v.getDouble(d) * cents.getDouble(off + d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  // ---- product quantization ------------------------------------------------

  /** PQ encode against a FLAT codebook (`cb` holds m·ksub·dsub doubles,
    * row-major by (subspace, code)): per subspace, the code of the nearest
    * centroid by squared L2 over that subspace's `dsub` components. Strict
    * `<` keeps the LOWEST code on exact ties; accumulation is left-to-right —
    * OracleSql.simPq mirrors the fold order and the tie rule value-exactly
    * (Jégou et al. 2011, public literature; no FAISS code involved).
    */
  def vecPqEncode(v: ArrayData, cb: ArrayData, dsub: Int, ksub: Int): ArrayData = {
    val m = v.numElements() / dsub
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vo = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val co = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = v.getDouble(vo + j) - cb.getDouble(co + j)
          acc += d * d
          j += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table over the same flat codebook:
    * `lut[s·ksub + c]` = dot(query subvector s, centroid (s,c)), each inner
    * fold left-to-right. Computed ONCE per query (the broadcast side) so the
    * per-candidate score ([[pqAdc]]) is m lookups + adds instead of a
    * dim-wide dot.
    */
  def vecPqLut(v: ArrayData, cb: ArrayData, dsub: Int, ksub: Int): ArrayData = {
    val m = v.numElements() / dsub
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val vo = s * dsub
      var c = 0
      while (c < ksub) {
        val co = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) { acc += v.getDouble(vo + j) * cb.getDouble(co + j); j += 1 }
        out(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_s lut[s·ksub + code_s], left-to-right over
    * subspaces — identical grouping to the oracle's ordered two-level sum
    * (per-subspace partial dots, then the subspace fold), because double
    * addition is not associative and the mirror must match bit-for-bit.
    */
  def pqAdc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut.getDouble(s * ksub + codes.getInt(s)); s += 1 }
    acc
  }

  /** Sign-bit binary quantization: bit j set iff v[j] > 0 (strictly — zeros
    * and negatives clear), packed little-endian into one long. Requires
    * dim ≤ 64; the 64-dim test embeddings fill the word exactly. Hamming
    * distance between two sketches is `bit_count(a ^ b)` — a built-in on
    * both engines, so the mirror needs no kernel.
    */
  def vecSignBits(v: ArrayData): Long = {
    val n = v.numElements()
    require(n <= 64, s"vecSignBits packs into one long: dim must be <= 64, got $n")
    var out = 0L
    var j = 0
    while (j < n) { if (v.getDouble(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  // ---- language id --------------------------------------------------------

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "du", "au", "avec"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "para", "en", "del", "con", "por"),
    "de" -> Set("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "von", "zu", "mit", "den", "im", "für", "auf"),
    "it" -> Set("il", "la", "le", "di", "e", "un", "una", "è", "che", "per", "in", "del", "con", "non", "si"),
  )
  private val langs = stopwords.keys.toArray.sorted

  /** Heuristic language id: the language whose stopword set hits the most
    * tokens ("und" when tied/no evidence → first alphabetically with max, or
    * "unknown" when nothing matches; CJK-dominant text → "zh").
    */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var cjk = 0; var total = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.HIRAGANA ||
            block == Character.UnicodeBlock.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 2 > total) return UTF8String.fromString("zh")
    val tokens = s.split("[^\\p{L}]+").filter(_.nonEmpty)
    var best = "unknown"; var bestHits = 0
    langs.foreach { l =>
      val hits = tokens.count(stopwords(l))
      if (hits > bestHits) { best = l; bestHits = hits }
    }
    UTF8String.fromString(best)
  }

  /** 64-bit document fingerprint: xor-mix of the 4 smallest char-8-gram
    * hashes (winnowing-style — robust to reordering of large blocks, changes
    * with local edits).
    */
  def fingerprint(text: UTF8String): Long = {
    val s = text.toString
    val k = 4
    val minima = Array.fill(k)(Long.MaxValue)
    def offer(h: Long): Unit = {
      var i = 0
      var v = h
      while (i < k) {
        if (v < minima(i)) { val t = minima(i); minima(i) = v; v = t }
        i += 1
      }
    }
    val n = s.length
    if (n < 8) offer(hashRange(s, 0, n))
    else {
      var p = 0
      while (p + 8 <= n) { offer(hashRange(s, p, p + 8)); p += 1 }
    }
    var out = 0L
    var i = 0
    while (i < k) { if (minima(i) != Long.MaxValue) out = mix64(out ^ minima(i)); i += 1 }
    out
  }

  /** Robust winnowing fingerprints (the MOSS local fingerprinting scheme,
    * Schleimer/Wilkerson/Aiken SIGMOD'03): hash every char `k`-gram, slide a
    * window of `w` consecutive gram hashes, select each window's RIGHTMOST
    * minimal hash (signed compare — the SQL mirror minimizes the signed
    * representation), and emit the distinct selected (pos, hash) pairs in
    * position order as an array of structs.
    *
    * Guarantees: every run of `w` consecutive grams contributes at least one
    * fingerprint (so detection is position-uniform), and any substring of
    * length >= k + w - 1 shared by two documents shares at least one
    * fingerprint — the local, deterministic alternative to sampling schemes
    * that can miss matches. Texts shorter than `k` emit no fingerprints;
    * texts with fewer than `w` grams are treated as a single window.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val p = s.length - k + 1
    if (p <= 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](p)
    var i = 0
    while (i < p) { h(i) = hashRange(s, i, i + k); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val lastStart = math.max(p - w, 0)
    var minPos = -1
    var q = 0
    while (q <= lastStart) {
      val end = math.min(q + w, p)
      if (minPos < q) {
        // the previous minimum slid out: rescan for the rightmost minimum
        minPos = q
        var j = q + 1
        while (j < end) { if (h(j) <= h(minPos)) minPos = j; j += 1 }
      } else if (h(end - 1) <= h(minPos)) {
        // new gram entered on the right; <= keeps the rightmost-tie rule
        minPos = end - 1
      }
      if (out.isEmpty ||
          out.last.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getInt(0) != minPos)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](minPos, h(minPos)))
      q += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Deflate compression ratio of the UTF-8 bytes (compressed / raw, level
    * 6, no dictionary): the classic redundancy signal for corpus quality
    * gates — highly repetitive or templated text compresses far below
    * natural prose (~0.4-0.6), random noise stays near 1. Deterministic for
    * a given JDK zlib; empty text ratios 1.0.
    */
  // one native zlib stream per executor thread, reset() between rows — a
  // per-row new/end pair is a JNI allocation/free on every document
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }

  def compressRatio(text: org.apache.spark.unsafe.types.UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length
  }

  /** PassJoin segment keys, index side: a length-l string split into d+1
    * contiguous segments (longer segments first), each emitted as the join
    * key "slot:l:segment". If ed(s, t) <= d, at most d segments are touched
    * by an edit, so at least one survives verbatim in t (pigeonhole) —
    * probing [[passjoinProbe]] against these keys yields a complete
    * candidate set for an edit-distance threshold join.
    */
  def passjoinIndex(text: org.apache.spark.unsafe.types.UTF8String, d: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val k = d + 1
    val l = s.length
    val base = l / k
    val rem = l % k
    val out = new Array[Any](k)
    var i = 0
    var start = 0
    while (i < k) {
      val len = base + (if (i < rem) 1 else 0)
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(
        s"$i:$l:${s.substring(start, start + len)}")
      start += len
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** PassJoin segment keys, probe side: every substring of `text` that could
    * equal slot i of a length-l index string for l within +-d of |text| and
    * start within +-d of that segment's home position (each edit shifts
    * later characters by at most one). Keys are deduped per row; the result
    * is a compile-time-bounded (d+1)(2d+1)(2d+1) list, NOT a function of
    * string length, so the probe fan-out stays O(1) per row at any scale.
    */
  def passjoinProbe(text: org.apache.spark.unsafe.types.UTF8String, d: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val m = s.length
    val k = d + 1
    val seen = new java.util.LinkedHashSet[String]
    var l = math.max(0, m - d)
    while (l <= m + d) {
      val base = l / k
      val rem = l % k
      var i = 0
      var segStart = 0
      while (i < k) {
        val len = base + (if (i < rem) 1 else 0)
        var shift = -d
        while (shift <= d) {
          val st = segStart + shift
          if (st >= 0 && st + len <= m)
            seen.add(s"$i:$l:${s.substring(st, st + len)}")
          shift += 1
        }
        segStart += len
        i += 1
      }
      l += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
