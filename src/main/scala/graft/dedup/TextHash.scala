package graft.dedup

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM core of the fused text-dedup expressions (the CanonCore pattern:
  * generated code makes ONE static call, keeping the enclosing projection
  * tiny and codegen'd).
  *
  * [[strHash60]] is bit-compatible with the declarative
  * `conv(substring(md5(s), 1, 15), 16, 10)` (TextOps.strHash) and with
  * the DuckDB oracle's `CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)`:
  * the first 15 hex nibbles of the MD5 digest as a 60-bit non-negative
  * Long — which is what makes every fused operator hash-identical to both
  * the Column twin and the SQL oracle.
  */
object TextHash {

  val P: Long = 2147483647L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(utf8 bytes) as a Long (60 bits). */
  def strHash60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // nibbles 0..14: bytes 0..6 fully (14 nibbles) + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** MinHash signature over distinct shingles: for each permutation j,
    * min over shingles of (a(j) * (strHash60 % P) + b(j)) % P; empty or
    * all-null input leaves the slot at P (the fold twin's init). Null
    * shingle elements are SKIPPED — mirroring `least(acc, null) = acc`
    * in the zip_with fold.
    */
  def minhashSig(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val acc = Array.fill(k)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = strHash60(shingles.getUTF8String(i)) % P
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % P
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** MinHash signature straight from the TOKEN array: slides the n-gram
    * window, joins each window with " " (concat_ws semantics: null
    * elements skipped), hashes, folds the per-permutation min — no
    * shingle array, no distinct (duplicate shingles cannot change a
    * min), no intermediate per-shingle hash arrays. Bit-identical to
    * `minhashSig(array_distinct(shingles(tokens, n)), a, b)`:
    * fewer-than-n tokens degrade to the single whole-join shingle,
    * exactly like TextOps.shingles.
    */
  def minhashTokens(tokens: ArrayData, n: Int,
      a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val acc = Array.fill(k)(P)
    val m = tokens.numElements()
    val sep = UTF8String.fromString(" ")
    def fold(from: Int, until: Int): Unit = {
      val parts = new Array[UTF8String](until - from)
      var i = from
      while (i < until) {
        // concat_ws skips nulls; UTF8String.concatWs does the same
        parts(i - from) = if (tokens.isNullAt(i)) null
          else tokens.getUTF8String(i)
        i += 1
      }
      val h = strHash60(UTF8String.concatWs(sep, parts: _*)) % P
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % P
        if (v < acc(j)) acc(j) = v
        j += 1
      }
    }
    if (m >= n) {
      var s = 0
      while (s <= m - n) { fold(s, s + n); s += 1 }
    } else fold(0, m)
    new GenericArrayData(acc)
  }

  /** Winnowing fingerprint set (Schleimer'03) in one pass: k-char-gram
    * hashes of the normalized text, sliding w-window minima, distinct,
    * ascending. Bit-identical to the staged Column pipeline
    * `winnowMins(winnowHashes(norm, k), w)` (TextOps): empty norm =>
    * empty set; shorter-than-k norm degrades to the single whole-string
    * gram; fewer-than-w grams to the single global min. `norm` is
    * [a-z0-9]-only by construction (winnowNorm), so byte == char
    * positions and the substring walk is exact.
    */
  def winnowSet(norm: UTF8String, k: Int, w: Int): ArrayData = {
    val nb = norm.numBytes()
    if (nb == 0) return new GenericArrayData(Array.empty[Long])
    val grams: Array[Long] =
      if (nb >= k) {
        val out = new Array[Long](nb - k + 1)
        var i = 0
        while (i <= nb - k) {
          out(i) = strHash60(norm.substring(i, i + k)) % P
          i += 1
        }
        out
      } else Array(strHash60(norm) % P)
    val mins: Array[Long] =
      if (grams.length >= w) {
        val out = new Array[Long](grams.length - w + 1)
        var j = 0
        while (j <= grams.length - w) {
          var m = Long.MaxValue
          var t = j
          while (t < j + w) { if (grams(t) < m) m = grams(t); t += 1 }
          out(j) = m
          j += 1
        }
        out
      } else Array(grams.min)
    new GenericArrayData(mins.distinct.sorted)
  }

  /** 32-bit SimHash over distinct tokens: bit i set iff the sum over
    * tokens of +-1 (by bit i of the token hash) is >= 0. Empty input =>
    * all sums 0 => all 32 bits set (the fold twin's value). A NULL token
    * element contributes -1 to every bit — mirroring the twin's
    * `when(null & mask != 0, 1).otherwise(-1)` null semantics.
    */
  def simhash32(tokens: ArrayData): Long = {
    val sums = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        var bit = 0
        while (bit < 32) { sums(bit) -= 1; bit += 1 }
      } else {
        val h = strHash60(tokens.getUTF8String(i))
        var bit = 0
        while (bit < 32) {
          if (((h >>> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 32) {
      if (sums(bit) >= 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
