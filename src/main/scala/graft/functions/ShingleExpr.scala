package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes of a WHITESPACE-NORMALIZED
  * document in one native pass: 64-bit xxhash64 (Spark's seed-42
  * XXH64, identical to `xxhash64(gram)`) of every word n-gram, distinct
  * in first-occurrence order, with NO per-gram string materialization.
  *
  * The input must already be `regexp_replace(trim(text), "\\s+", " ")`
  * — single spaces, no leading/trailing whitespace. Under that
  * normalization every word n-gram `concat_ws(" ", w(i..i+n-1))` is a
  * CONTIGUOUS byte range of the input, so each gram hash is one
  * `XXH64.hashUnsafeBytes` over the shared buffer: zero allocations
  * per gram, versus the column formulation
  * (`array_distinct(transform(arrays_zip(slices), concat_ws))` then
  * `xxhash64` per exploded row) which materializes the zipped struct
  * array, every gram string, and runs its lambdas interpreted.
  *
  * Semantics replicated from [[graft.dedup.Dedup.wordShingles]]:
  * fewer than n tokens (including the empty document) collapse to one
  * whole-text gram; distinct keeps the first occurrence. Distinctness
  * is by HASH here rather than by string — identical modulo 64-bit
  * collisions, which downstream MinHash/Jaccard treats as what they
  * are: the same hash. Null input yields null, so a null document
  * drops out of explode-based pipelines — a DELIBERATE change from
  * wordShingles, whose when/otherwise collapsed null text to the
  * empty-string shingle and thereby made every null document a
  * jaccard-1.0 "near-duplicate" of every empty document.
  */
private[functions] object WordGrams {

  /** Token start offsets of a whitespace-normalized byte string:
    * starts(t) is the byte offset of token t, and starts(nTokens) is
    * `bytes.length + 1` — a virtual space after the last token, so a
    * gram spanning tokens [from, until) is the byte range
    * [starts(from), starts(until) − 1). The normalized empty document
    * is ONE empty token, matching `split("", "\\s+")`. A space byte
    * (0x20) never occurs inside a multi-byte UTF-8 sequence, so the
    * raw byte scan is character-safe. */
  def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTokens += 1
      i += 1
    }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    starts
  }

  /** Byte range [from, until) of the gram spanning tokens
    * [fromTok, untilTok): starts(fromTok) up to the byte before the
    * (possibly virtual) space that follows token untilTok − 1. */
  @inline def gramFrom(starts: Array[Int], fromTok: Int): Int = starts(fromTok)
  @inline def gramUntil(starts: Array[Int], untilTok: Int): Int = starts(untilTok) - 1

  /** Seed-42 XXH64 of the gram's byte range ≡ `xxhash64(gram)`. */
  def gramXxHash(bytes: Array[Byte], starts: Array[Int], fromTok: Int, untilTok: Int): Long = {
    val from = gramFrom(starts, fromTok)
    val until = gramUntil(starts, untilTok)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
  }
}

case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = WordGrams.tokenStarts(bytes)
    val nTokens = starts.length - 1
    def gramHash(fromTok: Int, untilTok: Int): Long =
      WordGrams.gramXxHash(bytes, starts, fromTok, untilTok)
    if (nTokens < n) {
      new GenericArrayData(Array(gramHash(0, nTokens)))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]
      var g = 0
      while (g <= nTokens - n) {
        seen.add(gramHash(g, g + n))
        g += 1
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** POSITIONAL word n-gram shingle hashes of a whitespace-normalized
  * document: hash(t) of the gram STARTING at word t, in word order,
  * NON-distinct — the array index IS the (0-based) start position, so
  * `posexplode` recovers (position, hash) rows with no struct
  * materialization. Same seed-42 XXH64 byte-range hashing as
  * [[ShingleHashes]] (≡ `xxhash64(gram_string)`), same normalization
  * contract on the input.
  *
  * Two deliberate differences from [[ShingleHashes]]: no whole-text
  * fallback for documents shorter than n words (they return an EMPTY
  * array — a span shorter than the pattern length cannot be a
  * boilerplate match site), and no distinctness (every occurrence is
  * a removable site). Built for [[graft.text.TextAnalysis.stripBoilerplate]],
  * whose match join needs every start position of every frequent gram. */
case class ShingleHashStarts(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_starts needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = WordGrams.tokenStarts(bytes)
    val nTokens = starts.length - 1
    if (nTokens < n) {
      new GenericArrayData(Array.emptyLongArray)
    } else {
      val out = new Array[Long](nTokens - n + 1)
      var g = 0
      while (g <= nTokens - n) {
        out(g) = WordGrams.gramXxHash(bytes, starts, g, g + n)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashStarts =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_starts"
}

/** The whole MinHash signature of a document's distinct shingle-hash
  * array in ONE map-side expression: sig(i) = min over input hashes h
  * of `XXH64.hashLong(h, seed(i))` with seed(i) ≡ Spark's hash state
  * after folding the literal int i into xxhash64's default seed 42 —
  * bit-identical to [[MinHashAgg]] over the exploded rows (same k
  * seed-hash construction over the same distinct hash values), which
  * in turn is value-identical to the k-column
  * `min(xxhash64(lit(i), h))` form.
  *
  * Why an expression and not the aggregate: the group key of that
  * aggregate IS the row id, so it isn't really an aggregate — the
  * explode materializes one row per shingle and the groupBy shuffles
  * a partial signature per document, all to compute something each
  * row already holds. One eval per document keeps the k×|shingles|
  * seed-hash loop tight and the plan shuffle-free; pair with
  * [[ShingleHashes]] for the input. [[MinHashAgg]] remains the right
  * tool when the grouping is genuinely coarser than a row.
  *
  * An empty input array yields null (the aggregate's no-input
  * semantics); null input yields null. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs an array<bigint> input, got $other")
  }

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = a.getLong(j)
      var i = 0
      while (i < numHashes) {
        val hv = XXH64.hashLong(h, seeds(i))
        if (hv < sig(i)) sig(i) = hv
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** One-permutation MinHash signature (Li/Owen/Zhang NIPS'12) with
  * optimal densification (Shrivastava ICML'17): each distinct shingle
  * hash is binned by its unsigned residue mod k and the signature slot
  * is the signed MIN hash within the bin — ONE hash lookup per
  * shingle instead of [[MinHashSignature]]'s k seed-hashes per
  * shingle, an O(k) → O(1) per-shingle cost drop (the dominant
  * map-side dedup cost at corpus scale: k=128 over ~190M shingle
  * instances at sf0.1 alone).
  *
  * Empty bins (documents with fewer shingles than bins leave some
  * empty) are densified by copying the value of a FILLED bin chosen
  * by an independent per-(bin, attempt) probe sequence —
  * Shrivastava's "optimal" variant: probes depend only on the empty
  * bin's index, never on the fill pattern, so two documents' empty
  * bins probe identically and the collision estimator stays unbiased.
  * The probe target set is the ORIGINAL filled bins (densified bins
  * are not re-copied).
  *
  * Signatures are banding-compatible with the k-hash form (same
  * array<long> shape) but NOT value-compatible — pick ONE mode per
  * corpus. Element distribution differs too: slots hold raw shingle
  * hashes, not seed-hash minima; the LSH bucket hash absorbs that.
  * Null/empty input yields null, matching [[MinHashSignature]]. */
case class OnePermSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"oph_signature needs an array<bigint> input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    val filled = new Array[Boolean](numHashes)
    var j = 0
    while (j < n) {
      val h = a.getLong(j)
      val bin = java.lang.Long.remainderUnsigned(h, numHashes).toInt
      if (!filled(bin) || h < sig(bin)) { sig(bin) = h; filled(bin) = true }
      j += 1
    }
    var i = 0
    while (i < numHashes) {
      if (!filled(i)) {
        // Deterministic probe walk over the original filled bins; at
        // least one bin is filled (n > 0), so this terminates with
        // expected k/filled attempts.
        var attempt = 1L
        var done = false
        while (!done) {
          val p = java.lang.Long.remainderUnsigned(
            XXH64.hashLong((i.toLong << 32) | attempt, 0x5bd1e995L), numHashes).toInt
          if (filled(p)) { sig(i) = sig(p); done = true }
          attempt += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): OnePermSignature =
    copy(child = newChild)

  override def prettyName: String = "oph_signature"
}

/** The whole SimHash-64 sketch of a whitespace-normalized document as
  * ONE map-side expression: distinct word n-gram fields → 64 signed
  * bit votes → sketch, with no explode, no aggregate, and no shuffle
  * (the relational explode + [[SimHashAgg]] formulation shuffles one
  * partial sketch per document and pays the per-gram-row aggregate
  * machinery; this pays one eval per document).
  *
  * Value-identical to `simhashSketches`'s explode + SimHashAgg over
  * `wordShingles` in both hash modes:
  *   - `xxhash64`: gram field = seed-42 XXH64 of the gram's byte
  *     range (≡ `xxhash64(gram)`); bit b of the field votes ±1 on
  *     sketch bit b;
  *   - `md5`: gram field = the first 16 hex chars of the gram's md5
  *     as a big-endian unsigned long; bit b is bit (b mod 4) of hex
  *     nibble (b div 4) — [[SimHashAgg]]'s engine-reproducible
  *     definition, read here straight from the digest's first 8 bytes.
  *
  * Gram distinctness is by 64-bit gram hash rather than by gram
  * string — identical modulo collisions (the [[ShingleHashes]]
  * argument); in md5 mode the cheap XXH64 also gates which grams get
  * the expensive digest. Ties vote to 0 (bit clear). Fewer than n
  * tokens collapse to one whole-text gram. Null input yields null;
  * [[graft.dedup.Dedup.simhashSketches]] filters null documents out
  * entirely — a DELIBERATE change from the explode form, which
  * collapsed null text to the empty-string shingle and gave null and
  * empty documents identical sketches.
  */
case class SimHashSketch(child: Expression, n: Int, hashMode: String)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be positive: $n")

  private val isMd5 = hashMode match {
    case "md5" => true
    case "xxhash64" => false
    case other => throw new IllegalArgumentException(s"unknown hashMode: $other")
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sketch needs a string input, got $other")
  }

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = WordGrams.tokenStarts(bytes)
    val nTokens = starts.length - 1
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]
    def vote(fromTok: Int, untilTok: Int): Unit = {
      val gh = WordGrams.gramXxHash(bytes, starts, fromTok, untilTok)
      if (!seen.add(gh)) return
      val field: Long =
        if (isMd5) {
          val from = WordGrams.gramFrom(starts, fromTok)
          md.update(bytes, from, WordGrams.gramUntil(starts, untilTok) - from)
          val d = md.digest() // resets the instance
          // First 8 digest bytes, big-endian ≡ parseUnsignedLong of
          // the first 16 lowercase-hex chars.
          var f = 0L
          var i = 0
          while (i < 8) { f = (f << 8) | (d(i) & 0xffL); i += 1 }
          f
        } else gh
      var b = 0
      while (b < 64) {
        votes(b) += (if (SimHashBits.isSet(field, b, isMd5)) 1 else -1)
        b += 1
      }
    }
    if (nTokens < n) vote(0, nTokens)
    else {
      var g = 0
      while (g <= nTokens - n) { vote(g, g + n); g += 1 }
    }
    var sk = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sk |= (1L << b)
      b += 1
    }
    sk
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)

  override def prettyName: String = "simhash_sketch"
}
