package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit hash kernels for the text-dedup operators. All pure
  * static functions so the Catalyst expressions below can call them from
  * generated code without breaking whole-stage codegen.
  */
object GraftHash {
  final val Prime61: Long = (1L << 61) - 1

  /** splitmix64 — deterministic per-seed stream of hash coefficients. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — token-level base hash. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Hash each k-token shingle of a token array: chained FNV-64 over the
    * tokens of the window (token boundary folded in). One tight loop —
    * this replaces a `transform(sequence(...), lambda)` pipeline that
    * would run on the interpreted expression path (~25µs/shingle there,
    * ~0.1µs here).
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val m = math.max(0, n - k + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        val tok = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i + j)
        val bytes = tok.getBytes
        var b = 0
        while (b < bytes.length) { h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1 }
        h ^= 0x1fL; h *= 0x100000001b3L // token separator
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shingle + MinHash fused: k-token shingles hashed and folded into an
    * n-hash MinHash signature in one pass, no intermediate shingle array.
    */
  def shingleMinHash(tokens: ArrayData, k: Int, n: Int, seed: Long): ArrayData = {
    minhashSig(shingleHashes(tokens, k), n, seed)
  }

  /** MinHash signature of a shingle-hash set: n universal hashes
    * h_i(x) = (a_i*x + b_i) mod (2^61-1), min over shingles per i.
    */
  def minhashSig(shingles: ArrayData, n: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = splitmix64(seed + 2L * i) | 1L // odd multiplier
      val b = splitmix64(seed + 2L * i + 1)
      var minV = Long.MaxValue
      var j = 0
      val m = shingles.numElements()
      while (j < m) {
        val x = shingles.getLong(j)
        val v = java.lang.Math.floorMod(a * x + b, Prime61)
        if (v < minV) minV = v
        j += 1
      }
      sig(i) = if (m == 0) Long.MaxValue else minV
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Hash each of `bands` contiguous blocks of a MinHash signature into
    * one long (FNV over the block's values + band index) — the LSH bucket
    * keys, computed natively.
    */
  def sigBands(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val per = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var j = 0
      while (j < per) {
        val v = sig.getLong(b * per + j)
        var s = 0
        while (s < 64) { h ^= ((v >>> s) & 0xffL); h *= 0x100000001b3L; s += 8 }
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash64 over a token array: per-bit vote of each token's FNV hash. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var j = 0
    val m = tokens.numElements()
    while (j < m) {
      if (!tokens.isNullAt(j)) {
        val h = fnv64(tokens.getUTF8String(j))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Min rolling polynomial hash over all k-byte windows (Karp–Rabin with
    * base 257 mod 2^61-1) — a winnowing-style document fingerprint that is
    * stable under content shifts. Text shorter than k hashes whole.
    */
  def rollingFingerprint(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val B = 257L
    if (n == 0) return 0L
    val win = math.min(k, n)
    // B^(win-1) mod p
    var pow = 1L
    var i = 0
    while (i < win - 1) { pow = mulMod(pow, B); i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = addMod(mulMod(h, B), bytes(i) & 0xffL); i += 1 }
    var minH = h
    i = win
    while (i < n) {
      h = subMod(h, mulMod(bytes(i - win) & 0xffL, pow))
      h = addMod(mulMod(h, B), bytes(i) & 0xffL)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  /** Count of positions where two equal-length long arrays agree — the
    * MinHash signature-agreement kernel (estimated Jaccard = agree/n).
    * One tight loop; replaces an `aggregate(zip_with(...))` pipeline that
    * would run per candidate pair on the interpreted expression path.
    */
  def sigAgreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var same = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) same += 1
      i += 1
    }
    same
  }

  /** Count of tokens present in a fixed word set (duplicates counted) —
    * the stopword-hit kernel for language ID / quality scoring. Set
    * membership on UTF8String, no per-token lambda dispatch.
    */
  def stopwordHits(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var hits = 0
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  /** Count of array elements present in a SORTED long array (binary
    * search per element, no boxing) — the membership kernel for checking
    * hashed shingles against a broadcast benchmark set.
    */
  def sortedHits(values: ArrayData, sorted: Array[Long]): Int = {
    var hits = 0
    var i = 0
    val n = values.numElements()
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, values.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }

  /** Boilerplate-covered token count in one pass: for each position i
    * (0-based) whose k-shingle hash is in the sorted hot set, the window
    * [i+1, i+k] (1-based tokens) is covered; adjacent/overlapping
    * windows merge as they stream by (positions arrive in order, so the
    * interval union needs only the running end). The d13 kernel, usable
    * map-side against a pinned hot set.
    */
  def coveredTokens(shingles: ArrayData, sorted: Array[Long], k: Int): Long = {
    var total = 0L
    var curStart = -1L
    var curEnd = -1L
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(sorted, shingles.getLong(i)) >= 0) {
        val p = i + 1L
        if (curStart < 0) { curStart = p; curEnd = p + k - 1 }
        else if (p <= curEnd + 1) { curEnd = p + k - 1 }
        else { total += curEnd - curStart + 1; curStart = p; curEnd = p + k - 1 }
      }
      i += 1
    }
    if (curStart >= 0) total += curEnd - curStart + 1
    total
  }

  /** Σ weights[pmod(h, weights.length)] over an array<long> of feature
    * hashes — the map-side scoring kernel for hashed-feature linear
    * models (DSIR importance weights): one tight loop, no explode, no
    * join, no boxing. weights.length MUST be a power of two so the
    * JVM's signed pmod equals the oracle's unsigned mod (low bits of
    * the two's-complement representation agree).
    */
  def bucketWeightSum(hashes: ArrayData, weights: Array[Double]): Double = {
    val m = weights.length
    var s = 0.0
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      s += weights(((hashes.getLong(i) % m + m) % m).toInt)
      i += 1
    }
    s
  }

  private def mulMod(a: Long, b: Long): Long = {
    // (a*b) mod (2^61-1) via 128-bit multiply
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold: x mod (2^61-1) where x = hi*2^64 + lo
    val part = ((hi << 3) | (lo >>> 61)) + (lo & Prime61)
    val r = (part & Prime61) + (part >>> 61)
    if (r >= Prime61) r - Prime61 else r
  }
  private def addMod(a: Long, b: Long): Long = { val s = a + b; if (s >= Prime61) s - Prime61 else s }
  private def subMod(a: Long, b: Long): Long = { val s = a - b; if (s < 0) s + Prime61 else s }
}

/** MinHash signature expression: array<long> shingle hashes → array<long>
  * signature of length `numHashes`. Map-side only — at 100 TB scale the
  * signature replaces the shingle set before any shuffle.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    GraftHash.minhashSig(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls$$.MODULE$$.minhashSig($c, $numHashes, ${seed}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** Shingle-hash expression: array<string> tokens → array<long> hashes of
  * every k-token shingle, computed natively (codegen; no higher-order
  * function lambda on the hot path).
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    GraftHash.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.shingleHashes($c, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes = copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** Fused shingle→MinHash expression: array<string> tokens → signature,
  * one pass, no intermediate shingle array materialized per row.
  */
case class ShingleMinHash(child: Expression, k: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    GraftHash.shingleMinHash(input.asInstanceOf[ArrayData], k, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.shingleMinHash($c, $k, $numHashes, ${seed}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash = copy(child = newChild)
  override def prettyName: String = "shingle_minhash"
}

/** LSH band-key expression: array<long> signature → array<long> of
  * `bands` bucket keys (codegen).
  */
case class SignatureBands(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    GraftHash.sigBands(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.sigBands($c, $bands);")
  }
  override protected def withNewChildInternal(newChild: Expression): SignatureBands = copy(child = newChild)
  override def prettyName: String = "sig_bands"
}

/** SimHash64 expression: array<string> tokens → 64-bit locality-sensitive
  * hash (hamming distance tracks cosine similarity of token multisets).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(GraftHash.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.simhash64($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Signature-agreement expression: (array<long>, array<long>) → int count
  * of agreeing positions (codegen). Estimated Jaccard for MinHash
  * signatures is `sig_agreement(a, b) / numHashes`.
  */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(
      GraftHash.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls$$.MODULE$$.sigAgreement($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sig_agreement"
}

/** Stopword-hit-count expression: array<string> tokens → int count of
  * tokens in the fixed word list (duplicates counted; codegen). The set
  * lives once per task via a codegen reference object — no per-token
  * interpreted lambda.
  */
case class StopwordHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHash.stopwordHits(input.asInstanceOf[ArrayData], set))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("stopwords", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.stopwordHits($c, (java.util.HashSet) $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordHits = copy(child = newChild)
  override def prettyName: String = "stopword_hits"
}

/** Long-set membership count expression: array<long> → int count of
  * elements in a fixed long set (codegen; the set ships once per task as
  * a sorted array reference object). The hashed-shingle analog of
  * [[StopwordHits]] — powers stateless streaming decontamination.
  */
case class LongSetHits(child: Expression, values: Seq[Long]) extends UnaryExpression {
  // values is a Seq, not Array: case-class equality stays STRUCTURAL, so
  // two plans built from equal sets compare equal (sameResult/cache
  // reuse/ReuseExchange all depend on it; an Array field would compare
  // by reference and silently defeat them)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val sorted: Array[Long] = {
    val s = values.toArray
    java.util.Arrays.sort(s)
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(GraftHash.sortedHits(input.asInstanceOf[ArrayData], sorted))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("longset", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.sortedHits($c, (long[]) $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): LongSetHits = copy(child = newChild)
  override def prettyName: String = "long_set_hits"
}

/** Covered-token count expression: array<long> positional shingle hashes
  * → tokens covered by the union of hot-shingle windows (the d13
  * boilerplate kernel as ONE codegen pass — sorted-set membership and
  * interval merge fused, for map-side scoring against a pinned hot set).
  */
case class CoveredTokens(child: Expression, hotSet: Seq[Long], k: Int) extends UnaryExpression {
  // Seq, not Array: structural case-class equality (see LongSetHits)
  require(k >= 1, s"shingle width must be positive, got $k")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val sorted: Array[Long] = {
    val s = hotSet.toArray
    java.util.Arrays.sort(s)
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(GraftHash.coveredTokens(input.asInstanceOf[ArrayData], sorted, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    val setRef = ctx.addReferenceObj("hotset", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls$$.MODULE$$.coveredTokens($c, (long[]) $setRef, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): CoveredTokens = copy(child = newChild)
  override def prettyName: String = "covered_tokens"
}

/** Hashed-feature linear scoring expression: array<long> feature hashes →
  * Σ weights[pmod(h, B)] (codegen; the weight table ships once per task
  * as a double[] reference object). The scoring half of DSIR-style
  * importance weighting — a fixed-size model applied map-side, so
  * selection scoring never shuffles the corpus.
  */
case class BucketWeightSum(child: Expression, weights: Seq[Double]) extends UnaryExpression {
  // Seq, not Array: structural case-class equality (see LongSetHits)
  require(weights.nonEmpty && (weights.size & (weights.size - 1)) == 0,
    s"weights length must be a power of two, got ${weights.size}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  @transient private lazy val arr: Array[Double] = weights.toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(GraftHash.bucketWeightSum(input.asInstanceOf[ArrayData], arr))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    val wRef = ctx.addReferenceObj("bucketweights", arr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.bucketWeightSum($c, (double[]) $wRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum = copy(child = newChild)
  override def prettyName: String = "bucket_weight_sum"
}

/** Rolling-hash fingerprint expression: string → min k-byte-window
  * Karp–Rabin hash (winnowing fingerprint).
  */
case class RollingFingerprint(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(GraftHash.rollingFingerprint(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.rollingFingerprint($c, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint = copy(child = newChild)
  override def prettyName: String = "rolling_fingerprint"
}
