package graft

import graft.functions.GraftHash

/** DuckDB SQL replicas of graft's hash/sketch kernels, generated from the
  * same constants the Scala expressions use (seeds, FNV primes, splitmix
  * streams). These exist so the driver's DuckDB oracle can verify even
  * the custom-expression operators end-to-end: the corpus is pure ASCII
  * (strlen == length for every doc at every SF), so char-level SQL folds
  * reproduce the JVM's byte-level hashing exactly, and HUGEINT modular
  * arithmetic emulates wrapping 64/32-bit integer semantics.
  *
  * The IVF probe (s2) is replayable because its k-means runs on
  * quantized scaled-integer embeddings with integer-SUM centroids
  * ([[graft.operators.Similarity.kmeansCentroids]]): every double in
  * the assignment scoring is integer-valued below 2^53, so addition is
  * exact and order-independent and plain SQL SUMs reproduce the JVM
  * loop bit-for-bit.
  */
object OracleReplicas {

  private val Mod64 = "CAST(18446744073709551616 AS HUGEINT)"
  private val P61 = GraftHash.Prime61 // 2305843009213693951

  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** FNV-1a 64 over a string expression, unsigned in HUGEINT (mirrors
    * [[graft.functions.GraftHash.fnv64]]).
    */
  def fnv64Sql(s: String): String =
    s"""list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |    list_transform(string_split($s, ''), c -> CAST(unicode(c) AS HUGEINT))),
       |  (h, b) -> (xor(h, b) * 1099511628211) % $Mod64)""".stripMargin

  /** Reinterpret an unsigned HUGEINT value as the JVM's signed 64-bit. */
  def signed64(v: String): String =
    s"CAST(CASE WHEN ($v) >= 9223372036854775808 THEN ($v) - 18446744073709551616 ELSE ($v) END AS BIGINT)"

  /** java.util.Arrays.hashCode over a HUGEINT byte list (h = 31*h + b,
    * wrapping 32-bit), unsigned mod 2^32.
    */
  def jhashSql(bytes: String): String =
    s"""list_reduce(list_prepend(CAST(1 AS HUGEINT), $bytes),
       |  (h, b) -> (31 * h + b) % CAST(4294967296 AS HUGEINT))""".stripMargin

  /** Reinterpret an unsigned mod-2^32 HUGEINT as the JVM's signed int. */
  def signed32(v: String): String =
    s"CAST(CASE WHEN ($v) >= 2147483648 THEN ($v) - 4294967296 ELSE ($v) END AS INTEGER)"

  /** Chars of a string expression as a HUGEINT byte list (ASCII corpus). */
  def charBytes(s: String): String =
    s"list_transform(string_split($s, ''), c -> CAST(unicode(c) AS HUGEINT))"

  /** d3: SimHash64 — per-token FNV, 64 per-bit votes, pigeonhole band
    * collision + exact hamming filter, mirroring
    * [[graft.functions.GraftHash.simhash64]] and [[graft.operators.Dedup.simhash]].
    */
  def d3Simhash(maxHamming: Int = 6): String = {
    val votes = (0 until 64)
      .map(b => s"SUM(CASE WHEN (h // CAST(${u(1L << b)} AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val sigTerms = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(${u(1L << b)} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END")
      .mkString(" + ")
    val bandCond = (0 until 4)
      .map(b => s"((a.usig // CAST(${u(1L << (16 * b))} AS HUGEINT)) % 65536 = (b.usig // CAST(${u(1L << (16 * b))} AS HUGEINT)) % 65536)")
      .mkString(" OR ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok FROM documents),
       |th AS (SELECT doc_id, ${fnv64Sql("tok")} AS h FROM toks),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM th GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $sigTerms AS usig FROM votes),
       |s2 AS (SELECT doc_id, usig, ${signed64("usig")} AS sig FROM sigs)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |  AND ($bandCond)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** t4: min rolling Karp–Rabin window hash (base 257 mod 2^61-1) over
    * every 16-byte window, mirroring [[graft.functions.GraftHash.rollingFingerprint]].
    */
  def t4Fingerprint(k: Int = 16): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS L, LEAST($k, length(text)) AS win FROM documents),
       |fp AS (
       |  SELECT doc_id,
       |    CASE WHEN L = 0 THEN CAST(0 AS BIGINT) ELSE CAST(
       |      list_aggregate(
       |        list_transform(range(L - win + 1), j ->
       |          list_reduce(
       |            list_prepend(CAST(0 AS HUGEINT), ${charBytes("substr(text, j + 1, win)")}),
       |            (a, b) -> (a * 257 + b) % CAST($P61 AS HUGEINT))),
       |        'min') AS BIGINT) END AS fp64
       |  FROM d)
       |SELECT doc_id, fp64, CAST(fp64 % 1024 AS INTEGER) AS fp_bucket
       |FROM fp ORDER BY doc_id""".stripMargin

  /** d5: random-hyperplane sign sketch with the exact splitmix64-derived
    * weights of [[graft.functions.GraftVec.signSketch]] inlined as double
    * literals (Double.toString round-trips), 4-bit band collision, exact
    * cosine, mirroring [[graft.operators.Dedup.embeddingNearDup]].
    */
  /** Shared d5/dc8 CTE block: sign sketch → band collision candidates →
    * exact cosine, threshold applied on the UNROUNDED value (matching
    * the Spark filter); `cosd` carries the rounded presentation cosine.
    */
  private def d5PairCtes(minCosine: Double, nbits: Int = 16, seed: Long = 7L, dim: Int = 64): String = {
    def weight(b: Int, d: Int): Double = {
      val h = GraftHash.splitmix64(seed + b.toLong * 131071L + d)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val sketch = (0 until nbits).map { b =>
      val w = (0 until dim).map(d => weight(b, d).toString).mkString("[", ", ", "]")
      s"CASE WHEN list_reduce(list_prepend(0.0, list_transform(range($dim), d -> ($w)[d+1] * CAST(embedding[d+1] AS DOUBLE))), (a, x) -> a + x) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    val bandCond = (0 until 4)
      .map(b => s"((a.sk // ${1L << (4 * b)}) % 16 = (b.sk // ${1L << (4 * b)}) % 16)")
      .mkString(" OR ")
    s"""sk AS MATERIALIZED (SELECT vec_id, embedding, $sketch AS sk FROM embeddings),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
       |  FROM sk a JOIN sk b ON a.vec_id < b.vec_id
       |  WHERE $bandCond),
       |pairs AS (
       |  SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM cand),
       |scored AS (
       |  SELECT id_a, id_b,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pairs GROUP BY id_a, id_b),
       |cosd AS MATERIALIZED (
       |  SELECT id_a, id_b,
       |    ROUND(CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END, 4) AS cos
       |  FROM scored
       |  WHERE (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END) >= $minCosine)""".stripMargin
  }

  def d5EmbedNearDup(minCosine: Double = 0.15, topN: Int = 50, nbits: Int = 16, seed: Long = 7L, dim: Int = 64): String =
    s"""WITH ${d5PairCtes(minCosine, nbits, seed, dim)}
       |SELECT id_a, id_b, cos FROM cosd
       |ORDER BY cos DESC, id_a, id_b
       |LIMIT $topN""".stripMargin

  /** d2: the full MinHash+LSH pipeline — shingle FNV (token bytes + the
    * 0x1f separator fold, i.e. FNV over `tok1 || chr(31) || tok2 ||
    * chr(31)`), 64 universal hashes `floorMod(a_i*x + b_i, 2^61-1)` with
    * the splitmix64(42)-stream coefficients inlined, band-block equality,
    * signature agreement ≥ threshold. Mirrors
    * [[graft.functions.GraftHash.shingleMinHash]] / [[graft.operators.Dedup.minhashLsh]].
    * Wrapping 64-bit `a*x` is computed as
    * `((a_hi*x mod 2^32)*2^32 + a_lo*x) mod 2^64` to stay inside HUGEINT.
    */
  def d2MinhashLsh(numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed)}
       |SELECT doc_a, doc_b, ROUND(est, 4) AS est_jaccard
       |FROM cand WHERE est >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The pointer-jumping replay budget shared by every min-label oracle
    * chain below AND the Spark operators' gate-path convergence asserts
    * (`Dedup.clustersOfPairsOracle`): jumping covers component diameters
    * up to 2^iters, and the operator asserts it converged within the
    * budget so a pathological long-chain graph fails loudly instead of
    * producing a spurious gate divergence.
    *
    * r15: 16 → 24 after the derived-LSH default (scaleSafeLsh) produces
    * SPARSER threshold graphs whose min-label propagation measured 21
    * productive rounds at sf0.1 (dense 4-bit graphs converged well under
    * 16); generations past the fixpoint are no-ops, so the raised budget
    * costs only SQL length, never a result.
    *
    * r19: 24 → 28 for the folded recurrence
    * ([[graft.operators.Dedup.propagationRound]] — the jump now
    * compresses through the PREVIOUS generation's label instead of the
    * neighbor-folded one, which measured one extra productive round on
    * the dc8 forest, 21 → 22 at sf0.1). The chain itself got CHEAPER per
    * generation (one materialized CTE instead of three), so the raised
    * budget still shrinks the oracle's total work.
    */
  val PointerJumpIters = 28

  /** Min-label propagation WITH pointer jumping over `edges(s, d)` (both
    * directions present) + `verts(doc_id)`, as a generated CTE chain —
    * one generation per round, mirroring `Dedup.propagationRound`
    * exactly: each vertex's next label is the MIN over its own label
    * (the self contribution), its neighbors' labels, and the label of
    * its label (the pointer jump — labels are vertex ids, so the
    * previous generation maps every key and the inner joins drop
    * nothing). Emits `labels(doc_id, cluster_id)`. Replaces the naive
    * transitive-closure recursive walk, which is V×V rows on dense pair
    * graphs (the g4 lesson — 108 s vs sub-second at sf0.01; dc8's
    * cosine graph measured 300+ s). CTEs are MATERIALIZED: each
    * generation is referenced three times, and default inlining
    * re-expands the chain 3^iters-fold (the t13 lesson).
    */
  private def pointerJumpLabels(iters: Int = PointerJumpIters): String = {
    val rounds = (1 to iters).map { i =>
      s"""pjl$i AS MATERIALIZED (
         |  SELECT dst AS doc_id, MIN(cand) AS label FROM (
         |    SELECT e.s AS dst, l.label AS cand
         |    FROM edges e JOIN pjl${i - 1} l ON l.doc_id = e.d
         |    UNION ALL
         |    SELECT l.doc_id AS dst, j.label AS cand
         |    FROM pjl${i - 1} l JOIN pjl${i - 1} j ON j.doc_id = l.label
         |    UNION ALL
         |    SELECT doc_id AS dst, label AS cand FROM pjl${i - 1}
         |  ) GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""pjl0 AS MATERIALIZED (SELECT doc_id, doc_id AS label FROM verts),
       |$rounds,
       |labels AS MATERIALIZED (SELECT doc_id, label AS cluster_id FROM pjl$iters)""".stripMargin
  }

  /** dc17: the d2 pair replica rolled up to the order-normalized
    * (source_a, source_b) matrix. Mirrors
    * [[graft.operators.Curation.sourceOverlap]].
    */
  def dc17SourceOverlap(numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed)},
       |p AS (SELECT doc_a, doc_b FROM cand WHERE est >= $threshold)
       |SELECT LEAST(sa.source, sb.source) AS source_a,
       |  GREATEST(sa.source, sb.source) AS source_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM p
       |JOIN documents sa ON sa.doc_id = p.doc_a
       |JOIN documents sb ON sb.doc_id = p.doc_b
       |GROUP BY 1, 2
       |ORDER BY source_a, source_b""".stripMargin

  /** d6: connected components (min-label per component) over the d2 LSH
    * pair graph, via the pointer-jumping generation chain. Mirrors
    * [[graft.operators.Dedup.clusters]].
    */
  def d6Clusters(numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed)},
       |p AS MATERIALIZED (SELECT doc_a, doc_b FROM cand WHERE est >= $threshold),
       |edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |verts AS (SELECT DISTINCT s AS doc_id FROM edges),
       |${pointerJumpLabels()}
       |SELECT doc_id, cluster_id FROM labels ORDER BY cluster_id, doc_id""".stripMargin

  /** dc3: canonical doc per near-dup cluster — the d6 closure joined
    * with t2's quality formula, keeper = highest score then lowest id.
    * Mirrors [[graft.operators.Curation.canonicalPerCluster]].
    */
  def dc3Canonical(numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.5, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed)},
       |p AS MATERIALIZED (SELECT doc_a, doc_b FROM cand WHERE est >= $threshold),
       |${canonicalClosureTail()}""".stripMargin

  /** dc8: dc3's closure+keeper tail over d5's embedding-cosine pair
    * graph (full threshold set, no presentation limit). Mirrors
    * [[graft.operators.Curation.semanticCanonical]].
    */
  def dc8SemanticCanonical(minCosine: Double = 0.3): String =
    s"""WITH ${d5PairCtes(minCosine)},
       |p AS MATERIALIZED (SELECT id_a AS doc_a, id_b AS doc_b FROM cosd),
       |${canonicalClosureTail()}""".stripMargin

  /** Shared dc3/dc8 tail: min-label transitive closure over the `p`
    * pair CTE, t2's quality formula, highest-quality (tie → lowest id)
    * keeper per cluster.
    */
  private def canonicalClosureTail(): String = {
    // word list derived from the operator's own constant, not a copy
    val enStopwords = graft.operators.TextAnalysis.Stopwords("en")
      .map(w => s"'$w'").mkString("[", ",", "]")
    s"""edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |verts AS (SELECT DISTINCT s AS doc_id FROM edges),
       |${pointerJumpLabels()},
       |qbase AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
       |    ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
       |      / GREATEST(length(text), 1), 6) AS punct_ratio,
       |    ROUND(CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |        x -> list_contains($enStopwords, x))) AS DOUBLE)
       |      / GREATEST(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1), 6) AS stop_ratio
       |  FROM documents),
       |q AS (
       |  SELECT doc_id,
       |    ROUND(0.5 * LEAST(n_tokens, 100) / 100.0
       |        + 0.3 * (1.0 - punct_ratio)
       |        + 0.2 * LEAST(stop_ratio * 5.0, 1.0), 6) AS quality_score
       |  FROM qbase),
       |m AS (SELECT l.cluster_id, l.doc_id, q.quality_score FROM labels l JOIN q USING (doc_id)),
       |r AS (SELECT cluster_id, doc_id, quality_score,
       |        ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id) AS rn
       |      FROM m)
       |SELECT r.cluster_id, r.doc_id AS keeper_id, r.quality_score AS keeper_score, c.n_docs
       |FROM r JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs FROM m GROUP BY cluster_id) c
       |  USING (cluster_id)
       |WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin
  }

  /** splitmix64 over an unsigned HUGEINT expression, emitted as chained
    * CTE column transforms (mirrors [[graft.functions.GraftHash.splitmix64]]).
    * Each 64×64-bit wrapping multiply by a constant C is computed as
    * ((C_hi·x mod 2^32)·2^32 + C_lo·x) mod 2^64 to stay inside HUGEINT.
    */
  private def mulConstMod64(c: Long, x: String): String = {
    val hi = c >>> 32
    val lo = c & 0xffffffffL
    s"((((($hi * ($x)) % 4294967296) * 4294967296) + $lo * ($x)) % $Mod64)"
  }

  def splitmixSql(x: String): String = {
    val z0 = s"((($x) + ${u(0x9e3779b97f4a7c15L)}) % $Mod64)"
    val z1 = mulConstMod64(0xbf58476d1ce4e5b9L, s"xor($z0, ($z0) // 1073741824)")
    val z2 = mulConstMod64(0x94d049bb133111ebL, s"xor($z1, ($z1) // 134217728)")
    s"xor($z2, ($z2) // 2147483648)"
  }

  /** q22: the deterministic-HLL distinct sketch replayed
    * register-for-register — splitmix64 hash, bucket = top p bits, rank =
    * leading zeros of the shifted word (via the exact bit-length of its
    * UBIGINT binary string), MAX rank per (group, bucket), exact HUGEINT
    * register sum, single double division by the same numerator literal
    * the Scala estimator uses. Mirrors [[graft.functions.HllDistinct]] /
    * [[graft.operators.Relational.q22HllDistinct]].
    */
  def q22HllDistinct(p: Int = 6): String = {
    val m = 1 << p
    val k = graft.functions.HllDistinct.maxRank(p)
    val num = graft.functions.HllDistinct.numerator(p)
    val bucketDiv = u(1L << (64 - p)) // hash // 2^(64-p) = top p bits
    s"""WITH h AS (
       |  SELECT l_returnflag, ${splitmixSql("CAST(l_orderkey AS HUGEINT)")} AS hu
       |  FROM lineitem),
       |rh AS (
       |  SELECT l_returnflag,
       |    hu // $bucketDiv AS idx,
       |    LEAST(65 - length(bin(CAST((hu * $m) % $Mod64 AS UBIGINT))), $k) AS rho
       |  FROM h),
       |regs AS (SELECT l_returnflag, idx, MAX(rho) AS mr FROM rh GROUP BY 1, 2),
       |agg AS (
       |  SELECT l_returnflag,
       |    COUNT(*) AS present,
       |    SUM(CAST(power(2, $k - mr) AS HUGEINT)) AS s_present
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT l_returnflag,
       |    s_present + ($m - present) * CAST(power(2, $k) AS HUGEINT) AS s_total,
       |    $m - present AS zeros
       |  FROM agg),
       |n AS (SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1)
       |SELECT l_returnflag,
       |  ROUND(CASE WHEN $num / CAST(s_total AS DOUBLE) <= 2.5 * $m AND zeros > 0
       |             THEN $m * ln($m / zeros)
       |             ELSE $num / CAST(s_total AS DOUBLE) END, 2) AS est_distinct,
       |  n_rows
       |FROM est JOIN n USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** q25: rollup-over-sketches replayed per grain. Register max is
    * associative, so merging finest-grain sketches equals building each
    * grain from rows — the replica computes every grain's registers
    * directly from the hashed keys and must match the merged estimates
    * exactly. Mirrors [[graft.operators.Relational.q25HllRollup]].
    */
  def q25HllRollup(p: Int = 6): String = {
    val m = 1 << p
    val k = graft.functions.HllDistinct.maxRank(p)
    val num = graft.functions.HllDistinct.numerator(p)
    val bucketDiv = u(1L << (64 - p))
    def grain(groupCols: Seq[String], gid: Int): String = {
      val sel = Seq("l_returnflag", "l_linestatus").map { c =>
        if (groupCols.contains(c)) c else s"CAST(NULL AS VARCHAR) AS $c"
      }.mkString(", ")
      val by = if (groupCols.isEmpty) "" else s" GROUP BY ${groupCols.mkString(", ")}"
      val keyList = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ","
      val joinOn =
        if (groupCols.isEmpty) "ON TRUE"
        else "USING (" + groupCols.mkString(", ") + ")"
      s"""SELECT $sel,
         |  ROUND(CASE WHEN $num / CAST(s_total AS DOUBLE) <= 2.5 * $m AND zeros > 0
         |             THEN $m * ln($m / zeros)
         |             ELSE $num / CAST(s_total AS DOUBLE) END, 2) AS est_distinct,
         |  n_rows, CAST($gid AS BIGINT) AS gid
         |FROM (
         |  SELECT $keyList
         |    SUM(CAST(power(2, $k - mr) AS HUGEINT)) + ($m - COUNT(*)) * CAST(power(2, $k) AS HUGEINT) AS s_total,
         |    $m - COUNT(*) AS zeros
         |  FROM (SELECT $keyList idx, MAX(rho) AS mr FROM rh GROUP BY ${(groupCols :+ "idx").mkString(", ")})
         | $by) e
         |JOIN (SELECT $keyList COUNT(*) AS n_rows FROM lineitem$by) n
         |  $joinOn""".stripMargin
    }
    s"""WITH h AS (
       |  SELECT l_returnflag, l_linestatus,
       |    ${splitmixSql("CAST(l_orderkey AS HUGEINT)")} AS hu
       |  FROM lineitem),
       |rh AS (
       |  SELECT l_returnflag, l_linestatus,
       |    hu // $bucketDiv AS idx,
       |    LEAST(65 - length(bin(CAST((hu * $m) % $Mod64 AS UBIGINT))), $k) AS rho
       |  FROM h)
       |${grain(Seq("l_returnflag", "l_linestatus"), 0)}
       |UNION ALL
       |${grain(Seq("l_returnflag"), 1)}
       |UNION ALL
       |${grain(Seq.empty, 3)}
       |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin
  }

  /** q31: incremental-rollup parity — the maintained aggregate must
    * equal a FULL recompute, so the replica IS the full recompute:
    * per-event-type counts, decimal sums, and the q22 HLL estimator's
    * registers built directly from every row (register max is
    * associative, so history-partials merged with delta-partials give
    * the same registers — [[graft.operators.Relational.q31IncrementalRollup]]).
    */
  def q31IncrementalRollup(p: Int = 6): String = {
    val m = 1 << p
    val k = graft.functions.HllDistinct.maxRank(p)
    val num = graft.functions.HllDistinct.numerator(p)
    val bucketDiv = u(1L << (64 - p))
    s"""WITH h AS (
       |  SELECT event_type, ${splitmixSql("CAST(user_id AS HUGEINT)")} AS hu
       |  FROM events),
       |rh AS (
       |  SELECT event_type,
       |    hu // $bucketDiv AS idx,
       |    LEAST(65 - length(bin(CAST((hu * $m) % $Mod64 AS UBIGINT))), $k) AS rho
       |  FROM h),
       |regs AS (SELECT event_type, idx, MAX(rho) AS mr FROM rh GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type,
       |    SUM(CAST(power(2, $k - mr) AS HUGEINT)) +
       |      ($m - COUNT(*)) * CAST(power(2, $k) AS HUGEINT) AS s_total,
       |    $m - COUNT(*) AS zeros
       |  FROM regs GROUP BY event_type),
       |n AS (
       |  SELECT event_type, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |  FROM events GROUP BY event_type)
       |SELECT n.event_type, n.n_events, n.sum_value,
       |  ROUND(CASE WHEN $num / CAST(s_total AS DOUBLE) <= 2.5 * $m AND zeros > 0
       |             THEN $m * ln($m / zeros)
       |             ELSE $num / CAST(s_total AS DOUBLE) END, 2) AS est_users
       |FROM n JOIN agg USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  /** s3: LSH-bucketed ANN — d5's sign sketch (same inlined weights) on
    * both sides, 4-bit band collision gates candidates, exact cosine
    * rerank, top-k per query. Mirrors [[graft.operators.Similarity.lshTopK]].
    */
  def s3LshTopK(nQueries: Int = 10, k: Int = 5, nbits: Int = 16, seed: Long = 7L, dim: Int = 64): String = {
    def weight(b: Int, d: Int): Double = {
      val h = GraftHash.splitmix64(seed + b.toLong * 131071L + d)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val sketch = (0 until nbits).map { b =>
      val w = (0 until dim).map(d => weight(b, d).toString).mkString("[", ", ", "]")
      s"CASE WHEN list_reduce(list_prepend(0.0, list_transform(range($dim), d -> ($w)[d+1] * CAST(embedding[d+1] AS DOUBLE))), (a, x) -> a + x) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    val bandCond = (0 until nbits / 4)
      .map(b => s"((q.sk // ${1L << (4 * b)}) % 16 = (c.sk // ${1L << (4 * b)}) % 16)")
      .mkString(" OR ")
    s"""WITH sk AS (SELECT vec_id, embedding, $sketch AS sk FROM embeddings),
       |cand AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.embedding AS qe, c.embedding AS ce
       |  FROM sk q JOIN sk c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id
       |  WHERE $bandCond),
       |pairs AS (SELECT query_id, neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM cand),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pairs GROUP BY query_id, neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END AS cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END) DESC,
       |               neighbor_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s2: IVF ANN probe — deterministic k-means replayed round-for-round,
    * mirroring [[graft.operators.Similarity.ivf]]. Embeddings quantize
    * to scaled longs (floor(x·S + 0.5), S = 2^12); seeds are the first
    * `nlist` quantized vectors; each round assigns every vector to its
    * max-cosine centroid (tie → lowest cid) and rebuilds centroids as
    * per-dimension integer SUMS of members (cosine is scale-invariant,
    * so sum ≡ mean). All assignment-scoring doubles are integer-valued
    * < 2^53 ⇒ exact ⇒ the SQL SUMs equal the JVM's sequential loops
    * bit-for-bit, and every argmax lands identically. Queries probe
    * their `nprobe` best centroids; candidates rerank by exact cosine
    * on the ORIGINAL float embeddings (the s1/s3-precedented pattern).
    */
  def s2Ivf(nQueries: Int = 10, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 2, scale: Long = 4096, trainPred: String = "TRUE"): String = {
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    s"""WITH ${s2IvfCtes(nQueries, nlist, nprobe, iters, scale, trainPred)},
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    ($cosOf) AS cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ($cosOf) DESC, neighbor_id) AS INT) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s9: the s2 chain with the rank tail swapped for the radius
    * threshold (applied on the UNROUNDED cosine — the d5/s8 discipline),
    * mirroring [[graft.operators.Similarity.ivfRange]]: the oracle
    * replays the SAME cell pruning, so the admitted set is pinned
    * exactly, recall trade included.
    */
  def s9IvfRange(nQueries: Int = 10, minCos: Double = 0.2, nlist: Int = 16,
      nprobe: Int = 4, iters: Int = 2, scale: Long = 4096): String = {
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    s"""WITH ${s2IvfCtes(nQueries, nlist, nprobe, iters, scale)}
       |SELECT query_id, neighbor_id AS match_id, ROUND(cosf, 6) AS cos
       |FROM (SELECT query_id, neighbor_id, ($cosOf) AS cosf FROM sc) z
       |WHERE cosf >= $minCos
       |ORDER BY query_id, cos DESC, match_id""".stripMargin
  }

  /** Shared s2/s9 CTE chain: quantized k-means rounds, per-query nprobe
    * cell admission, exact dot/na/nb sums for the admitted (query,
    * candidate) pairs (terminal CTE `sc`). `trainPred` (a predicate on
    * bare `vec_id`) restricts the k-means TRAINING set — seeds and every
    * assign→sum round — while the final assignment, probes and
    * candidates still run over the whole corpus: exactly the
    * frozen-centroid contract of the s11 segment-append probe
    * ([[graft.operators.Similarity.appendToIvfIndex]]).
    */
  private def s2IvfCtes(nQueries: Int, nlist: Int, nprobe: Int,
      iters: Int, scale: Long, trainPred: String = "TRUE"): String = {
    // cosine from exact dot/na/nb columns (identical CASE/sqrt/div ops
    // to GraftVec.cosine2 on identical inputs)
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    // one assign→sum round: score quantized vectors against the current
    // long-format centroid table g{i-1}(cid, pos, s), pick argmax, then
    // per-dimension integer sums of the winners' quantized vectors
    def round(i: Int, prevCentroids: String): String =
      s"""r${i}s AS (
         |  SELECT v.vec_id, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM (SELECT * FROM vx WHERE ($trainPred)) v
         |  JOIN $prevCentroids g USING (pos)
         |  GROUP BY v.vec_id, g.cid),
         |a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM r${i}s) z WHERE rn = 1),
         |g$i AS (
         |  SELECT a.cid, v.pos, SUM(v.x) AS s
         |  FROM a$i a JOIN vx v USING (vec_id) GROUP BY a.cid, v.pos)""".stripMargin
    val rounds = (1 to iters).map(i => round(i, if (i == 1) "g0" else s"g${i - 1}")).mkString(",\n")
    s"""qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $scale.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |vx AS (
       |  SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos FROM qv),
       |g0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM vx WHERE vec_id < $nlist AND ($trainPred)),
       |$rounds,
       |fs AS (
       |  SELECT v.vec_id, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM vx v JOIN g$iters g USING (pos)
       |  GROUP BY v.vec_id, g.cid),
       |fr AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
       |  FROM fs),
       |afin AS (SELECT vec_id, cid FROM fr WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM fr WHERE vec_id < $nQueries AND rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN afin a USING (cid)
       |  WHERE a.vec_id <> p.query_id),
       |pr AS (
       |  SELECT c.query_id, c.neighbor_id, unnest(qe.embedding) AS x, unnest(ne.embedding) AS y
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |sc AS (
       |  SELECT query_id, neighbor_id,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pr GROUP BY query_id, neighbor_id)""".stripMargin
  }

  /** s5: product-quantization ANN — s2's quantized integer-sum k-means
    * replayed PER SUBSPACE (`sub` rides in every key), then the ADC
    * scoring chain: per-query (sub, cid) → partial-dot LUT, corpus codes
    * sum their m hits, top-`nCandidates` rerank by exact cosine. Every
    * intermediate is an integer-valued double < 2^53 (subspace sums are
    * strictly smaller than s2's full-dimension ones), so the whole
    * train→encode→score cascade replays graft's
    * [[graft.operators.ProductQuant.pqTopK]] bit-for-bit — including the
    * `trainSize` id-prefix sample bound on the training CTEs.
    */
  def s5Pq(nQueries: Int = 10, k: Int = 5, m: Int = 4, nlist: Int = 16,
      iters: Int = 2, nCandidates: Int = 64, dim: Int = 64,
      scale: Long = 4096, trainSize: Long = 1024L): String = {
    val subDim = dim / m
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    // one per-subspace assign→sum round against centroids g{i-1}(sub, cid,
    // pos, s); training reads ONLY the tx sample (mirrors `trainSize`)
    def round(i: Int, prev: String): String =
      s"""r${i}s AS (
         |  SELECT v.vec_id, v.sub, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM tx v JOIN $prev g ON v.sub = g.sub AND v.pos = g.pos
         |  GROUP BY v.vec_id, v.sub, g.cid),
         |a$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM r${i}s) z WHERE rn = 1),
         |g$i AS (
         |  SELECT a.sub, a.cid, v.pos, SUM(v.x) AS s
         |  FROM a$i a JOIN tx v ON a.vec_id = v.vec_id AND a.sub = v.sub
         |  GROUP BY a.sub, a.cid, v.pos)""".stripMargin
    val rounds = (1 to iters).map(i => round(i, if (i == 1) "g0" else s"g${i - 1}")).mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $scale.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |vx AS (
       |  SELECT vec_id, CAST((pos - 1) // $subDim AS INT) AS sub, pos, x FROM (
       |    SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos FROM qv) z),
       |tx AS (SELECT * FROM vx WHERE vec_id < $trainSize),
       |g0 AS (
       |  SELECT sub, CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM tx WHERE vec_id < $nlist),
       |$rounds,
       |fs AS (
       |  SELECT v.vec_id, v.sub, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM vx v JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |  GROUP BY v.vec_id, v.sub, g.cid),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
       |    FROM fs) z WHERE rn = 1),
       |lut AS (
       |  SELECT v.vec_id AS query_id, v.sub, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS pdot
       |  FROM vx v JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |  WHERE v.vec_id < $nQueries
       |  GROUP BY v.vec_id, v.sub, g.cid),
       |adc AS (
       |  SELECT l.query_id, c.vec_id, SUM(l.pdot) AS adc
       |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.cid = l.cid
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id
       |  HAVING COUNT(*) = $m),
       |cand AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS cr
       |    FROM adc) z WHERE cr <= $nCandidates),
       |pr AS (
       |  SELECT c.query_id, c.neighbor_id, unnest(qe.embedding) AS x, unnest(ne.embedding) AS y
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |sc AS (
       |  SELECT query_id, neighbor_id,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pr GROUP BY query_id, neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    ($cosOf) AS cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ($cosOf) DESC, neighbor_id) AS INT) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s6: IVF-PQ — the s2 coarse replica and the s5 fine replica
    * composed into ONE replayed query, mirroring
    * [[graft.operators.ProductQuant.ivfPqTopK]]: full-dimension
    * quantized k-means routes (corpus assigned once, queries probe
    * their nprobe best cells — both read off the same final scoring
    * CTE, exactly like the operator's shared arithmetic), per-subspace
    * codebooks + codes + ADC LUT score ONLY the pairs the coarse stage
    * admitted, top-nCandidates rerank by exact cosine. Raw (non
    * -residual) PQ encode keeps every stage integer-exact — the
    * property that lets the two replicas compose at all.
    */
  def s6IvfPq(nQueries: Int = 10, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 4, pqNlist: Int = 16, iters: Int = 2, nCandidates: Int = 64,
      dim: Int = 64, scale: Long = 4096, trainSize: Long = 1024L): String = {
    val subDim = dim / m
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    // coarse (full-dimension) assign→sum round, names prefixed c
    def cRound(i: Int, prev: String): String =
      s"""cr${i}s AS (
         |  SELECT v.vec_id, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM vx v JOIN $prev g USING (pos)
         |  GROUP BY v.vec_id, g.cid),
         |ca$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM cr${i}s) z WHERE rn = 1),
         |cg$i AS (
         |  SELECT a.cid, v.pos, SUM(v.x) AS s
         |  FROM ca$i a JOIN vx v USING (vec_id) GROUP BY a.cid, v.pos)""".stripMargin
    val cRounds = (1 to iters).map(i => cRound(i, if (i == 1) "cg0" else s"cg${i - 1}")).mkString(",\n")
    // fine (per-subspace) round over the trainSize sample, s5's names
    def fRound(i: Int, prev: String): String =
      s"""r${i}s AS (
         |  SELECT v.vec_id, v.sub, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM tx v JOIN $prev g ON v.sub = g.sub AND v.pos = g.pos
         |  GROUP BY v.vec_id, v.sub, g.cid),
         |a$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM r${i}s) z WHERE rn = 1),
         |g$i AS (
         |  SELECT a.sub, a.cid, v.pos, SUM(v.x) AS s
         |  FROM a$i a JOIN tx v ON a.vec_id = v.vec_id AND a.sub = v.sub
         |  GROUP BY a.sub, a.cid, v.pos)""".stripMargin
    val fRounds = (1 to iters).map(i => fRound(i, if (i == 1) "g0" else s"g${i - 1}")).mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $scale.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |vx AS (
       |  SELECT vec_id, CAST((pos - 1) // $subDim AS INT) AS sub, pos, x FROM (
       |    SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos FROM qv) z),
       |cg0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM vx WHERE vec_id < $nlist),
       |$cRounds,
       |cfs AS (
       |  SELECT v.vec_id, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM vx v JOIN cg$iters g USING (pos)
       |  GROUP BY v.vec_id, g.cid),
       |cfr AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
       |  FROM cfs),
       |cafin AS (SELECT vec_id, cid FROM cfr WHERE rn = 1),
       |cprobes AS (
       |  SELECT vec_id AS query_id, cid FROM cfr
       |  WHERE vec_id < $nQueries AND rn <= $nprobe),
       |cpairs AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM cprobes p JOIN cafin a USING (cid)
       |  WHERE a.vec_id <> p.query_id),
       |tx AS (SELECT * FROM vx WHERE vec_id < $trainSize),
       |g0 AS (
       |  SELECT sub, CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM tx WHERE vec_id < $pqNlist),
       |$fRounds,
       |fs AS (
       |  SELECT v.vec_id, v.sub, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM vx v JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |  GROUP BY v.vec_id, v.sub, g.cid),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
       |    FROM fs) z WHERE rn = 1),
       |lut AS (
       |  SELECT v.vec_id AS query_id, v.sub, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS pdot
       |  FROM vx v JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |  WHERE v.vec_id < $nQueries
       |  GROUP BY v.vec_id, v.sub, g.cid),
       |adc AS (
       |  SELECT cp.query_id, cp.vec_id, SUM(l.pdot) AS adc
       |  FROM cpairs cp
       |  JOIN codes c ON c.vec_id = cp.vec_id
       |  JOIN lut l ON l.query_id = cp.query_id AND l.sub = c.sub AND l.cid = c.cid
       |  GROUP BY cp.query_id, cp.vec_id
       |  HAVING COUNT(*) = $m),
       |cand AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS cr
       |    FROM adc) z WHERE cr <= $nCandidates),
       |pr AS (
       |  SELECT c.query_id, c.neighbor_id, unnest(qe.embedding) AS x, unnest(ne.embedding) AS y
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |sc AS (
       |  SELECT query_id, neighbor_id,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pr GROUP BY query_id, neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    ($cosOf) AS cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ($cosOf) DESC, neighbor_id) AS INT) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s12: residual IVF-PQ — the s6 replica with the fine stage trained
    * and encoded on INTEGER residuals r = q·cnt_c − s_c (exact: the
    * coarse chain's own cell sums and populations), the ADC LUT built
    * from the PLAIN query ints against the residual books, and the
    * candidate score recomposed as (dot(q', s_c) + radc) / cnt_c — one
    * IEEE division over integer-valued doubles, identical in both
    * engines. Mirrors [[graft.operators.ProductQuant.ivfPqResidualTopK]].
    */
  def s12IvfPqResidual(nQueries: Int = 10, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 4, pqNlist: Int = 16, iters: Int = 2, nCandidates: Int = 64,
      dim: Int = 64, scale: Long = 4096, trainSize: Long = 1024L): String = {
    val subDim = dim / m
    val cosOf = "CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END"
    def cRound(i: Int, prev: String): String =
      s"""cr${i}s AS (
         |  SELECT v.vec_id, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM vx v JOIN $prev g USING (pos)
         |  GROUP BY v.vec_id, g.cid),
         |ca$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM cr${i}s) z WHERE rn = 1),
         |cg$i AS (
         |  SELECT a.cid, v.pos, SUM(v.x) AS s
         |  FROM ca$i a JOIN vx v USING (vec_id) GROUP BY a.cid, v.pos)""".stripMargin
    val cRounds = (1 to iters).map(i => cRound(i, if (i == 1) "cg0" else s"cg${i - 1}")).mkString(",\n")
    // fine rounds over the RESIDUAL subvector rows rx
    def fRound(i: Int, prev: String): String =
      s"""r${i}s AS (
         |  SELECT v.vec_id, v.sub, g.cid,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
         |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
         |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
         |  FROM tx v JOIN $prev g ON v.sub = g.sub AND v.pos = g.pos
         |  GROUP BY v.vec_id, v.sub, g.cid),
         |a$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
         |    FROM r${i}s) z WHERE rn = 1),
         |g$i AS (
         |  SELECT a.sub, a.cid, v.pos, SUM(v.x) AS s
         |  FROM a$i a JOIN tx v ON a.vec_id = v.vec_id AND a.sub = v.sub
         |  GROUP BY a.sub, a.cid, v.pos)""".stripMargin
    val fRounds = (1 to iters).map(i => fRound(i, if (i == 1) "g0" else s"g${i - 1}")).mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $scale.0 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |vx AS (
       |  SELECT vec_id, CAST((pos - 1) // $subDim AS INT) AS sub, pos, x FROM (
       |    SELECT vec_id, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos FROM qv) z),
       |cg0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM vx WHERE vec_id < $nlist),
       |$cRounds,
       |cfs AS (
       |  SELECT v.vec_id, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM vx v JOIN cg$iters g USING (pos)
       |  GROUP BY v.vec_id, g.cid),
       |cfr AS (
       |  SELECT vec_id, cid, dot,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ($cosOf) DESC, cid) AS rn
       |  FROM cfs),
       |cafin AS MATERIALIZED (SELECT vec_id, cid FROM cfr WHERE rn = 1),
       |cprobes AS (
       |  SELECT vec_id AS query_id, cid FROM cfr
       |  WHERE vec_id < $nQueries AND rn <= $nprobe),
       |cpairs AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM cprobes p JOIN cafin a USING (cid)
       |  WHERE a.vec_id <> p.query_id),
       |ccnt AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS cnt FROM cafin GROUP BY cid),
       |rx AS MATERIALIZED (
       |  SELECT v.vec_id, v.sub, v.pos, v.x * c.cnt - g.s AS x
       |  FROM vx v
       |  JOIN cafin a USING (vec_id)
       |  JOIN ccnt c ON c.cid = a.cid
       |  JOIN cg$iters g ON g.cid = a.cid AND g.pos = v.pos),
       |tx AS (SELECT * FROM rx WHERE vec_id < $trainSize),
       |g0 AS (
       |  SELECT sub, CAST(vec_id AS INT) AS cid, pos, CAST(x AS HUGEINT) AS s
       |  FROM tx WHERE vec_id < $pqNlist),
       |$fRounds,
       |fs AS (
       |  SELECT v.vec_id, v.sub, g.cid,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS dot,
       |    SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
       |    SUM(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) AS nb
       |  FROM rx v JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |  GROUP BY v.vec_id, v.sub, g.cid),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY ($cosOf) DESC, cid) AS rn
       |    FROM fs) z WHERE rn = 1),
       |rpop AS (
       |  SELECT sub, cid, CAST(COUNT(*) AS BIGINT) AS pop
       |  FROM a$iters GROUP BY sub, cid),
       |lut AS (
       |  SELECT query_id, sub, cid, sdot / pop AS pdot FROM (
       |    SELECT v.vec_id AS query_id, v.sub, g.cid, p.pop,
       |      SUM(CAST(v.x AS DOUBLE) * CAST(g.s AS DOUBLE)) AS sdot
       |    FROM vx v
       |    JOIN g$iters g ON v.sub = g.sub AND v.pos = g.pos
       |    JOIN rpop p ON p.sub = g.sub AND p.cid = g.cid
       |    WHERE v.vec_id < $nQueries
       |    GROUP BY v.vec_id, v.sub, g.cid, p.pop) z),
       |cdot AS (
       |  SELECT vec_id AS query_id, cid, dot AS cdot FROM cfs
       |  WHERE vec_id < $nQueries),
       |adc AS (
       |  SELECT cp.query_id, cp.vec_id,
       |    ${(0 until m).map(i =>
             s"MAX(CASE WHEN c.sub = $i THEN l.pdot END) AS p$i").mkString(",\n       |    ")},
       |    COUNT(*) AS nsub
       |  FROM cpairs cp
       |  JOIN codes c ON c.vec_id = cp.vec_id
       |  JOIN lut l ON l.query_id = cp.query_id AND l.sub = c.sub AND l.cid = c.cid
       |  GROUP BY cp.query_id, cp.vec_id
       |  HAVING COUNT(*) = $m),
       |scored0 AS (
       |  SELECT a.query_id, a.vec_id,
       |    (d.cdot + (${(0 until m).map(i => s"a.p$i").reduce((x, y) => s"($x + $y)")})) / c.cnt AS sc
       |  FROM adc a
       |  JOIN cafin f ON f.vec_id = a.vec_id
       |  JOIN ccnt c ON c.cid = f.cid
       |  JOIN cdot d ON d.query_id = a.query_id AND d.cid = f.cid),
       |cand AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) AS cr
       |    FROM scored0) z WHERE cr <= $nCandidates),
       |pr AS (
       |  SELECT c.query_id, c.neighbor_id, unnest(qe.embedding) AS x, unnest(ne.embedding) AS y
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |sc AS (
       |  SELECT query_id, neighbor_id,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pr GROUP BY query_id, neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    ($cosOf) AS cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ($cosOf) DESC, neighbor_id) AS INT) AS rank
       |  FROM sc)
       |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s4: corpus-wide kNN graph — d5/s3's sign sketch (same inlined
    * weights) on every vector, undirected 4-bit band collision pairs,
    * exact cosine, then each pair feeds both endpoints' top-k. Mirrors
    * [[graft.operators.Similarity.knnGraph]].
    */
  def s4KnnGraph(k: Int = 3, nbits: Int = 16, seed: Long = 7L, dim: Int = 64): String = {
    def weight(b: Int, d: Int): Double = {
      val h = GraftHash.splitmix64(seed + b.toLong * 131071L + d)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val sketch = (0 until nbits).map { b =>
      val w = (0 until dim).map(d => weight(b, d).toString).mkString("[", ", ", "]")
      s"CASE WHEN list_reduce(list_prepend(0.0, list_transform(range($dim), d -> ($w)[d+1] * CAST(embedding[d+1] AS DOUBLE))), (a, x) -> a + x) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    val bandCond = (0 until nbits / 4)
      .map(b => s"((a.sk // ${1L << (4 * b)}) % 16 = (b.sk // ${1L << (4 * b)}) % 16)")
      .mkString(" OR ")
    s"""WITH sk AS MATERIALIZED (SELECT vec_id, embedding, $sketch AS sk FROM embeddings),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
       |  FROM sk a JOIN sk b ON a.vec_id < b.vec_id
       |  WHERE $bandCond),
       |pairs AS (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM cand),
       |scored AS (
       |  SELECT id_a, id_b,
       |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
       |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
       |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
       |  FROM pairs GROUP BY id_a, id_b),
       |cosd AS MATERIALIZED (
       |  SELECT id_a, id_b,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END AS cosf
       |  FROM scored),
       |directed AS (
       |  SELECT id_a AS vec_id, id_b AS neighbor_id, cosf FROM cosd
       |  UNION ALL
       |  SELECT id_b, id_a, cosf FROM cosd),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, cosf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cosf DESC, neighbor_id) AS INT) AS rank
       |  FROM directed)
       |SELECT vec_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
       |FROM ranked WHERE rank <= $k
       |ORDER BY vec_id, rank""".stripMargin
  }

  /** d7: incremental MinHash dedup — the d2 replica with a ONE-SIDED
    * pair condition (existing corpus × new batch), mirroring
    * [[graft.operators.Dedup.minhashIncremental]].
    */
  def d7MinhashIncremental(splitId: Long = 250, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed, s"a.doc_id < $splitId AND b.doc_id >= $splitId")}
       |SELECT doc_b AS new_id, doc_a AS dup_of, ROUND(est, 4) AS est_jaccard
       |FROM cand WHERE est >= $threshold
       |ORDER BY new_id, dup_of""".stripMargin

  /** d22: the takedown probe — d7's one-sided replica over a corpus
    * with the REMOVED doc_id ranges excluded from the existing side,
    * mirroring [[graft.operators.Dedup.removeFromSignatureStore]]'s
    * contract: probing the store after the removal cascade is
    * bit-identical to probing a store rebuilt from the filtered corpus
    * (which is exactly what this SQL computes — the store path builds a
    * base, appends a segment, removes ids spanning BOTH, then probes).
    */
  def d22TakedownProbe(splitId: Long = 250,
      removed: Seq[(Long, Long)] = Seq((100L, 150L), (210L, 220L)),
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L): String = {
    // "TRUE" leads so an empty removal list degenerates to the plain d7
    // probe instead of a dangling-AND parse error
    val keepCond = ("TRUE" +: removed
      .map { case (lo, hi) => s"NOT (a.doc_id >= $lo AND a.doc_id < $hi)" })
      .mkString(" AND ")
    s"""WITH ${minhashCtes(numHashes, bands, seed,
        s"a.doc_id < $splitId AND $keepCond AND b.doc_id >= $splitId")}
       |SELECT doc_b AS new_id, doc_a AS dup_of, ROUND(est, 4) AS est_jaccard
       |FROM cand WHERE est >= $threshold
       |ORDER BY new_id, dup_of""".stripMargin
  }

  /** dc12: near-dup decontamination — the d7 one-sided replica with the
    * roles flipped (benchmark = existing side, corpus = probe side) and
    * a per-corpus-doc best-match pick, mirroring
    * [[graft.operators.Curation.neardupDecontaminate]].
    */
  def dc12NeardupDecontaminate(benchSize: Long = 50, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.35, seed: Long = 42L): String =
    s"""WITH ${minhashCtes(numHashes, bands, seed, s"a.doc_id < $benchSize AND b.doc_id >= $benchSize")}
       |SELECT doc_id, matched_bench, ROUND(est, 4) AS est_jaccard FROM (
       |  SELECT doc_b AS doc_id, doc_a AS matched_bench, est,
       |    ROW_NUMBER() OVER (PARTITION BY doc_b ORDER BY est DESC, doc_a) AS rn
       |  FROM cand WHERE est >= $threshold) z
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** d9: substring-level exact dedup — positional k-shingle FNV inverted
    * index + alignment-diagonal gaps-and-islands, mirroring
    * [[graft.operators.Dedup.substringSpans]]. Same FNV shingle domain
    * as d2/d4 (token bytes + the 0x1f separator fold per token); the
    * unsigned-HUGEINT hashes join identically to the JVM's signed longs
    * because the reinterpretation is bijective and `h` never reaches
    * the output.
    */
  /** Shared d9/d10 CTEs: tokens → positional k-shingle FNV list →
    * (doc_id, h, pos) occurrence table.
    */
  private def substringCtes(k: Int): String = {
    val shingleFnv = fnv64Sql((0 until k).map(j => s"t[i+$j] || chr(31)").mkString(" || "))
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, list_transform(range(1, len(t) - $k + 2), i -> $shingleFnv) AS xs
       |  FROM toks WHERE len(t) >= $k),
       |psh AS (
       |  SELECT doc_id, unnest(xs) AS h, unnest(range(1, len(xs) + 1)) AS pos FROM sh)""".stripMargin
  }

  /** d13: corpus boilerplate coverage — positional k-shingles, hot
    * shingles by distinct-doc df, per-doc union of hot windows via the
    * same gaps-and-islands merge. Mirrors
    * [[graft.operators.Dedup.boilerplate]].
    */
  def d13Boilerplate(k: Int = 3, minDf: Long = 5): String =
    s"""WITH ${substringCtes(k)},
       |nt AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tokens FROM toks),
       |hot AS (
       |  SELECT h FROM (
       |    SELECT h, COUNT(DISTINCT doc_id) AS df FROM psh GROUP BY h) z
       |  WHERE df >= $minDf),
       |hp AS (SELECT doc_id, pos FROM psh JOIN hot USING (h)),
       |brks AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
       |         THEN 0 ELSE 1 END AS brk
       |  FROM hp),
       |isl AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM brks),
       |cov AS (
       |  SELECT doc_id, island, MAX(pos) - MIN(pos) + $k AS cov
       |  FROM isl GROUP BY doc_id, island),
       |pd AS (SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS bp_tokens FROM cov GROUP BY doc_id)
       |SELECT n.doc_id, n.n_tokens,
       |  COALESCE(pd.bp_tokens, 0) AS bp_tokens,
       |  CASE WHEN n.n_tokens = 0 THEN 0.0
       |       ELSE ROUND(COALESCE(pd.bp_tokens, 0) / CAST(n.n_tokens AS DOUBLE), 4) END AS bp_frac
       |FROM nt n LEFT JOIN pd ON pd.doc_id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin

  def d9SubstringSpans(k: Int = 8, minSpanTokens: Int = 16): String =
    s"""WITH ${substringCtes(k)},
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
       |  FROM psh a JOIN psh b ON a.h = b.h AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
       |    pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
       |  FROM m)
       |SELECT doc_a, doc_b,
       |  CAST(MIN(pos_a) AS INTEGER) AS start_a,
       |  CAST(MIN(pos_b) AS INTEGER) AS start_b,
       |  CAST(COUNT(*) + ${k - 1} AS BIGINT) AS span_tokens
       |FROM isl
       |GROUP BY doc_a, doc_b, diag, island
       |HAVING COUNT(*) + ${k - 1} >= $minSpanTokens
       |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin

  /** d20: the cleaned corpus — replay d9's span replica, cut every
    * `doc_b`-side span (the keep-lowest-doc_id rule), merge overlapping
    * cuts as a DISTINCT position set, and splice the kept tokens back
    * with single spaces. Mirrors
    * [[graft.operators.Dedup.substringRewrite]] — the parallel `unnest`
    * pair zips each doc's tokens with 1-based positions, exactly the
    * Spark side's `zip_with(tokens, sequence(1, n))`.
    */
  def d20SubstringRewrite(k: Int = 8, minSpanTokens: Int = 16): String =
    s"""WITH ${substringCtes(k)},
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
       |  FROM psh a JOIN psh b ON a.h = b.h AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
       |    pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
       |  FROM m),
       |spans AS (
       |  SELECT doc_b AS doc_id, MIN(pos_b) AS s, MIN(pos_b) + COUNT(*) + ${k - 2} AS e
       |  FROM isl
       |  GROUP BY doc_a, doc_b, diag, island
       |  HAVING COUNT(*) + ${k - 1} >= $minSpanTokens),
       |cutpos AS (
       |  SELECT DISTINCT doc_id, pos
       |  FROM (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans) z),
       |tokpos AS (
       |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos FROM toks),
       |kept AS (
       |  SELECT p.doc_id, p.pos, p.tok
       |  FROM tokpos p LEFT JOIN cutpos c ON p.doc_id = c.doc_id AND p.pos = c.pos
       |  WHERE c.pos IS NULL),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS kept_n,
       |    string_agg(tok, ' ' ORDER BY pos) AS text
       |  FROM kept GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.t) AS INTEGER) AS n_tokens,
       |  CAST(len(t.t) - COALESCE(a.kept_n, 0) AS INTEGER) AS removed_tokens,
       |  COALESCE(a.text, '') AS text
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** d21: the cleaned INGEST batch — d20's splice applied to the
    * one-sided span set (new batch vs existing corpus only, d10's
    * roles): cut every span from the NEW side, splice, and emit only
    * the batch's rows. Mirrors
    * [[graft.operators.Dedup.substringRewriteAgainstStore]] (whose
    * spans come from the persisted d17 store — identity with this
    * in-job replay is exactly what gates the store path).
    */
  def d21SubstringRewriteIngest(splitId: Long = 250, k: Int = 8,
      minSpanTokens: Int = 16): String =
    s"""WITH ${substringCtes(k)},
       |m AS (
       |  SELECT a.doc_id AS new_id, b.doc_id AS dup_of, a.pos AS pos_new, b.pos AS pos_old
       |  FROM psh a JOIN psh b ON a.h = b.h AND a.doc_id >= $splitId AND b.doc_id < $splitId),
       |isl AS (
       |  SELECT new_id, dup_of, pos_new, pos_old, pos_new - pos_old AS diag,
       |    pos_new - ROW_NUMBER() OVER (PARTITION BY new_id, dup_of, pos_new - pos_old ORDER BY pos_new) AS island
       |  FROM m),
       |spans AS (
       |  SELECT new_id AS doc_id, MIN(pos_new) AS s, MIN(pos_new) + COUNT(*) + ${k - 2} AS e
       |  FROM isl
       |  GROUP BY new_id, dup_of, diag, island
       |  HAVING COUNT(*) + ${k - 1} >= $minSpanTokens),
       |cutpos AS (
       |  SELECT DISTINCT doc_id, pos
       |  FROM (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans) z),
       |tokpos AS (
       |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos
       |  FROM toks WHERE doc_id >= $splitId),
       |kept AS (
       |  SELECT p.doc_id, p.pos, p.tok
       |  FROM tokpos p LEFT JOIN cutpos c ON p.doc_id = c.doc_id AND p.pos = c.pos
       |  WHERE c.pos IS NULL),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS kept_n,
       |    string_agg(tok, ' ' ORDER BY pos) AS text
       |  FROM kept GROUP BY doc_id)
       |SELECT t.doc_id,
       |  CAST(len(t.t) AS INTEGER) AS n_tokens,
       |  CAST(len(t.t) - COALESCE(a.kept_n, 0) AS INTEGER) AS removed_tokens,
       |  COALESCE(a.text, '') AS text
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |WHERE t.doc_id >= $splitId
       |ORDER BY t.doc_id""".stripMargin

  /** d10: one-sided d9 — a new batch's spans against the existing
    * corpus only, mirroring [[graft.operators.Dedup.substringSpansIncremental]].
    */
  def d10SubstringIncremental(splitId: Long = 250, k: Int = 8, minSpanTokens: Int = 16): String =
    s"""WITH ${substringCtes(k)},
       |m AS (
       |  SELECT a.doc_id AS new_id, b.doc_id AS dup_of, a.pos AS pos_new, b.pos AS pos_old
       |  FROM psh a JOIN psh b ON a.h = b.h AND a.doc_id >= $splitId AND b.doc_id < $splitId),
       |isl AS (
       |  SELECT new_id, dup_of, pos_new, pos_old, pos_new - pos_old AS diag,
       |    pos_new - ROW_NUMBER() OVER (PARTITION BY new_id, dup_of, pos_new - pos_old ORDER BY pos_new) AS island
       |  FROM m)
       |SELECT new_id, dup_of,
       |  CAST(MIN(pos_new) AS INTEGER) AS start_new,
       |  CAST(MIN(pos_old) AS INTEGER) AS start_old,
       |  CAST(COUNT(*) + ${k - 1} AS BIGINT) AS span_tokens
       |FROM isl
       |GROUP BY new_id, dup_of, diag, island
       |HAVING COUNT(*) + ${k - 1} >= $minSpanTokens
       |ORDER BY new_id, dup_of, start_new, start_old""".stripMargin

  /** dc9: the composed end-to-end curation pipeline — gate (dc6's rules)
    * → exact dedup (d1) → MinHash-LSH clusters + quality keeper
    * (d2/d6/dc3) → decontamination (dc1) → weighted mixture (dc4) —
    * chaining the SAME replica fragments the stage oracles use, each
    * stage restricted to the previous stage's survivors. Mirrors
    * [[graft.operators.Curation.fullCuration]]. String shingles stand in
    * for the FNV hash domain as in dc1/d4 (collision-negligible).
    */
  def dc9FullCuration(benchSize: Long = 50, shingleK: Int = 3, minShared: Long = 5,
      totalBudget: Long = 60000, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16): String =
    s"""WITH
       |${dc9Ctes(benchSize, shingleK, minShared, totalBudget, numHashes, bands,
          threshold, seed, rewriteK, rewriteMinSpan)}
       |SELECT doc_id, source, ws_tokens, cum_tokens, src_budget FROM sel
       |WHERE cum_tokens <= src_budget
       |ORDER BY source, cum_tokens""".stripMargin

  /** dc10: the dc9 attrition audit — per-stage survivor COUNT(*)s over
    * the SAME chained CTEs the dc9 replica runs, mirroring
    * [[graft.operators.Curation.fullCurationAudit]].
    */
  def dc10CurationAudit(benchSize: Long = 50, shingleK: Int = 3, minShared: Long = 5,
      totalBudget: Long = 60000, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, seed: Long = 42L,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16): String =
    s"""WITH
       |${dc9Ctes(benchSize, shingleK, minShared, totalBudget, numHashes, bands,
          threshold, seed, rewriteK, rewriteMinSpan)}
       |SELECT * FROM (
       |  SELECT 0 AS stage_ord, 'corpus' AS stage, (SELECT COUNT(*) FROM corpus) AS survivors,
       |    (SELECT CAST(COALESCE(SUM(len(t)), 0) AS BIGINT) FROM gtoks) AS ws_tokens
       |  UNION ALL SELECT 1, 'quality_gate', (SELECT COUNT(*) FROM s1),
       |    (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s1)
       |  UNION ALL SELECT 2, 'exact_dedup', (SELECT COUNT(*) FROM s2),
       |    (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s2)
       |  UNION ALL SELECT 3, 'near_dup', (SELECT COUNT(*) FROM s3),
       |    (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s3)
       |  UNION ALL SELECT 4, 'substring_rewrite', (SELECT COUNT(*) FROM s3r),
       |    (SELECT CAST(COALESCE(SUM(ws_tokens), 0) AS BIGINT) FROM s3r)
       |  UNION ALL SELECT 5, 'decontaminate', (SELECT COUNT(*) FROM s4),
       |    (SELECT CAST(COALESCE(SUM(ws_tokens), 0) AS BIGINT) FROM s4)
       |  UNION ALL SELECT 6, 'mixture',
       |    (SELECT COUNT(*) FROM sel WHERE cum_tokens <= src_budget),
       |    (SELECT CAST(COALESCE(SUM(ws_tokens), 0) AS BIGINT) FROM sel
       |     WHERE cum_tokens <= src_budget)) z
       |ORDER BY stage_ord""".stripMargin

  /** The dc9 CTE chain (gate → exact → near-dup → decon → mixture
    * window), shared verbatim by [[dc9FullCuration]] and
    * [[dc10CurationAudit]] so the audit oracle counts exactly the rows
    * the run oracle emits.
    */
  private def dc9Ctes(benchSize: Long, shingleK: Int, minShared: Long,
      totalBudget: Long, numHashes: Int, bands: Int,
      threshold: Double, seed: Long,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16): String = {
    val enStopwords = graft.operators.TextAnalysis.Stopwords("en")
      .map(w => s"'$w'").mkString("[", ",", "]")
    // k-token ' '-joined shingles: range(1, len(t) - (k - 2)) positions
    val shingleExpr = (0 until shingleK).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    def shingleCte(cteName: String, from: String): String =
      s"""$cteName AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${shingleK - 2}),
         |    i -> $shingleExpr)) AS shingle
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
         |        FROM $from) zt
         |  WHERE len(t) >= $shingleK) z)""".stripMargin
    // the rewrite stage's positional k-gram (string shingles stand in
    // for the FNV domain, the dc1/d4 precedent) and the k=3 decon
    // shingles over the KEPT token sequence
    val rShingleExpr = (0 until rewriteK).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    val keptShingleExpr = (0 until shingleK).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""corpus AS MATERIALIZED (SELECT * FROM documents WHERE doc_id >= $benchSize),
       |gtoks AS (
       |  SELECT doc_id, source, text, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM corpus),
       |gbase AS (
       |  SELECT doc_id, source, text,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
       |      / GREATEST(length(text), 1), 6) AS punct_ratio,
       |    ROUND(CAST(len(list_filter(t, x -> list_contains($enStopwords, x))) AS DOUBLE)
       |      / GREATEST(len(t), 1), 6) AS stop_ratio,
       |    len(list_distinct(t)) AS dt,
       |    list_aggregate(list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x))), 'max') AS topc,
       |    GREATEST(len(t) - 1, 0) AS nsh,
       |    len(list_distinct(list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i+1]))) AS dsh
       |  FROM gtoks),
       |gm AS (
       |  SELECT doc_id, source, text, n_tokens, punct_ratio, stop_ratio,
       |    ROUND(0.5 * LEAST(n_tokens, 100) / 100.0
       |        + 0.3 * (1.0 - punct_ratio)
       |        + 0.2 * LEAST(stop_ratio * 5.0, 1.0), 6) AS quality_score,
       |    ROUND(1.0 - dt / GREATEST(n_tokens, 1), 6) AS dup_token_frac,
       |    ROUND(topc / GREATEST(n_tokens, 1), 6) AS top_token_frac,
       |    ROUND(CASE WHEN nsh > 0 THEN 1.0 - dsh / nsh ELSE 0.0 END, 6) AS dup_2gram_frac
       |  FROM gbase),
       |s1 AS MATERIALIZED (
       |  SELECT doc_id, source, text, quality_score, n_tokens FROM gm
       |  WHERE n_tokens >= 16 AND punct_ratio <= 0.10 AND stop_ratio >= 0.01
       |    AND dup_token_frac <= 0.68 AND top_token_frac <= 0.16 AND dup_2gram_frac <= 0.08),
       |ex AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS MATERIALIZED (SELECT s1.* FROM s1 JOIN ex USING (doc_id)),
       |${minhashCtes(numHashes, bands, seed, source = "s2")},
       |p AS MATERIALIZED (SELECT doc_a, doc_b FROM cand WHERE est >= $threshold),
       |edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |verts AS (SELECT DISTINCT s AS doc_id FROM edges),
       |${pointerJumpLabels()},
       |rk AS (
       |  SELECT l.cluster_id, l.doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |      ORDER BY s2.quality_score DESC, l.doc_id) AS rn
       |  FROM labels l JOIN s2 USING (doc_id)),
       |drops AS (SELECT doc_id FROM rk WHERE rn > 1),
       |s3 AS MATERIALIZED (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
       |rt AS MATERIALIZED (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM s3),
       |rpsh AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, $rShingleExpr AS h
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${rewriteK - 2})) AS i
       |        FROM rt WHERE len(t) >= $rewriteK) z),
       |rm AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
       |  FROM rpsh a JOIN rpsh b ON a.h = b.h AND a.doc_id < b.doc_id),
       |risl AS (
       |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
       |    pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
       |  FROM rm),
       |rspans AS (
       |  SELECT doc_b AS doc_id, MIN(pos_b) AS sp, MIN(pos_b) + COUNT(*) + ${rewriteK - 2} AS ep
       |  FROM risl
       |  GROUP BY doc_a, doc_b, diag, island
       |  HAVING COUNT(*) + ${rewriteK - 1} >= $rewriteMinSpan),
       |rcut AS (
       |  SELECT DISTINCT doc_id, pos
       |  FROM (SELECT doc_id, unnest(range(sp, ep + 1)) AS pos FROM rspans) z),
       |rtokpos AS (
       |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS pos FROM rt),
       |rkept AS (
       |  SELECT p.doc_id, p.pos, p.tok
       |  FROM rtokpos p LEFT JOIN rcut c2 ON p.doc_id = c2.doc_id AND p.pos = c2.pos
       |  WHERE c2.pos IS NULL),
       |rlist AS MATERIALIZED (
       |  SELECT doc_id, list(tok ORDER BY pos) AS t, COUNT(*) AS rn FROM rkept GROUP BY doc_id),
       |s3r AS MATERIALIZED (
       |  SELECT s3.doc_id, s3.source, s3.quality_score,
       |    CAST(COALESCE(r.rn, 0) AS BIGINT) AS ws_tokens,
       |    COALESCE(r.t, CAST([] AS VARCHAR[])) AS t
       |  FROM s3 LEFT JOIN rlist r ON s3.doc_id = r.doc_id),
       |${shingleCte("bsh", s"documents WHERE doc_id < $benchSize")},
       |bench AS (SELECT DISTINCT shingle FROM bsh),
       |csh AS (SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${shingleK - 2}),
       |    i -> $keptShingleExpr)) AS shingle
       |  FROM s3r
       |  WHERE len(t) >= $shingleK) z),
       |cont AS (
       |  SELECT doc_id FROM csh JOIN bench USING (shingle)
       |  GROUP BY doc_id HAVING COUNT(*) >= $minShared),
       |s4 AS MATERIALIZED (SELECT * FROM s3r WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |c AS (SELECT doc_id, source, ws_tokens FROM s4),
       |wt AS (
       |  SELECT source, CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS DOUBLE) AS w
       |  FROM (SELECT DISTINCT source FROM s4) z),
       |b AS (
       |  SELECT source, CAST(FLOOR($totalBudget.0 * w / (SELECT SUM(w) FROM wt)) AS BIGINT) AS src_budget
       |  FROM wt),
       |sel AS MATERIALIZED (
       |  SELECT doc_id, c.source, ws_tokens, src_budget,
       |    CAST(SUM(ws_tokens) OVER (PARTITION BY c.source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM c JOIN b ON c.source = b.source)""".stripMargin
  }

  /** Shared CTEs: tokens → per-doc shingle-FNV list → 64-hash MinHash
    * signature → band-colliding candidate pairs with agreement estimate.
    * `pairCond` selects which (a, b) doc pairs are eligible (self-join
    * upper triangle by default; one-sided splits for incremental dedup).
    */
  private def minhashCtes(numHashes: Int, bands: Int, seed: Long,
      pairCond: String = "a.doc_id < b.doc_id",
      source: String = "documents"): String = {
    val shingleFnv = fnv64Sql("s")
    // universal-hash coefficients as a VALUES table instead of 64 inlined
    // expression columns: the per-(shingle, j) work becomes ONE generic
    // vectorized HUGEINT expression over the exploded cross product (a
    // per-doc lambda form ran the whole pass single-threaded inside one
    // row group and was 7× slower end-to-end); power-of-two mods are
    // bitwise AND masks (an order of magnitude cheaper than HUGEINT
    // division, identical on these non-negative values)
    val coefRows = (0 until numHashes).map { j =>
      val a = GraftHash.splitmix64(seed + 2L * j) | 1L
      val b = GraftHash.splitmix64(seed + 2L * j + 1)
      s"($j, CAST(${a >>> 32} AS HUGEINT), CAST(${a & 0xffffffffL} AS HUGEINT), CAST(${u(b)} AS HUGEINT))"
    }.mkString(", ")
    val tu = s"((((ahi * x) & 4294967295) * 4294967296 + alo * x + cb) & CAST(18446744073709551615 AS HUGEINT))"
    val ts = s"(CASE WHEN tu >= 9223372036854775808 THEN tu - 18446744073709551616 ELSE tu END)"
    val per = numHashes / bands
    val bandCond = (0 until bands)
      .map(b => s"(a.sig[${per * b + 1}:${per * b + per}] = b.sig[${per * b + 1}:${per * b + per}])")
      .mkString(" OR ")
    s"""mhc(j, ahi, alo, cb) AS MATERIALIZED (SELECT * FROM (VALUES $coefRows)),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM $source),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, $shingleFnv AS x
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i+1] || chr(31))) AS s
       |        FROM toks WHERE len(t) > 1)),
       |mhx AS MATERIALIZED (
       |  SELECT doc_id, j, MIN((($ts % $P61) + $P61) % $P61) AS m
       |  FROM (SELECT doc_id, j, $tu AS tu FROM sh, mhc)
       |  GROUP BY doc_id, j),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, list(CAST(m AS BIGINT) ORDER BY j) AS sig FROM mhx GROUP BY doc_id),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_filter(range($numHashes), i -> a.sig[i+1] = b.sig[i+1])) / $numHashes.0 AS est
       |  FROM sigs a JOIN sigs b ON $pairCond
       |  WHERE $bandCond)""".stripMargin
  }

  /** t15: the Count-Min plane replayed counter-for-counter — per row j,
    * every distinct token's bucket is splitmix64(fnv64(token) + j) mod w
    * (w a power of two, so the unsigned mod equals the JVM's mask), the
    * row's counters are bucket-grouped SUMs, and a probe's estimate is
    * the LEAST across rows. Mirrors
    * [[graft.operators.TextAnalysis.cmsTokenFreq]] /
    * [[graft.functions.CmsCounters]].
    */
  def t15CmsFreq(probes: Seq[String], d: Int = 4, w: Int = 512): String = {
    def bucketExpr(tokenExpr: String, j: Int): String =
      s"(${splitmixSql(s"((${fnv64Sql(tokenExpr)}) + $j) % $Mod64")}) % $w"
    val bucketCols = (0 until d).map(j => s"${bucketExpr("token", j)} AS b$j").mkString(",\n    ")
    val rowCtes = (0 until d).map(j =>
      s"cnt$j AS MATERIALIZED (SELECT b$j AS bu, CAST(SUM(c) AS BIGINT) AS n FROM tb GROUP BY b$j)")
      .mkString(",\n")
    val probeValues = probes.map(p => s"('$p')").mkString(", ")
    // LEFT joins + COALESCE 0: a probe bucket no corpus token landed in
    // has no counter row, and the JVM plane reads 0 there
    val joins = (0 until d)
      .map(j => s"LEFT JOIN cnt$j ON cnt$j.bu = ${bucketExpr("p.token", j)}")
      .mkString("\n")
    val least = (0 until d).map(j => s"COALESCE(cnt$j.n, 0)").mkString("LEAST(", ", ", ")")
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token FROM documents),
       |tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE token <> '' GROUP BY token),
       |tb AS MATERIALIZED (
       |  SELECT token, c,
       |    $bucketCols
       |  FROM tc),
       |$rowCtes,
       |probes(token) AS (VALUES $probeValues)
       |SELECT p.token, $least AS est_count,
       |  COALESCE(tc.c, 0) AS exact_count
       |FROM probes p
       |$joins
       |LEFT JOIN tc ON tc.token = p.token
       |ORDER BY p.token""".stripMargin
  }

  /** q27: the lineitem column profile replayed column by column — one
    * UNION ALL branch per column with the same metric shapes the
    * single-pass operator computes (nulls via COUNT(*) − COUNT(c),
    * distinct excluding nulls, numeric min/max as DOUBLE, timestamps as
    * exact epoch-microsecond doubles, strings lexicographic). Mirrors
    * [[graft.operators.Profile.lineitemProfile]].
    */
  def q27Profile(): String = {
    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val tsCols = Seq("l_shipdate")
    def branch(c: String, minNum: String, maxNum: String, minStr: String, maxStr: String): String =
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minStr AS min_str, $maxStr AS max_str
         |FROM lineitem""".stripMargin
    val branches =
      numCols.map(c => branch(c, s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
        "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")) ++
      tsCols.map(c => branch(c, s"CAST(MIN(epoch_us($c)) AS DOUBLE)", s"CAST(MAX(epoch_us($c)) AS DOUBLE)",
        "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")) ++
      strCols.map(c => branch(c, "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        s"MIN($c)", s"MAX($c)"))
    branches.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) z ORDER BY col_name")
  }

  /** t13: BPE merge training replayed round by round — mirrors
    * [[graft.operators.Bpe.bpeMerges]]. Each round r derives from the
    * previous round's dict: sliding adjacent-pair counts (parallel
    * unnest of the two slices), best pair by (count DESC, lhs, rhs),
    * then the greedy leftmost non-overlapping rewrite expressed with
    * window functions — match positions grouped into consecutive runs
    * (i - row_number), odd rank within a run is selected, the symbol
    * after a selected position is dropped. Identical semantics to the
    * Scala `aggregate`-accumulator (a match is skipped iff it starts
    * where the previous selected match ended).
    */
  def t13BpeMerges(numMerges: Int = 8): String = {
    val stepRows = (1 to numMerges)
      .map(r => s"SELECT CAST($r AS BIGINT) AS step, lhs, rhs, lhs || rhs AS merged, n AS pair_count FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(numMerges)}
       |SELECT * FROM (
       |  $stepRows) steps
       |ORDER BY step""".stripMargin
  }

  /** t14: corpus BPE encoding replayed — the t13 chain's FINAL dict
    * (d<N>) holds each word's fully-merged symbol list, so a doc's BPE
    * token count is the per-word list length summed over its words.
    * Mirrors [[graft.operators.Bpe.bpeEncode]].
    */
  def t14BpeEncode(numMerges: Int = 8): String =
    s"""WITH ${bpeCtes(numMerges)},
       |docw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '${graft.operators.TextAnalysis.SubwordRegex}')) AS word
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(len(d.t)) AS BIGINT) AS n_bpe_tokens
       |FROM docw w JOIN d$numMerges d USING (word)
       |WHERE w.word <> ''
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  private def bpeCtes(numMerges: Int): String = {
    def round(r: Int): String = {
      val prev = s"d${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT freq, unnest(t[1:len(t)-1]) AS lhs, unnest(t[2:len(t)]) AS rhs
         |  FROM $prev WHERE len(t) >= 2),
         |b$r AS MATERIALIZED (
         |  SELECT lhs, rhs, n FROM (
         |    SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS n FROM p$r GROUP BY lhs, rhs) z
         |  ORDER BY n DESC, lhs, rhs LIMIT 1),
         |m$r AS MATERIALIZED (
         |  -- LEFT JOIN ON TRUE, not CROSS JOIN: when a round finds no
         |  -- pair (fully merged vocabulary) b$r is EMPTY, and a cross
         |  -- join would empty the dict chain for every later round
         |  -- while the Scala trainer keeps the dict unchanged
         |  SELECT z.word, z.freq, z.i, z.t[z.i] AS sym,
         |    COALESCE(z.i < len(z.t) AND z.t[z.i] = b.lhs AND z.t[z.i+1] = b.rhs, FALSE) AS is_m
         |  FROM (SELECT word, freq, t, unnest(range(1, len(t) + 1)) AS i FROM $prev) z
         |  LEFT JOIN b$r b ON TRUE),
         |s$r AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i) AS rn
         |    FROM (SELECT word, i, i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
         |          FROM m$r WHERE is_m) g) h
         |  WHERE rn % 2 = 1),
         |d$r AS MATERIALIZED (
         |  SELECT m.word, MAX(m.freq) AS freq,
         |    list(CASE WHEN s.i IS NOT NULL THEN b.lhs || b.rhs ELSE m.sym END ORDER BY m.i) AS t
         |  FROM m$r m
         |  LEFT JOIN b$r b ON TRUE
         |  LEFT JOIN s$r s  ON s.word = m.word AND s.i = m.i
         |  LEFT JOIN s$r sp ON sp.word = m.word AND sp.i = m.i - 1
         |  WHERE sp.i IS NULL
         |  GROUP BY m.word)""".stripMargin
    }
    val rounds = (1 to numMerges).map(round).mkString(",\n")
    s"""words AS (
       |  SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '${graft.operators.TextAnalysis.SubwordRegex}')) AS word
       |    FROM documents) z
       |  WHERE word <> '' GROUP BY word),
       |d0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_append(list_transform(range(1, len(word) + 1), i -> word[i]), '</w>') AS t
       |  FROM words),
       |$rounds""".stripMargin
  }
}
