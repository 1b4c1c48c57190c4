package graft.queries

/** DuckDB replication of graft.llm.Hashing — the splitmix64 / FNV-1a /
  * hyperplane-sign kernels as SQL macros, exact to the bit.
  *
  * Why this exists: the LSH-family operators (MinHash bands, SimHash,
  * hyperplane ANN) are approximate ALGORITHMS but deterministic FUNCTIONS —
  * their signatures involve no RNG state (graft/llm/Hashing.scala). That
  * makes the whole bucket→candidate→verify pipeline recomputable by an
  * independent engine, upgrading these queries from rows-only checks to
  * full hash-compared oracles.
  *
  * Arithmetic notes (64-bit wrap-around without a 64-bit unsigned type):
  *  - values live in HUGEINT (int128) restricted to [0, 2^64);
  *  - xor goes through UBIGINT (bit pattern is the same);
  *  - wrapping multiply splits the multiplicand into 32-bit halves so no
  *    intermediate exceeds 2^96 (HUGEINT-safe);
  *  - Spark/Scala Long comparisons are SIGNED, so `tosigned` re-biases
  *    before any min/ordering that must match the JVM kernel.
  */
object HashOracle {

  /** Macro prelude — prepend to any oracle that recomputes signatures.
    * CREATE OR REPLACE keeps repeated execution on one connection safe. */
  val macros: String =
    """CREATE OR REPLACE MACRO ux(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
      |CREATE OR REPLACE MACRO wmul(x, c) AS
      |  ((((((x >> 32) * (c & 4294967295)) & 4294967295) << 32)
      |    + (x & 4294967295) * c) & 18446744073709551615::HUGEINT);
      |CREATE OR REPLACE MACRO sm1(x) AS wmul(ux(x, x >> 30), 13787848793156543929::HUGEINT);
      |CREATE OR REPLACE MACRO sm2(x) AS wmul(ux(x, x >> 27), 10723151780598845931::HUGEINT);
      |CREATE OR REPLACE MACRO sm3(x) AS ux(x, x >> 31);
      |CREATE OR REPLACE MACRO sm64(x) AS sm3(sm2(sm1((x + 11400714819323198485::HUGEINT) & 18446744073709551615::HUGEINT)));
      |CREATE OR REPLACE MACRO fnv1a(s) AS (
      |  list_reduce(
      |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |      list_transform(range(1, length(s) + 1), i -> CAST(unicode(s[i]) AS HUGEINT))),
      |    (h, c) -> wmul(ux(h, c), 1099511628211::HUGEINT)));
      |CREATE OR REPLACE MACRO mix64(h, j) AS sm64(ux(h, (CAST(j AS HUGEINT) * 11400714819323198485::HUGEINT) & 18446744073709551615::HUGEINT));
      |CREATE OR REPLACE MACRO tosigned(u) AS CAST(CASE WHEN u >= 9223372036854775808::HUGEINT THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT);
      |CREATE OR REPLACE MACRO planesign(p, d) AS
      |  CASE WHEN CAST(sm64((CAST(p AS HUGEINT) * 2685821657736338717::HUGEINT + d) & 18446744073709551615::HUGEINT) AS UBIGINT) & 1 = 1 THEN 1 ELSE -1 END;
      |""".stripMargin

  /** CTE body computing the 64-slot MinHash signature as rows
    * (doc_id, j, slot) — mirrors Dedup.minhashSignature (k=3 word shingles,
    * FNV-1a per shingle, signed min of mix64 per slot). */
  val minhashSigRows: String =
    """d AS (SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |  ELSE list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS shingle FROM d),
      |uh AS (SELECT shingle, fnv1a(shingle) AS h FROM (SELECT DISTINCT shingle FROM sh)),
      |hh AS (SELECT DISTINCT doc_id, h FROM sh JOIN uh USING (shingle)),
      |sigrows AS (SELECT doc_id, j.j AS j, min(tosigned(mix64(h, j.j))) AS slot
      |  FROM hh, range(64) j(j) GROUP BY doc_id, j.j)""".stripMargin

  /** CTE body for the banded MinHash buckets with the hot-bucket cap —
    * bucket identity is the raw 4-slot slice (xxhash64 of the slice in the
    * engine is injective-modulo-collisions; equality of slices IS equality
    * of buckets). Yields `sc` (doc_id, band, sl). */
  val minhashBuckets: String =
    """slice AS (SELECT doc_id, j // 4 AS band, list(slot ORDER BY j) AS sl
      |  FROM sigrows GROUP BY doc_id, j // 4),
      |capped AS (SELECT band, sl FROM slice GROUP BY band, sl HAVING count(*) <= 500),
      |sc AS (SELECT slice.* FROM slice JOIN capped USING (band, sl))""".stripMargin

  /** CTE body computing the 16-bit hyperplane signature per embedding —
    * mirrors Ann.withNormSig: bit p = (Σ_d emb[d]·planesign(p,d) > 0),
    * folded in ascending dim order to match the JVM's sequential double
    * accumulation. Yields `sig` (vec_id, sig). */
  val hyperplaneSig: String =
    """e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, u.p, u.d, CAST(e.embedding[u.d + 1] AS DOUBLE) * planesign(u.p, u.d) AS term
      |  FROM e, (SELECT p, d FROM range(16) t(p), range(64) v(d)) u),
      |dots AS (SELECT vec_id, p, list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY d)), (a, b) -> a + b) AS dot
      |  FROM x GROUP BY vec_id, p),
      |sig AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS sig
      |  FROM dots GROUP BY vec_id),
      |bk AS (SELECT vec_id, b.b AS band,
      |  (sig // (CASE b.b WHEN 0 THEN 1 WHEN 1 THEN 16 WHEN 2 THEN 256 ELSE 4096 END)) % 16 AS bh
      |  FROM sig, range(4) b(b))""".stripMargin

  /** Exact sequential-fold cosine between two embedding columns (64 dims),
    * identical to graft.functions.CosineSimilarity's double accumulation. */
  def cosine(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) /
       | (sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))) *
       |  sqrt(list_sum(list_transform(range(1, 65), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /** Cosine of a float embedding against an INTEGER centroid — the centroid
    * passes through FLOAT first, replaying Exprs.cosine's array<float> cast
    * so both engines feed identical IEEE inputs to the fold. */
  def cosineIntCentroid(a: String, c: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST(CAST($c[i] AS FLOAT) AS DOUBLE))) /
       | (sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))) *
       |  sqrt(list_sum(list_transform(range(1, 65), i -> CAST(CAST($c[i] AS FLOAT) AS DOUBLE) * CAST(CAST($c[i] AS FLOAT) AS DOUBLE)))))""".stripMargin

  /** Squared-L2 of an integer sub-vector list `sq` against a codebook
    * (csum, cnt) mean, dsub=8 — ascending-dim double fold matching
    * graft.llm.Pq.l2 (mean = one exact-int double division). */
  def pqL2(sq: String, csum: String, cnt: String): String =
    s"""list_sum(list_transform(range(1, 9), i ->
       |  (CAST($sq[i] AS DOUBLE) - CAST($csum[i] AS DOUBLE) / CAST($cnt AS DOUBLE)) *
       |  (CAST($sq[i] AS DOUBLE) - CAST($csum[i] AS DOUBLE) / CAST($cnt AS DOUBLE))))""".stripMargin

  /** One per-subspace Lloyd step for product quantization over `subq`
    * (vec_id, m, sq: 8 quantized dims) given codebook `cin`
    * (m, code, csum, cnt), yielding `cout`: L2-argmin assignment (ties by
    * code), element-wise integer re-sums + counts, empty codes keep their
    * previous (csum, cnt) — mirrors graft.llm.Pq.train exactly. */
  def pqStep(cin: String, cout: String): String =
    s"""x_$cout AS (SELECT subq.vec_id, subq.m, $cin.code, subq.sq,
       |  ${pqL2("subq.sq", s"$cin.csum", s"$cin.cnt")} AS dist
       |  FROM subq JOIN $cin ON subq.m = $cin.m),
       |a_$cout AS (SELECT vec_id, m, code, sq FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk
       |   FROM x_$cout) WHERE rk = 1),
       |s_$cout AS (SELECT m, code, d.d AS dim, sum(sq[d.d]) AS sv
       |  FROM a_$cout, range(1, 9) d(d) GROUP BY m, code, d.d),
       |l_$cout AS (SELECT m, code, list(sv ORDER BY dim) AS csum FROM s_$cout GROUP BY m, code),
       |n_$cout AS (SELECT m, code, CAST(count(*) AS BIGINT) AS cnt FROM a_$cout GROUP BY m, code),
       |$cout AS (SELECT $cin.m, $cin.code,
       |  coalesce(l_$cout.csum, $cin.csum) AS csum,
       |  coalesce(n_$cout.cnt, $cin.cnt) AS cnt
       |  FROM $cin LEFT JOIN l_$cout ON l_$cout.m = $cin.m AND l_$cout.code = $cin.code
       |            LEFT JOIN n_$cout ON n_$cout.m = $cin.m AND n_$cout.code = $cin.code)""".stripMargin

  /** One Lloyd step over the quantized corpus `qv` given centroids `cin`,
    * yielding centroids `cout`: cosine assignment (ties by list_id),
    * integer dim-sums, empty lists keep their previous centroid. */
  def lloydStep(cin: String, cout: String): String =
    s"""x_$cout AS (SELECT qv.vec_id, qv.qe, $cin.list_id,
       |  ${cosineIntCentroid("qv.embedding", s"$cin.centroid")} AS sim FROM qv, $cin),
       |a_$cout AS (SELECT vec_id, qe, list_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rk FROM x_$cout) WHERE rk = 1),
       |s_$cout AS (SELECT list_id, d.d AS dim, sum(qe[d.d]) AS sv FROM a_$cout, range(1, 65) d(d) GROUP BY list_id, d.d),
       |r_$cout AS (SELECT list_id, list(sv ORDER BY dim) AS centroid FROM s_$cout GROUP BY list_id),
       |$cout AS (SELECT $cin.list_id, coalesce(r_$cout.centroid, $cin.centroid) AS centroid
       |  FROM $cin LEFT JOIN r_$cout USING (list_id))""".stripMargin
}
