package graft.pipeline

import graft.QueryRegistry
import graft.dedup.{Dedup, SpanDedup}
import graft.sim.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import PipelineShared._

/** Driver-contract entries for the deduplication family (dd_*):
  * exact/MinHash-LSH/SimHash/n-gram/semantic/span/incremental/URL
  * dedup and their audits. Split from the PipelineQueries monolith
  * (r14 verdict #6) — see TextQueries scaladoc.
  */
object DedupQueries extends QueryRegistry {

  // Winnowing pair search (the MOSS detection step): pairs sharing >= 2
  // selected fingerprints, boilerplate fingerprints df-capped before
  // the self-join, scored shared/min(|fp|) in exact ppm. The oracle
  // replays the full selection chain plus the posting-list self-join.
  q("dd_winnow_pairs",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE text IS NOT NULL),
      |base AS (SELECT doc_id, t, CAST(len(t) - 2 AS BIGINT) AS ng
      |         FROM toks WHERE len(t) >= 3),
      |g AS (SELECT doc_id, i AS p,
      |        CAST(CAST(('0x' || substr(md5(
      |          array_to_string(t[i:i+2], ' ')), 1, 12)) AS UBIGINT)
      |          AS BIGINT) AS h
      |      FROM base CROSS JOIN
      |        unnest(generate_series(1, CAST(ng AS INT))) AS u(i)),
      |win AS (SELECT doc_id,
      |          unnest(generate_series(1,
      |            CAST(greatest(ng - 3, 1) AS INT))) AS s
      |        FROM base),
      |j AS (SELECT w.doc_id, w.s, g.p, g.h
      |      FROM win w JOIN g ON g.doc_id = w.doc_id
      |      WHERE g.p >= w.s AND g.p <= w.s + 3),
      |m AS (SELECT doc_id, s, min(h) AS mh FROM j GROUP BY 1, 2),
      |pick AS (SELECT j.doc_id, j.s, m.mh, max(j.p) AS p
      |         FROM j JOIN m ON m.doc_id = j.doc_id AND m.s = j.s
      |                      AND j.h = m.mh
      |         GROUP BY j.doc_id, j.s, m.mh),
      |ph AS (SELECT DISTINCT doc_id, mh AS h FROM pick),
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
      |        FROM ph GROUP BY doc_id),
      |ok AS (SELECT h FROM ph GROUP BY h HAVING count(*) <= 64),
      |okph AS (SELECT ph.doc_id, ph.h FROM ph JOIN ok USING (h)),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(count(*) AS BIGINT) AS n_shared
      |       FROM okph a JOIN okph b ON a.h = b.h AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT doc_a, doc_b, n_shared, ca.nf AS nf_a, cb.nf AS nf_b,
      |       CAST(n_shared * 1000000 // least(ca.nf, cb.nf) AS BIGINT)
      |         AS score_ppm
      |FROM pr JOIN cnt ca ON ca.doc_id = pr.doc_a
      |        JOIN cnt cb ON cb.doc_id = pr.doc_b""") { (s, d) =>
    graft.dedup.Dedup.winnowPairs(docs(s, d), k = 3, w = 4,
      minShared = 2, maxDocFreq = 64)
  }

  // ------------------------------------------------------------- dedup

  q("dd_exact",
    """SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
      |       CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY text""") { (s, d) =>
    Dedup.exactDedup(docs(s, d)).select("keep_id", "n_copies")
  }

  // Incremental ingest dedup: the incoming slice (doc_id % 10 >= 8)
  // deduped against the existing corpus's digest table and within
  // itself — the steady-state mode (the full re-scan above is the
  // bootstrap). Text never shuffles: the corpus side is 8-byte digests.
  q("dd_incremental",
    """WITH inc AS (SELECT doc_id, text FROM documents
      |             WHERE doc_id % 10 >= 8),
      |corp AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 < 8),
      |bk AS (SELECT text, min(doc_id) AS batch_keep FROM inc GROUP BY 1)
      |SELECT CAST(i.doc_id AS BIGINT) AS doc_id,
      |       CASE WHEN c.text IS NOT NULL THEN 'dup_corpus'
      |            WHEN i.doc_id <> bk.batch_keep THEN 'dup_batch'
      |            ELSE 'new' END AS status
      |FROM inc i
      |LEFT JOIN corp c ON i.text = c.text
      |JOIN bk ON i.text = bk.text""") { (s, d) =>
    val all = docs(s, d)
    Dedup.incrementalDedup(
      all.filter(col("doc_id") % 10 < 8),
      all.filter(col("doc_id") % 10 >= 8))
  }

  /** The full MinHash-LSH pipeline reproduced in DuckDB: shingle FNV-1a
    * via mod-2^64 HUGEINT folds, the 32 universal hashes with an
    * overflow-safe 32-bit-split modmul and JAVA SIGNED min semantics,
    * FNV band hashes (XOR done on 32-bit halves), bucket caps, and the
    * signature-agreement estimate. The (a_f, b_f) constants are
    * generated from Dedup.minhashParams — the same splitmix derivation
    * the JVM uses — so the two cannot drift. est = k/32 is dyadic, so
    * round(.,4) is engine-independent.
    */
  private val minhashOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val ps = Dedup.minhashParams(32, 42L)
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM sh),
       |uh AS (
       |  SELECT doc_id, f,
       |         ((((${aL}[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + ${aL}[f + 1] * (x % 4294967296))
       |           + ${bL}[f + 1]) % $M AS u
       |  FROM shh, unnest(generate_series(0, 31)) AS g(f)),
       |sig AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sig GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M
       |                ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM sigl, unnest(generate_series(0, 7)) AS g(band)),
       |ok_buckets AS (
       |  SELECT band, bucket FROM banded GROUP BY band, bucket
       |  HAVING count(*) BETWEEN 2 AND 64),
       |pairs AS (
       |  SELECT DISTINCT p.doc_id AS doc_a, q.doc_id AS doc_b, p.sig AS sa, q.sig AS sb
       |  FROM banded p
       |  JOIN banded q ON p.band = q.band AND p.bucket = q.bucket AND p.doc_id < q.doc_id
       |  JOIN ok_buckets ob ON ob.band = p.band AND ob.bucket = p.bucket)
       |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       |       round(len(list_filter(range(1, 33),
       |             i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0, 4) AS est_jaccard
       |FROM pairs
       |WHERE len(list_filter(range(1, 33),
       |      i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0 >= 0.5""".stripMargin
  }

  q("dd_minhash_lsh", minhashOracleSql) { (s, d) =>
    Dedup.minhashCandidates(docs(s, d), minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** The star-mode oracle (r13): the SAME HUGEINT minhash/banding CTEs
    * spliced up to the pair stage, then hot buckets (> 64) contribute
    * hub→member star edges (hub = bucket-min doc_id) unioned with the
    * capped full-pair set — the viral-family answer measured in
    * SCALE.md: connectivity for the CC keeper pass at k−1 rows per
    * hot bucket instead of exclusion (recall hole) or k²/2 (trap).
    */
  private val minhashStarOracleSql: String = {
    val cut = minhashOracleSql.indexOf("pairs AS (")
    require(cut >= 0, "minhashStarOracleSql splice anchor " +
      "\"pairs AS (\" not found in minhashOracleSql — the pair CTE was " +
      "reworded; update the anchor here to match")
    val tail = minhashOracleSql.indexOf("SELECT CAST(doc_a AS BIGINT)")
    require(tail >= 0, "minhashStarOracleSql final-SELECT anchor missing")
    val ctes = minhashOracleSql.substring(0, cut).trim
    val finalSel = minhashOracleSql.substring(tail)
    s"""$ctes pairs0 AS (
       |  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, p.sig AS sa, q.sig AS sb
       |  FROM banded p
       |  JOIN banded q ON p.band = q.band AND p.bucket = q.bucket AND p.doc_id < q.doc_id
       |  JOIN ok_buckets ob ON ob.band = p.band AND ob.bucket = p.bucket),
       |hot AS (
       |  SELECT band, bucket, min(doc_id) AS hub FROM banded
       |  GROUP BY band, bucket HAVING count(*) > 64),
       |star AS (
       |  SELECT h.hub AS doc_a, b.doc_id AS doc_b, hb.sig AS sa, b.sig AS sb
       |  FROM banded b
       |  JOIN hot h ON h.band = b.band AND h.bucket = b.bucket AND b.doc_id > h.hub
       |  JOIN banded hb ON hb.band = h.band AND hb.bucket = h.bucket AND hb.doc_id = h.hub),
       |pairs AS (
       |  SELECT DISTINCT doc_a, doc_b, sa, sb FROM
       |    (SELECT * FROM pairs0 UNION ALL SELECT * FROM star))
       |$finalSel""".stripMargin
  }

  // Star-mode MinHash-LSH (r13): identical to dd_minhash_lsh on this
  // corpus unless a bucket exceeds the cap — the testdata has none, so
  // the entry pins "star mode changes NOTHING in the benign regime"
  // (the adversarial regime is measured in graft.AdversarialDedup /
  // SCALE.md, and DedupSpec plants a hot family to prove connectivity).
  q("dd_minhash_lsh_star", minhashStarOracleSql) { (s, d) =>
    Dedup.minhashCandidates(docs(s, d), minEstJaccard = 0.5,
        hotBucketStar = true)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Recall/precision audit of the MinHash-LSH candidate pairs
    * against the EXACT 3-gram Jaccard ground truth at the same 0.5
    * threshold — the honest sketch-quality metric that belongs next
    * to dd_minhash_lsh's speed (the sim_ivf_recall posture, applied
    * to dedup): a banding/bucket-cap/signature regression moves
    * n_hit and fails the integer hash. One full-outer join of the two
    * bounded pair sets; counts and ppm ratios are exact integers.
    * The oracle re-derives BOTH sides (the complete HUGEINT minhash
    * chain — generated from the same `Dedup.minhashParams`, so the
    * two cannot drift — plus the exact posting-list intersection).
    */
  private val minhashRecallOracleSql: String = {
    val cut = minhashOracleSql.indexOf("SELECT CAST(doc_a AS BIGINT)")
    // guarded splice (r9 advisory): anchor drift must fail with a
    // pointed message, not a StringIndexOutOfBounds at class-init that
    // takes down the whole query registry
    require(cut >= 0, "minhashRecallOracleSql splice anchor " +
      "\"SELECT CAST(doc_a AS BIGINT)\" not found in minhashOracleSql — " +
      "the final SELECT was reworded; update the anchor here to match")
    val ctes = minhashOracleSql.substring(0, cut).trim
    s"""$ctes,
       |found AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  WHERE len(list_filter(range(1, 33),
       |        i -> sa[CAST(i AS INT)] = sb[CAST(i AS INT)])) / 32.0 >= 0.5),
       |grams2 AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
       |           FROM toks,
       |           unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |cnt2 AS (SELECT doc_id, count(*) AS n_grams FROM grams2
       |         GROUP BY doc_id),
       |inter2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                  count(*) AS n_inter
       |           FROM grams2 a
       |           JOIN grams2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |truth AS (SELECT doc_a, doc_b
       |          FROM inter2 JOIN cnt2 ca ON ca.doc_id = doc_a
       |                      JOIN cnt2 cb ON cb.doc_id = doc_b
       |          WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter),
       |                      4) >= 0.5),
       |hit AS (SELECT t.doc_a FROM truth t JOIN found f
       |        ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b),
       |c AS (SELECT
       |  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_cand,
       |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit)
       |SELECT n_truth, n_cand, n_hit,
       |  CAST(CASE WHEN n_truth = 0 THEN NULL
       |       ELSE n_hit * 1000000 // n_truth END AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN n_cand = 0 THEN NULL
       |       ELSE n_hit * 1000000 // n_cand END AS BIGINT) AS precision_ppm
       |FROM c""".stripMargin
  }

  q("dd_minhash_recall", minhashRecallOracleSql) { (s, d) =>
    val dc = docs(s, d)
    val truth = Dedup.ngramJaccardPairs(dc, n = 3, minJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val found = Dedup.minhashCandidates(dc, minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("f"))
    truth.join(found, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("f"), lit(0L))).as("n_cand"),
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("f"), lit(0L)))
          .as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_truth"))
          .as("recall_ppm"),
        when(col("n_cand") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_cand"))
          .as("precision_ppm"))
  }

  /** The MinHash-LSH recall/precision audit on the deterministic
    * md5-threshold sample (r12 — the [[graft.pipeline.Sampling
    * .hashSample]] lever from `sim_dbscan_sampled_recall`, applied to
    * the DEDUP family's audit so the pattern is a standing tool, not a
    * one-off): both the exact 3-gram Jaccard truth and the LSH
    * candidate generation run on the SAME pct=50 sample, so the
    * truth side's pair stage prices a quarter of the pair volume and
    * the audit has an executable path at any scale (pct=50 rather
    * than the embeddings audits' 25 because duplicate FAMILIES are
    * rarer than loose-τ cosine neighbors — 25% keeps 0 of the sf0.01
    * corpus's 25 truth pairs, 50% keeps 9; pick pct per signal
    * density, the row reports the sampled counts so vacuity is
    * visible). Unbiased for pair recall AND precision: a pair enters
    * either side iff both endpoints survive the sample (uniform over
    * pairs), and its signatures/band keys/gram sets — the detection
    * indicators — are pure functions of the two docs. The oracle is
    * the UNSAMPLED twin's full HUGEINT chain with every corpus read
    * routed through the identical md5 filter (one textual
    * substitution point, so the twins cannot drift); sums coalesce to
    * 0 so an empty sample degrades to zeros, not NULLs.
    */
  q("dd_minhash_recall_sampled",
    minhashRecallOracleSql.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE CAST(('0x' || " +
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) " +
        "% 100 < 50)")) { (s, d) =>
    val dc = graft.pipeline.Sampling.hashSample(docs(s, d), "doc_id", 50)
    val truth = Dedup.ngramJaccardPairs(dc, n = 3, minJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val found = Dedup.minhashCandidates(dc, minEstJaccard = 0.5)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("f"))
    truth.join(found, Seq("doc_a", "doc_b"), "full_outer")
      .agg(coalesce(sum(coalesce(col("t"), lit(0L))), lit(0L))
          .as("n_truth"),
        coalesce(sum(coalesce(col("f"), lit(0L))), lit(0L)).as("n_cand"),
        coalesce(sum(coalesce(col("t"), lit(0L)) *
          coalesce(col("f"), lit(0L))), lit(0L)).as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_truth"))
          .as("recall_ppm"),
        when(col("n_cand") === 0, lit(null).cast("long"))
          .otherwise(expr("n_hit * 1000000L div n_cand"))
          .as("precision_ppm"))
  }

  /** Incremental NEAR-dup ingest oracle (r9): the full minhash
    * machinery (same HUGEINT folds and constants as
    * [[minhashOracleSql]] — generated from the same
    * `Dedup.minhashParams`, so the two cannot drift), then the
    * steady-state split: corpus = doc_id%10 < 8 contributes band keys
    * from its STANDING signatures, the incoming slice joins them with
    * per-side bucket caps, and each incoming doc resolves to
    * near_dup_corpus (precedence) / near_dup_batch (smaller-id
    * keeper) / new with its best match by (est desc, id asc).
    */
  private val incNearDupOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val P = "CAST('1099511628211' AS HUGEINT)"
    val B = "CAST('14695981039346656037' AS HUGEINT)"
    val ps = Dedup.minhashParams(32, 42L)
    val aL = ps.map(p => s"CAST('${p._1}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val bL = ps.map(p => s"CAST('${p._2}' AS HUGEINT)")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
       |          * $P) % $M) AS x
       |  FROM sh),
       |uh AS (
       |  SELECT doc_id, f,
       |         ((((${aL}[f + 1] * (x // 4294967296)) % 4294967296) * 4294967296
       |            + ${aL}[f + 1] * (x % 4294967296))
       |           + ${bL}[f + 1]) % $M AS u
       |  FROM shh, unnest(generate_series(0, 31)) AS g(f)),
       |sig AS (
       |  SELECT doc_id, f,
       |         min(CAST(CASE WHEN u >= $H THEN u - $M ELSE u END AS BIGINT)) AS mh
       |  FROM uh GROUP BY doc_id, f),
       |sigl AS (SELECT doc_id, list(mh ORDER BY f) AS sig FROM sig GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, band,
       |    list_reduce(
       |      list_prepend($B,
       |        list_transform(sig[band * 4 + 1 : band * 4 + 4],
       |          s -> (CASE WHEN s < 0 THEN CAST(s AS HUGEINT) + $M
       |                ELSE CAST(s AS HUGEINT) END))),
       |      (acc, v) -> (((
       |          CAST(xor(CAST(acc // 4294967296 AS BIGINT), CAST(v // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |          + CAST(xor(CAST(acc % 4294967296 AS BIGINT), CAST(v % 4294967296 AS BIGINT)) AS HUGEINT))
       |        * $P) % $M)) AS bucket
       |  FROM sigl, unnest(generate_series(0, 7)) AS g(band)),
       |cband AS (SELECT * FROM banded WHERE doc_id % 10 < 8),
       |iband AS (SELECT * FROM banded WHERE doc_id % 10 >= 8),
       |okc AS (SELECT band, bucket FROM cband GROUP BY 1, 2
       |        HAVING count(*) <= 64),
       |oki AS (SELECT band, bucket FROM iband GROUP BY 1, 2
       |        HAVING count(*) <= 64),
       |candc AS (
       |  SELECT DISTINCT i.doc_id, c.doc_id AS match_id
       |  FROM iband i
       |  JOIN oki ON oki.band = i.band AND oki.bucket = i.bucket
       |  JOIN okc ON okc.band = i.band AND okc.bucket = i.bucket
       |  JOIN cband c ON c.band = i.band AND c.bucket = i.bucket),
       |candb AS (
       |  SELECT DISTINCT a.doc_id, b.doc_id AS match_id
       |  FROM iband a
       |  JOIN oki ON oki.band = a.band AND oki.bucket = a.bucket
       |  JOIN iband b ON b.band = a.band AND b.bucket = a.bucket
       |   AND a.doc_id > b.doc_id),
       |estc AS (
       |  SELECT cc.doc_id, cc.match_id,
       |         len(list_filter(range(1, 33),
       |           f -> si.sig[CAST(f AS INT)] = sm.sig[CAST(f AS INT)]))
       |           / 32.0 AS est
       |  FROM candc cc
       |  JOIN sigl si ON si.doc_id = cc.doc_id
       |  JOIN sigl sm ON sm.doc_id = cc.match_id),
       |estb AS (
       |  SELECT cc.doc_id, cc.match_id,
       |         len(list_filter(range(1, 33),
       |           f -> si.sig[CAST(f AS INT)] = sm.sig[CAST(f AS INT)]))
       |           / 32.0 AS est
       |  FROM candb cc
       |  JOIN sigl si ON si.doc_id = cc.doc_id
       |  JOIN sigl sm ON sm.doc_id = cc.match_id),
       |bestc AS (
       |  SELECT doc_id, match_id, est FROM (
       |    SELECT doc_id, match_id, est,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY est DESC, match_id) AS rn
       |    FROM estc WHERE est >= 0.5) WHERE rn = 1),
       |bestb AS (
       |  SELECT doc_id, match_id, est FROM (
       |    SELECT doc_id, match_id, est,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY est DESC, match_id) AS rn
       |    FROM estb WHERE est >= 0.5) WHERE rn = 1)
       |SELECT CAST(i.doc_id AS BIGINT) AS doc_id,
       |       CASE WHEN bc.doc_id IS NOT NULL THEN 'near_dup_corpus'
       |            WHEN bb.doc_id IS NOT NULL THEN 'near_dup_batch'
       |            ELSE 'new' END AS status,
       |       CAST(coalesce(bc.match_id, bb.match_id) AS BIGINT) AS match_id,
       |       round(coalesce(bc.est, bb.est), 4) AS est_jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) i
       |LEFT JOIN bestc bc ON bc.doc_id = i.doc_id
       |LEFT JOIN bestb bb ON bb.doc_id = i.doc_id""".stripMargin
  }

  q("dd_incremental_neardup", incNearDupOracleSql) { (s, d) =>
    val all = docs(s, d)
    Dedup.incrementalNearDup(
      Dedup.signatures(all.filter(col("doc_id") % 10 < 8)),
      all.filter(col("doc_id") % 10 >= 8))
  }

  /** Duplicate-cluster SIZE distribution (r9): the histogram behind
    * every dedup dashboard — how many exact-dup clusters of each size
    * exist, and how many docs they absorb. Two digest-keyed
    * aggregations (16-byte md5 keys, text never shuffles); output is
    * ≤ max-cluster-size rows.
    */
  q("dd_cluster_sizes",
    """WITH c AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies
      |           FROM documents GROUP BY text)
      |SELECT n_copies AS cluster_size,
      |       CAST(count(*) AS BIGINT) AS n_clusters,
      |       CAST(count(*) * (n_copies - 1) AS BIGINT) AS n_removable
      |FROM c GROUP BY n_copies""") { (s, d) =>
    docs(s, d)
      .groupBy(md5(col("text").cast("binary")).as("th"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("n_clusters") * (col("cluster_size") - 1)).as("n_removable"))
  }

  // SimHash candidates fully reproduced in SQL: per-token FNV-1a with
  // mod-2^64 HUGEINT folds (XOR only touches the low byte for ASCII, so
  // it runs on BIGINT), 64 bit-position votes, 16-bit banding from the
  // unsigned form, bucket caps, and popcount Hamming verification —
  // every stage of the JVM pipeline independently confirmed.
  q("dd_simhash",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |th AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
      |        list_transform(range(1, length(t) + 1),
      |          i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS HUGEINT))),
      |      (a, ch) -> ((a - (a % 256) +
      |          CAST(xor(CAST(a % 256 AS BIGINT), CAST(ch AS BIGINT)) AS HUGEINT))
      |          * CAST('1099511628211' AS HUGEINT))
      |          % CAST('18446744073709551616' AS HUGEINT)) AS h
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, b,
      |         sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << CAST(b AS INT))) % 2 = 1
      |                  THEN 1 ELSE -1 END) AS vote
      |  FROM th, unnest(generate_series(0, 63)) AS g(b)
      |  GROUP BY doc_id, b),
      |sh AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN vote > 0
      |                  THEN CAST(1 AS HUGEINT) << CAST(b AS INT)
      |                  ELSE CAST(0 AS HUGEINT) END) AS u
      |  FROM bits GROUP BY doc_id),
      |sh2 AS (
      |  SELECT doc_id, u,
      |         CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
      |                   THEN u - CAST('18446744073709551616' AS HUGEINT)
      |                   ELSE u END AS BIGINT) AS simhash
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, simhash, b AS band,
      |         CAST((u // (CAST(1 AS HUGEINT) << CAST(b * 16 AS INT))) % 65536 AS BIGINT) AS bucket
      |  FROM sh2, unnest(generate_series(0, 3)) AS g(b)),
      |ok_buckets AS (
      |  SELECT band, bucket FROM banded GROUP BY band, bucket
      |  HAVING count(*) BETWEEN 2 AND 64),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |                  a.simhash AS sa, b2.simhash AS sb
      |  FROM banded a
      |  JOIN banded b2 ON a.band = b2.band AND a.bucket = b2.bucket
      |                AND a.doc_id < b2.doc_id
      |  JOIN ok_buckets ob ON ob.band = a.band AND ob.bucket = a.bucket)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
      |       CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      |FROM pairs WHERE bit_count(xor(sa, sb)) <= 8""") { (s, d) =>
    Dedup.simhashCandidates(docs(s, d), maxHamming = 8)
  }

  q("dd_ngram_jaccard",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
      |       round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = doc_a
      |JOIN cnt cb ON cb.doc_id = doc_b
      |WHERE round(n_inter / (ca.n_grams + cb.n_grams - n_inter), 4) >= 0.8""") { (s, d) =>
    Dedup.ngramJaccardPairs(docs(s, d), n = 3, minJaccard = 0.8)
  }

  // Threshold-sensitivity curve for the Jaccard dedup threshold:
  // exact-decile histogram + top-down cumulative over pairs with
  // J >= 0.5 — see Dedup.jaccardThresholdCurve. Integer buckets
  // ((n_inter*10) div union), no float knife-edge.
  q("dd_threshold_curve",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 2 >= ca.n_grams + cb.n_grams - n_inter),
      |h AS (SELECT CAST((n_inter * 10) // un AS BIGINT) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1)
      |SELECT bucket, n_pairs,
      |       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cum_pairs
      |FROM h""") { (s, d) =>
    Dedup.jaccardThresholdCurve(docs(s, d), n = 3, minJaccard = 0.5)
  }

  // Capped threshold-curve twin: the production df knob for the
  // low-threshold AllPairs prefix join (56x cost at 10x data
  // uncapped — the prefix at t=0.5 is half of every doc, so common
  // shingles pay Σ prefix-df² in the self-join). The oracle is the
  // same uncapped-exact SQL: the entry asserts the bounded-recall
  // trade loses NO pair at test scale, while the bench rows time
  // capped vs uncapped at sf0.1/sf1 — the containment_capped pattern.
  // DATA-DEPENDENT assumption (r9 advisory): capped ≡ uncapped only
  // while no prefix gram's df exceeds 16 at verify scale — true of
  // the committed testdata and PINNED by PipelineOpsSpec via
  // Dedup.maxPrefixDocFreq on sf0.001/sf0.01, so a testdata regen
  // with hotter grams fails there with a pointed message (re-tune the
  // cap or accept the documented recall trade), not as an opaque
  // oracle-hash red here.
  q("dd_threshold_curve_capped",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 2 >= ca.n_grams + cb.n_grams - n_inter),
      |h AS (SELECT CAST((n_inter * 10) // un AS BIGINT) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1)
      |SELECT bucket, n_pairs,
      |       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cum_pairs
      |FROM h""") { (s, d) =>
    Dedup.jaccardThresholdCurve(docs(s, d), n = 3, minJaccard = 0.5,
      maxDocFreq = Some(16))
  }

  // MinHash-LSH (bands, rows) parameter planner — see Dedup.lshPlan:
  // every r·b = 128 split of the signature budget, the banding S-curve
  // P(s) = 1-(1-s^r)^b integrated against the MEASURED pair-similarity
  // histogram (percent buckets over the exact AllPairs set at
  // J >= 0.3), expected false-candidate and missed-pair masses around
  // the t = 0.5 target in µ-pairs, chosen = argmin(fp+fn). The S-curve
  // is fixed-point (denominator 1e12, square-and-floor powers) so the
  // oracle replays the identical integer recurrence — no pow(), no
  // doubles anywhere.
  private val lshPlanSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |sel AS (SELECT n_inter,
      |               ca.n_grams + cb.n_grams - n_inter AS un
      |        FROM inter
      |        JOIN cnt ca ON ca.doc_id = doc_a
      |        JOIN cnt cb ON cb.doc_id = doc_b
      |        WHERE n_inter * 10 >= (ca.n_grams + cb.n_grams - n_inter) * 3),
      |h AS (SELECT CAST((n_inter * 100) // un AS BIGINT) AS s_pct,
      |             CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM sel GROUP BY 1),
      |cfg AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS INT) AS r),
      |cfg2 AS (SELECT r, CAST(128 // r AS INT) AS b FROM cfg),
      |g0 AS (SELECT h.*, cfg2.*, s_pct * 10000000000 AS p1
      |       FROM h CROSS JOIN cfg2),
      |g1 AS (SELECT *, (p1::HUGEINT * p1) // 1000000000000 AS p2 FROM g0),
      |g2 AS (SELECT *, (p2::HUGEINT * p2) // 1000000000000 AS p4 FROM g1),
      |g3 AS (SELECT *, (p4::HUGEINT * p4) // 1000000000000 AS p8 FROM g2),
      |g4 AS (SELECT *, (p8::HUGEINT * p8) // 1000000000000 AS p16 FROM g3),
      |g5 AS (SELECT *, (p16::HUGEINT * p16) // 1000000000000 AS p32 FROM g4),
      |ga AS (SELECT *, 1000000000000 - (CASE r WHEN 1 THEN p1
      |         WHEN 2 THEN p2 WHEN 4 THEN p4 WHEN 8 THEN p8
      |         WHEN 16 THEN p16 ELSE p32 END) AS q1 FROM g5),
      |gb AS (SELECT *, (q1::HUGEINT * q1) // 1000000000000 AS q2 FROM ga),
      |gc AS (SELECT *, (q2::HUGEINT * q2) // 1000000000000 AS q4 FROM gb),
      |gd AS (SELECT *, (q4::HUGEINT * q4) // 1000000000000 AS q8 FROM gc),
      |ge AS (SELECT *, (q8::HUGEINT * q8) // 1000000000000 AS q16 FROM gd),
      |gf AS (SELECT *, (q16::HUGEINT * q16) // 1000000000000 AS q32 FROM ge),
      |gg AS (SELECT *, (q32::HUGEINT * q32) // 1000000000000 AS q64 FROM gf),
      |gh AS (SELECT *, (q64::HUGEINT * q64) // 1000000000000 AS q128 FROM gg),
      |gp AS (SELECT *, 1000000000000 - (CASE b WHEN 4 THEN q4
      |         WHEN 8 THEN q8 WHEN 16 THEN q16 WHEN 32 THEN q32
      |         WHEN 64 THEN q64 ELSE q128 END) AS pc FROM gh),
      |a AS (SELECT r, b, CAST(sum(n_pairs) AS BIGINT) AS n_pairs_obs,
      |        CAST(sum(CASE WHEN s_pct < 50
      |               THEN n_pairs::HUGEINT * pc ELSE 0 END) // 1000000
      |          AS BIGINT) AS fp_lo_upairs,
      |        CAST(sum(CASE WHEN s_pct >= 50
      |               THEN n_pairs::HUGEINT * (1000000000000 - pc)
      |               ELSE 0 END) // 1000000 AS BIGINT) AS fn_hi_upairs,
      |        CAST(sum(CASE WHEN s_pct >= 50
      |               THEN n_pairs::HUGEINT * pc ELSE 0 END) // 1000000
      |          AS BIGINT) AS caught_hi_upairs
      |      FROM gp GROUP BY 1, 2)
      |SELECT r, b, n_pairs_obs, fp_lo_upairs, fn_hi_upairs,
      |       caught_hi_upairs,
      |       CAST(fp_lo_upairs + fn_hi_upairs AS BIGINT) AS err_upairs,
      |       CAST(CASE WHEN fp_lo_upairs + fn_hi_upairs =
      |              min(fp_lo_upairs + fn_hi_upairs) OVER ()
      |            THEN 1 ELSE 0 END AS INT) AS chosen
      |FROM a""".stripMargin

  q("dd_lsh_plan", lshPlanSql) { (s, d) =>
    Dedup.lshPlan(docs(s, d), n = 3, minJaccard = 0.3)
  }

  // Capped planner twin — the production df knob for the t=0.3 prefix
  // join (the planner's floor threshold makes the prefix 70% of every
  // doc's grams, so the uncapped pair stage measured 112 s isolated at
  // sf1 — the dd_threshold_curve quadratic trap at a lower threshold).
  // The oracle is the SAME uncapped-exact SQL (one val, cannot
  // diverge): the entry asserts the cap loses NO pair at verify scale
  // — PINNED by the PipelineOpsSpec testdata-assumption test at
  // t=0.3 — while the bench rows time capped vs uncapped. At corpus
  // scale the capped form runs on a hash-sample besides — the planner
  // is a design-time readout.
  q("dd_lsh_plan_capped", lshPlanSql) { (s, d) =>
    Dedup.lshPlan(docs(s, d), n = 3, minJaccard = 0.3,
      maxDocFreq = Some(16))
  }

  // Per-source dedup impact report: docs/tokens that exact dedup would
  // remove, ppm rate — the post-dedup curation dashboard. Keeper is
  // global min doc_id per text, so cross-source dups charge the
  // non-keeper source. Digest keys only; report is sources-sized.
  q("dd_impact_report",
    """WITH h AS (SELECT doc_id, source, text,
      |                  len(string_split(text, ' ')) AS ntok
      |           FROM documents),
      |k AS (SELECT text, min(doc_id) AS keeper FROM h GROUP BY text)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(ntok) AS BIGINT) AS tokens_total,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN ntok ELSE 0 END) AS BIGINT)
      |    AS tokens_removed,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS removed_ppm
      |FROM h JOIN k USING (text)
      |GROUP BY source""") { (s, d) =>
    Dedup.dedupImpactReport(docs(s, d))
  }

  // Asymmetric n-gram containment (|sub ∩ super| / |sub| ≥ 0.9): the
  // quote-inclusion / partial-plagiarism relation symmetric Jaccard
  // misses. Sub-side prefix filter only (no length-ratio cap — the
  // super side legitimately dwarfs the sub); exact verification.
  q("dd_ngram_containment",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
      |                 count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_sub AS BIGINT) AS doc_sub,
      |       CAST(doc_super AS BIGINT) AS doc_super,
      |       round(n_inter / c.n_grams, 4) AS containment
      |FROM inter JOIN cnt c ON c.doc_id = doc_sub
      |WHERE round(n_inter / c.n_grams, 4) >= 0.9""") { (s, d) =>
    Dedup.ngramContainmentPairs(docs(s, d), n = 3, minContainment = 0.9)
  }

  // Capped containment twin: the production doc-frequency knob
  // (maxDocFreq=4 — AGGRESSIVE at this corpus size, where gram df tops
  // out at 7, so the filter genuinely drops ~1% of distinct grams from
  // candidate generation). The oracle is the same uncapped-exact SQL:
  // the entry asserts the bounded-recall trade loses NO true pair here
  // (a true pair is only lost when its entire sub-side prefix is hot —
  // near-clones always share rarer shingles too), while the bench rows
  // time capped vs uncapped side by side at sf0.1/sf1 — the
  // skew_join_naive/salted pattern.
  q("dd_ngram_containment_capped",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      |          FROM toks, unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |cnt AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
      |                 count(*) AS n_inter
      |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
      |          GROUP BY 1, 2)
      |SELECT CAST(doc_sub AS BIGINT) AS doc_sub,
      |       CAST(doc_super AS BIGINT) AS doc_super,
      |       round(n_inter / c.n_grams, 4) AS containment
      |FROM inter JOIN cnt c ON c.doc_id = doc_sub
      |WHERE round(n_inter / c.n_grams, 4) >= 0.9""") { (s, d) =>
    Dedup.ngramContainmentPairs(docs(s, d), n = 3, minContainment = 0.9,
      maxDocFreq = Some(4))
  }

  private val clusterOracleSql: String =
    s"""WITH RECURSIVE
      |$clusterCtes
      |SELECT CAST(v AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
      |       CAST(CASE WHEN min(r) = v THEN 1 ELSE 0 END AS INT) AS is_keep
      |FROM reach GROUP BY v"""

  q("dd_cluster_components", clusterOracleSql) { (s, d) =>
    val dd = docs(s, d)
    Dedup.clusterDedup(dd, Dedup.ngramJaccardPairs(dd, n = 3, minJaccard = 0.8))
  }

  /** Quality-aware keeper policy over the same duplicate clusters:
    * keeper = highest quality_score in the cluster (ties to the lower
    * id) instead of the min-id rule — the same CTE chain as
    * dd_cluster_components plus the t_quality score and one
    * cluster-keyed rank window on both engines.
    */
  private val keeperQualityOracleSql: String =
    s"""WITH RECURSIVE
      |$clusterCtes,
      |comp AS (SELECT v AS doc_id, min(r) AS cluster_id
      |         FROM reach GROUP BY v),
      |q AS (
      |  SELECT doc_id,
      |         round(least(len(list_filter(string_split(text, ' '), x -> x IN
      |           ('the','a','an','of','and','or','to','in','is','it',
      |            'for','on','with','as','at','by'))) /
      |           len(string_split(text, ' ')) * 2.5, 1.0) * 0.5 +
      |           least((length(text) - (len(string_split(text, ' ')) - 1)) /
      |           len(string_split(text, ' ')) / 8.0, 1.0) * 0.5, 4)
      |           AS quality_score
      |  FROM documents),
      |r AS (
      |  SELECT c.doc_id, c.cluster_id, q.quality_score,
      |         row_number() OVER (PARTITION BY c.cluster_id
      |                            ORDER BY q.quality_score DESC, c.doc_id)
      |           AS rn
      |  FROM comp c JOIN q ON q.doc_id = c.doc_id)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(cluster_id AS BIGINT) AS cluster_id, quality_score,
      |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS is_keep
      |FROM r"""

  q("dd_keeper_quality", keeperQualityOracleSql) { (s, d) =>
    val dd = docs(s, d)
    Dedup.keeperByQuality(
      Dedup.clusterDedup(dd, Dedup.ngramJaccardPairs(dd, n = 3,
        minJaccard = 0.8)),
      TextAnalysis.qualityProjection(dd))
  }

  /** Cross-source contamination matrix — see
    * [[graft.dedup.Dedup.sourceOverlap]]. The oracle groups on the
    * raw n-gram STRING where Spark shuffles its xxhash64 (the
    * dd_ngram_jaccard convention: identical distinct-counts barring
    * 2⁻⁶⁴ collisions); trigram construction replays the same
    * clamped-slice rule (`l[i:i+2]`, i ≤ max(len−2, 1)) as the Scala
    * transform. On the committed testdata the planted near-dup
    * clusters surface as the high-overlap pairs (e.g. sources sharing
    * a duplicated doc run 2-3× the ~5% background trigram overlap).
    */
  q("dd_source_overlap",
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS l
      |             FROM documents),
      |grams AS (
      |  SELECT DISTINCT source,
      |    array_to_string(l[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)],
      |                    ' ') AS g
      |  FROM toks,
      |       unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
      |per_src AS (SELECT source, count(*) AS n_grams FROM grams
      |            GROUP BY 1),
      |shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         count(*) AS n_shared
      |  FROM grams a JOIN grams b
      |    ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s.source_a, s.source_b,
      |       CAST(s.n_shared AS BIGINT) AS n_shared,
      |       CAST(pa.n_grams AS BIGINT) AS n_a,
      |       CAST(pb.n_grams AS BIGINT) AS n_b,
      |       CAST(s.n_shared * 1000000 // least(pa.n_grams, pb.n_grams)
      |            AS BIGINT) AS overlap_ppm
      |FROM shared s JOIN per_src pa ON pa.source = s.source_a
      |              JOIN per_src pb ON pb.source = s.source_b""") {
    (s, d) => Dedup.sourceOverlap(docs(s, d), n = 3)
  }

  /** Intra-doc repeated-window cleanup (k=4): a gram is dup when the
    * identical gram started earlier in the same doc; covered tokens
    * drop, first occurrences survive, text reassembles in order. Same
    * relational chain on both engines — min-over-(doc,gram) window,
    * covered-position expansion, anti join, ordered string_agg.
    */
  q("dd_intradoc_clean",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
      |             FROM documents),
      |tok AS (SELECT doc_id, i AS pos, l[i] AS w
      |        FROM toks, unnest(generate_series(1, len(l))) AS t(i)),
      |grams AS (SELECT doc_id, i AS p, array_to_string(l[i:i+3], ' ') AS g
      |          FROM toks,
      |               unnest(generate_series(1, greatest(len(l) - 3, 0)))
      |                 AS t(i)),
      |dups AS (SELECT doc_id, p FROM (
      |           SELECT doc_id, p,
      |                  min(p) OVER (PARTITION BY doc_id, g) AS fp
      |           FROM grams) s WHERE p > fp),
      |cov AS (SELECT DISTINCT doc_id, p + o AS pos
      |        FROM dups, unnest(generate_series(0, 3)) AS t(o)),
      |kept AS (SELECT t.doc_id, t.pos, t.w
      |         FROM tok t LEFT JOIN cov c
      |           ON c.doc_id = t.doc_id AND c.pos = t.pos
      |         WHERE c.doc_id IS NULL),
      |re AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |              string_agg(w, ' ' ORDER BY pos) AS text_clean
      |       FROM kept GROUP BY doc_id)
      |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
      |       CAST(len(b.l) AS INT) AS n_tokens,
      |       CAST(len(b.l) - r.n_kept AS BIGINT) AS n_dropped,
      |       r.text_clean
      |FROM toks b JOIN re r ON r.doc_id = b.doc_id""") { (s, d) =>
    Dedup.intraDocClean(docs(s, d), k = 4)
  }

  /** Corpus n-gram novelty (dataset-freshness scoring): the share of a
    * document's distinct 3-grams whose FIRST corpus occurrence (by
    * doc_id) is this document — near-zero novelty marks near-copies of
    * earlier material even when no single span crosses the span-dedup
    * bar. Two gram-keyed exchanges (min-doc first-occurrence, then the
    * membership join), both map-side combinable; per-doc distinct
    * grams bound the explode; ppm integers keep float out of the hash.
    */
  q("dd_novelty",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
      |             FROM documents),
      |g AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS gram
      |      FROM toks,
      |           unnest(generate_series(1, greatest(len(l) - 2, 0)))
      |             AS t(i)),
      |fo AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
      |SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
      |       CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(sum(CASE WHEN fd = g.doc_id THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_novel,
      |       CAST(sum(CASE WHEN fd = g.doc_id THEN 1 ELSE 0 END)
      |            * 1000000 // count(*) AS BIGINT) AS novelty_ppm
      |FROM g JOIN fo USING (gram)
      |GROUP BY g.doc_id""") { (s, d) =>
    val g = docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i, lit(3)))))).as("gram"))
    val fo = g.groupBy("gram").agg(min("doc_id").as("fd"))
    g.join(fo, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 div n_grams").as("novelty_ppm"))
  }

  /** Corpus-slice overlap via KMV bottom-k sketches, fully reproduced
    * in DuckDB: the same FNV-1a shingle fold the MinHash oracle uses
    * (HUGEINT mod-2^64 arithmetic), unsigned→signed conversion so the
    * bottom-k ranking agrees with the JVM's signed-long ordering, per
    * source the k smallest DISTINCT hashes, then the Beyer et al.
    * estimator on each pair via O(k) list algebra. All outputs are exact
    * integers — nothing in the estimate depends on float formatting.
    */
  private val kmvOracleSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    val H = "CAST('9223372036854775808' AS HUGEINT)"
    val k = 128
    s"""WITH toks AS (
       |  SELECT source, string_split(text, ' ') AS l FROM documents),
       |sh AS (
       |  SELECT source, array_to_string(l[i:i+2], ' ') AS s
       |  FROM toks,
       |       unnest(generate_series(1, greatest(len(l) - 2, 1))) AS t(i)),
       |shh AS (
       |  SELECT DISTINCT source,
       |    list_reduce(
       |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |        list_transform(range(1, length(s) + 1),
       |          i -> CAST(ord(substr(s, CAST(i AS INT), 1)) AS HUGEINT))),
       |      (acc, ch) -> ((acc - (acc % 256) +
       |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(ch AS BIGINT))
       |               AS HUGEINT))
       |          * CAST('1099511628211' AS HUGEINT)) % $M) AS x
       |  FROM sh),
       |sg AS (
       |  SELECT source,
       |         CAST(CASE WHEN x >= $H THEN x - $M ELSE x END AS BIGINT) AS h
       |  FROM shh),
       |rk AS (
       |  SELECT source, h,
       |         row_number() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM sg),
       |sk AS (
       |  SELECT source, list(h ORDER BY h) AS kmv
       |  FROM rk WHERE r <= $k GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS slice_a, b.source AS slice_b,
       |         list_sort(list_distinct(a.kmv || b.kmv))[1:$k] AS ku,
       |         a.kmv AS ka, b.kmv AS kb
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |est AS (
       |  SELECT slice_a, slice_b, CAST(len(ku) AS INT) AS k_used,
       |         CAST(len(list_intersect(list_intersect(ku, ka), kb))
       |              AS BIGINT) AS n_common
       |  FROM pairs)
       |SELECT slice_a, slice_b, k_used, n_common,
       |       CAST(n_common * 1000000 // k_used AS BIGINT) AS jaccard_ppm
       |FROM est""".stripMargin
  }

  q("dd_kmv_overlap", kmvOracleSql) { (s, d) =>
    Dedup.kmvOverlap(docs(s, d), sliceCol = "source", k = 128)
  }

  q("dd_cosine_neardup",
    """SELECT CAST(a.vec_id AS BIGINT) AS vec_a,
      |       CAST(b.vec_id AS BIGINT) AS vec_b,
      |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |             CAST(b.embedding AS DOUBLE[])), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |      CAST(b.embedding AS DOUBLE[])), 6) >= 0.4""") { (s, d) =>
    Dedup.cosineNearDup(embs(s, d), minCosine = 0.4)
  }

  /** SemDeDup reproduced in DuckDB: cell assignment re-derived exactly
    * as the sim_ivf_topk oracle does (hash-sampled centers, sequential
    * squared-L2 fold, ties to the smaller cell), then the single-pass
    * keep rule — drop any vector with a smaller-id within-cell
    * neighbor at raw cosine ≥ τ. The threshold compares UNROUNDED
    * cosines: the sequential fold is bit-equal cross-engine, so the
    * boundary cannot move on one side only.
    */
  private val semDedupOracleSql: String = {
    val (nlist, dims, tau) = (16, 64, 0.4)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr = 1),
       |drops AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.e, eb.e) >= $tau)
       |SELECT CAST(v.vec_id AS BIGINT) AS vec_id, CAST(v.cell AS INT) AS cell
       |FROM asg v WHERE v.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
  }

  q("dd_semdedup", semDedupOracleSql) { (s, d) =>
    val e = embs(s, d)
    Dedup.semDedup(Similarity.hashSampledQuantizer(e, nlist = 16), e,
      minCosine = 0.4)
  }

  // Span-level exact-substring dedup (Lee et al. 2021): maximal token
  // spans appearing verbatim in >= 2 distinct docs, at 8-gram grain.
  // Both oracles are generated from the same (k, minDocs) constants.
  q("dd_span_dedup", SpanDedup.duplicateSpansOracleSql(k = 8)) { (s, d) =>
    SpanDedup.duplicateSpans(docs(s, d), k = 8)
  }

  q("dd_span_share", SpanDedup.spanDupShareOracleSql(k = 8)) { (s, d) =>
    SpanDedup.spanDupShare(docs(s, d), k = 8)
  }

  // The actionable form: cleaned corpus with one surviving copy of
  // each duplicated passage (keeper = min doc_id per gram).
  q("dd_span_clean", SpanDedup.spanDedupCleanOracleSql(k = 8)) { (s, d) =>
    SpanDedup.spanDedupClean(docs(s, d), k = 8)
  }

  /** Embedding decontamination oracle: same cell re-derivation as the
    * semDedup oracle, but drops are corpus-vs-EVAL within-cell pairs
    * (eval slice = vec_id % 50 == 0). Unrounded cosine threshold — the
    * sequential fold is bit-equal cross-engine.
    */
  private val embedDecontamOracleSql: String = {
    val (nlist, dims, tau) = (16, 64, 0.25)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |            FROM embeddings),
       |ctr0 AS (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, e
       |         FROM emb ORDER BY h LIMIT $nlist),
       |ctr AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cell, e AS c
       |        FROM ctr0),
       |dst AS (
       |  SELECT v.vec_id, c.cell,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, ${dims + 1}), i ->
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]) *
       |             (v.e[CAST(i AS INT)] - c.c[CAST(i AS INT)]))),
       |           (a, x) -> a + x) AS d2
       |  FROM emb v CROSS JOIN ctr c),
       |asg AS (
       |  SELECT vec_id, cell
       |  FROM (SELECT vec_id, cell,
       |          row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY d2, cell) AS pr
       |        FROM dst) WHERE pr = 1),
       |drops AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell
       |  JOIN emb ea ON ea.vec_id = a.vec_id
       |  JOIN emb eb ON eb.vec_id = b.vec_id
       |  WHERE a.vec_id % 50 <> 0 AND b.vec_id % 50 = 0
       |    AND list_cosine_similarity(ea.e, eb.e) >= $tau)
       |SELECT CAST(v.vec_id AS BIGINT) AS vec_id, CAST(v.cell AS INT) AS cell
       |FROM asg v WHERE v.vec_id % 50 <> 0
       |  AND v.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
  }

  q("dd_embed_decontam", embedDecontamOracleSql) { (s, d) =>
    val e = embs(s, d)
    val evalSlice = e.filter(col("vec_id") % 50 === 0)
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
    Dedup.embedDecontaminate(
      Similarity.hashSampledQuantizer(e, nlist = 16),
      corpus, evalSlice, minCosine = 0.25)
  }

  // URL-level dedup (the crawl-frontier step BEFORE any text is
  // fetched, so it must run on the URL alone): canonical-URL
  // equivalence classes, keeper = min doc_id (a total order → the
  // pick is deterministic on both engines), everything else in the
  // class flagged as a URL-dup. One shuffle on the canonical URL;
  // the class table shrinks to distinct URLs and joins back
  // AQE-sized. At crawl scale the same plan holds — classes are
  // host-path-bounded, and a pathological single-URL hotspot is a
  // count, not a fan-out (the join back is class→members, never
  // members×members).
  q("dd_url_dedup",
    urlSynthCanonSql +
    """,
      |g AS (SELECT url_canon, min(doc_id) AS keeper_id,
      |             count(*) AS class_size
      |      FROM c GROUP BY 1)
      |SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.url_canon,
      |       CAST(g.keeper_id AS BIGINT) AS keeper_id,
      |       CAST(g.class_size AS BIGINT) AS class_size,
      |       CAST(CASE WHEN c.doc_id <> g.keeper_id THEN 1 ELSE 0 END
      |            AS INT) AS is_url_dup
      |FROM c JOIN g USING (url_canon)""".stripMargin) { (s, d) =>
    val c = urlCanonFrame(s, d)
    val g = c.groupBy("url_canon")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("class_size"))
    c.join(g, "url_canon")
      .select(col("doc_id"), col("url_canon"), col("keeper_id"),
        col("class_size"),
        (col("doc_id") =!= col("keeper_id")).cast("int").as("is_url_dup"))
  }

  // Benchmark decontamination: flag corpus docs sharing any 8-gram
  // with the held-out eval slice (doc_id % 100 < 2) — train-set
  // hygiene as one exploded pass + gram-hash join.
  q("dd_decontaminate",
    """WITH w AS (SELECT doc_id, doc_id % 100 < 2 AS is_bench,
      |                  string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, is_bench,
      |             md5(array_to_string(ws[i:i+7], ' ')) AS h
      |      FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
      |      WHERE len(ws) >= 8),
      |bh AS (SELECT DISTINCT h FROM g WHERE is_bench),
      |hits AS (SELECT doc_id, count(DISTINCT h) AS n_shared
      |         FROM g JOIN bh USING (h) WHERE NOT is_bench GROUP BY 1)
      |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |       CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
      |       CAST(CASE WHEN coalesce(n_shared, 0) > 0 THEN 1 ELSE 0 END
      |            AS INT) AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE NOT (doc_id % 100 < 2)) d
      |LEFT JOIN hits ON hits.doc_id = d.doc_id""") { (s, d) =>
    Dedup.decontaminate(docs(s, d), col("doc_id") % 100 < 2, n = 8)
  }

  // Bloom-filter decontamination: at 100 TB you broadcast the m-bit
  // bitmap of the eval set, not a join side. Relational form — the
  // DISTINCT bit-position set (<= m rows) broadcasts; docs with all
  // 3 bits present are flagged; `exact` accounts false positives.
  // m scales with the eval count (5 bits/key, floor 64) so the FP
  // rate stays ~9% at every sf — small ON PURPOSE so the FP path is
  // non-empty and oracle-checked (production bitsPerKey ~10-20).
  q("dd_bloom_decontam",
    """WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
      |                  doc_id % 100 < 10 AS is_eval FROM documents),
      |n AS (SELECT greatest(64, 5 * count(*)) AS m FROM t WHERE is_eval),
      |b AS (SELECT doc_id, is_eval, md5(text) AS th,
      |             CAST(CAST(('0x' || substr(md5(concat(CAST(i AS VARCHAR),
      |                  ':', text)), 1, 8)) AS UBIGINT) % m AS BIGINT)
      |               AS bit
      |      FROM t, n, unnest([0, 1, 2]) AS u(i)),
      |bloom AS (SELECT DISTINCT bit FROM b WHERE is_eval),
      |ev AS (SELECT DISTINCT md5(text) AS th FROM t WHERE is_eval),
      |hits AS (SELECT doc_id, th, count(*) AS n_bits_hit
      |         FROM b JOIN bloom USING (bit) WHERE NOT is_eval
      |         GROUP BY doc_id, th HAVING count(*) = 3)
      |SELECT h.doc_id, CAST(n_bits_hit AS BIGINT) AS n_bits_hit,
      |       CAST(CASE WHEN e.th IS NOT NULL THEN 1 ELSE 0 END AS INT)
      |         AS exact
      |FROM hits h LEFT JOIN ev e USING (th)""") { (s, d) =>
    Dedup.bloomDecontaminate(docs(s, d), col("doc_id") % 100 < 10,
      bitsPerKey = 5, j = 3)
  }
}
