package graft

import graft.analysis._
import graft.core._
import graft.ops._

/** Shared SQL fragments of the tier `oracleSql` maps (portable-minhash
  * pipeline, quantile-tree walk, UA expressions, langid scoring, PII
  * regexes) — the body of SparkEntry.oracleSql's prelude, moved verbatim
  * in round 8. */
private[graft] object OracleFragments {
    val x = "least(greatest(floor(value), 10.0), 100.0)" // clipped value
    // 60 bit-majority expressions of the portable simhash signature (bit b of
    // the sig is 1 iff the sign-sum of token-hash bit b is positive)
    val simhashBits = (0 until 60).map(b =>
      s"(CASE WHEN SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    // language-ID scoring recomputed from the same (static, public) stopword
    // profiles: distinct-stopword intersection per language, argmax with
    // earliest-language tie-break, CJK char-ratio override — the langId
    // fold's exact semantics
    val langScores = graft.ops.Stopwords.profiles.map { case (lang, words) =>
      val list = words.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")
      lang -> s"len(list_distinct(list_intersect(toks, $list)))"
    }
    val langMax = langScores.map(s => s"s_${s._1}").mkString("greatest(", ", ", ")")
    val enStopList = graft.ops.Stopwords.en
      .map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")
    val langArms = langScores.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    // portable-minhash permutation constants (fixed literals; see Dedup.permA)
    val permAList = graft.ops.Dedup.permA.mkString("[", ",", "]")
    val permBList = graft.ops.Dedup.permB.mkString("[", ",", "]")
    // the full portable-minhash pipeline through the verify-input CTE `v`,
    // parameterized by band width (8-row bands for the Jaccard near-dup
    // grid; 2-row bands for the containment variant); shared by
    // dedup_minhash_md5, dedup_containment, and (as the pair source)
    // dedup_components
    def minhashPrefixSql(rows: Int, source: String = "documents") =
      s"""WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM $source),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3 THEN
                         list_distinct(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       ELSE [array_to_string(toks, ' ')] END AS grams
              FROM tok WHERE len(toks) > 0),
            h AS (
              SELECT doc_id,
                     CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) % 2147483647 AS h
              FROM (SELECT doc_id, unnest(grams) AS g FROM sh)),
            mh AS (
              SELECT doc_id, p,
                     min((($permAList)[p + 1] * h + ($permBList)[p + 1]) % 2147483647) AS mv
              FROM h CROSS JOIN (SELECT unnest(range(0, 128)) AS p)
              GROUP BY doc_id, p),
            sig AS (
              SELECT doc_id, p // $rows AS band,
                     string_agg(CAST(mv AS VARCHAR), '_' ORDER BY p) AS bucket
              FROM mh GROUP BY doc_id, p // $rows),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sig a JOIN sig b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
            v AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) AS inter,
                     CAST(len(ga.grams) + len(gb.grams) AS DOUBLE) AS szsum,
                     CAST(least(len(ga.grams), len(gb.grams)) AS DOUBLE) AS szmin,
                     CAST(len(ga.grams) AS DOUBLE) AS sz_a,
                     CAST(len(gb.grams) AS DOUBLE) AS sz_b
              FROM cand JOIN sh ga ON ga.doc_id = id_a JOIN sh gb ON gb.doc_id = id_b)
            """
    def minhashMd5SqlFor(source: String) =
      s"""${minhashPrefixSql(8, source)}SELECT id_a, id_b,
                   CASE WHEN szsum - inter = 0 THEN 0.0
                        ELSE inter / (szsum - inter) END AS jaccard
            FROM v
            WHERE (CASE WHEN szsum - inter = 0 THEN 0.0
                        ELSE inter / (szsum - inter) END) >= 0.6"""
    val minhashMd5Sql = minhashMd5SqlFor("documents")
    // the same candidate pipeline with 2-row bands and the CONTAINMENT
    // verify (|A∩B| / min size)
    val containmentMd5Sql =
      s"""${minhashPrefixSql(2)}SELECT id_a, id_b,
                   CASE WHEN szmin = 0 THEN 0.0
                        ELSE inter / szmin END AS containment
            FROM v
            WHERE (CASE WHEN szmin = 0 THEN 0.0
                        ELSE inter / szmin END) >= 0.8"""
    // Quantile-tree walk oracle, parameterized by the percentile list (whole
    // percents). Replicates the zero-noise height-4/branching-16 descent.
    def pctlTreeSqlFor(ps: Seq[Int], source: String = "events"): String = {
      val valuesList = ps.map(p => s"(${p / 100.0})").mkString(", ")
      val pivots = ps.map(p =>
        s"MAX(CASE WHEN q = ${p / 100.0} THEN v END) AS percentile_$p")
        .mkString(",\n                  ")
      s"""WITH leaves AS (
             SELECT event_type,
                    CASE WHEN lf >= 65536 THEN 65535 ELSE lf END AS leaf
             FROM (SELECT event_type,
                          CAST(trunc(((least(greatest(floor(value), 0.0), 500.0) - 0.0)
                                      / (500.0 - 0.0)) * 65536.0) AS BIGINT) AS lf
                   FROM $source)
           ),
           qs AS (SELECT * FROM (VALUES $valuesList) t(q)),
           tot AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n FROM leaves GROUP BY 1),
           l1 AS (SELECT event_type, leaf // 4096 AS d, CAST(count(*) AS DOUBLE) AS c
                  FROM leaves GROUP BY 1, 2),
           s1 AS (
             SELECT event_type, q, d AS sel1, c AS c1, (t1 - (cumt - c)) / c AS r1
             FROM (SELECT t.event_type, qs.q, l.d, l.c, qs.q * t.n AS t1,
                          SUM(l.c) OVER (PARTITION BY t.event_type, qs.q ORDER BY l.d) AS cumt
                   FROM tot t CROSS JOIN qs JOIN l1 l ON l.event_type = t.event_type) z
             WHERE cumt >= t1
             QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY d) = 1
           ),
           l2 AS (SELECT s.event_type, s.q, s.sel1, s.r1, s.c1,
                         (l.leaf // 256) % 16 AS d, CAST(count(*) AS DOUBLE) AS c
                  FROM s1 s JOIN leaves l
                    ON l.event_type = s.event_type AND l.leaf // 4096 = s.sel1
                  GROUP BY ALL),
           s2 AS (
             SELECT event_type, q, sel1, d AS sel2, c AS c2, (t2 - (cumt - c)) / c AS r2
             FROM (SELECT *, r1 * c1 AS t2,
                          SUM(c) OVER (PARTITION BY event_type, q ORDER BY d) AS cumt
                   FROM l2) z
             WHERE cumt >= t2
             QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY d) = 1
           ),
           l3 AS (SELECT s.event_type, s.q, s.sel1, s.sel2, s.r2, s.c2,
                         (l.leaf // 16) % 16 AS d, CAST(count(*) AS DOUBLE) AS c
                  FROM s2 s JOIN leaves l
                    ON l.event_type = s.event_type AND l.leaf // 4096 = s.sel1
                   AND (l.leaf // 256) % 16 = s.sel2
                  GROUP BY ALL),
           s3 AS (
             SELECT event_type, q, sel1, sel2, d AS sel3, c AS c3, (t3 - (cumt - c)) / c AS r3
             FROM (SELECT *, r2 * c2 AS t3,
                          SUM(c) OVER (PARTITION BY event_type, q ORDER BY d) AS cumt
                   FROM l3) z
             WHERE cumt >= t3
             QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY d) = 1
           ),
           l4 AS (SELECT s.event_type, s.q, s.sel1, s.sel2, s.sel3, s.r3, s.c3,
                         l.leaf % 16 AS d, CAST(count(*) AS DOUBLE) AS c
                  FROM s3 s JOIN leaves l
                    ON l.event_type = s.event_type AND l.leaf // 4096 = s.sel1
                   AND (l.leaf // 256) % 16 = s.sel2 AND (l.leaf // 16) % 16 = s.sel3
                  GROUP BY ALL),
           s4 AS (
             SELECT event_type, q, sel1, sel2, sel3, d AS sel4, (t4 - (cumt - c)) / c AS r4
             FROM (SELECT *, r3 * c3 AS t4,
                          SUM(c) OVER (PARTITION BY event_type, q ORDER BY d) AS cumt
                   FROM l4) z
             WHERE cumt >= t4
             QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, q ORDER BY d) = 1
           ),
           walk AS (
             SELECT event_type, q,
                    lo3 + sel4 * w4 AS lo4, lo3 + (sel4 + 1) * w4 AS hi4, r4
             FROM (
               SELECT *, (hi3 - lo3) / 16.0 AS w4 FROM (
                 SELECT *, lo2 + sel3 * w3 AS lo3, lo2 + (sel3 + 1) * w3 AS hi3 FROM (
                   SELECT *, (hi2 - lo2) / 16.0 AS w3 FROM (
                     SELECT *, lo1 + sel2 * w2 AS lo2, lo1 + (sel2 + 1) * w2 AS hi2 FROM (
                       SELECT *, (hi1 - lo1) / 16.0 AS w2 FROM (
                         SELECT *, 0.0 + sel1 * w1 AS lo1, 0.0 + (sel1 + 1) * w1 AS hi1 FROM (
                           SELECT *, (500.0 - 0.0) / 16.0 AS w1 FROM s4))))))) y
           ),
           res AS (
             SELECT event_type, q,
                    least(greatest(lo4 + r4 * (hi4 - lo4), 0.0), 500.0) AS v
             FROM walk
           )
           SELECT event_type,
                  $pivots
           FROM res GROUP BY event_type"""
    }
    val pctlTreeSql = pctlTreeSqlFor(Seq(10, 50, 90))
    // best corpus match per new-batch doc from the portable pair set; shared
    // by dedup_incremental and its stored-signature twin
    val incrementalBestMatchSql =
      s"""WITH pairs AS ($minhashMd5Sql),
          cross_pairs AS (
            SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id,
                   CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS match_id,
                   jaccard
            FROM pairs
            WHERE (id_a % 10 = 0) <> (id_b % 10 = 0))
          SELECT id, match_id, jaccard FROM (
            SELECT *, row_number() OVER (
              PARTITION BY id ORDER BY jaccard DESC, match_id ASC) AS rn
            FROM cross_pairs) WHERE rn = 1"""


    // ---- utility-analysis oracle scaffolding (mirrors uaPublicOptions /
    // uaPrivateOptions; noise scales are sqrt(2)*l1/eps with eps = the equal
    // split share, evaluation order matching graft.core.DpNoise.laplaceB) ----
    val sclip = "least(greatest(s, mins), maxs)"
    val cclip = "least(greatest(cnt, 0.0), linf)"
    // shared per-(partition, config) error-moment table incl. empty public
    // partitions; replicates UtilityAnalysis.preAggregate + perPartitionMetrics
    val uaPerPartitionSql =
      s"""WITH pre AS (
            SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS cnt,
                   sum(floor(value)) AS s
            FROM events WHERE event_type IN ('click','view')
            GROUP BY user_id, event_type),
          np AS (SELECT pre.*, count(*) OVER (PARTITION BY user_id) AS nparts FROM pre),
          cfg AS (SELECT * FROM (VALUES
              (0, 1.0, 3.0, 0.0, 100.0),
              (1, 2.0, 100.0, 0.0, 500.0)) t(i, l0, linf, mins, maxs)),
          r AS (
            SELECT event_type, i, least(1.0, l0 / nparts) AS p, cnt, s, linf, mins, maxs
            FROM np CROSS JOIN cfg),
          per AS (
            SELECT event_type, i AS config_index,
              count(*) AS raw_privacy_id_count,
              CAST(sum(CAST(cnt AS BIGINT)) AS BIGINT) AS raw_count,
              sum(s) AS sum_sum,
              sum(CASE WHEN s < mins THEN $sclip - s ELSE 0.0 END) AS sum_clip_min_err,
              sum(CASE WHEN s > maxs THEN $sclip - s ELSE 0.0 END) AS sum_clip_max_err,
              sum(-$sclip * (1.0 - p)) AS sum_exp_l0_err,
              sqrt(sum($sclip * $sclip * p * (1.0 - p))) AS sum_std_l0_err,
              sum(cnt) AS count_sum,
              sum(CASE WHEN cnt < 0.0 THEN $cclip - cnt ELSE 0.0 END) AS count_clip_min_err,
              sum(CASE WHEN cnt > linf THEN $cclip - cnt ELSE 0.0 END) AS count_clip_max_err,
              sum(-$cclip * (1.0 - p)) AS count_exp_l0_err,
              sqrt(sum($cclip * $cclip * p * (1.0 - p))) AS count_std_l0_err
            FROM r GROUP BY 1, 2),
          pp AS (
            SELECT pc.event_type, pc.i AS config_index, 1.0 AS keep_prob,
              coalesce(per.raw_privacy_id_count, 0) AS raw_privacy_id_count,
              coalesce(per.raw_count, 0) AS raw_count,
              coalesce(per.sum_sum, 0.0) AS sum_sum,
              coalesce(per.sum_clip_min_err, 0.0) AS sum_clip_min_err,
              coalesce(per.sum_clip_max_err, 0.0) AS sum_clip_max_err,
              coalesce(per.sum_exp_l0_err, 0.0) AS sum_exp_l0_err,
              coalesce(per.sum_std_l0_err, 0.0) AS sum_std_l0_err,
              coalesce(per.count_sum, 0.0) AS count_sum,
              coalesce(per.count_clip_min_err, 0.0) AS count_clip_min_err,
              coalesce(per.count_clip_max_err, 0.0) AS count_clip_max_err,
              coalesce(per.count_exp_l0_err, 0.0) AS count_exp_l0_err,
              coalesce(per.count_std_l0_err, 0.0) AS count_std_l0_err,
              CASE WHEN pc.i = 0 THEN sqrt(2) * (100.0 / 0.5)
                   ELSE sqrt(2) * (1000.0 / 0.5) END AS sum_noise_std,
              CASE WHEN pc.i = 0 THEN sqrt(2) * (3.0 / 0.5)
                   ELSE sqrt(2) * (200.0 / 0.5) END AS count_noise_std
            FROM (SELECT * FROM (VALUES ('click'), ('view'), ('ghost_type')) p(event_type)
                  CROSS JOIN cfg) pc
            LEFT JOIN per ON per.event_type = pc.event_type AND per.config_index = pc.i)"""

    // per-metric derived error columns for the report oracle (public
    // partitions: keep_prob = weight = 1)
    def uaDerived(m: String) =
      s"""${m}_sum AS ${m}_actual,
          ${m}_exp_l0_err + ${m}_clip_min_err + ${m}_clip_max_err AS ${m}_am,
          ${m}_std_l0_err * ${m}_std_l0_err + ${m}_noise_std * ${m}_noise_std AS ${m}_av,
          -${m}_exp_l0_err AS ${m}_dl0,
          ${m}_clip_min_err - ${m}_clip_max_err AS ${m}_dlinf,
          ${m}_noise_std"""
    def uaRmse(m: String) =
      s"""sqrt(${m}_am * ${m}_am + ${m}_av) AS ${m}_rmse"""
    def uaAggs(m: String) =
      s"""max(${m}_noise_std) AS ${m}_noise_std,
          sum(${m}_actual) AS ${m}_actual,
          sum(${m}_dl0) AS ${m}_dl0,
          sum(${m}_dlinf) AS ${m}_dlinf,
          sum(${m}_am) AS ${m}_am,
          sum(${m}_av) AS ${m}_av,
          sum(${m}_rmse) AS ${m}_rmse,
          sum(CASE WHEN ${m}_actual = 0 THEN 0.0 ELSE ${m}_am / ${m}_actual END) AS ${m}_rm,
          sum(CASE WHEN ${m}_actual = 0 THEN 0.0 ELSE ${m}_av / (${m}_actual * ${m}_actual) END) AS ${m}_rv,
          sum(CASE WHEN ${m}_actual = 0 THEN 0.0 ELSE ${m}_rmse / ${m}_actual END) AS ${m}_rrmse"""
    def uaFinal(m: String) =
      s"""round(${m}_noise_std, 9) AS ${m}_noise_std,
          round(CASE WHEN ${m}_actual = 0
                     THEN (CASE WHEN ${m}_dl0 = 0 THEN 0.0 ELSE 1.0 END)
                     ELSE ${m}_dl0 / ${m}_actual END, 9) AS ${m}_ratio_dropped_l0,
          round(CASE WHEN ${m}_actual = 0
                     THEN (CASE WHEN ${m}_dlinf = 0 THEN 0.0 ELSE 1.0 END)
                     ELSE ${m}_dlinf / ${m}_actual END, 9) AS ${m}_ratio_dropped_linf,
          round(0.0, 9) AS ${m}_ratio_dropped_ps,
          round(${m}_am / tw, 9) AS ${m}_abs_mean,
          round(${m}_av / tw, 9) AS ${m}_abs_variance,
          round(${m}_rmse / tw, 9) AS ${m}_abs_rmse,
          round(${m}_rmse / tw, 9) AS ${m}_abs_rmse_wd,
          round(${m}_rm / tw, 9) AS ${m}_rel_mean,
          round(${m}_rv / tw, 9) AS ${m}_rel_variance,
          round(${m}_rrmse / tw, 9) AS ${m}_rel_rmse,
          round(${m}_rrmse / tw, 9) AS ${m}_rel_rmse_wd"""
    val uaBucket =
      """CASE WHEN raw_privacy_id_count <= 0 THEN 0
              WHEN raw_privacy_id_count < 10 THEN 1
              ELSE CAST(pow(10.0, floor(log10(CAST(raw_privacy_id_count AS DOUBLE))))
                * (CASE WHEN CAST(raw_privacy_id_count AS DOUBLE)
                          / pow(10.0, floor(log10(CAST(raw_privacy_id_count AS DOUBLE)))) >= 5 THEN 5.0
                        WHEN CAST(raw_privacy_id_count AS DOUBLE)
                          / pow(10.0, floor(log10(CAST(raw_privacy_id_count AS DOUBLE)))) >= 2 THEN 2.0
                        ELSE 1.0 END) AS BIGINT) END"""
    // Laplace-thresholding selection constants for uaPrivateOptions (computed
    // by the same code the engine uses; embedded as exact double literals)
    val uaPrivT = {
      val sel = LaplaceThresholdingSelection(1.0, 5e-5, 1, 1)
      // Locale.ROOT, NOT the f-interpolator: under a comma-decimal default
      // locale (de_DE) f"%.17g" renders "11,612..." and the interpolated
      // SQL becomes a DuckDB syntax error
      String.format(java.util.Locale.ROOT, "%.17g", Double.box(sel.threshold))
    }
    // brute-force cosine top-k over the 1024-quantized embeddings,
    // parameterized on the query-id cutoff and k so every consumer
    // (sim_topk, sim_ivf_exact, the rrf fusion's dense arm) is generated
    // from ONE definition and cannot drift
    def bruteTopKSqlFor(maxQid: Int, k: Int): String =
      s"""WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1024) / 1024) AS emb
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  CASE WHEN sqrt(list_sum(list_transform(q.emb, x -> x * x))) = 0
                         OR sqrt(list_sum(list_transform(c.emb, x -> x * x))) = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
                            / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                               * sqrt(list_sum(list_transform(c.emb, x -> x * x))))
                  END AS cosine
           FROM e q CROSS JOIN e c WHERE q.vec_id < $maxQid)
         SELECT query_id, neighbor_id, cosine,
                CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
         FROM scored
         QUALIFY rank <= $k"""
    // ground truth for BOTH sim_topk (brute-force operator) and
    // sim_ivf_exact (IVF with nprobe == nlist, provably equal)
    val bruteTopKSql = bruteTopKSqlFor(maxQid = 20, k = 5)
    // Okapi BM25 top-k replay, parameterized on k so sim_bm25_topk (k=5)
    // and the rrf fusion's lexical arm (k=20) share one definition.
    // Query fixture = vocabulary df-ranks 10..29, 4 terms/query. Exact
    // integer arithmetic throughout: log2-floor IDF via bin-length (the
    // tfidf convention), and the k1=1.2/b=0.75 tf factor cleared to ONE
    // integral division — numerator scale*idf*22*totlen*tf, denominator
    // 10*totlen*tf + 3*totlen + 9*dl*N — in HUGEINT (the DECIMAL(38,0)
    // arm of the Spark side), with only BIGINT columns released.
    def bm25SqlFor(k: Int): String =
      s"""WITH tok AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         base AS (
           SELECT doc_id, COALESCE(len(toks), 0) AS dl, toks FROM tok),
         stats AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(COALESCE(sum(dl), 0) AS BIGINT) AS totlen FROM base),
         tfall AS (
           SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
           GROUP BY doc_id, tok),
         dfall AS (
           SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tfall GROUP BY term),
         queries AS (
           SELECT CAST((r - 10) // 4 AS BIGINT) AS query_id, term, dfreq
           FROM (SELECT term, dfreq,
                        row_number() OVER (ORDER BY dfreq DESC, term ASC) AS r
                 FROM dfall)
           WHERE r >= 10 AND r < 30),
         bm25scored AS (
           SELECT q.query_id, t.doc_id, t.tf, b.dl,
                  CAST(length(bin((SELECT n FROM stats) // q.dfreq)) - 1 AS BIGINT) AS idf
           FROM tfall t JOIN queries q USING (term) JOIN base b USING (doc_id)),
         contrib AS (
           SELECT query_id, doc_id,
                  CAST((CAST(idf * 22000000 AS HUGEINT) * totlen * tf)
                     // (CAST(10 AS HUGEINT) * totlen * tf + 3 * totlen + 9 * dl * n)
                     AS BIGINT) AS c
           FROM bm25scored, stats),
         agg AS (
           SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score,
                  CAST(count(*) AS BIGINT) AS n_terms
           FROM contrib GROUP BY query_id, doc_id)
         SELECT query_id, doc_id, score, n_terms,
                CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
         FROM agg
         QUALIFY rk <= $k"""
    // PII oracle arms generated from the SAME pattern table the operator
    // uses, so impl and oracle cannot drift (patterns are Java/RE2-portable
    // and contain no single quotes)
    val piiCountsSql = CorpusOps.piiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(", ")
    val piiScrubSql = CorpusOps.piiPatterns.foldLeft("text") {
      case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }
    // generated from the SAME pattern/entity tables the operator uses
    // (the piiScrubSql convention), so impl and oracle cannot drift
    val htmlStripSql = {
      val blocks = graft.ops.TextAnalysis.htmlDropBlocks.foldLeft("html") {
        (acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')"
      }
      val noTags = s"regexp_replace($blocks, '<[^>]*>', ' ', 'g')"
      val decoded = graft.ops.TextAnalysis.htmlEntities.foldLeft(noTags) {
        case (acc, (e, r)) =>
          s"regexp_replace($acc, '$e', '${r.replace("'", "''")}', 'g')"
      }
      s"trim(regexp_replace($decoded, '[ \\t\\n\\r]+', ' ', 'g'))"
    }
}
