package graft.queries

import graft.Tables
import graft.operators.{Evaluation, QualityClassifier, TextAnalysis}
import org.apache.spark.sql.functions._

/** Filter-model evaluation gates ([[graft.operators.Evaluation]]): the
  * metrics that justify deleting data with a classifier or a dedup
  * stage. Every gate is full-oracle — the scores/labels under
  * evaluation are themselves md5-contract or closed-form operators
  * (classifier logits, Gopher rule labels, blocking keys), so DuckDB
  * rebuilds BOTH the model outputs and the metric from the contracts
  * alone and the whole evaluate-the-filter pipeline sits under one
  * hash.
  */
object EvalQueries extends QueryGroup {

  /** Shared oracle CTE: the md5-contract classifier score per doc
    * (same contract as the `text_quality_classifier` gate).
    */
  private val ScoreCte =
    """tk AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w FROM documents),
      |f AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT % 1024 AS b FROM tk),
      |wt AS (SELECT doc_id, (('0x' || substr(md5('w' || b::VARCHAR), 1, 7))::BIGINT % 2001) - 1000 AS wt FROM f),
      |sc AS (SELECT doc_id, sum(wt)::BIGINT + (('0x' || substr(md5('bias'), 1, 7))::BIGINT % 2001) - 1000 AS score FROM wt GROUP BY doc_id)""".stripMargin

  /** Shared oracle CTE: the Gopher rule-cascade keep label per doc
    * (same contract as the `text_gopher_rules` gate).
    */
  private val LabelCte =
    """gb AS (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS nw,
      |    (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0
      |      / greatest(length(text), 1) AS praw,
      |    list_reduce(list_prepend(0::BIGINT,
      |        list_transform(string_split_regex(trim(text), '\s+'), w -> length(w)::BIGINT)),
      |        (a, b) -> a + b) * 1.0
      |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS mwl,
      |    len(list_filter(string_split_regex(trim(text), '\s+'),
      |        w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
      |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS alpha_frac,
      |    len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')),
      |        ['the','a','an','of','and','or','to','in','is','it'])) AS n_stops
      |  FROM documents),
      |lb AS (SELECT doc_id, (nw BETWEEN 10 AND 1000) AND (mwl BETWEEN 3.0 AND 10.0)
      |    AND alpha_frac >= 0.8 AND praw <= 0.1 AND n_stops >= 2 AS label FROM gb)""".stripMargin

  /** Spark side of the shared (score, label) frame: classifier
    * milli-logit joined to the Gopher keep label on doc_id — the
    * "does the cheap model reproduce the expensive rule cascade"
    * distillation question.
    */
  private def scoreLabel(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables(s, dir).documents
    val score = QualityClassifier
      .portableLogitMilli(docs, "text", "doc_id", buckets = 1024)
      .select(col("doc_id"), col("logit_milli").as("score"))
    val label = docs.select(col("doc_id"),
      TextAnalysis.gopherKeep(TextAnalysis.gopherRules(col("text")))
        .as("label"))
    score.join(label, "doc_id")
  }

  /** ROC AUC of the hashed classifier against the Gopher label
    * ([[Evaluation.rocAuc]]): Mann-Whitney with average-rank ties,
    * integer rank sums until the final division — the oracle replays
    * classifier, labels, AND the rank statistic.
    */
  val auc: QueryDef = QueryDef(
    "eval_auc",
    (s, dir) => Evaluation.rocAuc(scoreLabel(s, dir), "score", "label"),
    Some(
      s"""WITH $ScoreCte,
         |$LabelCte,
         |j AS (SELECT sc.score, lb.label FROM sc JOIN lb USING (doc_id)),
         |g AS (SELECT score AS s, count(*) AS n,
         |  sum(CASE WHEN label THEN 1 ELSE 0 END) AS p FROM j GROUP BY score),
         |cm AS (SELECT s, n, p, coalesce(sum(n) OVER
         |  (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below FROM g),
         |a AS (SELECT sum(p)::BIGINT AS np, sum(n - p)::BIGINT AS nn,
         |  sum(p::DOUBLE * (2 * below + n + 1)) AS r2 FROM cm)
         |SELECT np AS n_pos, nn AS n_neg,
         |  round((r2 / 2 - np::DOUBLE * (np + 1) / 2) / (np::DOUBLE * nn), 6) AS auc
         |FROM a""".stripMargin))

  /** Precision / recall / F1 at three operating thresholds on the
    * milli-logit ([[Evaluation.prAtThresholds]]) — the table a
    * pipeline owner reads to pick the filter's cut point.
    */
  val prThreshold: QueryDef = QueryDef(
    "eval_pr_threshold",
    (s, dir) =>
      Evaluation.prAtThresholds(scoreLabel(s, dir), "score", "label",
          Seq(1000L, 3000L, 5000L))
        .orderBy("threshold"),
    Some(
      s"""WITH $ScoreCte,
         |$LabelCte,
         |j AS (SELECT sc.score, lb.label FROM sc JOIN lb USING (doc_id)),
         |t AS (SELECT unnest([1000, 3000, 5000])::BIGINT AS threshold),
         |g AS (SELECT threshold,
         |  sum(CASE WHEN score >= threshold AND label THEN 1 ELSE 0 END)::BIGINT AS tp,
         |  sum(CASE WHEN score >= threshold AND NOT label THEN 1 ELSE 0 END)::BIGINT AS fp,
         |  sum(CASE WHEN score < threshold AND label THEN 1 ELSE 0 END)::BIGINT AS fn,
         |  sum(CASE WHEN score < threshold AND NOT label THEN 1 ELSE 0 END)::BIGINT AS tn
         |FROM j CROSS JOIN t GROUP BY threshold)
         |SELECT threshold, tp, fp, fn, tn,
         |  round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp)::DOUBLE END, 6) AS precision,
         |  round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn)::DOUBLE END, 6) AS recall,
         |  round(CASE WHEN tp + fp > 0 AND tp + fn > 0
         |      AND tp / (tp + fp)::DOUBLE + tp / (tp + fn)::DOUBLE > 0
         |    THEN 2 * (tp / (tp + fp)::DOUBLE) * (tp / (tp + fn)::DOUBLE)
         |      / (tp / (tp + fp)::DOUBLE + tp / (tp + fn)::DOUBLE) END, 6) AS f1
         |FROM g ORDER BY threshold""".stripMargin))

  /** Cohen's kappa between the classifier's own label (logit > 0) and
    * the Gopher label ([[Evaluation.cohenKappa]]) — chance-corrected
    * rater agreement over the 2×2 contingency aggregate.
    */
  val kappa: QueryDef = QueryDef(
    "eval_kappa",
    (s, dir) => {
      val j = scoreLabel(s, dir)
        .select((col("score") > 0).as("a"), col("label").as("b"))
      Evaluation.cohenKappa(j, "a", "b")
    },
    Some(
      s"""WITH $ScoreCte,
         |$LabelCte,
         |j AS (SELECT sc.score > 0 AS a, lb.label AS b FROM sc JOIN lb USING (doc_id)),
         |c AS (SELECT count(*)::BIGINT AS n,
         |  sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
         |  sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
         |  sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
         |  sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00 FROM j),
         |k AS (SELECT n,
         |  (n11 + n00) / n::DOUBLE AS po,
         |  ((n11 + n10)::DOUBLE * (n11 + n01) + (n01 + n00)::DOUBLE * (n10 + n00))
         |    / (n::DOUBLE * n) AS pe
         |FROM c)
         |SELECT n, round(po, 6) AS p_o, round(pe, 6) AS p_e,
         |  round(CASE WHEN 1.0 - pe <> 0.0 THEN (po - pe) / (1.0 - pe) END, 6) + 0 AS kappa
         |FROM k""".stripMargin))

  /** Pairwise dedup evaluation ([[Evaluation.pairwiseClusterEval]]):
    * word-prefix blocking (first 4 words) as the predicted duplicate
    * clustering, scored against a 40-char-prefix reference clustering
    * — pair counts from cluster-size aggregates only, never a
    * materialized pair list.
    */
  val dedupPairs: QueryDef = QueryDef(
    "eval_dedup_pairs",
    (s, dir) => {
      val a = Tables(s, dir).documents.select(
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 4), " ")
          .as("pred"),
        substring(col("text"), 1, 40).as("truth"))
      Evaluation.pairwiseClusterEval(a, "pred", "truth")
    },
    Some(
      """WITH a AS (SELECT
        |    array_to_string(string_split_regex(trim(text), '\s+')[1:4], ' ') AS pred,
        |    substr(text, 1, 40) AS truth
        |  FROM documents),
        |tp AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS tp_pairs
        |  FROM (SELECT count(*) AS n FROM a GROUP BY pred, truth)),
        |pp AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS pred_pairs
        |  FROM (SELECT count(*) AS n FROM a GROUP BY pred)),
        |rp AS (SELECT sum(n * (n - 1) // 2)::BIGINT AS truth_pairs
        |  FROM (SELECT count(*) AS n FROM a GROUP BY truth))
        |SELECT tp_pairs, pred_pairs, truth_pairs,
        |  round(CASE WHEN pred_pairs > 0 THEN tp_pairs / pred_pairs::DOUBLE END, 6) AS precision,
        |  round(CASE WHEN truth_pairs > 0 THEN tp_pairs / truth_pairs::DOUBLE END, 6) AS recall,
        |  round(CASE WHEN pred_pairs > 0 AND truth_pairs > 0
        |      AND tp_pairs / pred_pairs::DOUBLE + tp_pairs / truth_pairs::DOUBLE > 0
        |    THEN 2 * (tp_pairs / pred_pairs::DOUBLE) * (tp_pairs / truth_pairs::DOUBLE)
        |      / (tp_pairs / pred_pairs::DOUBLE + tp_pairs / truth_pairs::DOUBLE) END, 6) AS f1
        |FROM tp, pp, rp""".stripMargin))

  /** Calibration table ([[Evaluation.calibrationBins]]): milli-logit
    * bins of width 1000 with each bin's observed Gopher-label rate —
    * the reliability diagram behind the threshold table.
    */
  val calibration: QueryDef = QueryDef(
    "eval_calibration",
    (s, dir) =>
      Evaluation.calibrationBins(scoreLabel(s, dir), "score", "label",
          binWidth = 1000L)
        .orderBy("bin"),
    Some(
      s"""WITH $ScoreCte,
         |$LabelCte,
         |j AS (SELECT sc.score, lb.label FROM sc JOIN lb USING (doc_id)),
         |g AS (SELECT floor(score / 1000)::BIGINT AS bin, count(*)::BIGINT AS n,
         |  sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos
         |FROM j GROUP BY 1)
         |SELECT bin, (bin * 1000)::BIGINT AS bin_lo, n, n_pos,
         |  round(n_pos / n::DOUBLE, 6) AS pos_rate
         |FROM g ORDER BY bin""".stripMargin))

  /** Retrieval-ranking agreement ([[Evaluation.rankingAgreement]]):
    * recall@10, MRR, and graded nDCG@10 of the matryoshka prefix-16
    * retrieval (`sim_matryoshka_topk`'s cheap first pass, run as a
    * 3-query batch) against the full-dimension ground truth — the
    * "is the cheap path good enough" report. Both rankings, the join,
    * and every metric replay in SQL; the ideal-DCG constant is computed
    * once on the driver and embedded as the identical double literal
    * in the oracle (the NMI discipline for transcendental terms).
    */
  val rankAgreement: QueryDef = {
    val k = 10
    val idcg = Evaluation.idealDcg(k)
    QueryDef(
      "eval_rank_agreement",
      (s, dir) => {
        import graft.operators.Similarity
        import org.apache.spark.sql.expressions.Window
        val emb = Tables(s, dir).embeddings
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))
        def ranked(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("rk", row_number().over(w))
        val truth = ranked(Similarity.topKCosineBatch(
          emb, "vec_id", "embedding", Seq(0L, 1L, 2L), k))
        val cand = ranked(Similarity.topKCosineBatch(
          emb.select(col("vec_id"),
            slice(col("embedding"), 1, 16).as("embedding")),
          "vec_id", "embedding", Seq(0L, 1L, 2L), k))
        Evaluation.rankingAgreement(cand, truth,
            "query_id", "vec_id", "rk", k)
          .orderBy("query_id")
      },
      Some(
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |ep AS (SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:16] AS v FROM embeddings),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
           |qp AS (SELECT vec_id AS query_id, v AS qv FROM ep WHERE vec_id IN (0, 1, 2)),
           |ts AS (SELECT q.query_id, e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS sim
           |       FROM e, q WHERE e.vec_id <> q.query_id
           |         AND NOT isnan(list_cosine_similarity(e.v, q.qv))),
           |tr AS (SELECT query_id, vec_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rt
           |       FROM ts QUALIFY rt <= $k),
           |cs AS (SELECT qp.query_id, ep.vec_id, round(list_cosine_similarity(ep.v, qp.qv), 6) AS sim
           |       FROM ep, qp WHERE ep.vec_id <> qp.query_id
           |         AND NOT isnan(list_cosine_similarity(ep.v, qp.qv))),
           |cr AS (SELECT query_id, vec_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rc
           |       FROM cs QUALIFY rc <= $k),
           |j AS (SELECT cr.query_id, cr.rc, tr.rt
           |      FROM cr LEFT JOIN tr ON tr.query_id = cr.query_id AND tr.vec_id = cr.vec_id)
           |SELECT query_id,
           |  sum(CASE WHEN rt IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
           |  round(sum(CASE WHEN rt IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / $k, 6) AS recall,
           |  round(coalesce(max(CASE WHEN rt = 1 THEN 1.0 / rc END), 0.0), 6) AS mrr,
           |  round(sum(CASE WHEN rt IS NOT NULL
           |    THEN (${k + 1} - rt)::DOUBLE / (ln(rc + 1) / ln(2.0)) ELSE 0.0 END), 4) AS dcg,
           |  round(sum(CASE WHEN rt IS NOT NULL
           |    THEN (${k + 1} - rt)::DOUBLE / (ln(rc + 1) / ln(2.0)) ELSE 0.0 END)
           |    / CAST('$idcg' AS DOUBLE), 4) AS ndcg
           |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin))
  }

  /** Two-sample KS distance ([[graft.operators.Evaluation
    * .ksDistance]]): distribution drift of doc length between two
    * sources — the ECDF compare restated over exact integers
    * (max |cum_a·n_b − cum_b·n_a|), one double division at the end.
    * Cumulative windows run over the DISTINCT-VALUE domain, not the
    * corpus.
    */
  val ksDistanceGate: QueryDef = QueryDef(
    "eval_ks_distance",
    (s, dir) =>
      graft.operators.Evaluation.ksDistance(
        graft.Tables(s, dir).documents, "n_chars", "source",
        "src0", "src1"),
    Some(
      """WITH v AS (SELECT source AS g, n_chars::BIGINT AS x
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |t AS (SELECT
        |    sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END)::BIGINT AS n_b
        |  FROM v),
        |c AS (SELECT x,
        |    sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM v GROUP BY x),
        |cu AS (SELECT x,
        |    (sum(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING))::BIGINT
        |      AS cuma,
        |    (sum(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING))::BIGINT
        |      AS cumb
        |  FROM c)
        |SELECT n_a, n_b,
        |  max(abs(cuma * n_b - cumb * n_a))::BIGINT AS d_num,
        |  round(max(abs(cuma * n_b - cumb * n_a))::DOUBLE /
        |    (n_a * n_b)::DOUBLE, 6) + 0 AS ks
        |FROM cu, t GROUP BY n_a, n_b""".stripMargin))

  /** Exact 1-D transport drift ([[graft.operators.Evaluation
    * .wasserstein1]]): same src0/src1 length split as the KS gate but
    * the INTEGRAL of the ECDF gap — `w1_num` is the exact
    * gap-weighted integer sum, `w1` the one final division.
    */
  val wassersteinGate: QueryDef = QueryDef(
    "eval_wasserstein",
    (s, dir) =>
      graft.operators.Evaluation.wasserstein1(
        graft.Tables(s, dir).documents, "n_chars", "source",
        "src0", "src1"),
    Some(
      """WITH v AS (SELECT source AS g, n_chars::BIGINT AS x
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |t AS (SELECT
        |    sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END)::BIGINT AS n_b
        |  FROM v),
        |c AS (SELECT x,
        |    sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |    sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM v GROUP BY x),
        |cu AS (SELECT x,
        |    (sum(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING))::BIGINT
        |      AS cuma,
        |    (sum(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING))::BIGINT
        |      AS cumb,
        |    coalesce(lead(x) OVER (ORDER BY x) - x, 0)::BIGINT AS gap
        |  FROM c)
        |SELECT n_a, n_b,
        |  sum(abs(cuma * n_b - cumb * n_a) * gap)::BIGINT AS w1_num,
        |  round(sum(abs(cuma * n_b - cumb * n_a) * gap)::DOUBLE /
        |    (n_a * n_b)::DOUBLE, 6) + 0 AS w1
        |FROM cu, t GROUP BY n_a, n_b""".stripMargin))

  /** Inter-annotator agreement ([[graft.operators.Evaluation
    * .krippendorffAlpha]]): a 120-unit × ~4-rater synthetic panel
    * (unit = doc_id mod 120, rater = doc_id div 120, label = lang).
    * Counts are exact integers; the single rational step regroups by
    * rating count and both engines fold the (m, S_m) pairs in the
    * SAME sorted order, so the 4-dp alpha replays bit-for-bit.
    */
  val krippendorffGate: QueryDef = QueryDef(
    "eval_krippendorff_alpha",
    (s, dir) => {
      val d = graft.Tables(s, dir).documents
        .select((col("doc_id") % 120).as("unit"),
          (col("doc_id") / lit(120)).cast("long").as("rater"),
          col("lang"))
      graft.operators.Evaluation.krippendorffAlpha(
        d, "unit", "rater", "lang")
    },
    Some(
      """WITH r AS (SELECT doc_id % 120 AS u, doc_id // 120 AS rtr,
        |    min(lang) AS c
        |  FROM documents GROUP BY 1, 2),
        |oc AS (SELECT u, c, count(*) AS o FROM r GROUP BY u, c),
        |pu AS (SELECT u, sum(o) AS m, sum(o * o) AS o2 FROM oc
        |  GROUP BY u HAVING sum(o) >= 2),
        |bym AS (SELECT m, sum(m * m - o2) AS s, count(*) AS units,
        |    sum(m) AS n FROM pu GROUP BY m),
        |f AS (SELECT sum(units)::BIGINT AS n_units,
        |    sum(n)::BIGINT AS n_ratings,
        |    list_sum(list(s::DOUBLE / (m - 1)::DOUBLE ORDER BY m))
        |      AS do_num
        |  FROM bym),
        |kc AS (SELECT c, sum(o)::BIGINT AS nc FROM oc
        |  JOIN pu USING (u) GROUP BY c),
        |de AS (SELECT sum(nc * (f.n_ratings - nc))::BIGINT AS de_num
        |  FROM kc, f)
        |SELECT f.n_units, f.n_ratings, de.de_num,
        |  round(1.0 - (f.n_ratings - 1)::DOUBLE * f.do_num /
        |    de.de_num::DOUBLE, 4) + 0 AS alpha
        |FROM f, de""".stripMargin))

  /** Preference-pair matchup stats ([[graft.operators.Preference
    * .winMatrix]]): an arena-style battle log derived from events
    * (models = event_id arithmetic, outcome = event_id mod 3, with
    * reversed-order pairs present so canonicalization is exercised) —
    * exact per-matchup counts plus the 6-dp win rate.
    */
  val preferenceMatrix: QueryDef = QueryDef(
    "eval_preference_matrix",
    (s, dir) => {
      val b = graft.Tables(s, dir).events
        .select((col("event_id") % 8).as("ma"),
          ((col("event_id") / lit(8)).cast("long") % 8).as("mb"),
          (col("event_id") % 3).as("outcome"))
        .filter(col("ma") =!= col("mb"))
      graft.operators.Preference.winMatrix(b, "ma", "mb", "outcome")
        .orderBy("model_a", "model_b")
    },
    Some(
      """WITH b AS (SELECT event_id % 8 AS ma,
        |    (event_id // 8) % 8 AS mb, event_id % 3 AS o
        |  FROM events WHERE event_id % 8 <> (event_id // 8) % 8),
        |c AS (SELECT least(ma, mb) AS model_a,
        |    greatest(ma, mb) AS model_b,
        |    CASE WHEN ma <= mb THEN o
        |         WHEN o = 0 THEN 1 WHEN o = 1 THEN 0 ELSE 2 END AS o
        |  FROM b)
        |SELECT model_a, model_b, count(*)::BIGINT AS n_battles,
        |  sum(CASE WHEN o = 0 THEN 1 ELSE 0 END)::BIGINT AS wins_a,
        |  sum(CASE WHEN o = 1 THEN 1 ELSE 0 END)::BIGINT AS wins_b,
        |  sum(CASE WHEN o = 2 THEN 1 ELSE 0 END)::BIGINT AS ties,
        |  round(sum(CASE WHEN o = 0 THEN 1 ELSE 0 END)::DOUBLE /
        |    count(*), 6) + 0 AS win_rate_a
        |FROM c GROUP BY model_a, model_b
        |ORDER BY model_a, model_b""".stripMargin))

  /** Copeland tournament ranking ([[graft.operators.Preference
    * .copelandRanking]]) over the same battle log: matchup majorities,
    * copeland = won − lost, equal scores share a dense rank.
    */
  val preferenceRanking: QueryDef = QueryDef(
    "eval_preference_ranking",
    (s, dir) => {
      val b = graft.Tables(s, dir).events
        .select((col("event_id") % 8).as("ma"),
          ((col("event_id") / lit(8)).cast("long") % 8).as("mb"),
          (col("event_id") % 3).as("outcome"))
        .filter(col("ma") =!= col("mb"))
      graft.operators.Preference.copelandRanking(b, "ma", "mb", "outcome")
        .orderBy("model")
    },
    Some(
      """WITH b AS (SELECT event_id % 8 AS ma,
        |    (event_id // 8) % 8 AS mb, event_id % 3 AS o
        |  FROM events WHERE event_id % 8 <> (event_id // 8) % 8),
        |c AS (SELECT least(ma, mb) AS model_a,
        |    greatest(ma, mb) AS model_b,
        |    CASE WHEN ma <= mb THEN o
        |         WHEN o = 0 THEN 1 WHEN o = 1 THEN 0 ELSE 2 END AS o
        |  FROM b),
        |m AS (SELECT model_a, model_b,
        |    sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS wa,
        |    sum(CASE WHEN o = 1 THEN 1 ELSE 0 END) AS wb
        |  FROM c GROUP BY model_a, model_b),
        |ps AS (SELECT model_a AS model,
        |    CASE WHEN wa > wb THEN 1 ELSE 0 END AS w,
        |    CASE WHEN wb > wa THEN 1 ELSE 0 END AS l FROM m
        |  UNION ALL SELECT model_b,
        |    CASE WHEN wb > wa THEN 1 ELSE 0 END,
        |    CASE WHEN wa > wb THEN 1 ELSE 0 END FROM m),
        |sc AS (SELECT model, count(*)::BIGINT AS n_matchups,
        |    sum(w)::BIGINT AS won, sum(l)::BIGINT AS lost,
        |    (sum(w) - sum(l))::BIGINT AS copeland
        |  FROM ps GROUP BY model)
        |SELECT model, n_matchups, won, lost, copeland,
        |  dense_rank() OVER (ORDER BY copeland DESC)::BIGINT AS rank
        |FROM sc ORDER BY model""".stripMargin))

  /** Two-proportion A/B readout ([[graft.operators.Evaluation
    * .abProportionTest]]): users split by id parity, conversion =
    * any purchase over 150 — exact per-variant counts plus the pooled
    * z statistic (fixed double chain over integers, 4 dp).
    */
  val abTest: QueryDef = QueryDef(
    "eval_ab_test",
    (s, dir) => {
      val ev = graft.Tables(s, dir).events
        .withColumn("variant",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      graft.operators.Evaluation.abProportionTest(
        ev, "user_id", "variant",
        col("event_type") === "purchase" && col("value") > 150)
    },
    Some(
      """WITH per AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |        THEN 1 ELSE 0 END)::BIGINT AS conv
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT v, count(*) AS n, sum(conv)::BIGINT AS conv
        |      FROM per GROUP BY v)
        |SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
        |  round(((a.conv::DOUBLE / a.n) - (b.conv::DOUBLE / b.n)) /
        |    sqrt(((a.conv + b.conv)::DOUBLE / (a.n + b.n)) *
        |      (1.0 - (a.conv + b.conv)::DOUBLE / (a.n + b.n)) *
        |      (1.0 / a.n + 1.0 / b.n)), 4) + 0 AS z
        |FROM (SELECT * FROM c WHERE v = 'A') a,
        |     (SELECT * FROM c WHERE v = 'B') b""".stripMargin))

  /** Language-ID confusion matrix: the marker-heuristic classifier
    * ([[TextAnalysis.langId]]) against the stored labels, one
    * (actual, predicted) cell per row with the per-actual recall —
    * the error-analysis view behind every "is the cheap classifier
    * good enough to filter with" decision. One label-domain-bounded
    * aggregate.
    */
  val confusionMatrix: QueryDef = QueryDef(
    "eval_confusion_matrix",
    (s, dir) => {
      val d = graft.Tables(s, dir).documents
        .select(col("lang").as("actual"),
          TextAnalysis.langId(col("text")).as("predicted"))
      val totals = d.groupBy(col("actual")).agg(count(lit(1)).as("n_actual"))
      d.groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .join(broadcast(totals), Seq("actual"))
        .select(col("actual"), col("predicted"), col("n"),
          round(col("n").cast("double") / col("n_actual"), 6).as("share"))
        .orderBy("actual", "predicted")
    },
    Some {
      def hits(markers: Seq[String]) = {
        val l = markers.map(w => s"'$w'").mkString(", ")
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), " +
          s"w -> list_contains([$l], w)))"
      }
      val en = hits(TextAnalysis.LangMarkers("en"))
      val de = hits(TextAnalysis.LangMarkers("de"))
      val fr = hits(TextAnalysis.LangMarkers("fr"))
      val es = hits(TextAnalysis.LangMarkers("es"))
      s"""WITH h AS (SELECT lang AS actual,
        |    $en AS en, $de AS de, $fr AS fr, $es AS es FROM documents),
        |p AS (SELECT actual, CASE
        |    WHEN greatest(en, de, fr, es) = 0 THEN 'und'
        |    WHEN en = greatest(en, de, fr, es) THEN 'en'
        |    WHEN de = greatest(en, de, fr, es) THEN 'de'
        |    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
        |    ELSE 'es' END AS predicted
        |  FROM h),
        |t AS (SELECT actual, count(*) AS n_actual FROM p GROUP BY actual)
        |SELECT p.actual AS actual, predicted, count(*) AS n,
        |  round(count(*)::DOUBLE / t.n_actual, 6) AS share
        |FROM p JOIN t ON t.actual = p.actual
        |GROUP BY p.actual, predicted, t.n_actual
        |ORDER BY p.actual, predicted""".stripMargin
    })

  /** Mann–Whitney U rank-sum test ([[graft.operators.Evaluation
    * .mannWhitneyU]]): English vs non-English document lengths — the
    * non-parametric check a skewed length distribution needs. The
    * per-value rank closed form keeps 2·R and 2·U exact integers
    * (`u2_a` is hash-exact); only the tie-corrected z is float,
    * 6-dp-rounded with the signed-zero guard. The oracle replays the
    * identical value-domain rank arithmetic.
    */
  val mannWhitneyGate: QueryDef = QueryDef(
    "eval_mann_whitney",
    (s, dir) =>
      graft.operators.Evaluation.mannWhitneyU(
        Tables(s, dir).documents, "n_chars", col("lang") === "en"),
    Some(
      """WITH pv AS (SELECT n_chars AS v,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS na,
        |    count(*) AS n
        |  FROM documents GROUP BY n_chars),
        |rk AS (SELECT v, na, n, coalesce(sum(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM pv),
        |ag AS (SELECT sum(na)::BIGINT AS n_a, sum(n - na)::BIGINT AS n_b,
        |    sum(na * (2 * cum + n + 1))::BIGINT AS r2a,
        |    sum(n * n * n - n)::BIGINT AS ties
        |  FROM rk)
        |SELECT n_a, n_b, (r2a - n_a * (n_a + 1))::BIGINT AS u2_a,
        |  round(((r2a - n_a * (n_a + 1))::DOUBLE / 2.0
        |      - n_a::DOUBLE * n_b / 2.0) /
        |    sqrt(n_a::DOUBLE * n_b / 12.0 *
        |      ((n_a::DOUBLE + n_b + 1.0)
        |        - ties::DOUBLE / ((n_a::DOUBLE + n_b) * (n_a::DOUBLE + n_b - 1.0)))),
        |    6) + 0 AS z
        |FROM ag""".stripMargin))

  /** CUPED variance-reduced experiment readout
    * ([[graft.operators.Evaluation.cuped]]): users split by id parity,
    * covariate x = pre-metric (even event ids per user), outcome y =
    * post-metric (odd event ids) — per-arm raw and adjusted means
    * under the pooled θ = cov(y,x)/var(x). All five sums are exact
    * integers; the oracle replays the identical double chains.
    */
  val cupedGate: QueryDef = QueryDef(
    "eval_cuped",
    (s, dir) => {
      val per = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("x"),
          sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("y"))
        .withColumn("arm", col("user_id") % 2)
      graft.operators.Evaluation.cuped(per, "arm", "x", "y")
        .orderBy("arm")
    },
    Some(
      """WITH per AS (SELECT user_id,
        |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS y,
        |    user_id % 2 AS arm
        |  FROM events GROUP BY user_id),
        |pa AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM per GROUP BY arm),
        |t AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
        |    sum(sxx) AS tsxx, sum(sxy) AS tsxy FROM pa)
        |SELECT arm, n::BIGINT AS n,
        |  round(sy::DOUBLE / n, 6) + 0 AS mean_y,
        |  round(sy::DOUBLE / n
        |    - ((tn * tsxy - tsx * tsy)::DOUBLE / (tn * tsxx - tsx * tsx)::DOUBLE)
        |      * (sx::DOUBLE / n - tsx::DOUBLE / tn), 6) + 0 AS mean_y_adj
        |FROM pa, t ORDER BY arm""".stripMargin))

  /** Benjamini–Hochberg FDR ([[graft.operators.Evaluation.fdrBh]],
    * q = 0.10) over per-event-type pseudo-p-values (closed-form exact
    * rationals `(Σ event_id mod 997)/997`): the step-up rule — a
    * metric above its own BH line still rejects when a later rank
    * crosses — sits under the hash. Rejected flag cast to 0/1 for the
    * cross-engine compare.
    */
  val fdrGate: QueryDef = QueryDef(
    "eval_fdr_bh",
    (s, dir) => {
      val pv = Tables(s, dir).events
        .groupBy(col("event_type").as("metric"))
        .agg(((sum(col("event_id")) % 997).cast("double") / 997.0)
          .as("pval"))
      graft.operators.Evaluation.fdrBh(pv, "metric", "pval", 0.10)
        .withColumn("rejected", col("rejected").cast("long"))
        .orderBy("metric")
    },
    Some(
      """WITH pv AS (SELECT event_type AS metric,
        |    (sum(event_id) % 997)::DOUBLE / 997.0 AS p
        |  FROM events GROUP BY event_type),
        |rk AS (SELECT metric, p,
        |    row_number() OVER (ORDER BY p, metric) AS rank,
        |    count(*) OVER () AS m FROM pv),
        |th AS (SELECT metric, p, rank, rank::DOUBLE * 0.1 / m AS thr,
        |    CASE WHEN p <= rank::DOUBLE * 0.1 / m THEN rank END AS hit
        |  FROM rk),
        |ks AS (SELECT max(hit) AS kstar FROM th)
        |SELECT metric, p, rank::BIGINT AS rank,
        |  round(thr, 6) + 0 AS bh_threshold,
        |  (CASE WHEN kstar IS NOT NULL AND rank <= kstar
        |        THEN 1 ELSE 0 END)::BIGINT AS rejected
        |FROM th, ks ORDER BY metric""".stripMargin))

  /** Murphy decomposition of the Brier score
    * ([[graft.operators.Evaluation.brierDecomposition]]): forecasts =
    * event_id mod 1001 milli-probs, labels = event_id mod 7 < 3,
    * decile bins. Reliability's cross-bin sum is the integer
    * fixed-point `Σ (D² div n)`, resolution comes off the identity
    * `brier = rel − res + unc` — so every float is one short chain
    * over exact integers and the oracle replays it bit-for-bit.
    */
  val brierGate: QueryDef = QueryDef(
    "eval_brier_decomposition",
    (s, dir) => {
      val d = Tables(s, dir).events.select(
        (col("event_id") % 1001).as("mp"),
        (col("event_id") % 7 < 3).cast("long").as("lbl"))
      graft.operators.Evaluation.brierDecomposition(d, "mp", "lbl")
    },
    Some(
      """WITH d AS (SELECT event_id % 1001 AS p,
        |    CASE WHEN event_id % 7 < 3 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |pb AS (SELECT p // 100 AS bin, count(*) AS n, sum(p) AS sp,
        |    sum(y) AS sy, sum((p - 1000*y)*(p - 1000*y)) AS se2
        |  FROM d GROUP BY 1),
        |ag AS (SELECT sum(n)::BIGINT AS n, sum(sy)::BIGINT AS ty,
        |    sum(se2)::BIGINT AS brier_fp,
        |    sum((sp - 1000*sy)*(sp - 1000*sy) // n)::BIGINT AS rel_fp
        |  FROM pb)
        |SELECT n,
        |  round(brier_fp::DOUBLE / (1000000.0 * n), 6) + 0 AS brier,
        |  round(rel_fp::DOUBLE / (1000000.0 * n), 6) + 0 AS reliability,
        |  round(rel_fp::DOUBLE / (1000000.0 * n)
        |    + (ty * (n - ty))::DOUBLE / (n::DOUBLE * n)
        |    - brier_fp::DOUBLE / (1000000.0 * n), 6) + 0 AS resolution,
        |  round((ty * (n - ty))::DOUBLE / (n::DOUBLE * n), 6) + 0
        |    AS uncertainty
        |FROM ag""".stripMargin))

  /** Two unrolled Bradley–Terry MM steps
    * ([[graft.operators.Preference.bradleyTerryTwoStep]]) over the
    * same arena battle log as `eval_preference_matrix` — decisive
    * battles only; step 1 is the exact integer-ratio 2W/G, step 2
    * folds Σ_j n_ij/(π_i+π_j) in opponent order so the oracle can
    * replay the identical double chain.
    */
  val bradleyTerryGate: QueryDef = QueryDef(
    "eval_bradley_terry",
    (s, dir) => {
      val b = graft.Tables(s, dir).events
        .select((col("event_id") % 8).as("ma"),
          ((col("event_id") / lit(8)).cast("long") % 8).as("mb"),
          (col("event_id") % 3).as("outcome"))
        .filter(col("ma") =!= col("mb"))
      graft.operators.Preference.bradleyTerryTwoStep(b, "ma", "mb",
          "outcome")
        .orderBy("model")
    },
    Some(
      """WITH b AS (SELECT event_id % 8 AS ma,
        |    (event_id // 8) % 8 AS mb, event_id % 3 AS o
        |  FROM events WHERE event_id % 8 <> (event_id // 8) % 8),
        |d AS (SELECT ma, mb, o FROM b WHERE o IN (0, 1)),
        |part AS (SELECT ma AS m, mb AS j,
        |    CASE WHEN o = 0 THEN 1 ELSE 0 END AS w FROM d
        |  UNION ALL SELECT mb, ma,
        |    CASE WHEN o = 1 THEN 1 ELSE 0 END FROM d),
        |nij AS (SELECT m, j, count(*)::BIGINT AS n FROM part
        |  GROUP BY m, j),
        |p1 AS (SELECT m, sum(w)::BIGINT AS wins,
        |    count(*)::BIGINT AS games,
        |    2.0 * sum(w)::DOUBLE / count(*)::DOUBLE AS pi1
        |  FROM part GROUP BY m),
        |dn AS (SELECT nij.m,
        |    list_sum(list(nij.n::DOUBLE / (a.pi1 + bb.pi1) ORDER BY nij.j))
        |      AS den
        |  FROM nij JOIN p1 a ON a.m = nij.m JOIN p1 bb ON bb.m = nij.j
        |  GROUP BY nij.m)
        |SELECT p1.m AS model, wins, games, round(pi1, 6) + 0 AS pi1,
        |  round(wins::DOUBLE / den, 6) + 0 AS pi2
        |FROM p1 JOIN dn ON dn.m = p1.m ORDER BY model""".stripMargin))

  /** Split-conformal thresholds over doc length as the nonconformity
    * score ([[graft.operators.Evaluation.conformalQuantile]]):
    * k = ceil((n+1)(1−α)) all-integer, k-th order statistic from a
    * per-value cumulative window — never a global row sort.
    */
  val conformalGate: QueryDef = QueryDef(
    "eval_conformal_quantile",
    (s, dir) =>
      graft.operators.Evaluation.conformalQuantile(
        graft.Tables(s, dir).documents, "n_chars", Seq(10, 5, 1)),
    Some(
      """WITH v AS (SELECT n_chars::BIGINT AS v FROM documents
        |    WHERE n_chars IS NOT NULL),
        |pv AS (SELECT v, count(*)::BIGINT AS n FROM v GROUP BY v),
        |c AS (SELECT v, sum(n)
        |    OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
        |  FROM pv),
        |t AS (SELECT sum(n)::BIGINT AS nn FROM pv),
        |al AS (SELECT a::BIGINT AS a FROM (VALUES (10), (5), (1)) x(a)),
        |q AS (SELECT a, ((nn + 1) * (100 - a) + 99) // 100 AS k, nn
        |  FROM al CROSS JOIN t),
        |r AS (SELECT q.a AS alpha_pct, q.nn AS n, q.k,
        |    min(c.v) AS threshold
        |  FROM q LEFT JOIN c ON c.cum >= q.k GROUP BY 1, 2, 3)
        |SELECT alpha_pct, n, k, threshold FROM r
        |ORDER BY alpha_pct""".stripMargin))

  /** Cohen's d / Hedges' g standardized mean difference
    * ([[graft.operators.Evaluation.cohensD]]): urgent-priority orders
    * vs the rest, exact fixed-point moments, one double chain.
    */
  val cohensDGate: QueryDef = QueryDef(
    "eval_cohens_d",
    (s, dir) =>
      graft.operators.Evaluation.cohensD(
        Tables(s, dir).orders, "o_totalprice",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
    Some(
      """WITH v AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS v,
        |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS a
        |  FROM orders),
        |m AS (SELECT
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN a THEN 0 ELSE 1 END)::BIGINT AS n_b,
        |    sum(CASE WHEN a THEN v ELSE 0 END)::BIGINT AS sa,
        |    sum(CASE WHEN NOT a THEN v ELSE 0 END)::BIGINT AS sb,
        |    sum(CASE WHEN a THEN v::HUGEINT * v::HUGEINT
        |      ELSE 0 END) AS qa,
        |    sum(CASE WHEN NOT a THEN v::HUGEINT * v::HUGEINT
        |      ELSE 0 END) AS qb
        |  FROM v),
        |d AS (SELECT n_a, n_b,
        |    n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
        |    sa::DOUBLE / n_a::DOUBLE AS ma,
        |    sb::DOUBLE / n_b::DOUBLE AS mb,
        |    (qa::DOUBLE - n_a::DOUBLE * (sa::DOUBLE / n_a::DOUBLE)
        |      * (sa::DOUBLE / n_a::DOUBLE)) / (n_a::DOUBLE - 1.0) AS va,
        |    (qb::DOUBLE - n_b::DOUBLE * (sb::DOUBLE / n_b::DOUBLE)
        |      * (sb::DOUBLE / n_b::DOUBLE)) / (n_b::DOUBLE - 1.0) AS vb
        |  FROM m),
        |e AS (SELECT n_a, n_b, na, nb, ma, mb,
        |    (ma - mb) / sqrt(((na - 1.0) * va + (nb - 1.0) * vb)
        |      / (na + nb - 2.0)) AS deff
        |  FROM d)
        |SELECT n_a, n_b,
        |  round(ma / 10000.0, 6) + 0 AS mean_a,
        |  round(mb / 10000.0, 6) + 0 AS mean_b,
        |  round(deff, 6) + 0 AS cohens_d,
        |  round(deff * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) + 0
        |    AS hedges_g
        |FROM e""".stripMargin))

  /** McNemar's paired-classifier test
    * ([[graft.operators.Evaluation.mcnemar]]): two marker-word
    * "classifiers" against the language label — one contingency
    * aggregate, continuity-corrected χ² from the discordant cells.
    */
  val mcnemarGate: QueryDef = QueryDef(
    "eval_mcnemar",
    (s, dir) =>
      graft.operators.Evaluation.mcnemar(
        Tables(s, dir).documents,
        truth = col("lang") === "en",
        predA = col("text").contains(" the "),
        predB = col("text").contains(" and ")),
    Some(
      """WITH p AS (SELECT (lang = 'en') AS t,
        |    (text LIKE '% the %') AS a, (text LIKE '% and %') AS b
        |  FROM documents),
        |m AS (SELECT
        |    sum(CASE WHEN a = t AND b = t THEN 1 ELSE 0 END)::BIGINT
        |      AS both_right,
        |    sum(CASE WHEN a = t AND b <> t THEN 1 ELSE 0 END)::BIGINT
        |      AS only_a,
        |    sum(CASE WHEN a <> t AND b = t THEN 1 ELSE 0 END)::BIGINT
        |      AS only_b,
        |    sum(CASE WHEN a <> t AND b <> t THEN 1 ELSE 0 END)::BIGINT
        |      AS both_wrong
        |  FROM p)
        |SELECT both_right, only_a, only_b, both_wrong,
        |  CASE WHEN only_a + only_b > 0 THEN
        |    round((abs(only_a - only_b)::DOUBLE - 1.0)
        |      * (abs(only_a - only_b)::DOUBLE - 1.0)
        |      / (only_a + only_b)::DOUBLE, 6) + 0
        |  END AS chi2
        |FROM m""".stripMargin))

  /** Difference-in-differences
    * ([[graft.operators.Evaluation.diffInDiff]]): even/odd users as
    * treated/control, first/second calendar half as before/after —
    * four exact cell moments in one aggregate, DiD the only float.
    */
  val didGate: QueryDef = QueryDef(
    "eval_diff_in_diff",
    (s, dir) =>
      graft.operators.Evaluation.diffInDiff(
        Tables(s, dir).events, "value",
        treated = col("user_id") % 2 === 0,
        after = to_date(col("ts")) >= lit("2024-01-16").cast("date")),
    Some(
      """WITH p AS (SELECT
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v,
        |    (user_id % 2 = 0) AS t,
        |    (ts::DATE >= DATE '2024-01-16') AS a
        |  FROM events),
        |m AS (SELECT
        |    sum(CASE WHEN t AND a THEN 1 ELSE 0 END)::BIGINT AS n11,
        |    sum(CASE WHEN t AND a THEN v ELSE 0 END)::BIGINT AS s11,
        |    sum(CASE WHEN t AND NOT a THEN 1 ELSE 0 END)::BIGINT AS n10,
        |    sum(CASE WHEN t AND NOT a THEN v ELSE 0 END)::BIGINT AS s10,
        |    sum(CASE WHEN NOT t AND a THEN 1 ELSE 0 END)::BIGINT AS n01,
        |    sum(CASE WHEN NOT t AND a THEN v ELSE 0 END)::BIGINT AS s01,
        |    sum(CASE WHEN NOT t AND NOT a THEN 1 ELSE 0 END)::BIGINT
        |      AS n00,
        |    sum(CASE WHEN NOT t AND NOT a THEN v ELSE 0 END)::BIGINT
        |      AS s00
        |  FROM p)
        |SELECT n11, n10, n01, n00,
        |  round(s11::DOUBLE / n11::DOUBLE / 10000.0, 6) + 0
        |    AS treated_after,
        |  round(s10::DOUBLE / n10::DOUBLE / 10000.0, 6) + 0
        |    AS treated_before,
        |  round(s01::DOUBLE / n01::DOUBLE / 10000.0, 6) + 0
        |    AS control_after,
        |  round(s00::DOUBLE / n00::DOUBLE / 10000.0, 6) + 0
        |    AS control_before,
        |  round((s11::DOUBLE / n11::DOUBLE / 10000.0
        |      - s10::DOUBLE / n10::DOUBLE / 10000.0)
        |    - (s01::DOUBLE / n01::DOUBLE / 10000.0
        |      - s00::DOUBLE / n00::DOUBLE / 10000.0), 6) + 0 AS did
        |FROM m""".stripMargin))

  /** Expected Calibration Error
    * ([[Evaluation.expectedCalibrationError]]): per-row sigmoid
    * quantized to exact micro-probabilities, bin frame folded in
    * sorted order — the one-number calibration summary next to the
    * per-bin table.
    */
  val eceGate: QueryDef = QueryDef(
    "eval_ece",
    (s, dir) =>
      Evaluation.expectedCalibrationError(scoreLabel(s, dir),
        "score", "label", binWidth = 1000L),
    Some(
      s"""WITH $ScoreCte,
         |$LabelCte,
         |j AS (SELECT sc.score, lb.label FROM sc JOIN lb USING (doc_id)),
         |b AS (SELECT floor(score / 1000)::BIGINT AS bin,
         |    count(*)::BIGINT AS n,
         |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS np,
         |    sum(CAST(round(1.0 / (1.0 + exp(-(score::DOUBLE) / 1000.0))
         |      * 1000000.0, 0) AS BIGINT))::BIGINT AS spm
         |  FROM j GROUP BY 1),
         |ef AS (SELECT count(*)::BIGINT AS n_bins, sum(n)::BIGINT AS n,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list(n::DOUBLE * abs(np::DOUBLE / n::DOUBLE
         |        - spm::DOUBLE / (n::DOUBLE * 1000000.0)) ORDER BY bin)),
         |      (a, b) -> a + b) AS w
         |  FROM b)
         |SELECT n_bins, n, round(ef.w / n::DOUBLE, 6) + 0 AS ece
         |FROM ef""".stripMargin))

  /** Retrieval-quality metrics ([[Evaluation.retrievalMetrics]]):
    * recall@10 / MRR / nDCG@10 of matryoshka-prefix (16-dim) retrieval
    * judged against full-vector exact top-10 and label relevance — the
    * eval that decides whether the truncated index is good enough to
    * serve. Full oracle: DuckDB replays both cosine rankings, the
    * label-relevance grades, and the DCG ladder from the same 6-dp
    * contracts.
    */
  val retrievalMetricsGate: QueryDef = QueryDef(
    "eval_retrieval_metrics",
    (s, dir) =>
      Evaluation.retrievalMetrics(Tables(s, dir).embeddings, "vec_id",
          "embedding", "label", queryIds = Seq(0L, 1L, 2L, 3L, 4L),
          k = 10, prefixDim = 16)
        .orderBy("query_id"),
    Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             CAST(label AS BIGINT) AS lbl FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv, lbl AS qlbl FROM e
        |      WHERE vec_id IN (0, 1, 2, 3, 4)),
        |s AS (SELECT q.qid, q.qlbl, e.vec_id, e.lbl,
        |        round(list_cosine_similarity(e.v, q.qv), 6) + 0 AS sf,
        |        round(list_cosine_similarity(e.v[1:16], q.qv[1:16]), 6) + 0 AS sp
        |      FROM e, q WHERE e.vec_id <> q.qid),
        |pt AS (SELECT qid, qlbl, vec_id, lbl,
        |         row_number() OVER (PARTITION BY qid ORDER BY sp DESC, vec_id) AS rk
        |       FROM s WHERE NOT isnan(sp) QUALIFY rk <= 10),
        |tt AS (SELECT qid, vec_id FROM s WHERE NOT isnan(sf)
        |       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sf DESC, vec_id) <= 10),
        |nrel AS (SELECT qid,
        |           CAST(sum(CASE WHEN lbl = qlbl THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
        |         FROM s GROUP BY qid),
        |ov AS (SELECT pt.qid, count(*) AS hits FROM pt
        |       JOIN tt ON pt.qid = tt.qid AND pt.vec_id = tt.vec_id
        |       GROUP BY pt.qid),
        |tn AS (SELECT qid, count(*) AS tn FROM tt GROUP BY qid),
        |pm AS (SELECT qid,
        |         sum(CASE WHEN lbl = qlbl THEN 1.0/log2(rk + 1.0) ELSE 0.0 END) AS dcg,
        |         min(CASE WHEN lbl = qlbl THEN rk END) AS firstrel
        |       FROM pt GROUP BY qid),
        |idcg AS (SELECT i AS j, sum(1.0/log2(i + 1.0)) OVER (ORDER BY i) AS c
        |         FROM generate_series(1, 10) t(i))
        |SELECT q.qid AS query_id,
        |  coalesce(nrel.n_relevant, 0) AS n_relevant,
        |  round(coalesce(ov.hits, 0) * 1.0
        |    / greatest(coalesce(tn.tn, 0), 1), 6) + 0 AS recall_at_k,
        |  round(coalesce(1.0 / pm.firstrel, 0.0), 6) + 0 AS mrr,
        |  round(CASE WHEN coalesce(nrel.n_relevant, 0) = 0 THEN 0.0
        |        ELSE coalesce(pm.dcg, 0.0)
        |          / (SELECT c FROM idcg WHERE j = least(10, nrel.n_relevant))
        |        END, 6) + 0 AS ndcg_at_k
        |FROM q LEFT JOIN nrel ON nrel.qid = q.qid
        |LEFT JOIN ov ON ov.qid = q.qid
        |LEFT JOIN tn ON tn.qid = q.qid
        |LEFT JOIN pm ON pm.qid = q.qid
        |ORDER BY query_id""".stripMargin))

  /** Rank-biased overlap ([[Evaluation.rankBiasedOverlap]]): RBO@10
    * (p = 0.9) between matryoshka-prefix and full-vector rankings —
    * the top-weighted agreement next to `eval_retrieval_metrics`'
    * set recall. The oracle embeds the identical exact-decimal weight
    * literals and the same left-associated weighted sum.
    */
  val rboGate: QueryDef = QueryDef(
    "eval_rbo",
    (s, dir) =>
      Evaluation.rankBiasedOverlap(Tables(s, dir).embeddings, "vec_id",
          "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), d = 10,
          p = BigDecimal("0.9"), prefixDim = 16)
        .orderBy("query_id"),
    Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
        |s AS (SELECT q.qid, e.vec_id,
        |        round(list_cosine_similarity(e.v, q.qv), 6) + 0 AS sf,
        |        round(list_cosine_similarity(e.v[1:16], q.qv[1:16]), 6) + 0 AS sp
        |      FROM e, q WHERE e.vec_id <> q.qid),
        |pt AS (SELECT qid, vec_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY sp DESC, vec_id) AS rk
        |       FROM s WHERE NOT isnan(sp) QUALIFY rk <= 10),
        |tt AS (SELECT qid, vec_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY sf DESC, vec_id) AS trk
        |       FROM s WHERE NOT isnan(sf) QUALIFY trk <= 10),
        |cm AS (SELECT pt.qid, greatest(pt.rk, tt.trk) AS m
        |       FROM pt JOIN tt ON pt.qid = tt.qid AND pt.vec_id = tt.vec_id),
        |x AS (SELECT qid,
        |        CAST(sum(CASE WHEN m <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |        CAST(sum(CASE WHEN m <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS x2,
        |        CAST(sum(CASE WHEN m <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS x3,
        |        CAST(sum(CASE WHEN m <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS x4,
        |        CAST(sum(CASE WHEN m <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS x5,
        |        CAST(sum(CASE WHEN m <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS x6,
        |        CAST(sum(CASE WHEN m <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS x7,
        |        CAST(sum(CASE WHEN m <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS x8,
        |        CAST(sum(CASE WHEN m <= 9 THEN 1 ELSE 0 END) AS BIGINT) AS x9,
        |        CAST(sum(CASE WHEN m <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS x10
        |      FROM cm GROUP BY qid)
        |SELECT q.qid AS query_id,
        |  coalesce(x.x10, 0) AS overlap_at_d,
        |  round(
        |    coalesce(x1, 0) * CAST(0.1 AS DOUBLE) / CAST(1 AS DOUBLE)
        |    + coalesce(x2, 0) * CAST(0.09 AS DOUBLE) / CAST(2 AS DOUBLE)
        |    + coalesce(x3, 0) * CAST(0.081 AS DOUBLE) / CAST(3 AS DOUBLE)
        |    + coalesce(x4, 0) * CAST(0.0729 AS DOUBLE) / CAST(4 AS DOUBLE)
        |    + coalesce(x5, 0) * CAST(0.06561 AS DOUBLE) / CAST(5 AS DOUBLE)
        |    + coalesce(x6, 0) * CAST(0.059049 AS DOUBLE) / CAST(6 AS DOUBLE)
        |    + coalesce(x7, 0) * CAST(0.0531441 AS DOUBLE) / CAST(7 AS DOUBLE)
        |    + coalesce(x8, 0) * CAST(0.04782969 AS DOUBLE) / CAST(8 AS DOUBLE)
        |    + coalesce(x9, 0) * CAST(0.043046721 AS DOUBLE) / CAST(9 AS DOUBLE)
        |    + coalesce(x10, 0) * CAST(0.0387420489 AS DOUBLE) / CAST(10 AS DOUBLE),
        |    6) + 0 AS rbo
        |FROM q LEFT JOIN x ON x.qid = q.qid
        |ORDER BY query_id""".stripMargin))

  /** Paired Poisson bootstrap ([[graft.operators.Evaluation
    * .pairedBootstrap]]): per-doc metric A = char count vs metric B =
    * 10× whitespace token count — observed mean difference, exact
    * order-statistic 95% band over 200 md5-contract Poisson(1)
    * replicates, sign share. The oracle replays the 28-bit md5
    * uniform, the integer Poisson thresholds, the per-replicate
    * weighted deltas, and the ceil-rank band.
    */
  val pairedBootstrapGate: QueryDef = QueryDef(
    "eval_paired_bootstrap",
    (s, dir) =>
      Evaluation.pairedBootstrap(
        Tables(s, dir).documents.select(col("doc_id"),
          col("n_chars").cast("long").as("m_a"),
          (TextAnalysis.tokenCount(col("text")).cast("long") * 10L)
            .as("m_b")),
        "doc_id", "m_a", "m_b", nBoot = 200, tag = "pb"),
    Some(
      """WITH u AS (SELECT doc_id::VARCHAR AS u,
        |    n_chars::BIGINT
        |      - 10 * len(string_split_regex(trim(text), '\s+'))::BIGINT
        |      AS d
        |  FROM documents),
        |e AS (SELECT u.u, u.d, t.r FROM u, unnest(range(0, 200)) AS t(r)),
        |hw AS (SELECT u, d, r,
        |    ('0x' || substr(md5('pb:' || u || ':' || r::VARCHAR), 1, 7))
        |      ::BIGINT AS h
        |  FROM e),
        |wts AS (SELECT r, d,
        |    (CASE WHEN h >= 98751885 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 197503771 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 246879713 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 263338361 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 267453023 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 268275955 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 268413111 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 268432704 THEN 1 ELSE 0 END
        |     + CASE WHEN h >= 268435153 THEN 1 ELSE 0 END)::BIGINT AS w
        |  FROM hw),
        |rep AS (SELECT r, sum(w)::BIGINT AS ws, sum(w * d)::BIGINT AS dn
        |  FROM wts GROUP BY r HAVING sum(w) > 0),
        |del AS (SELECT round(dn::DOUBLE / ws::DOUBLE, 6) + 0 AS delta
        |  FROM rep),
        |rk AS (SELECT delta, row_number() OVER (ORDER BY delta) AS rk
        |  FROM del),
        |agg AS (SELECT count(*)::BIGINT AS n_reps,
        |    sum(CASE WHEN delta <= 0 THEN 1 ELSE 0 END)::BIGINT AS le0
        |  FROM del),
        |band AS (SELECT n_reps, le0,
        |    min(delta) AS ci_lo, max(delta) AS ci_hi
        |  FROM rk, agg
        |  WHERE rk = (n_reps * 25 + 999) // 1000
        |     OR rk = (n_reps * 975 + 999) // 1000
        |  GROUP BY 1, 2),
        |obs AS (SELECT count(*)::BIGINT AS n,
        |    round(sum(d)::DOUBLE / count(*), 6) + 0 AS delta_obs
        |  FROM u)
        |SELECT n, delta_obs, n_reps, ci_lo, ci_hi,
        |  round(le0::DOUBLE / n_reps, 6) + 0 AS share_le_zero
        |FROM obs, band""".stripMargin))

  /** Wald SPRT over the purchase-conversion stream
    * ([[graft.operators.Evaluation.sprtBernoulli]]): per event-time
    * day, the cumulative LLR of H1: p=0.20 vs H0: p=0.15 with
    * α=5%/β=20% boundaries — the sequential "when did the evidence
    * cross" walk. The four log constants interpolate into BOTH the
    * plan and this SQL as the same shortest-round-trip decimals, so
    * each day's LLR is one identical IEEE expression on both engines.
    */
  val sprtGate: QueryDef = {
    val (c1, c2, up, lo) =
      graft.operators.Evaluation.sprtConstants(0.15, 0.20, 5, 20)
    QueryDef(
      "eval_sprt_walk",
      (s, dir) =>
        graft.operators.Evaluation.sprtBernoulli(
            Tables(s, dir).events, "ts",
            col("event_type") === "purchase", p0 = 0.15, p1 = 0.20,
            alphaPct = 5, betaPct = 20)
          .orderBy("day"),
      Some(
        s"""WITH d AS (SELECT CAST(ts AS DATE) AS day,
           |    count(*)::BIGINT AS n,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |      END)::BIGINT AS k
           |  FROM events GROUP BY 1),
           |c AS (SELECT day,
           |    sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           |      ::BIGINT AS n_cum,
           |    sum(k) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           |      ::BIGINT AS k_cum
           |  FROM d),
           |l AS (SELECT day, n_cum, k_cum,
           |    round(k_cum::DOUBLE * ($c1) +
           |      (n_cum - k_cum)::DOUBLE * ($c2), 6) + 0 AS llr
           |  FROM c)
           |SELECT day, n_cum, k_cum, llr,
           |  CASE WHEN llr >= ($up) THEN 'accept_h1'
           |       WHEN llr <= ($lo) THEN 'accept_h0'
           |       ELSE 'continue' END AS decision
           |FROM l ORDER BY day""".stripMargin))
  }

  /** Cochran–Mantel–Haenszel over per-user conversion stratified by a
    * user-derived block ([[graft.operators.Evaluation.cmhTest]]):
    * pooled χ² and Mantel–Haenszel odds ratio from strata-ordered
    * float folds over exact 2×2 integer cells — the oracle rebuilds
    * the per-user frame, the cells, each stratum's terms with the
    * identical IEEE expression order, and the ordered `list_reduce`
    * sums.
    */
  val cmhGate: QueryDef = QueryDef(
    "eval_cmh_stratified",
    (s, dir) => {
      val users = Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .select(col("user_id"), col("conv"),
          expr("(user_id div 2) % 3").cast("string").as("stratum"))
      graft.operators.Evaluation.cmhTest(users, "stratum",
        col("user_id") % 2 === 0, col("conv") === 1)
    },
    Some(
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1),
        |cell AS (SELECT ((user_id // 2) % 3)::VARCHAR AS s,
        |    sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0
        |      END)::BIGINT AS n11,
        |    sum(CASE WHEN user_id % 2 = 0 AND conv = 0 THEN 1 ELSE 0
        |      END)::BIGINT AS n10,
        |    sum(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1 ELSE 0
        |      END)::BIGINT AS n01,
        |    sum(CASE WHEN user_id % 2 <> 0 AND conv = 0 THEN 1 ELSE 0
        |      END)::BIGINT AS n00
        |  FROM u GROUP BY 1),
        |f AS (SELECT s, n11 + n10 + n01 + n00 AS n,
        |    n11::DOUBLE - (n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
        |      / (n11 + n10 + n01 + n00)::DOUBLE AS d,
        |    (n11 + n10)::DOUBLE * (n01 + n00)::DOUBLE
        |      * (n11 + n01)::DOUBLE * (n10 + n00)::DOUBLE
        |      / ((n11 + n10 + n01 + n00)::DOUBLE
        |         * (n11 + n10 + n01 + n00)::DOUBLE
        |         * ((n11 + n10 + n01 + n00)::DOUBLE - 1.0)) AS v,
        |    n11::DOUBLE * n00::DOUBLE
        |      / (n11 + n10 + n01 + n00)::DOUBLE AS a,
        |    n10::DOUBLE * n01::DOUBLE
        |      / (n11 + n10 + n01 + n00)::DOUBLE AS b
        |  FROM cell WHERE n11 + n10 + n01 + n00 >= 2),
        |agg AS (SELECT count(*)::BIGINT AS n_strata, sum(n)::BIGINT AS n,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(d ORDER BY s)), (x, y) -> x + y) AS sd,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(v ORDER BY s)), (x, y) -> x + y) AS sv,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(a ORDER BY s)), (x, y) -> x + y) AS sa,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      list(b ORDER BY s)), (x, y) -> x + y) AS sb
        |  FROM f)
        |SELECT n_strata, n,
        |  CASE WHEN sb <> 0.0 THEN round(sa / sb, 6) + 0 END AS or_mh,
        |  CASE WHEN sv <> 0.0 THEN round(sd * sd / sv, 6) + 0 END
        |    AS cmh_chi2
        |FROM agg""".stripMargin))

  def defs: Seq[QueryDef] =
    Seq(auc, prThreshold, kappa, dedupPairs, calibration, rankAgreement,
      ksDistanceGate, wassersteinGate, krippendorffGate,
      preferenceMatrix, preferenceRanking, abTest, confusionMatrix,
      mannWhitneyGate, cupedGate, fdrGate, brierGate, bradleyTerryGate,
      conformalGate, cohensDGate, mcnemarGate, didGate, eceGate,
      retrievalMetricsGate, rboGate, pairedBootstrapGate, sprtGate,
      cmhGate)
}
