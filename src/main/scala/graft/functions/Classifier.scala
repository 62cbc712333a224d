package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-engine linear text classifier — the fastText/FineWeb-Edu-style
  * gate trained WITHOUT leaving the engine: logistic regression on
  * hashed-bigram features by full-batch gradient descent, every step a
  * pair of keyed aggregations and the weight vector quantized to 6 dp
  * per round (the Lloyd-trainer discipline from
  * [[graft.similarity.KMeans]] — per-step quantization resets
  * cross-engine FP drift, which is what lets DuckDB replay the entire
  * training run and the driver hash-certify a GRADIENT DESCENT).
  *
  * Model: p(target | doc) = σ(Σ_b x_b·w_b) over
  * [[TextFunctions.DsirBuckets]] hashed-bigram buckets (md5 15-hex →
  * 60-bit mod B, the replayable feature hashing shared with DSIR),
  * x = per-doc L1-normalized bucket counts, labels = the DSIR
  * target/raw split (lang = '[[TextFunctions.DsirTargetLang]]').
  * Gradients are CLASS-BALANCED (each class contributes weight 1/2
  * regardless of size), which centers the decision boundary at z = 0
  * without an intercept term whose unit-scale feature would otherwise
  * dominate the normalized bucket features.
  *
  * NOTE on the testdata: the corpus' lang labels are synthetic (every
  * label draws from the same vocabulary), so accuracy here measures
  * the machinery's FIT on the training set — the certified artifact is
  * the training run itself, not a linguistic claim.
  *
  * Scale plan (100 TB): features hash map-side; the only token-volume
  * shuffle is the (doc, bucket) count agg. Each GD step is: one
  * ≤B-row broadcast join + doc-keyed agg (the forward pass), one
  * doc-keyed join + bucket-keyed agg with map-side partials (the
  * gradient), one ≤B-row update. T steps = T passes over the bounded
  * feature table (checkpointed once), never over raw text; the model
  * state is B rows on every engine at every moment. Nothing is
  * collected.
  */
object Classifier {

  /** Full-batch GD steps. */
  val Steps = 5

  /** Learning rate — sized for L1-normalized features (per-feature
    * x ≈ 1/doc_len, so per-step weight movement is O(η·x̄·½) ≈ 0.2).
    */
  val Eta = 2000.0

  /** (feat, labels): (doc_id, bucket, x) L1-normalized hashed-bigram
    * features and (doc_id, y, cw) class-balanced labels — docs with no
    * bigrams carry no features and are excluded from both.
    */
  private[graft] def features(docs: DataFrame): (DataFrame, DataFrame) = {
    val bk = TextFunctions.docBigrams(docs)
      .select(col("doc_id"), TextFunctions.bigramBucket(col("a"), col("b")))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("n"))
    val nd = bk.groupBy("doc_id").agg(sum("n").cast("double").as("nd"))
    val feat = bk.join(nd, "doc_id")
      .select(col("doc_id"), col("bucket"), (col("n") / col("nd")).as("x"))
    val y0 = docs
      .select(col("doc_id"),
        (col("lang") === lit(TextFunctions.DsirTargetLang)).cast("int").as("y"))
      .join(nd.select("doc_id"), "doc_id")
    val cls = y0.groupBy("y").agg((lit(0.5) / count(lit(1))).as("cw"))
    (feat, y0.join(broadcast(cls), "y").select("doc_id", "y", "cw"))
  }

  /** One forward pass: (doc_id, z) raw scores under a weight table. */
  private[graft] def scores(feat: DataFrame, w: DataFrame): DataFrame =
    feat.join(broadcast(w), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("x") * col("w")).as("z"))

  /** One GD round: forward pass (≤B-row broadcast join + doc agg),
    * class-balanced gradient (doc-keyed join + bucket agg with
    * map-side partials), 6-dp-quantized weight update.
    */
  private[graft] def gdStep(feat: DataFrame, labels: DataFrame,
                            w: DataFrame): DataFrame = {
    val p = scores(feat, w)
      .select(col("doc_id"), (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
    val g = feat.join(p, "doc_id").join(labels, "doc_id")
      .groupBy("bucket")
      .agg(sum((col("p") - col("y")) * col("x") * col("cw")).as("g"))
    w.join(g, Seq("bucket"), "left")
      .select(col("bucket"),
        round(col("w") - lit(Eta) * coalesce(col("g"), lit(0.0)), 6).as("w"))
  }

  /** The trained ≤B-row weight table (bucket, w) after [[Steps]]
    * class-balanced GD rounds from w⁰ = 0, 6-dp quantized per round.
    */
  private def gdTrain(feat: DataFrame, labels: DataFrame): DataFrame = {
    var w = feat.select("bucket").distinct()
      .withColumn("w", lit(0.0)).localCheckpoint(true)
    for (_ <- 1 to Steps)
      w = gdStep(feat, labels, w).localCheckpoint(true)
    w
  }

  /** Memoized (features, labels, trained weights) — classifier_train
    * and classifier_eval share one training run per session (bench
    * attribution: the `text_classifier` artifact).
    */
  private def cachedModel(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    graft.SessionCache.getOrElseUpdate(spark, ("textClassifier", dir)) {
      val docs = Tables.documents(spark, dir)
      val (feat, labels) = features(docs)
      val f = feat.localCheckpoint(true)
      val l = labels.localCheckpoint(true)
      (f, l, gdTrain(f, l))
    }

  def prewarmModel(spark: SparkSession, dir: String): Unit = {
    cachedModel(spark, dir); ()
  }

  /** The trained weight table — the model artifact a curation run
    * persists and serves (every hashed bucket that occurs in the
    * corpus, with its learned log-odds contribution).
    */
  def classifierTrain(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, w) = cachedModel(spark, dir)
    w.select(col("bucket"), col("w").as("weight")).orderBy("bucket")
  }

  /** Training-set fit readout per class: doc count, correct
    * predictions at the z ≥ 0 boundary, accuracy, and mean raw score —
    * the acceptance numbers that decide whether the gate is usable.
    */
  def classifierEval(spark: SparkSession, dir: String): DataFrame = {
    val (feat, labels, w) = cachedModel(spark, dir)
    scores(feat, w)
      .select(col("doc_id"), round(col("z"), 6).as("z"))
      .join(labels, "doc_id")
      .groupBy(col("y").as("is_target"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when((col("z") >= 0) === (col("y") === 1), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(when((col("z") >= 0) === (col("y") === 1), 1.0).otherwise(0.0))
          / count(lit(1)), 4).as("accuracy"),
        round(avg(col("z")), 4).as("mean_score"))
      .orderBy("is_target")
  }

  /** The gate APPLIED — per-source curation readout: scored docs,
    * kept docs (z ≥ 0), keep rate and mean score per source. The
    * decision a mix-planning run inspects before committing to the
    * gate (a source whose keep rate collapses is the gate's blind
    * spot, not necessarily bad data). Shares the memoized training
    * run; one doc-keyed label join + source rollup on top.
    */
  def classifierGate(spark: SparkSession, dir: String): DataFrame = {
    val (feat, _, w) = cachedModel(spark, dir)
    scores(feat, w)
      .select(col("doc_id"), round(col("z"), 6).as("z"))
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("z") >= 0, 1L).otherwise(0L)).as("n_kept"),
        round(sum(when(col("z") >= 0, 1.0).otherwise(0.0)) / count(lit(1)), 4)
          .as("keep_rate"),
        round(avg(col("z")), 4).as("mean_score"))
      .orderBy("source")
  }

  /** Rank-AUC of the trained gate: every scored doc globally ranked by
    * (z, doc_id) — the deterministic total order standing in for
    * midranks, both engines breaking score ties identically — and
    * AUC = (Σ ranks₊ − n₊(n₊+1)/2) / (n₊·n₋). The threshold-free
    * quality number next to 26p′'s fixed-boundary accuracy. The global
    * rank rides [[Ranks.globalRank]] (range-decomposed, never a
    * single-partition sort); everything after is one 1-row fold.
    */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame = {
    val (feat, labels, w) = cachedModel(spark, dir)
    val scored = scores(feat, w)
      .select(col("doc_id"), round(col("z"), 6).as("z"))
      .join(labels.select("doc_id", "y"), "doc_id")
    Ranks.globalRank(scored, Seq(col("z"), col("doc_id")))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("y") === 1, col("rn")).otherwise(0L)).as("rs"))
      .select(col("n_pos"), col("n_neg"),
        // a single-class corpus has NO defined AUC — emit NULL on both
        // engines (the old greatest(...,1) guard made it read 0.0,
        // which a consumer parses as "perfectly inverted ranking")
        when(col("n_pos") * col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(round(
            (lit(2L) * col("rs") - col("n_pos") * (col("n_pos") + lit(1L)))
              .cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 4))
          .as("auc"))
  }

  /** The shared training-replay WITH-chain through w[[Steps]] —
    * feat/labels/per-step weights MATERIALIZED so DuckDB evaluates the
    * chain once instead of inlining it recursively.
    */
  /** The training-replay CTE body (no WITH), every name prefixed with
    * `p` so the chain composes with other chains (gate_agreement).
    */
  private[functions] def trainBody(p: String): String = {
    val b = TextFunctions.DsirBuckets
    val steps = (1 to Steps).map { i =>
      s"""${p}z$i AS (
         |  SELECT f.doc_id, sum(f.x * w.w) AS z
         |  FROM ${p}feat f JOIN ${p}w${i - 1} w USING (bucket) GROUP BY 1),
         |${p}p$i AS (SELECT doc_id, 1.0/(1.0+exp(-z)) AS p FROM ${p}z$i),
         |${p}g$i AS (
         |  SELECT f.bucket, sum((p.p - y.y) * f.x * y.cw) AS g
         |  FROM ${p}feat f JOIN ${p}p$i p USING (doc_id)
         |  JOIN ${p}y y USING (doc_id) GROUP BY 1),
         |${p}w$i AS MATERIALIZED (
         |  SELECT w.bucket, round(w.w - $Eta * coalesce(g.g, 0.0), 6) AS w
         |  FROM ${p}w${i - 1} w LEFT JOIN ${p}g$i g USING (bucket))""".stripMargin
    }.mkString(",\n")
    s"""${p}toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |${p}zz AS (
       |  SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS pr
       |  FROM ${p}toks WHERE len(t) >= 2),
       |${p}bg AS (SELECT doc_id, pr[1] AS a, pr[2] AS b FROM ${p}zz
       |       WHERE pr[1] <> '' AND pr[2] <> ''),
       |${p}bk AS (
       |  SELECT doc_id, ('0x' || substr(md5(a || ' ' || b), 1, 15))::BIGINT % $b AS bucket,
       |    count(*) AS n
       |  FROM ${p}bg GROUP BY 1, 2),
       |${p}nd AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS nd FROM ${p}bk GROUP BY 1),
       |${p}feat AS MATERIALIZED (
       |  SELECT doc_id, bucket, n / nd AS x FROM ${p}bk JOIN ${p}nd USING (doc_id)),
       |${p}y0 AS (
       |  SELECT doc_id, CAST(lang = '${TextFunctions.DsirTargetLang}' AS INTEGER) AS y
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM ${p}nd)),
       |${p}cls AS (SELECT y, 0.5 / count(*) AS cw FROM ${p}y0 GROUP BY y),
       |${p}y AS MATERIALIZED (
       |  SELECT doc_id, y0.y, cls.cw FROM ${p}y0 y0 JOIN ${p}cls cls USING (y)),
       |${p}w0 AS (SELECT DISTINCT bucket, 0.0 AS w FROM ${p}feat),
       |$steps""".stripMargin
  }

  private def trainCtes: String = "WITH " + trainBody("")

  val classifierTrainSql: String =
    s"""$trainCtes
       |SELECT bucket, w AS weight FROM w$Steps ORDER BY bucket""".stripMargin

  val classifierEvalSql: String =
    s"""$trainCtes,
       |zf AS (
       |  SELECT f.doc_id, round(sum(f.x * w.w), 6) AS z
       |  FROM feat f JOIN w$Steps w USING (bucket) GROUP BY 1)
       |SELECT y.y AS is_target, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN (zf.z >= 0) = (y.y = 1) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  round(sum(CASE WHEN (zf.z >= 0) = (y.y = 1) THEN 1.0 ELSE 0.0 END)
       |    / count(*), 4) AS accuracy,
       |  round(avg(zf.z), 4) AS mean_score
       |FROM zf JOIN y USING (doc_id)
       |GROUP BY 1 ORDER BY is_target""".stripMargin

  val classifierGateSql: String =
    s"""$trainCtes,
       |zf AS (
       |  SELECT f.doc_id, round(sum(f.x * w.w), 6) AS z
       |  FROM feat f JOIN w$Steps w USING (bucket) GROUP BY 1)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN zf.z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(sum(CASE WHEN zf.z >= 0 THEN 1.0 ELSE 0.0 END) / count(*), 4)
       |    AS keep_rate,
       |  round(avg(zf.z), 4) AS mean_score
       |FROM zf JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY source""".stripMargin

  /** Gate-agreement matrix — the capstone readout over the round's
    * three certified curation gates: pairwise keep-set sizes,
    * intersection, and Jaccard agreement between
    *   - `clf`: the trained classifier at z ≥ 0 ([[classifierGate]]),
    *   - `dsir`: positive DSIR log importance weight,
    *   - `ppl`: the head perplexity tercile ([[TextFunctions.pplBuckets]]).
    * Gates that mostly agree are redundant (run the cheap one); gates
    * that disagree partition the corpus into zones worth auditing
    * BEFORE a 100 TB run commits to one. Doc grain is the intersection
    * of the three scored populations (docs with ≥1 bigram).
    *
    * Scale: all three signals are the memoized per-doc tables; the
    * matrix is two doc-keyed joins + one 3-row fold.
    */
  def gateAgreement(spark: SparkSession, dir: String): DataFrame = {
    val (feat, _, w) = cachedModel(spark, dir)
    val ck = scores(feat, w)
      .select(col("doc_id"), (round(col("z"), 6) >= 0).cast("int").as("ka"))
    val dk = TextFunctions.dsirWeights(spark, dir)
      .select(col("doc_id"), (col("dsir_logw") >= 0).cast("int").as("kb"))
    val pk = TextFunctions.pplBuckets(spark, dir)
      .select(col("doc_id"), (col("ppl_bucket") === 1).cast("int").as("kc"))
    val j = ck.join(dk, "doc_id").join(pk, "doc_id")
    // ONE aggregation computes all six sums (the "two joins + one
    // 3-row fold" cost the docstring states — previously the fold ran
    // three times, once per pair row); the pair rows are an
    // explode-pivot of the single 1-row fold
    def pairStruct(name: String, a: Column, b: Column, both: Column) =
      struct(lit(name).as("pair"), a.as("n_a"), b.as("n_b"), both.as("n_both"))
    j.agg(sum(col("ka")).cast("long").as("na"),
        sum(col("kb")).cast("long").as("nb"),
        sum(col("kc")).cast("long").as("nc"),
        sum(col("ka") * col("kb")).cast("long").as("nab"),
        sum(col("ka") * col("kc")).cast("long").as("nac"),
        sum(col("kb") * col("kc")).cast("long").as("nbc"))
      .select(explode(array(
        pairStruct("clf_vs_dsir", col("na"), col("nb"), col("nab")),
        pairStruct("clf_vs_ppl", col("na"), col("nc"), col("nac")),
        pairStruct("dsir_vs_ppl", col("nb"), col("nc"), col("nbc")))).as("r"))
      .select(col("r.pair").as("pair"), col("r.n_a").as("n_a"),
        col("r.n_b").as("n_b"), col("r.n_both").as("n_both"))
      .select(col("pair"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double")
          / greatest(col("n_a") + col("n_b") - col("n_both"), lit(1L)), 4)
          .as("jaccard"))
      .orderBy("pair")
  }

  val gateAgreementSql: String = {
    def pairSel(name: String, a: String, b: String): String =
      s"""SELECT '$name' AS pair,
         |  CAST(sum($a) AS BIGINT) AS n_a, CAST(sum($b) AS BIGINT) AS n_b,
         |  CAST(sum($a * $b) AS BIGINT) AS n_both,
         |  round(CAST(sum($a * $b) AS DOUBLE)
         |    / greatest(sum($a) + sum($b) - sum($a * $b), 1), 4) AS jaccard
         |FROM j""".stripMargin
    s"""WITH ${TextFunctions.dsirBody("d_")},
       |${trainBody("c_")},
       |${TextFunctions.pplBody("p_")},
       |ck AS (
       |  SELECT f.doc_id, CAST(round(sum(f.x * w.w), 6) >= 0 AS INTEGER) AS ka
       |  FROM c_feat f JOIN c_w$Steps w USING (bucket) GROUP BY f.doc_id),
       |dk AS (SELECT doc_id, CAST(round(logw_raw, 4) >= 0 AS INTEGER) AS kb FROM d_w),
       |pk AS (
       |  SELECT doc_id,
       |    CAST(ntile(3) OVER (ORDER BY avg_neg_logprob, doc_id) = 1 AS INTEGER) AS kc
       |  FROM p_s),
       |j AS (
       |  SELECT ck.ka, dk.kb, pk.kc
       |  FROM ck JOIN dk USING (doc_id) JOIN pk USING (doc_id))
       |${pairSel("clf_vs_dsir", "ka", "kb")}
       |UNION ALL ${pairSel("clf_vs_ppl", "ka", "kc")}
       |UNION ALL ${pairSel("dsir_vs_ppl", "kb", "kc")}
       |ORDER BY pair""".stripMargin
  }

  val classifierAucSql: String =
    s"""$trainCtes,
       |zf AS (
       |  SELECT f.doc_id, round(sum(f.x * w.w), 6) AS z
       |  FROM feat f JOIN w$Steps w USING (bucket) GROUP BY 1),
       |rk AS (
       |  SELECT y.y, row_number() OVER (ORDER BY zf.z, zf.doc_id) AS rn
       |  FROM zf JOIN y USING (doc_id))
       |SELECT
       |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       |  CASE WHEN sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)
       |          * sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) = 0 THEN NULL
       |  ELSE round(CAST(2 * sum(CASE WHEN y = 1 THEN rn ELSE 0 END)
       |      - sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)
       |        * (sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) + 1) AS DOUBLE)
       |    / CAST(2 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)
       |        * sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS DOUBLE), 4)
       |  END AS auc
       |FROM rk""".stripMargin
}
