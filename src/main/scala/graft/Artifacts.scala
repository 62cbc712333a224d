package graft

import org.apache.spark.sql.SparkSession

/** Named builders for the expensive shared artifacts the driver faces
  * memoize through [[SessionCache]] (dedup pair table, BPE training,
  * the six ANN tier tables, the mm codec output, the CDC changelog and
  * latest-state).
  *
  * [[Bench]] times each builder as its own first-class line: the
  * memoization is the right production shape (build once, serve every
  * consumer), but without explicit attribution a regression in a shared
  * generator lands on whichever consuming query happens to run first
  * alphabetically and the named queries keep looking fast. Each builder
  * forces exactly the SessionCache entry its consumers read (the cached
  * frames are eager localCheckpoints, so the build realizes here), and
  * after a build pass the per-query bench numbers are marginal costs.
  *
  * Keep the parameters in lock-step with the driver faces: a builder
  * that warms a DIFFERENT memo key than its consumers would re-hide the
  * build cost inside the first consumer.
  */
object Artifacts {

  val builders: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "cdc_changelog" -> ((s: SparkSession, d: String) => { cdc.CdcOps.cachedChangelog(s, d); () }),
    "cdc_latest_state" -> ((s: SparkSession, d: String) => { cdc.CdcOps.cachedLatestState(s, d); () }),
    "cdc_user_epochs" -> ((s: SparkSession, d: String) => { cdc.AggMaintain.cachedUserEpochs(s, d); () }),
    "cdc_orders_epochs" -> ((s: SparkSession, d: String) => { cdc.JoinMaintain.cachedOrdersEpochs(s, d); () }),
    "cdc_cents_support" -> ((s: SparkSession, d: String) => { cdc.AggMaintain.cachedCentsSupport(s, d); () }),
    "cdc_upsert_sink" -> ((s: SparkSession, d: String) => { cdc.CdcQueries.cachedUpsertSink(s, d); () }),
    "dedup_pair_table" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmPairs(s, d)),
    "dedup_lsh_index" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmLshIndex(s, d)),
    "dedup_containment_pairs" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmContainmentPairs(s, d)),
    "dedup_sn_pairs" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmSnPairs(s, d)),
    "dedup_ppjoin_pairs" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmPpjoinPairs(s, d)),
    "graph_epochs" -> ((s: SparkSession, d: String) => { queries.Graph.cachedEpochPairs(s, d); () }),
    "graph_degree_state" -> ((s: SparkSession, d: String) => { queries.Graph.cachedDegreePrefix(s, d); () }),
    "graph_wpairs" -> ((s: SparkSession, d: String) => { queries.Graph.cachedWeightedPairs(s, d); () }),
    "graph_edges" -> ((s: SparkSession, d: String) => { queries.Graph.cachedGraph(s, d); () }),
    "graph_lpa_labels" -> ((s: SparkSession, d: String) => { queries.Graph.cachedLpaLabels(s, d); () }),
    "graph_thresh_both" -> ((s: SparkSession, d: String) => { queries.Graph.cachedThresholdedBoth(s, d); () }),
    "graph_bipartite" -> ((s: SparkSession, d: String) => { queries.Graph.cachedBipartite(s, d); () }),
    "graph_walks" -> ((s: SparkSession, d: String) => { queries.Graph.cachedWalks(s, d); () }),
    "kmeans_assign" -> ((s: SparkSession, d: String) => { similarity.KMeans.cachedAssignment(s, d); () }),
    "bpe_training" -> ((s: SparkSession, d: String) => { functions.Bpe.trainedMerges(s, d, nMerges = 20); () }),
    "text_token_counts" -> ((s: SparkSession, d: String) => { functions.TextFunctions.cachedDocTokenCounts(s, d); () }),
    "text_tfidf_scored" -> ((s: SparkSession, d: String) => { functions.TextFunctions.cachedDocSimilarScored(s, d); () }),
    "ann_brute_scored" -> ((s: SparkSession, d: String) => { similarity.Ann.cachedBruteScored(s, d); () }),
    "text_bigrams" -> ((s: SparkSession, d: String) => { functions.TextFunctions.cachedDocBigrams(s, d); () }),
    "text_kn_model" -> ((s: SparkSession, d: String) => functions.TextFunctions.prewarmKnModel(s, d)),
    "text_dsir_logw" -> ((s: SparkSession, d: String) => functions.TextFunctions.prewarmDsirLogw(s, d)),
    "text_classifier" -> ((s: SparkSession, d: String) => functions.Classifier.prewarmModel(s, d)),
    "mm_codec" -> ((s: SparkSession, d: String) => { multimodal.BinaryPipeline.pipelineRaw(s, d); () }),
    // AFTER mm_codec: both read the memoized decode pass, so their
    // lines attribute only their own work (pair join / Lloyd replay)
    "mm_phash_pairs" -> ((s: SparkSession, d: String) => { multimodal.BinaryPipeline.cachedPhashPairs(s, d); () }),
    "mm_kmeans_assign" -> ((s: SparkSession, d: String) => { multimodal.BinaryPipeline.cachedMediaAssign(s, d); () }),
    "mm_ann_index" -> ((s: SparkSession, d: String) => multimodal.BinaryPipeline.prewarmMmAnnIndex(s, d)),
    "ann_ivf_index" -> ((s: SparkSession, d: String) => { similarity.Ann.cachedIvfIndex(s, d); () }),
    "ann_tier_brute" -> ((s: SparkSession, d: String) => { similarity.Ann.bruteForceTopK(s, d); () }),
    "ann_tier_lsh" -> ((s: SparkSession, d: String) => { similarity.Ann.lshTopK(s, d); () }),
    "ann_tier_ivf" -> ((s: SparkSession, d: String) => { similarity.Ann.ivfTopK(s, d); () }),
    "ann_tier_sq" -> ((s: SparkSession, d: String) => { similarity.Ann.sqTopK(s, d); () }),
    "ann_tier_pq" -> ((s: SparkSession, d: String) => { similarity.Ann.pqTopK(s, d); () }),
    "ann_tier_ivfpq" -> ((s: SparkSession, d: String) => { similarity.Ann.ivfpqTopK(s, d); () }),
    "ann_tier_ivfpq_refine" -> ((s: SparkSession, d: String) => { similarity.Ann.ivfpqRefineTopK(s, d); () }),
    "layout_bucketed" -> ((s: SparkSession, d: String) => { sources.Layout.bucketedTables(s, d); () }),
    "corpus_jsonl" -> ((s: SparkSession, d: String) => { sources.CorpusIO.jsonlDocuments(s, d); () }),
    "layout_zordered" -> ((s: SparkSession, d: String) => { sources.Layout.zorderedEvents(s, d); () }),
    "layout_compacted" -> ((s: SparkSession, d: String) => { sources.Layout.compactedEvents(s, d); () }))
}
