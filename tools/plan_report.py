#!/usr/bin/env python
"""Regenerate PLANS.md: a physical-plan audit of every headline query
at sf0.001 — exchange count, join strategies, scan pushdown — the
evidence behind SCALE.md's claims. Run: python tools/plan_report.py"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import HEADLINE
from streamforge_spark import registry
from streamforge_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def audit(plan: str) -> dict:
    scans = re.findall(r"Location: InMemoryFileIndex.*?/(\w+)\.parquet", plan)
    return {
        "exchanges": plan.count("Arguments: hashpartitioning"),
        "broadcasts": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "topk": "TakeOrderedAndProject" in plan,
        "pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "scans": ",".join(f"{t}x{scans.count(t)}" for t in sorted(set(scans))),
    }


#: curation / similarity queries not in the bench headline set — their
#: plan shapes are audited in a second table.
CURATION = [
    "stratified_sample", "contamination_check", "top_terms_per_doc",
    "token_budget_pack", "pii_scrub", "dedup_minhash_lsh",
    "simhash_near_dup", "ann_lsh_topk", "ann_ivf_topk",
    "multimodal_features", "embedding_kmeans", "leakage_safe_split",
    "quality_classifier_score", "segment_dedup", "doc_repetition_stats",
    "semantic_dedup",  # hot_band_report moved to HEADLINE (r8)
    # r8 late additions (verdict r8 item 3): audit rows required
    "ivf_cell_report", "semantic_decontamination",
    "dedup_cluster_representatives", "corpus_funnel_summary",
    # r9 additions (corpus_funnel_semantic_report audits via HEADLINE)
    "ivf_index_staleness_report", "corpus_funnel_by_source",
    "ivf_frozen_vs_retrained_recall", "funnel_vocab_what_if",
    "decontamination_agreement", "corpus_quality_by_lang",
    "funnel_gate_cost_report",
    # r9 late additions: training-run planning surface
    "epoch_repeat_plan", "curriculum_schedule", "vocab_coverage_curve",
    "corpus_funnel_ablation",
    # r9 handoff audit face (state query audits via HEADLINE)
    "handoff_chunk_audit",
    # r9 CDC log-maintenance faces
    "cdc_net_effect_squash", "kafka_tombstone_gc",
    # r9 ranking-quality eval + state divergence audit + eval integrity
    "retrieval_ndcg_eval", "state_audit_report",
    "benchmark_integrity_report",
]

#: time-series analytics queries (queries/timeseries.py) + graph /
#: vector-infra additions.
TIMESERIES = [
    "bloom_fp_bound", "winnow_near_dup", "pack_chunk_stats", "k_anonymity_audit", "session_dynamic_gap", "tv_drift_by_day", "funnel_conversion", "top_event_paths", "exact_percentiles_by_type", "metadata_decorator_stamp", "heavy_hitters_misra_gries", "return_rate_pchart",
    "gap_fill_daily", "ohlc_daily", "zscore_outliers",
    "value_histogram", "event_transitions", "value_drift_report",
    "winsorized_values", "supplier_pagerank", "embedding_quantize_int8",
    "corpus_mix_sample", "customer_entity_match", "twap_daily",
    "window_rank_suite", "scd2_temporal_join", "negative_pairs",
    "cluster_balanced_sample", "multimodal_png_roundtrip", "state_snapshot_diff",
    "gap_fill_interpolate",
    # round-2 later additions (series_similarity / rolling_active are
    # audited via the bench HEADLINE list, not repeated here)
    "bfs_reachability", "user_value_trend", "equidepth_histogram",
    "fuzzy_dedup_survivors", "embedding_gram_matrix", "zorder_layout_key",
    "comovement_pairs", "ab_test_cuped",
    "pareto_concentration", "doc_chunks", "seasonal_anomaly_cells",
    "multimodal_gif_roundtrip", "multimodal_wav_roundtrip",
    "session_incident_overlap", "token_budget_mix", "bpe_train_merges",
    "expectations_report", "funnel_time_to_convert",
    "quality_by_semantic_cluster", "ewma_values", "hybrid_retrieval_rrf",
    "cep_click_error_pattern",
    # round-3 session additions (allpairs is also in HEADLINE)
    "weighted_shortest_path", "rfm_segments", "holt_forecast",
    "corpus_shuffle_order", "soft_dedup_weights",
    "label_centroid_shift", "doc_novelty", "pareto_frontier_parts",
    "dataset_fingerprint", "seasonal_index_monthly", "survival_curve",
    "mixture_temperature_weights", "benford_first_digit",
    "clamped_balance", "revenue_variance_decomposition", "cohort_ltv",
    # this session's additions (bloom/ks/span/drawdown are in HEADLINE)
    "acf_daily_revenue", "gini_revenue", "xcorr_lead_lag",
    "supplier_link_pred", "event_runs", "deletion_propagation_report",
    "fifo_lot_matching", "fulfillment_business_days", "theilsen_trend",
    "bootstrap_ci_revenue", "imputation_values", "chisq_event_mix",
    "holt_winters_weekly", "qq_plot_points", "term_collocations",
    "embedding_trunc_overlap", "join_explosion_risk",
    "event_trigrams", "user_burstiness", "transition_latency",
    "weighted_median_order_value", "activity_streaks", "basket_triples",
    "attribution_time_decay", "new_vs_returning_revenue",
    "price_elasticity_monthly", "trending_parts", "topn_with_others",
    "receivables_aging", "ma_crossover_signals", "readability_ari",
    "zipf_check", "slo_burn_rate", "smoothed_supplier_reliability",
    "dedup_cluster_audit", "did_estimator", "embedding_outliers",
    "two_proportion_test", "lang_confusion_matrix", "table_version_diff",
    "dq_scorecard", "size_urgency_corr", "join_size_prediction",
    "repeat_purchase_intervals", "rolling_click_purchase_corr",
    "label_separation", "offset_continuity_audit",
    "percentile_bands_daily", "resurrection_rate_daily",
    "session_gap_sensitivity", "stratified_did",
    "double_charge_candidates", "attribution_first_last",
    "basket_mix_outliers", "single_source_parts",
    "supplier_price_spread", "price_erosion_ranking",
    "brand_portfolio_matrix", "assortment_concentration_trend",
    "supplier_latency_consistency", "shipment_fragmentation",
    "fulfillment_latency_trend", "nation_trade_balance",
    "missing_order_days", "round_number_bias", "revenue_pacing_curve",
]


def main() -> None:
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    def audited(names):
        rows = []
        for name in names:
            df = registry.QUERIES[name](spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            rows.append((name, audit(plan)))
        return rows

    rows = audited(HEADLINE)
    curation_rows = audited(CURATION)
    out = pathlib.Path(__file__).resolve().parent.parent / "PLANS.md"
    with out.open("w") as f:
        f.write(
            "# PLANS — physical-plan audit of the bench headline set\n\n"
            "Generated by `python tools/plan_report.py` (sf0.001; plan shape, "
            "not data volume, is what transfers to the cluster — see SCALE.md). "
            "`exch` = hash-exchange count, `bcast`/`smj` = join strategies, "
            "`bnlj` = nested-loop/cartesian (must be 0), `topk` = "
            "TakeOrderedAndProject, `pushdown` = filters reached a scan.\n\n"
            "| query | exch | bcast | smj | bnlj | topk | pushdown | scans |\n"
            "|---|---|---|---|---|---|---|---|\n")
        def write_rows(rs):
            for name, a in rs:
                f.write(f"| {name} | {a['exchanges']} | {a['broadcasts']} | {a['smj']} "
                        f"| {a['bnlj']} | {'y' if a['topk'] else ''} "
                        f"| {'y' if a['pushed'] else ''} | {a['scans']} |\n")

        write_rows(rows)
        f.write(
            "\n## Curation / similarity queries (non-headline)\n\n"
            "| query | exch | bcast | smj | bnlj | topk | pushdown | scans |\n"
            "|---|---|---|---|---|---|---|---|\n")
        write_rows(curation_rows)
        f.write(
            "\n## Time-series / graph / vector-infra queries (non-headline)\n\n"
            "| query | exch | bcast | smj | bnlj | topk | pushdown | scans |\n"
            "|---|---|---|---|---|---|---|---|\n")
        write_rows(audited(TIMESERIES))
        f.write(
            "\nNotes:\n"
            "- `q22_idle_customers`'s nested-loop joins are the scalar-"
            "subquery pattern: a ONE-ROW aggregate (the account-balance "
            "threshold) broadcast-crossed into customer — constant work "
            "per row at any scale, not an O(n·m) join.\n"
            "- `dedup_clusters` shows 0 because its edges come from a "
            "localCheckpoint: the audited plan is the final label "
            "aggregation; per-round plans are one join + one aggregate "
            "(operators/graph.py).\n"
            "- `embedding_kmeans` audits the final assignment pass (scan "
            "+ broadcast centroids + mapInPandas, zero exchanges); each "
            "training round adds one k-row partial-aggregated exchange "
            "(functions/clustering.py).\n"
            "- `embedding_quantize_int8`'s nested-loop join is the same "
            "one-row scalar-subquery pattern as q22: the 64-entry "
            "min/max limits row broadcast-crossed onto the corpus scan.\n"
            "- `supplier_pagerank` audits the final iteration's plan; "
            "edges/nodes are checkpointed once and each power round is "
            "one edges⨝ranks shuffle + a BIGINT in-sum "
            "(operators/graph.py::pagerank).\n"
            "- `bfs_reachability` shows 0 for the same reason as "
            "dedup_clusters: edges are checkpointed once (the "
            "lineitem⨝orders extraction runs exactly once, not per "
            "round) and each frontier round is one hash join + one "
            "anti-join on checkpointed inputs.\n"
            "- `corpus_funnel_report`'s nested-loop joins are all the "
            "DSIR totals pattern: a ONE-ROW (nr, nt) aggregate "
            "broadcast-crossed onto the <=4096-row bucket table "
            "(functions/dsir.py::dsir_llr_from_counts); the formatted "
            "explain shows the subtree once per pre-checkpoint "
            "consumer, the runtime materializes it once.\n"
            "- `ab_test_cuped` / `pareto_concentration` nested-loop "
            "joins are one-row scalar broadcasts (pooled moments / "
            "grand total) — the adjudicated q22 pattern.\n"
            "- `training_data_release` scans documents 8x: each stage "
            "(signatures, segments, shingles x2, gates, token counts, "
            "verdict/shard stamps) derives independently from the one "
            "string column — column-pruned re-scans, deliberately "
            "chosen over materializing a corpus-sized intermediate; a "
            "production run would persist the tokenized projection "
            "once. Its SMJs are doc_id equi-joins between corpus-sized "
            "sides — the correct strategy there.\n"
            "- `ann_sq8_rerank`'s nested-loop join is int8_quantize's "
            "one-row min/max-limits broadcast cross (the q22 pattern); "
            "4 embeddings scans = quantizer stats + code table + the "
            "two full-precision rerank sides.\n"
            "- `ivf_cell_report`'s nested-loop joins are the one-row "
            "totals broadcast (the q22 pattern: a single-row SUM "
            "crossed onto the k-row cell rollup); the formatted "
            "explain shows the pre-localCheckpoint subtree once per "
            "consumer, and its scans column is empty because the "
            "audited plan reads the checkpointed cell rollup, not "
            "parquet (the trainer's scans run before the checkpoint "
            "like dedup_clusters).\n"
            "- `semantic_decontamination` is the r9 plan fix: the "
            "benchmark side inlines as literals and the per-vector "
            "argmax is a row-local array_sort fold — 0 exchanges "
            "(the r8 shape shuffled the |corpus|x|bench| crossed "
            "relation through a window).\n"
            "- `bigram_lm_score` scans documents 3x — verified: no "
            "ReusedExchange even with broadcasts disabled (column "
            "pruning makes the three bigram subplans distinct). The "
            "skew-safe trade: a single-scan window formulation (count "
            "over (w1,w2) / (w1)) would funnel hot bigrams through "
            "single reducers, so 3 column-pruned re-scans plus "
            "map-side-combined model aggregates are the 100 TB plan; "
            "production could persist the exploded bigram table "
            "once.\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
