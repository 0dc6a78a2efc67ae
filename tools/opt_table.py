#!/usr/bin/env python
"""Emit the OPTIMIZATION_r12 before/after lane table (markdown) from two
bench stdout JSON files. Usage: opt_table.py before.json after.json"""
import json
import sys

OPT = {
    "curation_pipeline", "lm_perplexity", "dsir_resample", "ppl_buckets",
    "quality_classifier", "bm25_search", "hybrid_search", "dedup_ngram",
    "dedup_verified", "corpus_curation", "dedup_clusters", "ann_ivfpq",
    "mixture_sample", "winnow_overlap", "winnow_families",
    "boilerplate_removal", "part_communities", "association_rules",
    "bm25_incremental",
}
INHERENT = {
    "part_scc", "part_hits", "bpe_train_incremental", "text_stats",
    "dedup_embedding_incremental", "dedup_simhash_incremental",
    "dedup_minhash_incremental", "dedup_forget", "setjoin_pairs",
    "cdc_merge_into", "streaming_cms_parts", "streaming_sessions",
    "streaming_hll_users", "streaming_hourly", "streaming_exactly_once",
    "streaming_ingest_dedup", "streaming_cdc", "streaming_change_feed",
    "sn_families", "sn_candidate_pairs", "customer_entities", "psi_drift",
    "value_outliers", "order_rank_stats_scalable", "ann_ndcg",
    "item_cf_recs", "item_neighbors", "bfs_distances", "part_distances",
    "part_reachability", "pagerank_parts", "pagerank_weighted",
    "ppr_parts", "part_triangles", "kcore_parts", "part_walks",
    "part_routes", "winnow_incremental", "dedup_embedding",
    "dedup_simhash", "dedup_minhash", "dedup_exact", "substring_dedup",
    "dedup_editdist", "semantic_dedup", "dedup_embedding_lsh",
    "customer_linkage", "decontaminate", "ann_recall",
}
# Measured every pass (movement tracks the anchors), plan audited in a
# prior round, untouched this round, queued for the r13 sweep.
MID = {
    "value_bins", "funnel_latency", "four_stage_recs",
    "bloom_join_revenue", "negative_samples", "source_overlap",
    "embedding_pc1", "value_quantiles_scalable", "orders_replica_diff",
    "heavy_parts", "phrase_search", "cms_part_counts", "region_revenue",
    "orders_point_lookup", "cdc_replication",
}


def load(p):
    d = json.loads(open(p).read().strip().splitlines()[-1])
    return d


def main():
    b, a = load(sys.argv[1]), load(sys.argv[2])
    bq = {k: v for k, v in b["queries"].items() if v is not None}
    aq = {k: v for k, v in a["queries"].items() if v is not None}
    print("| lane | before s | after s | class |")
    print("|---|---|---|---|")
    for k in sorted(set(bq) | set(aq), key=lambda k: -(bq.get(k) or 0)):
        cls = ("OPT" if k in OPT else
               "INHERENT" if k in INHERENT else
               "MID" if k in MID else "CHEAP")
        bb = f"{bq[k]:.2f}" if k in bq else "—"
        aa = f"{aq[k]:.2f}" if k in aq else "—"
        print(f"| {k} | {bb} | {aa} | {cls} |")


if __name__ == "__main__":
    main()
