"""Driver contract for the graft builder (Ray Data target).

entry(): flagship KG-construction pipeline (north rule) over the
deterministic synthetic transcript table at smoke scale.

queries(): one entry per implemented operator family from SURVEY.md §2
plus the training-data additions.  Entries with a matching oracle_sql()
key are value-checked against DuckDB; KG/reasoner/near-dup entries are
not SQL-expressible and get the rows-only check.

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/shutdown() here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from rdf_n3_ray.datatune import tune_data_context
from rdf_n3_ray.malloctune import tune_malloc

# tune the (already-running) driver process: this host has first-touch
# allocation-latency episodes (see rdf_n3_ray/malloctune.py); Ray's
# workers predate this import, but driver-side folds/merges benefit
tune_malloc()
tune_data_context()  # polars sort path (rdf_n3_ray/datatune.py)


def entry() -> Any:
    """Flagship: synthetic transcripts -> parse -> skolemize -> link ->
    dedup -> sorted canonical triples (north-rule pipeline)."""
    from rdf_n3_ray.pipelines.kg import build_kg_dataset
    from rdf_n3_ray.sources.transcripts import transcripts_dataset

    ts = transcripts_dataset(n_convs=60, turns_per_conv=8)
    return build_kg_dataset(ts)


def _kg_scale(sf_dir: str) -> tuple[int, int]:
    if "0.1" in sf_dir:
        return 400, 12
    if "0.01" in sf_dir:
        return 150, 10
    return 60, 8


# --- KG / parser / reasoner queries (not SQL-expressible: rows-only) ----

def _q_kg_triples(sf_dir: str):
    from rdf_n3_ray.pipelines.kg import build_kg_dataset
    from rdf_n3_ray.sources.transcripts import transcripts_dataset

    n, t = _kg_scale(sf_dir)
    return build_kg_dataset(transcripts_dataset(n_convs=n, turns_per_conv=t))


def _q_parse_turns(sf_dir: str):
    from rdf_n3_ray.sources.transcripts import transcripts_dataset
    from rdf_n3_ray.stages.parse_stage import parse_transcripts

    n, t = _kg_scale(sf_dir)
    return parse_transcripts(transcripts_dataset(n_convs=n, turns_per_conv=t))


def _q_reason_turns(sf_dir: str):
    from rdf_n3_ray.pipelines.reasoning import reason_transcripts
    from rdf_n3_ray.sources.transcripts import transcripts_dataset

    n, t = _kg_scale(sf_dir)
    n = max(20, n // 4)  # reasoning is per-turn; keep the check fast
    return reason_transcripts(transcripts_dataset(n_convs=n, turns_per_conv=t))


def _q_serialize_turns(sf_dir: str):
    from rdf_n3_ray.serializer.n3_writer import serialize_documents
    from rdf_n3_ray.sources.transcripts import transcripts_dataset
    from rdf_n3_ray.stages.parse_stage import parse_transcripts

    n, t = _kg_scale(sf_dir)
    triples = parse_transcripts(
        transcripts_dataset(n_convs=max(20, n // 4), turns_per_conv=t)
    )
    return serialize_documents(triples)


def _q_minhash_pairs(sf_dir: str):
    from rdf_n3_ray.pipelines.relational import minhash_pairs

    return minhash_pairs(sf_dir, threshold=0.5)


def _q_simhash(sf_dir: str):
    from rdf_n3_ray.pipelines.relational import simhash_docs

    return simhash_docs(sf_dir)


def _q_lang_id(sf_dir: str):
    from rdf_n3_ray.pipelines.relational import lang_distribution

    return lang_distribution(sf_dir)


def _q_media_features(sf_dir: str):
    import ray.data as rd

    from rdf_n3_ray.stages.multimodal import decode_pipeline, synthetic_media_table

    media = rd.from_arrow(synthetic_media_table(n=48))
    features, _ = decode_pipeline(media)
    return features


def _q_audio_windows(sf_dir: str):
    import ray.data as rd

    from rdf_n3_ray.stages.multimodal import (audio_windows,
                                              synthetic_media_table)

    media = rd.from_arrow(synthetic_media_table(n=48))
    return audio_windows(media)


def _q_embed_kmeans(sf_dir: str):
    import os

    import ray.data as rd

    from rdf_n3_ray.stages.cluster import kmeans_cluster_profile

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return kmeans_cluster_profile(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    """Contract entries, ordered for the driver's correctness sweep.

    The driver records at most 50 entries per round, taken in dict
    order.  Across rounds 1-4 it covered 74 of the (now) 111 entries;
    37 have NEVER received a driver row (they are green under
    scripts/selfcheck.py — the same gate — but the hard artifact must
    show it).  Round-5 ordering therefore puts those 37 first, then
    the 24 last checked in r03, then the 50 the driver hash-verified
    in r04 — so CORRECTNESS_r05's window lands on exactly the
    longest-uncovered entries.
    """
    from rdf_n3_ray.pipelines import relational as R

    return {
        # === never driver-checked in ANY round (37; oracle-backed
        #     first, rows-only last — all inside the 50 window) ====
        "dup_gram_pairs": R.dup_gram_pairs,
        "doc_dup_rate": R.doc_dup_rate,
        "curation_verdict": R.curation_verdict,
        "source_report": R.source_report,
        "domain_resample": R.domain_resample,
        "pack_sequences": R.pack_sequences,
        "winnow_fingerprints": R.winnow_fingerprints,
        "winnow_dup_pairs": R.winnow_dup_pairs,
        "phrase_search": R.phrase_search,
        "tfidf_search": R.tfidf_search,
        "revenue_forecast": R.revenue_forecast,
        "returned_top_customers": R.returned_top_customers,
        "large_orders": R.large_orders,
        "nation_trade_volume": R.nation_trade_volume,
        "brand_disjunct_revenue": R.brand_disjunct_revenue,
        "doc_rarity": R.doc_rarity,
        "event_zscore": R.event_zscore,
        "top_bigrams": R.top_bigrams,
        "bigram_pmi": R.bigram_pmi,
        "user_retention": R.user_retention,
        "event_funnel": R.event_funnel,
        "sole_late_supplier": R.sole_late_supplier,
        "market_share": R.market_share,
        "type_cooccurrence": R.type_cooccurrence,
        "search_index": R.search_index,
        "top_supplier_revenue": R.top_supplier_revenue,
        "late_shipment_priority": R.late_shipment_priority,
        "simhash_pairs": R.simhash_pairs,
        "min_cost_supplier": R.min_cost_supplier,
        "product_type_profit": R.product_type_profit,
        "important_part_value": R.important_part_value,
        "supplier_part_counts": R.supplier_part_counts,
        "top_part_shippers": R.top_part_shippers,
        # rows-only members of the never-checked group:
        # ann_pq/ann_ivfpq (k-means PQ codebooks: no SQL twin; ann_
        # ivfpq at nprobe==all is pytest-pinned == ann_pq),
        # embed_kmeans (iterative fit; pins blob recovery +
        # monotone objective), semdedup (keep-list invariants
        # pytest-pinned)
        "ann_pq": R.ann_pq,
        "ann_ivfpq": R.ann_ivfpq,
        "embed_kmeans": _q_embed_kmeans,
        "semdedup": R.semdedup,
        # === last driver-checked in r03 (24; first 13 land in the
        #     window) =============================================
        "decontaminate": R.decontaminate,
        "top_tokens": R.top_tokens,
        "event_histogram": R.event_histogram,
        "events_sliding": R.events_sliding,
        "event_percentiles": R.event_percentiles,
        "distinct_users_by_type": R.distinct_users_by_type,
        "percentiles_by_type": R.percentiles_by_type,
        "shipping_priority": R.shipping_priority,
        "top_event_per_user": R.top_event_per_user,
        "user_running_total": R.user_running_total,
        "local_supplier_volume": R.local_supplier_volume,
        "small_qty_revenue": R.small_qty_revenue,
        "events_rollup": R.events_rollup,
        # --- the 50-entry driver window likely ends here ---------
        "pii_scrub": R.pii_scrub,
        "order_priority_exists": R.order_priority_exists,
        "customer_order_distribution": R.customer_order_distribution,
        "event_props_agg": R.event_props_agg,
        "train_val_split": R.train_val_split,
        "stratified_sample": R.stratified_sample,
        "promo_revenue": R.promo_revenue,
        "above_avg_low_activity": R.above_avg_low_activity,
        "doc_repetition": R.doc_repetition,
        "keyword_search": R.keyword_search,
        "approx_distinct_users": R.approx_distinct_users,
        # === driver hash-verified most recently in r04 (50) ======
        "lineitem_agg": R.lineitem_agg,
        "orders_by_nation": R.orders_by_nation,
        "top_events": R.top_events,
        "events_hourly": R.events_hourly,
        "event_types": R.event_types,
        "doc_token_stats": R.doc_token_stats,
        "dedup_exact_docs": R.dedup_exact_docs,
        "ann_topk": R.ann_topk,
        "doc_quality": R.doc_quality,
        "embed_cosine_dups": R.embed_cosine_dups,
        "sessionize": R.sessionize,
        "user_event_seq": R.user_event_seq,
        "event_mad": R.event_mad,
        "event_quantile_buckets": R.event_quantile_buckets,
        "rolling_active_users": R.rolling_active_users,
        "knn_graph": R.knn_graph,
        "source_token_gini": R.source_token_gini,
        "label_centroids": R.label_centroids,
        "session_duration_percentiles": R.session_duration_percentiles,
        "doc_ttr": R.doc_ttr,
        "heavy_hitter_tokens": R.heavy_hitter_tokens,
        "event_mad_by_type": R.event_mad_by_type,
        "user_gap_percentiles": R.user_gap_percentiles,
        "knn_label_accuracy": R.knn_label_accuracy,
        "late_event_audit": R.late_event_audit,
        "dedup_normalized_docs": R.dedup_normalized_docs,
        "events_heatmap": R.events_heatmap,
        "asof_join": R.asof_join_orders,
        "range_join_attrib": R.range_join_attrib,
        "revenue_by_priority": R.revenue_by_priority,
        "nations_without_suppliers": R.nations_without_suppliers,
        "part_brand_stats": R.part_brand_stats,
        "kg_triples": _q_kg_triples,
        "parse_turns": _q_parse_turns,
        "reason_turns": _q_reason_turns,
        "serialize_turns": _q_serialize_turns,
        "minhash_pairs": _q_minhash_pairs,
        "simhash": _q_simhash,
        "lang_id": _q_lang_id,
        "media_features": _q_media_features,
        "audio_windows": _q_audio_windows,
        "ann_ivf": R.ann_ivf,
        "ann_ivf_exact": R.ann_ivf_exact,
        "jaccard_dup_groups": R.jaccard_dup_groups,
        "dup_groups_cc": R.dup_groups_cc,
        "near_dedup_keep": R.near_dedup_keep,
        "dup_rate_by_source": R.dup_rate_by_source,
        "trade_pagerank": R.trade_pagerank,
        "triangle_count": R.triangle_count,
        "events_profile": R.events_profile,
    }


def oracle_sql() -> dict[str, str]:
    from rdf_n3_ray.pipelines import relational as R

    return {
        "lineitem_agg": R.LINEITEM_AGG_SQL,
        "orders_by_nation": R.ORDERS_BY_NATION_SQL,
        "top_events": R.TOP_EVENTS_SQL,
        "events_hourly": R.EVENTS_HOURLY_SQL,
        "event_types": R.EVENT_TYPES_SQL,
        "doc_token_stats": R.DOC_TOKEN_STATS_SQL,
        "dedup_exact_docs": R.DEDUP_EXACT_SQL,
        "ann_topk": R.ANN_TOPK_SQL,
        "ann_ivf_exact": R.ANN_TOPK_SQL,
        "doc_quality": R.DOC_QUALITY_SQL,
        "embed_cosine_dups": R.EMBED_COSINE_DUPS_SQL,
        "sessionize": R.SESSIONIZE_SQL,
        "user_event_seq": R.USER_EVENT_SEQ_SQL,
        "event_mad": R.EVENT_MAD_SQL,
        "event_quantile_buckets": R.EVENT_QUANTILE_BUCKETS_SQL,
        "rolling_active_users": R.ROLLING_ACTIVE_USERS_SQL,
        "knn_graph": R.KNN_GRAPH_SQL,
        "source_token_gini": R.SOURCE_TOKEN_GINI_SQL,
        "label_centroids": R.LABEL_CENTROIDS_SQL,
        "session_duration_percentiles": R.SESSION_DURATION_PERCENTILES_SQL,
        "doc_ttr": R.DOC_TTR_SQL,
        "heavy_hitter_tokens": R.HEAVY_HITTER_TOKENS_SQL,
        "event_mad_by_type": R.EVENT_MAD_BY_TYPE_SQL,
        "user_gap_percentiles": R.USER_GAP_PERCENTILES_SQL,
        "knn_label_accuracy": R.KNN_LABEL_ACCURACY_SQL,
        "late_event_audit": R.LATE_EVENT_AUDIT_SQL,
        "dedup_normalized_docs": R.DEDUP_NORMALIZED_SQL,
        "events_heatmap": R.EVENTS_HEATMAP_SQL,
        "asof_join": R.ASOF_JOIN_SQL,
        "range_join_attrib": R.RANGE_JOIN_ATTRIB_SQL,
        "revenue_by_priority": R.REVENUE_BY_PRIORITY_SQL,
        "nations_without_suppliers": R.NATIONS_WITHOUT_SUPPLIERS_SQL,
        "part_brand_stats": R.PART_BRAND_STATS_SQL,
        # exact-recompute oracles for the approximate/near-dup family
        "minhash_pairs": R.MINHASH_PAIRS_SQL,
        "jaccard_dup_groups": R.JACCARD_GROUPS_SQL,
        "dup_groups_cc": R.JACCARD_GROUPS_SQL,
        "near_dedup_keep": R.NEAR_DEDUP_KEEP_SQL,
        "dup_rate_by_source": R.DUP_RATE_BY_SOURCE_SQL,
        "trade_pagerank": R.TRADE_PAGERANK_SQL,
        "triangle_count": R.TRIANGLE_COUNT_SQL,
        "events_profile": R.EVENTS_PROFILE_SQL,
        "simhash": R.SIMHASH_SQL,
        "lang_id": R.LANG_ID_SQL,
        "decontaminate": R.DECONTAMINATE_SQL,
        "dup_gram_pairs": R.DUP_GRAM_PAIRS_SQL,
        "doc_dup_rate": R.DOC_DUP_RATE_SQL,
        "curation_verdict": R.CURATION_VERDICT_SQL,
        "source_report": R.SOURCE_REPORT_SQL,
        "domain_resample": R.DOMAIN_RESAMPLE_SQL,
        "pack_sequences": R.PACK_SEQUENCES_SQL,
        "winnow_fingerprints": R.WINNOW_FP_SQL,
        "winnow_dup_pairs": R.WINNOW_DUP_PAIRS_SQL,
        "top_tokens": R.TOP_TOKENS_SQL,
        "event_histogram": R.EVENT_HISTOGRAM_SQL,
        "events_sliding": R.EVENTS_SLIDING_SQL,
        "event_percentiles": R.EVENT_PERCENTILES_SQL,
        "distinct_users_by_type": R.DISTINCT_USERS_SQL,
        "percentiles_by_type": R.PERCENTILES_BY_TYPE_SQL,
        "shipping_priority": R.SHIPPING_PRIORITY_SQL,
        "top_event_per_user": R.TOP_EVENT_PER_USER_SQL,
        "user_running_total": R.USER_RUNNING_TOTAL_SQL,
        "local_supplier_volume": R.LOCAL_SUPPLIER_VOLUME_SQL,
        "small_qty_revenue": R.SMALL_QTY_REVENUE_SQL,
        "events_rollup": R.EVENTS_ROLLUP_SQL,
        "pii_scrub": R.PII_SCRUB_SQL,
        "order_priority_exists": R.ORDER_PRIORITY_EXISTS_SQL,
        "customer_order_distribution": R.CUSTOMER_ORDER_DISTRIBUTION_SQL,
        "event_props_agg": R.EVENT_PROPS_AGG_SQL,
        "train_val_split": R.TRAIN_VAL_SPLIT_SQL,
        "stratified_sample": R.STRATIFIED_SAMPLE_SQL,
        "promo_revenue": R.PROMO_REVENUE_SQL,
        "above_avg_low_activity": R.ABOVE_AVG_LOW_ACTIVITY_SQL,
        "doc_repetition": R.DOC_REPETITION_SQL,
        "keyword_search": R.KEYWORD_SEARCH_SQL,
        "phrase_search": R.PHRASE_SEARCH_SQL,
        "tfidf_search": R.TFIDF_SEARCH_SQL,
        "revenue_forecast": R.REVENUE_FORECAST_SQL,
        "returned_top_customers": R.RETURNED_TOP_CUSTOMERS_SQL,
        "large_orders": R.LARGE_ORDERS_SQL,
        "nation_trade_volume": R.NATION_TRADE_VOLUME_SQL,
        "brand_disjunct_revenue": R.BRAND_DISJUNCT_REVENUE_SQL,
        "doc_rarity": R.DOC_RARITY_SQL,
        "event_zscore": R.EVENT_ZSCORE_SQL,
        "top_bigrams": R.TOP_BIGRAMS_SQL,
        "bigram_pmi": R.BIGRAM_PMI_SQL,
        "user_retention": R.USER_RETENTION_SQL,
        "event_funnel": R.EVENT_FUNNEL_SQL,
        "sole_late_supplier": R.SOLE_LATE_SUPPLIER_SQL,
        "market_share": R.MARKET_SHARE_SQL,
        "type_cooccurrence": R.TYPE_COOCCURRENCE_SQL,
        "search_index": R.SEARCH_INDEX_SQL,
        "top_supplier_revenue": R.TOP_SUPPLIER_REVENUE_SQL,
        "late_shipment_priority": R.LATE_SHIPMENT_PRIORITY_SQL,
        "simhash_pairs": R.SIMHASH_PAIRS_SQL,
        "min_cost_supplier": R.MIN_COST_SUPPLIER_SQL,
        "product_type_profit": R.PRODUCT_TYPE_PROFIT_SQL,
        "important_part_value": R.IMPORTANT_PART_VALUE_SQL,
        "supplier_part_counts": R.SUPPLIER_PART_COUNTS_SQL,
        "top_part_shippers": R.TOP_PART_SHIPPERS_SQL,
    }
