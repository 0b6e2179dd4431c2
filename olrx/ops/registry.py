"""Registry of training-data / analysis operators for the driver contract.

OPS_QUERIES: name → callable(sf_dir) → Dataset | DataFrame | Table
OPS_ORACLES: name → callable(sf_dir) → DuckDB SQL string (omit = rows-only)
"""

from __future__ import annotations

from olrx.ops import (cluster, corpus, curate, dedup, events, multimodal,
                      redact, relational, sampling, similarity, text)

#: ORDER MATTERS: the driver's correctness sweep walks this dict in
#: insertion order under a runtime budget (r3/r4 each covered the first 50
#: of the registry). Rotation policy: the queries the PREVIOUS round's
#: sweep did not reach lead the next round, so every query gets a driver
#: row within two rounds; the heavily-swept dedup/ANN block sits last.
#: r4 swept everything except the final 10 (corpus sampling/vocab, tf-idf,
#: curation, k-means) — those lead r5.
OPS_QUERIES = {
    # unswept in r4 — rotated to the front
    "corpus_sample": sampling.q_corpus_sample,
    "token_vocab": sampling.q_token_vocab,
    "corpus_split": sampling.q_corpus_split,
    "tfidf_sources": corpus.q_tfidf_sources,
    "source_stats": corpus.q_source_stats,
    "token_length_quantiles": sampling.q_token_length_quantiles,
    "sequence_pack": curate.q_sequence_pack,
    "contamination_check": curate.q_contamination,
    "curation_pipeline": curate.q_curation_pipeline,
    "kmeans_embed": cluster.q_kmeans_embed,
    # swept green in r4 (first driver rows for the relational/stream tail)
    "text_redact": redact.q_text_redact,
    "events_asof_join": relational.q_events_asof_join,
    "orders_enrich": relational.q_orders_enrich,
    "events_sliding_window": events.q_events_sliding_window,
    "events_value_quantiles": events.q_events_value_quantiles,
    "events_hourly": events.q_events_hourly,
    "events_sessions": events.q_events_sessions,
    "events_topk_users": events.q_events_topk_users,
    "events_condition_filter": events.q_events_condition_filter,
    # text analysis
    "text_stats": text.q_text_stats,
    "text_quality": text.q_text_quality,
    "lang_id": text.q_lang_id,
    "doc_fingerprints": text.q_fingerprints,
    "text_repetition": text.q_repetition_stats,
    # multimodal plumbing
    "media_features": multimodal.q_media_features,
    "media_frames": multimodal.q_media_frames,
    "media_resize": multimodal.q_media_resize,
    "media_stats": multimodal.q_media_stats,
    # dedup (green every round since r2 — safe to fall off the end)
    "dedup_exact": dedup.q_dedup_exact,
    "dedup_minhash": dedup.q_dedup_minhash,
    "dedup_minhash_dist": dedup.q_dedup_minhash_dist,
    "dedup_minhash_pairs": dedup.q_dedup_minhash_pairs,
    "dedup_ngram": dedup.q_dedup_ngram,
    "dedup_simhash": dedup.q_dedup_simhash,
    "dedup_keep_best": dedup.q_dedup_keep_best,
    "embedding_pairs_exact": dedup.q_embedding_pairs_exact,
    "embedding_neardup_lsh": dedup.q_embedding_neardup_lsh,
    "embedding_neardup_recall": dedup.q_embedding_neardup_recall,
    "semantic_purge": dedup.q_semantic_purge,
    # similarity search
    "ann_bruteforce": similarity.q_ann_bruteforce,
    "ann_lsh": similarity.q_ann_lsh,
    "ann_ivf": similarity.q_ann_ivf,
    "ann_ivf_recall": similarity.q_ann_ivf_recall,
}

OPS_ORACLES = {
    "text_redact": redact.sql_text_redact,
    "text_stats": text.sql_text_stats,
    "lang_id": text.sql_lang_id,
    "doc_fingerprints": text.sql_fingerprints,
    "text_repetition": text.sql_repetition_stats,
    "dedup_exact": dedup.sql_dedup_exact,
    "dedup_simhash": dedup.sql_dedup_simhash,
    "dedup_minhash": dedup.sql_dedup_minhash,
    "dedup_minhash_dist": dedup.sql_dedup_minhash,  # identical closure
    "dedup_minhash_pairs": dedup.sql_dedup_minhash_pairs,
    "dedup_ngram": dedup.sql_dedup_ngram,
    "dedup_keep_best": dedup.sql_dedup_keep_best,
    "embedding_pairs_exact": dedup.sql_embedding_pairs_exact,
    "embedding_neardup_lsh": dedup.sql_embedding_neardup_lsh,
    "embedding_neardup_recall": dedup.sql_embedding_neardup_recall,
    "semantic_purge": dedup.sql_semantic_purge,
    "ann_bruteforce": similarity.sql_ann_bruteforce,
    "ann_lsh": similarity.sql_ann_lsh,
    "ann_ivf": similarity.sql_ann_ivf,
    "ann_ivf_recall": similarity.sql_ann_ivf_recall,
    "media_features": multimodal.sql_media_features,
    "media_frames": multimodal.sql_media_frames,
    "media_resize": multimodal.sql_media_resize,
    "media_stats": multimodal.sql_media_stats,
    "corpus_sample": sampling.sql_corpus_sample,
    "token_vocab": sampling.sql_token_vocab,
    "corpus_split": sampling.sql_corpus_split,
    "tfidf_sources": corpus.sql_tfidf_sources,
    "source_stats": corpus.sql_source_stats,
    "token_length_quantiles": sampling.sql_token_length_quantiles,
    "sequence_pack": curate.sql_sequence_pack,
    "contamination_check": curate.sql_contamination,
    "curation_pipeline": curate.sql_curation_pipeline,
    "kmeans_embed": cluster.sql_kmeans_embed,
    "events_asof_join": relational.sql_events_asof_join,
    "orders_enrich": relational.sql_orders_enrich,
    "events_hourly": events.sql_events_hourly,
    "events_sliding_window": events.sql_events_sliding_window,
    "events_value_quantiles": events.sql_events_value_quantiles,
    "events_sessions": events.sql_events_sessions,
    "events_topk_users": events.sql_events_topk_users,
    "events_condition_filter": events.sql_events_condition_filter,
    "text_quality": text.sql_text_quality,
}
