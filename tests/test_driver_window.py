"""Pin the driver-contract ordering invariant.

The external correctness driver checks only the FIRST 50 ``queries()``
entries (VERDICT.md round 2, finding #1).  These tests make the window
contract explicit: every entry inside the window must carry a DuckDB
oracle (hash-checkable, not rows-only), and the training-data family —
which went driver-unverified in round 2 — must sit inside it.
"""

import __ray_entry__ as entrymod

WINDOW = 50

MUST_BE_IN_WINDOW = [
    # dedup / decontamination / similarity
    "dedup_exact",
    "dedup_incr_near",
    "dup_spans",
    "dedup_minhash",
    "conv_near_dedup",
    "decontaminate",
    "sim_knn_index",
    # CDC disaster recovery (round-3 continuation)
    "cdc_restore",
    # incremental view family: the non-invertible hash-exact flagship
    # (round-5: promoted into the window per VERDICT r4 #3)
    "cdc_extrema_view",
    # the reference's production loop: tail + Router fan-out (round 4)
    "cdc_tail_route",
    # text / tokens / embeddings
    "quality_gate",
    "text_repetition",
    "text_redact",
    "sft_pairs",
    "pack_masks",
    "tfidf_docs",
    "assemble_convs",
    "embed_centroids",
    # relational additions
    "cdc_snapshot_diff",
    "join_full_outer",
    "pivot_user_events",
    "distinct_props_per_user",
    # multimodal codecs + features
    "audio_near_dup",
    "media_bmp",
    "image_near_dup",
    "media_frames",
]


def test_window_entries_all_have_oracles():
    keys = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    window = keys[:WINDOW]
    missing = [k for k in window if k not in oracles]
    assert missing == [], f"driver-window entries without an oracle: {missing}"


def test_training_data_family_inside_window():
    window = set(list(entrymod.queries())[:WINDOW])
    missing = [k for k in MUST_BE_IN_WINDOW if k not in window]
    assert missing == [], f"training-data queries outside the driver window: {missing}"


def test_same_oracle_variants_do_not_crowd_the_window():
    """At most two of the five lww_final-oracle replay variants may occupy
    window slots (cdc_replay + cdc_replay_lake); the rest ride behind."""
    window = list(entrymod.queries())[:WINDOW]
    lww_variants = {
        "cdc_replay",
        "cdc_replay_lake",
        "cdc_replay_salted",
        "cdc_replay_actors",
        "cdc_csv_ingest",
        "cdc_sync_replica",
        # same final-state oracle, but the query itself exercises the
        # snapshot-restore machinery on top of the lake apply path
        "cdc_restore",
    }
    in_window = [k for k in window if k in lww_variants]
    assert len(in_window) <= 2, in_window


def test_every_query_name_unique_and_callable():
    q = entrymod.queries()
    assert len(q) == len(set(q))
    assert all(callable(v) for v in q.values())
