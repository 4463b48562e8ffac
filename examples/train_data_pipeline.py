"""Training-data curation walkthrough: documents → dedup → quality → stats.

The operator families a 100 TB corpus pipeline chains, end to end on the
small synthetic tables, each stage a streaming Ray Data transform:

1. exact dedup (hash-partitioned first-wins)
2. near-dup removal: MinHash → LSH candidates → distributed exact-Jaccard
   verify (no driver-side corpus), drop the higher doc_id of each pair
3. quality + language filters (vectorized batch kernels)
4. token accounting + a shuffle-free HyperLogLog distinct-user profile

    python examples/train_data_pipeline.py [sf_dir]

Prints per-stage row counts and the final kept-corpus token stats.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycdc.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_pairs,
    )
    from raycdc.sketch import approx_ndistinct
    from raycdc.text import lang_id, quality_score, token_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n0 = docs.count()

    # 0. crawl cleanup: strip markup, collapse repeated in-doc paragraphs
    # (pure per-batch maps — zero exchanges)
    from raycdc.text import dedup_paragraphs, strip_markup

    docs = docs.map_batches(
        strip_markup, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(dedup_paragraphs, batch_format="pyarrow", zero_copy_batch=True)

    # 1. exact dedup
    docs = exact_dedup(docs, num_partitions=8)
    n1 = docs.count()

    # 2. near-dup: LSH candidates, distributed Jaccard >= 0.8, drop b side
    sigs = docs.map_batches(minhash_signatures, batch_format="pyarrow")
    pairs = lsh_candidate_pairs(sigs, bands=32, num_partitions=8, distinct=False)
    dup_b = verify_jaccard_pairs(pairs, docs, threshold=0.8, num_partitions=8)
    drop = {int(r["b"]) for r in dup_b.select_columns(["b"]).take_all()}
    drop_ref = ray.put(drop)

    def without_dups(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not d:
            return t
        keep = pc.invert(
            pc.is_in(t["doc_id"], value_set=pa.array(sorted(d), pa.int64()))
        )
        return t.filter(keep)

    docs = docs.map_batches(without_dups, batch_format="pyarrow", zero_copy_batch=True)
    n2 = docs.count()

    # 3. quality + language gates (vectorized; thresholds are demo-level)
    def gated(t: pa.Table) -> pa.Table:
        q = quality_score(t)["quality"]
        lang = lang_id(t)["pred_lang"]
        keep = pc.and_(
            pc.greater(q, 0.3), pc.is_in(lang, value_set=pa.array(["en", "fr", "de"]))
        )
        return t.filter(keep)

    kept = docs.map_batches(gated, batch_format="pyarrow", zero_copy_batch=True)
    n3 = kept.count()

    # 4. scrub: PII redaction + canonical normalization (whole-column RE2)
    from raycdc.text import normalize_text, pack_sequences, redact_text

    kept = kept.map_batches(
        redact_text, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(normalize_text, batch_format="pyarrow", zero_copy_batch=True)

    # 5. token accounting, then pack into fixed 512-token training bins
    stats = kept.map_batches(token_stats, batch_format="pyarrow")
    total_tokens = int(
        stats.aggregate(ray.data.aggregate.Sum("n_tokens"))["sum(n_tokens)"]
    )
    packs = pack_sequences(
        stats.select_columns(["doc_id", "n_tokens"]), budget=512, num_partitions=8
    )
    n_packs = len(packs.select_columns(["pack_id"]).unique("pack_id"))

    # 5b. fluency gate + retrieval chunks: bigram-LM NLL ranks local
    # coherence (one conditioning-token exchange), chunk_tokens splits
    # long docs into overlapping 64-token windows with ZERO exchange
    from raycdc.text import bigram_nll, chunk_tokens

    nll = bigram_nll(kept, num_partitions=8)
    n_fluent = nll.map_batches(
        lambda t: t.filter(pc.less(t["nll"], 8.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).count()
    chunks = kept.map_batches(
        lambda t: chunk_tokens(t, window=64, stride=48),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n_chunks = chunks.count()

    # 6. SEMANTIC layer, no model required: deterministic hashing-trick
    # embeddings (actor-pool stage, text dropped before the exchange) →
    # LSH-bucketed cosine near-dup pairs — the embedding-space sibling of
    # stage 2's MinHash pass
    from raycdc.similarity import embed_text, embedding_near_dup_pairs

    vecs = embed_text(kept, dim=256, id_col="doc_id", concurrency=(1, 4))
    sem_pairs = embedding_near_dup_pairs(
        vecs, threshold=0.9, nbits=4, nprobe=3, id_col="doc_id", num_partitions=8
    )
    n_sem_pairs = sem_pairs.count()

    # 7. shuffle-free profiles of the events stream
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    n_users, rse = approx_ndistinct(events, "user_id", p=12)

    print(f"documents:        {n0}")
    print(f"after exact dedup: {n1}")
    print(f"after near-dup:    {n2}  (dropped {len(drop)} near-duplicates)")
    print(f"after quality/lang gates: {n3}")
    print(f"kept-corpus tokens: {total_tokens} in {n_packs} packs of <=512")
    print(f"semantic near-dup pairs (cos>=0.9 on hashed embeddings): {n_sem_pairs}")
    print(f"fluent docs (bigram nll < 8): {n_fluent}; retrieval chunks: {n_chunks}")
    print(f"distinct users (HLL ±{rse:.1%}): {n_users}")
    assert n0 >= n1 >= n2 >= n3 and total_tokens > 0 and n_packs > 0
    assert n_chunks >= n3 and n_fluent > 0
    print("train_data_pipeline OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
