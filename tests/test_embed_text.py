"""Embedding GENERATION stage (similarity.HashingEmbedder / embed_text):
determinism, null handling, and planted-twin recall of the composed
text → embed → near-dup pipeline."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from raycdc.similarity import HashingEmbedder, embed_text, embedding_near_dup_pairs

POOL = [f"w{k:03d}" for k in range(200)]


def _mix(x: int) -> int:
    """splitmix64 avalanche — linear index walks would correlate families
    (the media-fixture lesson from CLAUDE.md)."""
    x = (x * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _corpus(n_families: int = 40, words_per_doc: int = 30):
    """Deterministic corpus: each family is one base doc + one TWIN with a
    single word substituted; word indices come from a splitmix avalanche
    over (family, position), so families draw decorrelated samples of a
    200-word pool."""
    ids, texts, families = [], [], []
    for f in range(n_families):
        idx = [_mix((f << 20) | i) % len(POOL) for i in range(words_per_doc)]
        base = [POOL[j] for j in idx]
        twin = list(base)
        mid = words_per_doc // 2
        twin[mid] = POOL[(idx[mid] + 101) % len(POOL)]
        ids += [2 * f, 2 * f + 1]
        texts += [" ".join(base), " ".join(twin)]
        families += [f, f]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "family": pa.array(families, pa.int64()),
        }
    )


def test_embedder_deterministic_and_null_safe():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d", None, ""]),
        }
    )
    e1, e2 = HashingEmbedder(dim=64)(t), HashingEmbedder(dim=64)(t)
    m1 = np.stack([np.array(v) for v in e1["embedding"].to_pylist()])
    m2 = np.stack([np.array(v) for v in e2["embedding"].to_pylist()])
    assert np.array_equal(m1, m2)
    assert np.linalg.norm(m1[1]) == 0.0  # null text → zero vector
    assert np.linalg.norm(m1[2]) == 0.0  # empty text → zero vector
    assert abs(np.linalg.norm(m1[0]) - 1.0) < 1e-6  # unit-normalized
    assert e1["embedding"].type == pa.list_(pa.float32(), 64)


def test_embedder_twin_cosine_dominates_cross_family():
    t = _corpus(n_families=12)
    out = HashingEmbedder(dim=256)(t)
    m = np.stack([np.array(v) for v in out["embedding"].to_pylist()])
    cos = m @ m.T
    n = len(t)
    fam = np.array(t["family"].to_pylist())
    twin_mask = (fam[:, None] == fam[None, :]) & ~np.eye(n, dtype=bool)
    cross_mask = fam[:, None] != fam[None, :]
    assert cos[twin_mask].min() > 0.9
    assert cos[cross_mask].max() < 0.5


def test_end_to_end_planted_twin_recall(ray_session):
    """text → actor-pool embed → LSH-bucketed near-dup pairs must recover
    EVERY planted twin pair and nothing across families."""
    t = _corpus(n_families=40)
    ds = ray.data.from_arrow(t).repartition(4)
    vecs = embed_text(ds, dim=256, id_col="doc_id", concurrency=(1, 2))
    pairs_ds = embedding_near_dup_pairs(
        vecs, threshold=0.85, nbits=4, nprobe=3, id_col="doc_id", num_partitions=8
    )
    parts = [p for p in ray.get(pairs_ds.to_arrow_refs()) if p.num_rows]
    got = set()
    if parts:
        pt = pa.concat_tables(parts)
        got = set(zip(pt["a"].to_pylist(), pt["b"].to_pylist()))
    expected = {(2 * f, 2 * f + 1) for f in range(40)}
    missing = expected - got
    extra = got - expected
    assert not missing, f"planted twins not recovered: {sorted(missing)[:5]}"
    assert not extra, f"cross-family false pairs: {sorted(extra)[:5]}"


def test_embed_text_drops_text_and_keeps_requested_cols(ray_session):
    t = _corpus(n_families=4)
    ds = ray.data.from_arrow(t)
    out = embed_text(ds, dim=64, id_col="doc_id", keep_cols=("family",))
    sch = out.schema().names
    assert "text" not in sch and set(sch) == {"doc_id", "embedding", "family"}
