"""Regression pins for the round-3 continuation review findings:
batch_lsn misuse in the incremental dedup paths must fail fast (silent
index stagnation otherwise), zero-shingle docs must not SimHash-pair,
and degenerate LSH band counts must be rejected."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raycdc import dedup as D


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows),
            }
        )
    )


def test_incremental_dedup_requires_batch_lsn(ray_session, tmp_path):
    with pytest.raises(ValueError, match="batch_lsn is required"):
        D.incremental_dedup(_docs(["a b c"]), str(tmp_path / "idx"))


def test_incremental_dedup_rejects_stale_batch_lsn(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    D.incremental_dedup(_docs(["alpha beta"]), idx, batch_lsn=5, num_partitions=4)
    with pytest.raises(ValueError, match="behind the index position"):
        D.incremental_dedup(_docs(["gamma delta"]), idx, batch_lsn=4, num_partitions=4)
    # reusing the CURRENT position (crash-retry of the same batch) stays legal
    D.incremental_dedup(_docs(["alpha beta"]), idx, batch_lsn=5, num_partitions=4)


def test_incremental_near_dedup_lsn_guards(ray_session, tmp_path):
    idx = str(tmp_path / "nidx")
    text = "the quick brown fox jumps over the lazy dog " * 3
    with pytest.raises(ValueError, match="batch_lsn is required"):
        D.incremental_near_dedup(_docs([text]), idx)
    D.incremental_near_dedup(_docs([text]), idx, batch_lsn=10, num_partitions=4)
    with pytest.raises(ValueError, match="behind the index position"):
        D.incremental_near_dedup(
            _docs([text + " tail"]), idx, batch_lsn=3, num_partitions=4
        )


def test_simhash_zero_shingle_docs_never_pair(ray_session):
    """600 one-token docs (shorter than shingle_k=2 → zero shingles) all
    used to share the all-zero signature and pair at hamming 0."""
    t = pa.table(
        {
            "doc_id": pa.array(range(600), pa.int64()),
            "text": pa.array([f"w{i}" for i in range(600)]),
        }
    )
    sigs = ray.data.from_arrow(t).map_batches(
        D.simhash_signatures, batch_format="pyarrow"
    )
    pairs = D.simhash_candidate_pairs(sigs, num_partitions=4).take_all()
    assert pairs == []


def test_simhash_real_docs_still_pair(ray_session):
    base = "the quick brown fox jumps over the lazy dog"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, base, "completely different words here"]),
        }
    )
    sigs = ray.data.from_arrow(t).map_batches(
        D.simhash_signatures, batch_format="pyarrow"
    )
    pairs = D.simhash_candidate_pairs(sigs, num_partitions=2).take_all()
    assert {(p["a"], p["b"]) for p in pairs} == {(0, 1)}
    assert all(p["hamming"] == 0 for p in pairs)


def test_lsh_band_rows_rejects_degenerate_bands():
    sig = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.arange(128, dtype=np.int64)), 128
            ),
        }
    )
    with pytest.raises(ValueError, match="must divide num_perm"):
        D.lsh_band_rows(sig, bands=200)
    with pytest.raises(ValueError, match="must divide num_perm"):
        D.lsh_band_rows(sig, bands=48)
    out = D.lsh_band_rows(sig, bands=32)  # valid divisor unchanged
    assert len(out) == 32
