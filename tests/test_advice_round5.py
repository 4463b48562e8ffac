"""Round-5 ADVICE fixes: knn_ivfpq order-independent query ids,
prune_segments listing-cache invalidation on duplicate journal entries,
maintain_extrema NULL-value semantics, matrix_to_binary offset overflow."""

import datetime as dt
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

import raycdc.similarity as S
from raycdc.changelog import synthetic_changelog
from raycdc.engine import prune_segments, read_lake, replay, tail_once
from raycdc.schema import TableSpec
from raycdc.storage import get_storage


# ---------------------------------------------------------------------------
# knn_ivfpq: public API must not require ascending query_ids


def test_ivfpq_unsorted_query_ids_match_sorted(ray_session):
    emb = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    m = S._to_matrix(emb["embedding"])
    ids = emb["vec_id"].to_numpy()
    q, qids = m[:6], ids[:6].astype(np.int64)
    kw = dict(k=5, n_lists=8, nprobe=2, m_sub=4, num_partitions=8)
    ds = ray.data.from_arrow(emb)
    fwd = S.knn_ivfpq(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    # same queries, REVERSED caller order: exact rerank must map each
    # candidate back to the right query vector regardless of id order
    rev = (
        S.knn_ivfpq(ds, q[::-1].copy(), qids[::-1].copy(), **kw)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    assert fwd.reset_index(drop=True).equals(rev.reset_index(drop=True))


# ---------------------------------------------------------------------------
# prune_segments: duplicate journal entry degrades to 'missing', no raise


def test_prune_duplicate_journal_entry_reports_missing(ray_session, tmp_path):
    watch = tmp_path / "wal"
    watch.mkdir()
    log = synthetic_changelog(n_events=200, seed=511)
    seg_path = os.path.join(str(watch), "seg-000.parquet")
    pq.write_table(log, seg_path)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    tail_once(str(watch), lake, spec)
    # simulate a duplicate delivery that slipped into the journal twice
    journal = os.path.join(lake, "_segments.jsonl")
    with open(journal, "a") as f:
        f.write(json.dumps(seg_path) + "\n")
    res = prune_segments(lake, keep_last=0).to_pandas()
    statuses = res[res["path"] == seg_path]["status"].tolist()
    assert statuses == ["pruned", "missing"]
    assert not os.path.exists(seg_path)


# ---------------------------------------------------------------------------
# maintain_extrema: NULL values ignored (SQL MIN/MAX), all-null tombstones


def test_maintain_extrema_ignores_null_values(ray_session, tmp_path):
    from raycdc.engine import maintain_extrema

    spec = TableSpec(
        name="scores",
        schema=pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("item", pa.int32()),
                pa.field("score", pa.int64()),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("conv_id", "item"),
        version_cols=("ts", "lsn"),
        partition_key="conv_id",
        num_partitions=4,
        sort_cols=("conv_id", "item"),
    )
    rows = [
        ("c1", 0, 5),
        ("c1", 1, None),  # NULL value must not poison min/max or count
        ("c1", 2, 9),
        ("c2", 0, None),  # all-null group must drop out entirely
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "item": pa.array([r[1] for r in rows], pa.int32()),
            "score": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "op": pa.array(["insert"] * len(rows)),
            "lsn": pa.array(np.arange(len(rows), dtype=np.int64)),
        }
    )
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(ray.data.from_arrow(t), src, spec)
    maintain_extrema(
        src, view, group_col="conv_id", value_col="score", spec=spec,
        num_partitions=4,
    )
    parts = [
        p
        for p in ray.get(
            read_lake(view, TableSpec(num_partitions=4)).to_arrow_refs()
        )
        if p.num_rows
    ]
    vt = pa.concat_tables(parts).to_pandas().set_index("conv_id")
    assert set(vt.index) == {"c1"}
    assert (
        int(vt.loc["c1", "vmin"]),
        int(vt.loc["c1", "vmax"]),
        int(vt.loc["c1", "n_rows"]),
    ) == (5, 9, 2)


# ---------------------------------------------------------------------------
# matrix_to_binary: int32 offset overflow must raise, never wrap


def test_matrix_to_binary_overflow_raises():
    from raycdc.sketch import matrix_to_binary

    m = 4096
    rows = (np.iinfo(np.int32).max // m) + 1
    # broadcast view: huge logical shape, no physical allocation — the
    # guard must fire before any buffer is built
    mat = np.broadcast_to(np.zeros(m, dtype=np.uint8), (rows, m))
    with pytest.raises(ValueError, match="overflows int32"):
        matrix_to_binary(mat)


def test_matrix_to_binary_roundtrip_still_exact():
    from raycdc.sketch import matrix_to_binary, registers_matrix

    rng = np.random.default_rng(5)
    mat = rng.integers(0, 256, size=(37, 16), dtype=np.uint8)
    arr = matrix_to_binary(mat)
    assert np.array_equal(registers_matrix(arr, 16), mat)
