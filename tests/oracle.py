"""Pure-python reference replay — the test oracle for LWW semantics.

Deliberately naive (dict + per-row loop): correctness yardstick only,
mirroring the reference's golden-file assert style
(`/root/reference/contrib/handlers/handlers_test.go:33-51`).
"""

from __future__ import annotations

import pyarrow as pa


def python_lww_replay(
    tables: list[pa.Table],
    key_cols=("conv_id", "turn_idx"),
    version_cols=("ts", "lsn"),
    op_col="op",
) -> dict[tuple, dict]:
    """Final state: key -> winning row dict (deletes removed)."""
    best: dict[tuple, tuple] = {}
    for t in tables:
        for r in t.to_pylist():
            k = tuple(r[c] for c in key_cols)
            v = tuple(r[c] for c in version_cols)
            if k not in best or v > best[k][0]:
                best[k] = (v, r)
    return {
        k: r for k, (v, r) in best.items() if r.get(op_col) != "delete"
    }


def table_state(t: pa.Table, key_cols=("conv_id", "turn_idx")) -> dict[tuple, dict]:
    return {tuple(r[c] for c in key_cols): r for r in t.to_pylist()}


def lake_state(lake_dir: str) -> dict[tuple, str]:
    """Live {(conv_id, turn_idx): text} of a lake's CURRENT partition files
    — the shared reader every lake-content assertion uses."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from raycdc.sink import current_files

    out: dict[tuple, str] = {}
    for p in current_files(lake_dir):
        t = pq.read_table(p)
        live = t.filter(pc.not_equal(t["op"], "delete"))
        for c, i, tx in zip(
            live["conv_id"].to_pylist(),
            live["turn_idx"].to_pylist(),
            live["text"].to_pylist(),
        ):
            out[(c, i)] = tx
    return out
