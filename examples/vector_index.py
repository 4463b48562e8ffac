"""CDC × ANN walkthrough: a vector lake kept fresh by exactly-once replay,
an IVF-PQ index lake incrementally maintained as a VIEW of it, and top-k
search served from the index.

The shape this demonstrates for a 100 TB embedding store:

* vectors arrive as changelog events (insert/update/delete) and land in a
  partitioned lake via ``replay`` — exactly-once, resumable;
* the index is ``maintain_vector_index`` — a ``maintain_view`` of that
  lake: the quantizer trains once and persists (KB-scale), every refresh
  re-encodes ONLY the changed vectors (feed ∝ change, never corpus);
* ``knn_over_index`` probes lists by streaming (key, list, m_sub code
  bytes) from the INDEX lake — vectors are never re-encoded at query
  time — and the exact rerank reads only the candidate keys' partitions
  of the SOURCE lake.

Run standalone: ``python examples/vector_index.py`` (local Ray).
"""

import os
import shutil
import sys
import tempfile

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycdc.engine import replay
    from raycdc.schema import TableSpec
    from raycdc.similarity import knn_over_index, maintain_vector_index

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 32)) * 4
    mat = centers[rng.integers(0, 8, 2000)] + rng.standard_normal((2000, 32))

    def seg(ids, rows, lsn0, op="insert"):
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.asarray(ids, np.int64)),
                "embedding": pa.array([list(map(float, r)) for r in rows]),
                "ts": pa.array(
                    np.full(n, 1_600_000_000_000_000, np.int64)
                    + np.arange(lsn0, lsn0 + n, dtype=np.int64),
                    pa.timestamp("us"),
                ),
                "op": pa.array([op] * n),
                "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
            }
        )

    spec = TableSpec(
        name="vectors",
        schema=pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("embedding", pa.list_(pa.float64())),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("vec_id",),
        version_cols=("ts", "lsn"),
        partition_key="vec_id",
        num_partitions=8,
        sort_cols=("vec_id",),
    )
    base = tempfile.mkdtemp(prefix="raycdc_vecdemo_")
    src, idx = f"{base}/vectors", f"{base}/index"
    try:
        # day 1: first half of the corpus arrives; index trains + builds
        replay(ray.data.from_arrow(seg(np.arange(1000), mat[:1000], 0)), src, spec)
        maintain_vector_index(src, idx, n_lists=8, m_sub=4, spec=spec)
        # day 2: the rest arrives, plus one deletion — the refresh feeds
        # only this change (check the lineage the call returns)
        replay(
            ray.data.from_arrow(seg(np.arange(1000, 2000), mat[1000:], 5000)),
            src, spec,
        )
        replay(ray.data.from_arrow(seg([3], mat[3:4], 9000, op="delete")), src, spec)
        lin = maintain_vector_index(src, idx, n_lists=8, m_sub=4, spec=spec)
        print("refresh lineage rows_in:",
              int(pa.compute.sum(lin["rows_in"]).as_py()))
        # query: vector 3 was deleted, so its own query must not return it
        res = knn_over_index(
            idx, src, mat[:4], np.arange(4), k=3, nprobe=3, spec=spec
        ).to_pandas().sort_values(["q_id", "rank"])
        print(res.to_string(index=False))
        assert 3 not in set(res[res["q_id"] == 3]["vec_id"])
        print("deleted vector absent from its own query: OK")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
