#!/usr/bin/env python
"""Print Ray Data execution stats for the headline replay stages.

Usage: python tools/stats_report.py [sf_dir] [amplify]

The per-operator breakdown (task counts, remote wall/cpu, rows per block)
is the evidence loop for tuning — run it after any engine change and check
that wall time is dominated by the map and merge compute, not scheduling.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycdc.changelog import amplified_changelog
    from raycdc.engine import _configure_shuffle, _make_apply_fn, prepare
    from raycdc.schema import TableSpec

    _configure_shuffle()
    spec = TableSpec(num_partitions=64, shuffle_partitions=64)
    lake = os.path.join(tempfile.gettempdir(), "raycdc_stats_lake")
    shutil.rmtree(lake, ignore_errors=True)

    ds = prepare(amplified_changelog(sf_dir, amplify, reps_per_task=4), spec)
    lineage = ds.groupby("part_key", num_partitions=64).map_groups(
        _make_apply_fn(lake, spec), batch_format="pyarrow"
    )
    lineage.to_pandas()
    print(lineage.stats())
    shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
