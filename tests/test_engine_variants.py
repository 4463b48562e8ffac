"""Engine variants: actor-pool merge, auto-salting, hot-key detection."""

import glob

import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import detect_hot_keys, replay
from raycdc.schema import TableSpec

from .oracle import lake_state as _lake_state, python_lww_replay




def test_actor_pool_merge_matches_task_merge(ray_session, tmp_path):
    t = synthetic_changelog(n_events=1500, seed=31, shuffle=True)
    spec = TableSpec(num_partitions=8)
    lake_a = str(tmp_path / "actors")
    lake_b = str(tmp_path / "tasks")
    replay(ray.data.from_arrow(t), lake_a, spec, merge_concurrency=2)
    replay(ray.data.from_arrow(t), lake_b, spec)
    assert _lake_state(lake_a) == _lake_state(lake_b)
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake_a) == expect


def test_detect_hot_keys_flags_skew(ray_session):
    hot = synthetic_changelog(n_events=2000, seed=32, zipf_skew=0.9, n_convs=20)
    keys = detect_hot_keys(ray.data.from_arrow(hot), TableSpec())
    assert keys == ["conv-0"]
    uniform = synthetic_changelog(n_events=2000, seed=33, n_convs=50)
    assert detect_hot_keys(ray.data.from_arrow(uniform), TableSpec()) == []


def test_replay_auto_salting_correct(ray_session, tmp_path):
    t = synthetic_changelog(n_events=2000, seed=34, zipf_skew=0.9, n_convs=20)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "auto")
    replay(ray.data.from_arrow(t), lake, spec, salted="auto")
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect
