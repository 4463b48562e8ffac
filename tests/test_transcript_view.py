"""Incremental transcript-view maintenance (engine.maintain_transcripts):
change_feed -> touched-conversation reassembly (partition-pruned snapshot
read) -> LWW replay.  The view must equal a from-scratch assembly of the
source's live state across refreshes, whole-conversation deletes, crash
retries, and no-change refreshes.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import (
    maintain_transcripts,
    merged_state,
    read_lake,
    replay,
)
from raycdc.relational import assemble_group_text
from raycdc.schema import TableSpec

SPEC = TableSpec(num_partitions=8)
COLS = ["conv_id", "transcript", "n_turns", "n_chars", "n_user"]


def _view_df(view: str) -> pd.DataFrame:
    return (
        read_lake(view)
        .select_columns(COLS)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _full_df(log: pa.Table) -> pd.DataFrame:
    final = merged_state(ray.data.from_arrow(log), SPEC).select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    )
    return (
        assemble_group_text(
            final,
            group_col="conv_id",
            order_col="turn_idx",
            text_col="text",
            sep="\n",
            role_col="role",
            role_value="user",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)[COLS]
    )


def test_transcript_view_tracks_source(ray_session, tmp_path):
    """Three incremental refreshes == full recompute at each point."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    log = synthetic_changelog(n_events=900, n_convs=12, seed=7)
    cuts = [300, 600, 900]
    prev = 0
    for cut in cuts:
        chunk = log.filter(
            pc.and_(
                pc.greater_equal(log["lsn"], prev), pc.less(log["lsn"], cut)
            )
        )
        replay(ray.data.from_arrow(chunk), src, SPEC)
        maintain_transcripts(src, view, SPEC, num_partitions=4)
        got = _view_df(view)
        want = _full_df(log.filter(pc.less(log["lsn"], cut)))
        pd.testing.assert_frame_equal(got, want)
        prev = cut


def test_transcript_view_whole_conversation_delete(ray_session, tmp_path):
    """A conversation whose every turn is deleted vanishes from the view."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")

    def rows(lsn0, conv, idxs, op):
        n = len(idxs)
        return pa.table(
            {
                "conv_id": pa.array([conv] * n),
                "turn_idx": pa.array(idxs, pa.int32()),
                "role": pa.array(["user"] * n),
                "text": pa.array([f"t{i}" for i in idxs]),
                "tool": pa.array([""] * n),
                "ts": pa.array(
                    np.arange(lsn0, lsn0 + n) * 1_000_000, pa.timestamp("us")
                ),
                "op": pa.array([op] * n),
                "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
                "seg_id": pa.array(np.zeros(n, np.int32)),
            }
        )

    replay(
        ray.data.from_arrow(
            pa.concat_tables([rows(0, "a", [0, 1], "insert"), rows(2, "b", [0], "insert")])
        ),
        src,
        SPEC,
    )
    maintain_transcripts(src, view, SPEC, num_partitions=4)
    assert set(_view_df(view).conv_id) == {"a", "b"}
    # delete ALL of conv a's turns; touch nothing else
    replay(ray.data.from_arrow(rows(10, "a", [0, 1], "delete")), src, SPEC)
    lineage = maintain_transcripts(src, view, SPEC, num_partitions=4)
    got = _view_df(view)
    assert set(got.conv_id) == {"b"}
    # conv b was untouched by the feed: its partition may re-apply but the
    # view content is unchanged
    assert got.transcript.tolist() == ["t0"]
    assert lineage.num_rows > 0


def test_transcript_view_crash_retry_pending_reuse(ray_session, tmp_path):
    """A crash between the claim and the promotion re-applies under the
    SAME snapshot id: the retry converges and a THIRD call is a no-op."""
    import json
    import os

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    log = synthetic_changelog(n_events=400, n_convs=6, seed=11)
    replay(ray.data.from_arrow(log), src, SPEC)
    maintain_transcripts(src, view, SPEC, num_partitions=4)
    pos_path = os.path.join(view, "_feed_pos.json")
    promoted = json.load(open(pos_path))
    assert "pending" not in promoted
    # simulate the crash window: demote the position back to pending
    json.dump(
        {"snapshot": None, "pending": promoted["snapshot"]},
        open(pos_path, "w"),
    )
    maintain_transcripts(src, view, SPEC, num_partitions=4)  # the retry
    got = _view_df(view)
    want = _full_df(log)
    pd.testing.assert_frame_equal(got, want)
    after = json.load(open(pos_path))
    assert after == {"snapshot": promoted["snapshot"]}
    # steady state: an unchanged source feeds nothing
    lineage = maintain_transcripts(src, view, SPEC, num_partitions=4)
    assert lineage.num_rows == 0


def test_transcript_view_requires_matching_partition_key(ray_session, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    log = synthetic_changelog(n_events=50, n_convs=3, seed=3)
    replay(ray.data.from_arrow(log), src, SPEC)
    with pytest.raises(ValueError, match="partition"):
        maintain_transcripts(
            src, view, SPEC, group_col="turn_idx", order_col="conv_id"
        )
