"""Streaming scratch-base placement (scratch.py) — including the
non-tmpfs fallback path (VERDICT r14 item 3/8: only the /dev/shm
default was proven; the SPARK_GRAFT_STREAM_SCRATCH override must also
carry a real replay end-to-end)."""

from __future__ import annotations

import os

import pytest

import gmall2021_flink_dw_spark.scratch as scratch


@pytest.fixture()
def reset_scratch_base():
    """Reset the module-level memo around each test so the env
    override is actually re-resolved, and restore afterwards."""
    orig_base = scratch._BASE
    orig_env = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH")
    scratch._BASE = None
    yield
    scratch._BASE = orig_base
    if orig_env is None:
        os.environ.pop("SPARK_GRAFT_STREAM_SCRATCH", None)
    else:
        os.environ["SPARK_GRAFT_STREAM_SCRATCH"] = orig_env


def test_env_override_wins_and_is_created(tmp_path, reset_scratch_base):
    target = str(tmp_path / "disk_scratch" / "nested")
    os.environ["SPARK_GRAFT_STREAM_SCRATCH"] = target
    assert scratch.stream_scratch_base() == target
    assert os.path.isdir(target)


def test_default_prefers_shm_or_tempdir(reset_scratch_base):
    os.environ.pop("SPARK_GRAFT_STREAM_SCRATCH", None)
    base = scratch.stream_scratch_base()
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert base == "/dev/shm"
    else:
        import tempfile

        assert base == tempfile.gettempdir()


def test_streaming_replay_green_on_disk_fallback(
    spark, tmp_path, reset_scratch_base
):
    """A checkpoint-bearing replay must stay correct when the scratch
    base is plain disk: run streaming_visitor_stats with the override
    pointed at tmp_path and compare against its DuckDB oracle closure
    rule evaluated on the same slice — and assert the checkpoint
    scaffolding actually landed under the override (the fallback path
    really carried the run)."""
    import duckdb

    from gmall2021_flink_dw_spark.registry import load_all

    target = str(tmp_path / "disk_scratch")
    os.environ["SPARK_GRAFT_STREAM_SCRATCH"] = target
    assert scratch.stream_scratch_base() == target

    sf_dir = "/root/testdata/sf0.001"
    spec = load_all()["streaming_visitor_stats"]
    got = spec.fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(spec.oracle).df()
    con.close()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return (
            df.astype(str)
            .sort_values(list(df.columns))
            .reset_index(drop=True)
        )

    g, w = canon(got), canon(want)
    assert len(g) == len(w) and g.equals(w)
    # the replay's checkpoint scaffolding must be under the override
    assert any(
        e.startswith("memckpt_") for e in os.listdir(target)
    ), os.listdir(target)
