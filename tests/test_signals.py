"""K5 graceful signal shutdown (reference cmd/watcher/main.go:41-51:
SIGINT/SIGTERM → context cancel → producer drain → clean disconnect,
exit 0). Spark parity: the CLI watch mode stops the streaming query on
SIGTERM, exits 0, and leaves a resumable checkpoint — a restart drains the
remaining epochs to the oracle-equal final state with no double-apply."""

import json
import os
import signal
import subprocess
import sys
import time

from kafka_mongo_watcher_spark.datagen import generate_events, write_event_log
from kafka_mongo_watcher_spark.oracle import oracle_rows
from kafka_mongo_watcher_spark.plans.lake import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _watch_cmd(tmp_path):
    return [
        sys.executable, "-m", "kafka_mongo_watcher_spark", "watch",
        "--log-dir", str(tmp_path / "log"),
        "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1",
    ]


def test_sigterm_stops_watch_with_resumable_checkpoint(spark, tmp_path):
    ev = generate_events(spark, 4000)
    rows = [r.asDict() for r in ev.collect()]
    write_event_log(ev, str(tmp_path / "log"), n_chunks=8)
    LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)

    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4",
           "KMW_DRIVER_MEMORY": "2g"}
    p = subprocess.Popen(
        _watch_cmd(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # wait for the first committed epoch (manifest pointer advances past 0)
    latest = tmp_path / "t" / "_latest"
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            if latest.exists() and int(latest.read_text().strip() or 0) >= 1:
                break
            if p.poll() is not None:
                raise AssertionError(f"watch exited early: rc={p.returncode}")
            time.sleep(0.2)
        else:
            raise AssertionError("no epoch committed before deadline")
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["mode"] == "watch"

    # some but not all epochs committed (we stopped it mid-stream)
    t = LakeTable(spark, str(tmp_path / "t"))
    committed_v = t.version
    assert committed_v >= 1

    # restart in-process: drains the rest from the checkpoint, no
    # double-apply, oracle-equal final state
    from kafka_mongo_watcher_spark.streaming.run import run_replay_stream

    stats = run_replay_stream(
        spark,
        log_dir=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    resumed = [s["epoch"] for s in stats if not s.get("skipped")]
    assert min(resumed, default=10**9) >= committed_v - 1  # only the tail replays
    final = {
        tuple(r)
        for r in t.refresh().snapshot()
        .select("repo", "path", "commit", "lang", "content_sha256")
        .collect()
    }
    assert final == oracle_rows(rows)
