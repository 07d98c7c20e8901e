"""Sequential replay oracle — the golden-state generator.

Plain-Python, single-threaded replay of a change-event list in strict
(commit_seq, offset) order against a dict keyed by (repo, path) — the
behavioral model of the reference watcher's downstream consumer applying
Kafka messages per-key in order (golden-output strategy of
/root/reference/cmd/watcher/main_test.go:111-119). Tests assert the engine's
distributed final state equals this oracle on
(repo, path, commit, lang, content_sha256) exactly.
"""

from __future__ import annotations

from kafka_mongo_watcher_spark.functions.content import (
    normalize_content_py,
    sha256_hex_py,
)


def replay_oracle(events: list[dict]) -> dict[tuple[str, str], dict]:
    """events: list of dicts with keys partition_id, offset, op, repo, path,
    commit, lang (optional), content_raw, commit_seq. Returns final state
    keyed by (repo, path)."""
    state: dict[tuple[str, str], dict] = {}
    for e in sorted(events, key=lambda e: (e["commit_seq"], e.get("offset", 0))):
        repo, path = e.get("repo"), e.get("path")
        if not repo or not path:  # malformed → skipped, stream continues
            continue
        key = (repo, path)
        if e["op"] == "delete":
            state.pop(key, None)
            continue
        content = normalize_content_py(e.get("content_raw"))
        state[key] = {
            "repo": repo,
            "path": path,
            "commit": e.get("commit"),
            "lang": e.get("lang"),
            "content": content,
            "content_sha256": sha256_hex_py(content),
            "commit_seq": e["commit_seq"],
        }
    return state


def oracle_rows(events: list[dict], cols=("repo", "path", "commit", "lang", "content_sha256")) -> set[tuple]:
    """Final state as a comparable set of tuples."""
    return {tuple(v[c] for c in cols) for v in replay_oracle(events).values()}
