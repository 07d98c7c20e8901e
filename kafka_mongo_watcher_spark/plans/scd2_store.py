"""Bucketed on-disk store for an incrementally-maintained SCD2 dimension.

The reference watcher ships raw change events to Kafka
(/root/reference/internal/app/watcher.go); warehouse consumers that keep a
type-2 dimension of "what did each document look like over time" must fold
those events themselves.  `Scd2Store` is that consumer, Spark-side: a
copy-on-write bucketed parquet table maintained by
``operators/scd.scd2_apply`` one micro-batch at a time.

Layout (mirrors plans/lake.py's manifest discipline at 1/10th the scope)::

    <path>/_manifests/v{N}.json   per-commit manifest
    <path>/_latest                atomic pointer (os.replace flip)
    <path>/data/v{N}/_b={b}/      rewritten bucket directories

Two write modes, mirroring the lake engine's COW/MOR split:

* ``cow`` — per commit only the buckets whose keys the batch touched are
  rewritten; every other bucket entry keeps pointing at its old directory.
  Write cost O(touched buckets' current rows + batch).  Reads are plain
  scans.
* ``mor`` — the upsert delta is blind-APPENDED as new files under the
  touched buckets (write cost O(batch), independent of dimension size;
  an SCD2 delta never deletes rows, so append-only is lossless).  Every
  file carries ``_sc`` (store commit); reads resolve latest-commit-wins
  per (key, version) with one map-side-combinable hash agg, and
  ``compact()`` folds the deltas back into resolved bases.  The fold
  itself reads the unresolved union directly — ``scd2_apply``'s
  seed_tie_cols ranks superseded copies without a pre-resolution shuffle.

The `applied` map fences (source_id, batch_id) exactly like
``LakeTable.merge`` (plans/lake.py), making checkpoint replays no-ops and
the streaming path exactly-once.

Scale shape per batch: one bounded collect of ≤ n_buckets touched bucket
ids, a parquet scan of ONLY those bucket dirs further pruned by
scd2_apply's broadcast-semi on the batch keys, the O(batch) seed-union
window chain, and one partitioned write of the touched buckets.  Because
the history side is a fresh parquet scan (no lineage shared with the batch
frame), the self-join de-duplication hazard documented on scd2_apply does
not arise; the delta is still localCheckpoint'd so the anti-join and the
bucket rewrite evaluate ONE delta, not two.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_mongo_watcher_spark.operators.scd import scd2_apply, scd2_history


class Scd2Store:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._load()

    # ---------- manifest plumbing (lake.py:249-283 idiom) ----------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        *,
        key_cols: Sequence[str],
        order_col: str,
        attr_cols: Sequence[str],
        tie_breakers: Sequence[str] = (),
        delete_col: str | None = None,
        n_buckets: int = 16,
        write_mode: str = "cow",
    ) -> "Scd2Store":
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        manifest = {
            "version": 0,
            "write_mode": write_mode,
            "n_buckets": n_buckets,
            "key_cols": list(key_cols),
            "order_col": order_col,
            "attr_cols": list(attr_cols),
            "tie_breakers": list(tie_breakers),
            "delete_col": delete_col,
            "buckets": {},
            "deltas": {},
            "applied": {},
            "stats": {"commits": 0},
        }
        cls._write_manifest(path, manifest)
        cls._flip_latest(path, 0)
        return cls(spark, path)

    @staticmethod
    def _write_manifest(path: str, manifest: dict) -> None:
        mpath = os.path.join(path, "_manifests", f"v{manifest['version']:08d}.json")
        tmp = mpath + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)

    @staticmethod
    def _flip_latest(path: str, version: int) -> None:
        target = os.path.join(path, "_latest")
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, target)  # atomic commit point

    def _load(self) -> None:
        with open(os.path.join(self.path, "_latest")) as f:
            version = int(f.read().strip())
        with open(
            os.path.join(self.path, "_manifests", f"v{version:08d}.json")
        ) as f:
            self.manifest = json.load(f)

    def refresh(self) -> "Scd2Store":
        self._load()
        return self

    @property
    def version(self) -> int:
        return self.manifest["version"]

    @property
    def n_buckets(self) -> int:
        return self.manifest["n_buckets"]

    def _fold_kwargs(self) -> dict:
        m = self.manifest
        return dict(
            key_cols=m["key_cols"],
            order_col=m["order_col"],
            attr_cols=m["attr_cols"],
            tie_breakers=m["tie_breakers"],
            delete_col=m["delete_col"],
        )

    def _bucket_expr(self):
        m = self.manifest
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in m["key_cols"]]), F.lit(m["n_buckets"])
        ).cast("int")

    @property
    def write_mode(self) -> str:
        return self.manifest.get("write_mode", "cow")

    # ---------- read ----------

    def _schema_frame(self, like: DataFrame) -> DataFrame:
        """Empty frame with the store's RAW file schema (history schema +
        `_sc`), derived from a zero-row fold of a batch-shaped frame —
        no schema duplication to drift."""
        kw = self._fold_kwargs()
        if kw["delete_col"] is None:
            kw.pop("delete_col")
        return scd2_history(like.limit(0), **kw).withColumn(
            "_sc", F.lit(0).cast("long")
        )

    def _read_raw(
        self,
        bucket_ids=None,
        *,
        like: DataFrame | None = None,
        seeds_only: bool = False,
    ) -> DataFrame:
        """Union of base + delta files for the selected buckets, UNRESOLVED:
        in MOR mode a (key, version) may appear once per commit that
        re-emitted it; `_sc` (store commit) ranks the copies.

        ``seeds_only``: substitute each bucket's SEED file (the latest
        version row per key, written by ``compact``) for its full base —
        the incremental fold (``scd2_apply``) only ever consults the
        max-version row per key, so reading O(keys) seed rows + the
        post-compaction deltas instead of the O(all versions) history is
        exactly sufficient, and turns steady-state ingest IO from
        "re-read the whole dimension every batch" into "read the current
        rows of the touched buckets". Buckets never compacted fall back
        to their (delta-only) files unchanged."""
        m = self.manifest
        seeds = m.get("seeds", {}) if seeds_only else {}
        sel = None if bucket_ids is None else set(bucket_ids)
        dirs = [
            os.path.join(self.path, seeds.get(b, d))
            for b, d in sorted(m["buckets"].items())
            if sel is None or int(b) in sel
        ]
        for b, dlist in sorted(m.get("deltas", {}).items()):
            if sel is None or int(b) in sel:
                dirs.extend(os.path.join(self.path, d) for d in dlist)
        if not dirs:
            if like is None:
                raise ValueError("empty store: pass `like` for the schema")
            return self._schema_frame(like)
        return self.spark.read.parquet(*dirs)

    def _resolve(self, raw: DataFrame) -> DataFrame:
        """Latest-commit-wins per (key, version) — the MOR read resolution
        (one map-side-combinable hash agg, no window, no self-join: the
        same shape as the lake's LWW resolve, plans/lake.py)."""
        m = self.manifest
        keys = [*m["key_cols"], "version"]
        vals = [c for c in raw.columns if c not in keys and c != "_sc"]
        packed = raw.groupBy(*keys).agg(
            F.max_by(F.struct(*vals), F.col("_sc")).alias("_v")
        )
        return packed.select(*keys, *[F.col(f"_v.{c}").alias(c) for c in vals])

    def history(self, bucket_ids=None, *, like: DataFrame | None = None) -> DataFrame:
        """Current dimension rows (optionally only the given buckets).
        ``like`` (a batch-shaped frame) is required only while the store has
        no data files yet, to mint the empty-but-typed frame."""
        raw = self._read_raw(bucket_ids, like=like)
        if self.write_mode == "mor":
            return self._resolve(raw)
        return raw.drop("_sc")

    def snapshot_at(self, instant) -> DataFrame:
        """Point-in-time dimension view: the row version live at `instant`
        per key (half-open intervals: valid_from <= t < valid_to)."""
        h = self.history()
        t = F.lit(instant)
        return h.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
        )

    # ---------- write ----------

    def apply_batch(
        self,
        batch: DataFrame,
        *,
        source_id: str = "dim",
        batch_id: int = 0,
        on_late: str = "raise",
    ) -> dict:
        """Fold one micro-batch of events into the dimension (exactly-once
        via the `applied` fence).  Returns commit stats; a replayed
        (source_id, batch_id) returns ``{"skipped": True}`` untouched."""
        self.refresh()
        m = self.manifest
        if batch_id in m["applied"].get(source_id, []):
            return {"skipped": True, "version": m["version"]}

        kw = self._fold_kwargs()
        if kw["delete_col"] is None:
            kw.pop("delete_col")

        # Rows with a NULL key column are dropped: an SCD2 key must identify
        # a dimension member, and a null would land in Hive's default
        # partition outside the bucket map (the ingest path already
        # quarantines malformed keys to the DLQ before this point).
        for c in m["key_cols"]:
            batch = batch.filter(F.col(c).isNotNull())

        # Bounded collect: ≤ n_buckets ints (the same bounded-aggregate shape
        # as LakeTable.merge's bucket-id collect, plans/lake.py).
        bexpr = self._bucket_expr()
        touched = sorted(
            r[0]
            for r in batch.select(bexpr.alias("_b")).distinct().collect()
            if r[0] is not None
        )
        mor = self.write_mode == "mor"
        # MOR: the fold only needs each touched key's max-version row, so
        # compacted buckets are read through their O(keys) seed files (plus
        # any post-compaction deltas). COW rewrites whole buckets and needs
        # the full rows regardless.
        raw = self._read_raw(touched, like=batch, seeds_only=mor)
        # the raw union may hold superseded (key, version) copies in MOR
        # mode; seed_tie_cols makes the latest commit's copy the seed
        # without a pre-resolution shuffle
        delta = scd2_apply(
            raw, batch, on_late=on_late, seed_tie_cols=["_sc"], **kw
        ).localCheckpoint()

        key_cols = m["key_cols"]
        new_version = m["version"] + 1
        stamped = delta.withColumn("_sc", F.lit(new_version).cast("long"))
        if mor:
            # blind append: write ONLY the delta — O(batch) write cost per
            # commit regardless of dimension size; reads resolve by _sc
            out = stamped.withColumn("_b", bexpr)
        else:
            replaced = delta.select(*key_cols, "version")
            out = (
                raw.join(F.broadcast(replaced), [*key_cols, "version"], "left_anti")
                .unionByName(stamped)
                .withColumn("_b", bexpr)
            )
        out_rel = os.path.join("data", f"v{new_version:08d}")
        out_dir = os.path.join(self.path, out_rel)
        n_writers = max(1, min(len(touched) or 1, self.spark.sparkContext.defaultParallelism))
        (
            # mode=overwrite: a crash between write and flip leaves a partial
            # v{N} dir; the replayed epoch recomputes the same N and must be
            # able to clean it (manifest not flipped => nothing references it)
            out.repartition(n_writers, "_b")
            .sortWithinPartitions("_b", *key_cols, "version")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(out_dir)
        )
        written = {
            int(d.split("=", 1)[1]): os.path.join(out_rel, d)
            for d in os.listdir(out_dir)
            if d.startswith("_b=")
        }
        n_delta = delta.count()  # checkpointed: no recompute
        buckets = dict(m["buckets"])
        deltas = {b: list(d) for b, d in m.get("deltas", {}).items()}
        for b in touched:
            # a touched bucket can be absent from `written` only when the
            # batch produced no emitted rows for a previously-empty bucket
            # (delete-only stream for a never-seen key): keep it absent
            if b not in written:
                continue
            if mor:
                deltas.setdefault(str(b), []).append(written[b])
            else:
                buckets[str(b)] = written[b]
        manifest = {
            **m,
            "version": new_version,
            "buckets": buckets,
            "deltas": deltas,
            "applied": {
                **m["applied"],
                source_id: sorted([*m["applied"].get(source_id, []), batch_id]),
            },
            "stats": {"commits": m["stats"].get("commits", 0) + 1},
        }
        self._write_manifest(self.path, manifest)
        self._flip_latest(self.path, new_version)
        self.manifest = manifest
        return {
            "skipped": False,
            "version": new_version,
            "touched_buckets": len(touched),
            "delta_rows": n_delta,
        }

    # ---------- maintenance ----------

    def compact(self) -> dict:
        """MOR maintenance: fold every bucket's delta files into a fresh
        resolved base (latest commit per (key, version)) and clear the
        delta lists — point reads and history() stop paying the resolve
        agg until new deltas accumulate.  Buckets with no deltas keep
        their base untouched.  The commit bumps the version but is not an
        event batch (the `applied` fence is unchanged)."""
        self.refresh()
        m = self.manifest
        with_deltas = sorted(int(b) for b, d in m.get("deltas", {}).items() if d)
        if not with_deltas:
            return {"compacted_buckets": 0, "version": m["version"]}
        raw = self._read_raw(with_deltas)
        resolved = self._resolve(raw).withColumn(
            "_sc", F.lit(m["version"]).cast("long")
        )
        new_version = m["version"] + 1
        out_rel = os.path.join("data", f"v{new_version:08d}")
        out_dir = os.path.join(self.path, out_rel)
        bexpr = self._bucket_expr()
        n_writers = max(
            1, min(len(with_deltas), self.spark.sparkContext.defaultParallelism)
        )
        (
            resolved.withColumn("_b", bexpr)
            .repartition(n_writers, "_b")
            .sortWithinPartitions("_b", *m["key_cols"], "version")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(out_dir)
        )
        written = {
            int(d.split("=", 1)[1]): os.path.join(out_rel, d)
            for d in os.listdir(out_dir)
            if d.startswith("_b=")
        }
        # SEED split: per key, the max-version row of the just-compacted
        # buckets — the only row the incremental fold ever consults
        # (operators/scd.py::scd2_apply seed pick). Written as a second
        # small file set so steady-state apply_batch reads O(keys), not
        # O(all versions). Computed by re-reading the freshly written
        # columnar output (sequential local IO) rather than caching the
        # O(state) resolved frame.
        seeds_rel = out_rel + "_seeds"
        seeds_dir = os.path.join(self.path, seeds_rel)
        full = self.spark.read.parquet(out_dir)
        keyed = full.groupBy(*m["key_cols"]).agg(
            F.max_by(
                F.struct(*[c for c in full.columns if c not in m["key_cols"]]),
                F.col("version"),
            ).alias("_v")
        )
        seed_rows = keyed.select(
            *m["key_cols"],
            *[
                F.col(f"_v.{c}").alias(c)
                for c in full.columns
                if c not in m["key_cols"]
            ],
        )
        (
            seed_rows.repartition(n_writers, "_b")
            .sortWithinPartitions("_b", *m["key_cols"])
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(seeds_dir)
        )
        seeds_written = {
            int(d.split("=", 1)[1]): os.path.join(seeds_rel, d)
            for d in os.listdir(seeds_dir)
            if d.startswith("_b=")
        }
        buckets = dict(m["buckets"])
        deltas = {b: list(d) for b, d in m.get("deltas", {}).items()}
        seeds = dict(m.get("seeds", {}))
        for b in with_deltas:
            if b in written:
                buckets[str(b)] = written[b]
            if b in seeds_written:
                seeds[str(b)] = seeds_written[b]
            else:
                seeds.pop(str(b), None)
            deltas.pop(str(b), None)
        manifest = {**m, "version": new_version, "buckets": buckets,
                    "deltas": deltas, "seeds": seeds}
        self._write_manifest(self.path, manifest)
        self._flip_latest(self.path, new_version)
        self.manifest = manifest
        return {"compacted_buckets": len(with_deltas), "version": new_version}

    def expire_versions(self, *, keep_last: int = 1) -> dict:
        """GC: every COW commit re-homes its touched buckets under a new
        data/v{N} dir, orphaning the replaced bucket dirs — without this the
        store's disk footprint grows with every commit forever.  Deletes
        data dirs referenced by NO manifest among the current one and the
        `keep_last - 1` before it, then drops the expired manifests
        (mirrors LakeTable.expire_snapshots' keep-set discipline,
        plans/lake.py).  Driver-side file ops only — O(versions + buckets),
        no Spark job."""
        import shutil

        self.refresh()
        keep_last = max(1, keep_last)
        cur = self.manifest["version"]
        keep_from = max(0, cur - keep_last + 1)
        live: set = set()
        mdir = os.path.join(self.path, "_manifests")
        for v in range(keep_from, cur + 1):
            p = os.path.join(mdir, f"v{v:08d}.json")
            if os.path.isfile(p):
                with open(p) as f:
                    kept = json.load(f)
                refs = list(kept["buckets"].values())
                refs.extend(kept.get("seeds", {}).values())
                for dlist in kept.get("deltas", {}).values():
                    refs.extend(dlist)
                live.update(d.split(os.sep)[1] for d in refs)
        removed_dirs = removed_manifests = 0
        data_dir = os.path.join(self.path, "data")
        for d in sorted(os.listdir(data_dir)):
            if d not in live:
                shutil.rmtree(os.path.join(data_dir, d))
                removed_dirs += 1
        for f in sorted(os.listdir(mdir)):
            v = int(f[1:9]) if f.startswith("v") and f.endswith(".json") else None
            if v is not None and v < keep_from:
                os.remove(os.path.join(mdir, f))
                removed_manifests += 1
        return {"removed_dirs": removed_dirs, "removed_manifests": removed_manifests}
