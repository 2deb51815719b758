"""Spectrum checkpoint / resume (SURVEY.md §5 checkpointing).

The spectrum (Bloom table + exact sorted array) is the only large state
between passes; saved as raw .npz + a JSON manifest so the oracle and tests
can read it. Stage-level idempotence: a pass whose manifest says "complete"
is skipped on resume (exercised by tests/golden/test_pipeline.py).
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_spectrum(dirpath: str, cfg, *, bloom_table=None, exact=None,
                  threshold=None, hist=None, host=None, stage: str = "count",
                  status: str = "complete", extra: dict | None = None):
    os.makedirs(dirpath, exist_ok=True)
    arrays = {}
    extra = dict(extra or {})
    npz_name = "spectrum.npz"
    if bloom_table is not None:
        arrays["bloom_table"] = np.asarray(bloom_table)
    if exact is not None:
        uniq, counts, n = exact
        arrays["exact_uniq"] = np.asarray(uniq)
        arrays["exact_counts"] = np.asarray(counts)
        arrays["exact_n"] = np.asarray(n)
    elif host is not None:
        from kmerax.spectrum.host_sharded import ShardedHostSpectrum

        if isinstance(host, ShardedHostSpectrum):
            # range-sharded spectrum: each process saves ONLY its shard
            # (that is the point — nothing global exists anywhere); the
            # manifest records the shard geometry for resume. bounds are
            # persisted for inspection/debugging completeness — nothing
            # consumes them after construction today (rows already carry
            # their range implicitly)
            arrays["host_uniq"] = host.local.uniq
            arrays["host_counts"] = host.local.counts
            arrays["host_bounds"] = np.asarray(host.bounds)
            extra["host_shard"] = [host.pid, host.n_procs]
            npz_name = f"spectrum.p{host.pid}.npz"
        else:
            # host-resident spectrum (past device capacity): save
            # unpadded; exact_* stays the compact form when both exist
            arrays["host_uniq"] = host.uniq
            arrays["host_counts"] = host.counts
    if hist is not None:
        arrays["hist"] = np.asarray(hist)
    np.savez(os.path.join(dirpath, npz_name), **arrays)
    manifest = {
        "stage": stage, "status": status, "threshold": threshold,
        "config": json.loads(cfg.to_json()), "npz": npz_name, **extra,
    }
    # per-process manifests for sharded saves, single otherwise
    mname = "manifest.json" if "host_shard" not in extra \
        else f"manifest.p{extra['host_shard'][0]}.json"
    tmp = os.path.join(dirpath, mname + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(dirpath, mname))
    if "host_shard" in extra and extra["host_shard"][0] == 0:
        # rank 0 also writes the canonical manifest for _is_done checks
        with open(os.path.join(dirpath, "manifest.json.tmp"), "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(os.path.join(dirpath, "manifest.json.tmp"),
                   os.path.join(dirpath, "manifest.json"))


def load_spectrum(dirpath: str, pid: int | None = None,
                  n_procs: int | None = None):
    """Returns (manifest dict, arrays dict) or (None, None) if absent.

    Sharded-host saves (manifest key "host_shard") store one npz per
    process; pass this process's `pid` to load its shard. When the loaded
    manifest IS a shard, its [pid, n_procs] geometry must match the
    caller's — otherwise (resume under a different process count, or a
    missing per-process manifest silently falling back to rank 0's shard)
    the process would adopt the wrong key range and corrupt the global
    histogram/threshold/solid set (ADVICE r4 medium #2) — raise instead.
    """
    mpath = os.path.join(dirpath, "manifest.json")
    if pid is not None and os.path.exists(
            os.path.join(dirpath, f"manifest.p{pid}.json")):
        mpath = os.path.join(dirpath, f"manifest.p{pid}.json")
    if not os.path.exists(mpath):
        return None, None
    with open(mpath) as f:
        manifest = json.load(f)
    if "host_shard" in manifest:
        want = [pid if pid is not None else 0,
                n_procs if n_procs is not None else 1]
        if manifest["host_shard"] != want:
            raise RuntimeError(
                f"sharded spectrum checkpoint geometry mismatch: manifest "
                f"{mpath} holds shard {manifest['host_shard']} but this "
                f"process is {want} — resume with the original process "
                f"count, or delete the stage checkpoint to re-count")
    arrays = dict(np.load(
        os.path.join(dirpath, manifest.get("npz", "spectrum.npz"))))
    return manifest, arrays
