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
    if bloom_table is not None:
        arrays["bloom_table"] = np.asarray(bloom_table)
    if exact is not None:
        uniq, counts, n = exact
        arrays["exact_uniq"] = np.asarray(uniq)
        arrays["exact_counts"] = np.asarray(counts)
        arrays["exact_n"] = np.asarray(n)
    elif host is not None:
        # host-resident spectrum (past device capacity): save unpadded;
        # exact_* stays the compact form when both exist
        arrays["host_uniq"] = host.uniq
        arrays["host_counts"] = host.counts
    if hist is not None:
        arrays["hist"] = np.asarray(hist)
    np.savez(os.path.join(dirpath, "spectrum.npz"), **arrays)
    manifest = {
        "stage": stage, "status": status, "threshold": threshold,
        "config": json.loads(cfg.to_json()), **(extra or {}),
    }
    tmp = os.path.join(dirpath, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(dirpath, "manifest.json"))


def load_spectrum(dirpath: str):
    """Returns (manifest dict, arrays dict) or (None, None) if absent."""
    mpath = os.path.join(dirpath, "manifest.json")
    if not os.path.exists(mpath):
        return None, None
    with open(mpath) as f:
        manifest = json.load(f)
    arrays = dict(np.load(os.path.join(dirpath, "spectrum.npz")))
    return manifest, arrays
