"""Stage-level profiler tracing (SURVEY.md §5 "Tracing / profiling").

Set KMERAX_TRACE_DIR to capture an xprof/TensorBoard trace per stage:
    KMERAX_TRACE_DIR=/tmp/trace kmerax pipeline ...
Each stage writes to $KMERAX_TRACE_DIR/<stage>; view with
`tensorboard --logdir $KMERAX_TRACE_DIR` (tensorboard_plugin_profile is in
the environment).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace(stage: str):
    d = os.environ.get("KMERAX_TRACE_DIR")
    if not d:
        yield
        return
    import jax

    path = os.path.join(d, stage)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
