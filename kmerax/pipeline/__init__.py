from kmerax.pipeline.run import (
    CountState, run_align, run_count, run_correct, run_pipeline,
)
from kmerax.pipeline.checkpoint import save_spectrum, load_spectrum
