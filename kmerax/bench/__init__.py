from kmerax.bench.runners import run_preset
