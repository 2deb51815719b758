from kmerax.ops.correct import correct_batch
