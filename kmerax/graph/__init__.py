from kmerax.graph.build import build_edges, shift_append_base
from kmerax.graph.unitig import unitig_arrays, emit_unitigs, assemble_to_fasta
