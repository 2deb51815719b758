from kmerax.spectrum.bloom import BloomParams, make_table, insert, query
from kmerax.spectrum.exact import (
    SENTINEL_WORD, sort_kmers, unique_counts, merge_sorted, lookup_sorted,
)
from kmerax.spectrum.histogram import count_histogram, solid_threshold
