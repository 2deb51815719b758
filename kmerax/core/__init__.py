from kmerax.core.codec import (
    BASE_INVALID, num_words, seq_bytes_to_bases, bases_to_seq_bytes,
    revcomp_words, canonical_words, words_less, words_equal, words_le,
)
from kmerax.core.kmers import extract_kmers
from kmerax.core.hash import mix32, kmer_hash, bloom_indices
from kmerax.core.minimizer import minimizers, buckets
