from kmerax.io.fastq import FastqReader, read_fastq, FastqWriter
from kmerax.io.fasta import write_fasta, read_fasta
from kmerax.io.batcher import ReadBatch, batch_reads, BackgroundBatcher
