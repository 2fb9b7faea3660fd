from .fasta import read_fasta  # noqa: F401
from .fastq import FastqBatch, iter_fastq_batches, iter_paired_fastq_batches  # noqa: F401
