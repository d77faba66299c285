"""Host-side IO: FASTA/FASTQ, COBS classic indexes, assembly tars, SAM, stats."""
