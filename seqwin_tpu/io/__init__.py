"""Host IO: FASTA ingest and base-code packing."""
