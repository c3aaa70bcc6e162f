"""Host-side pipeline: graph filtering, subgraph search, marker extraction."""
