"""Distributed operators: kNN graph + degrees, carrier selection, majority
vote, attacks, dedup, similarity search, temporal (as-of + range) joins,
distinct-count sketching, multimodal plumbing."""
