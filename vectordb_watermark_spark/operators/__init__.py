"""Distributed operators: kNN graph + degrees, carrier selection, majority
vote, attacks, dedup, similarity search, multimodal plumbing."""
