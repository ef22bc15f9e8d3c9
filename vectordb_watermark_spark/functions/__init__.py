"""Scalar/array kernels: bit codecs, CRC-4, AES-GCM, keyed-hash randomness,
vector math, text analysis."""
