"""Codec kernels: pure-numpy encode/decode, no Spark imports here."""
