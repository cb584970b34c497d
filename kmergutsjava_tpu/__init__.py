"""TPU-native signature-k-mer annotation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference engine (rsutormin/KmerGutsJava): FASTA -> 6-frame translation ->
amino-acid 8-mer encoding -> signature-table lookup -> per-sequence function
CALLs and OTU counts, bit-identical to the reference's text report.
"""
import jax as _jax

# Encoded 8-mers span [0, 20^8) which exceeds int32; device-side encode and
# home-slot computation use int64 (XLA:TPU emulates s64 on 32-bit lanes).
# Pallas kernels avoid s64 via hi/lo int32 planes (see formats.kmer_table).
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
