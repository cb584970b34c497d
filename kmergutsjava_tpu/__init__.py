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

def enable_compile_cache() -> None:
    """Enable the persistent compilation cache (accelerator runs only).

    TPU compiles of the probe kernels can be expensive (and wildly variable
    through remote-compile relays); combined with power-of-two plane
    buckets the cache makes them one-time. Deliberately NOT enabled for
    CPU-backend runs: XLA:CPU AOT artifacts bake in host ISA feature flags
    and reloading them across heterogeneous hosts risks SIGILL.
    """
    import os as _os

    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        if _jax.default_backend() == "cpu":
            return
        _cache = _os.path.join(_os.path.expanduser("~"), ".cache",
                               "kmergutsjava-tpu", "jax")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass

__version__ = "0.1.0"

# Public library surface (lazy: importing the package must stay cheap and
# must not pull jax.numpy/device state before the caller configures jax).
# See docs/api.md for usage.
_EXPORTS = {
    "Engine": ("kmergutsjava_tpu.models.pipeline", "Engine"),
    "EngineConfig": ("kmergutsjava_tpu.config", "EngineConfig"),
    "build_table": ("kmergutsjava_tpu.formats.kmer_table", "build_table"),
    "read_table": ("kmergutsjava_tpu.formats.kmer_table", "read_table"),
    "write_table": ("kmergutsjava_tpu.formats.kmer_table", "write_table"),
    "KmerTable": ("kmergutsjava_tpu.formats.kmer_table", "KmerTable"),
    "read_fasta": ("kmergutsjava_tpu.formats.fasta", "read_fasta"),
    "FastaRecord": ("kmergutsjava_tpu.formats.fasta", "FastaRecord"),
    "load_function_index": ("kmergutsjava_tpu.formats.function_index",
                            "load_function_index"),
    "signatures_from_proteins": ("kmergutsjava_tpu.formats.table_tools",
                                 "signatures_from_proteins"),
    "write_data_dir": ("kmergutsjava_tpu.formats.table_tools",
                       "write_data_dir"),
}

__all__ = sorted(_EXPORTS) + ["enable_compile_cache"]


def __getattr__(name):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(target[0]), target[1])
    globals()[name] = value  # cache for subsequent lookups
    return value
