"""PallasLookup (interpret mode on CPU) vs parity oracle."""
import numpy as np
import pytest

from kmergutsjava_tpu.formats.kmer_table import build_table
from kmergutsjava_tpu.lookup.pallas_kernel import PallasLookup
from kmergutsjava_tpu.lookup.parity import lookup_stream
from test_lookup import canon, make_queries
from test_table import random_signatures


@pytest.mark.parametrize("seed,load,nq", [(0, 0.6, 3000), (1, 0.9, 6000)])
def test_pallas_vs_parity(seed, load, nq):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=load)
    values, cnt, pos = make_queries(rng, sig["kmers"], nq)
    a = lookup_stream(table, values, cnt, pos)
    b = PallasLookup(table).lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_pallas_dense_queries():
    """Query every signature (density ~ load factor)."""
    rng = np.random.default_rng(7)
    sig = random_signatures(rng, 5000)
    table = build_table(**sig)
    v = sig["kmers"]
    a = lookup_stream(table, v, np.zeros(len(v)), np.arange(len(v)))
    b = PallasLookup(table).lookup(v, np.zeros(len(v)), np.arange(len(v)))
    assert len(b) == len(v)
    assert canon(a) == canon(b)
