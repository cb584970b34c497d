"""Top-level library surface (docs/api.md): lazy exports + end-to-end use."""
import io

import pytest

import kmergutsjava_tpu as kg


def test_exports_resolve():
    for name in kg.__all__:
        assert getattr(kg, name) is not None


def test_unknown_attribute():
    with pytest.raises(AttributeError):
        kg.no_such_symbol


def test_library_round_trip(tmp_path):
    """Build a data dir, annotate through the public API, check the report
    shape — the docs/api.md quick-start, executed."""
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    sig = kg.signatures_from_proteins([(AAs, 0, 3)], weight=0.5)
    d = str(tmp_path / "data")
    kg.write_data_dir(d, sig, ["funcA"])

    table = kg.read_table(d + "/kmer.table.mem_map")
    assert table.num_sigs > 0
    assert kg.load_function_index(d + "/function.index") == ["funcA"]

    out = io.StringIO()
    kg.Engine(kg.EngineConfig(aa=True)).run(
        d, None, out, stdout=True,
        query_stream=io.StringIO(f">P1\n{AAs}\n"))
    text = out.getvalue()
    assert text.splitlines()[0] == "PROTEIN-ID\tP1\t20"
    assert "CALL\t0\t18\t12\t0\tfuncA\t6.000000" in text

    recs = list(kg.read_fasta(io.StringIO(">a b\nACDEF\n")))
    assert recs == [kg.FastaRecord("a", "ACDEF", "b")]
