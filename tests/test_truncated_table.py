"""Truncated table file -> partial report + 'Error: null' info line, the
reference's EOFException behavior (ref run() :797-802)."""
import io
import os

import numpy as np

from kmergutsjava_tpu.config import EngineConfig
from kmergutsjava_tpu.formats.kmer_table import TABLE_FILE, read_table
from kmergutsjava_tpu.formats.table_tools import (signatures_from_proteins,
                                                  write_data_dir)
from kmergutsjava_tpu.models.pipeline import Engine

AA = "ACDEFGHIKLMNPQRSTVWY"


def test_truncated_table_partial_report(tmp_path):
    d = tmp_path / "d"
    write_data_dir(str(d), signatures_from_proteins([(AA, 0, 3)], weight=0.5),
                   ["funcA"])
    path = str(d / TABLE_FILE)
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size // 2)

    table = read_table(path)
    assert table.truncated
    assert len(table.slots) < table.num_sigs

    import warnings

    out = io.StringIO()
    cfg = EngineConfig(aa=True, debug=True, backend="xla")  # rerouted to parity
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # expected reroute warning
        Engine(cfg).run(str(d), None, out, stdout=True,
                        query_stream=io.StringIO(">P1\n" + AA + "\n"))
    text = out.getvalue()
    assert "Error: null" in text  # EOFException's null message, verbatim
    assert "PROTEIN-ID\tP1\t20" in text  # grouping still ran


def test_dense_table_falls_back_to_parity(tmp_path):
    """probe window > 256 (uint8 offsets) -> engine degrades to parity."""
    import warnings

    import numpy as np

    from kmergutsjava_tpu.formats.function_index import write_function_index
    from kmergutsjava_tpu.formats.kmer_table import (TABLE_FILE, KmerTable,
                                                     SLOT_DTYPE, write_table)
    from kmergutsjava_tpu.constants import EMPTY_KMER

    # handcraft a table with a 300-slot probe chain
    num_sigs = 600
    slots = np.zeros(num_sigs, dtype=SLOT_DTYPE)
    slots["kmer"] = EMPTY_KMER
    for i in range(300):
        slots["kmer"][i] = i * num_sigs  # all home slot 0 -> chain length 300
    d = tmp_path / "d"
    d.mkdir()
    table = KmerTable(slots=slots, num_sigs=num_sigs)
    table.compute_max_probe()
    assert table.max_probe == 300
    write_table(str(d / TABLE_FILE), table)
    write_function_index(str(d / "function.index"), ["f0"])

    out = io.StringIO()
    cfg = EngineConfig(aa=True, backend="xla")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Engine(cfg).run(str(d), None, out, stdout=True,
                        query_stream=io.StringIO(">P1\n" + AA + "\n"))
        assert any("parity" in str(x.message) for x in w)
    assert "PROTEIN-ID\tP1\t20" in out.getvalue()


def test_lookup_error_yields_partial_report(tmp_path, monkeypatch):
    """Any lookup-phase failure -> Error line + grouping still runs
    (ref :797-802)."""
    write_data_dir(str(tmp_path / "d"), __import__(
        "kmergutsjava_tpu.formats.table_tools",
        fromlist=["signatures_from_proteins"]).signatures_from_proteins(
        [(AA, 0, 3)], weight=0.5), ["funcA"])

    from kmergutsjava_tpu.lookup import xla as xla_mod

    def boom(self):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(xla_mod.StreamingLookup, "finish", boom)
    out = io.StringIO()
    # explicit xla: backend 'auto' on an unknown-size input defers and
    # would finish on the one-shot path, never reaching StreamingLookup
    cfg = EngineConfig(aa=True, debug=True, backend="xla")
    Engine(cfg).run(str(tmp_path / "d"), None, out, stdout=True,
                    query_stream=io.StringIO(">P1\n" + AA + "\n"))
    text = out.getvalue()
    assert "Error: injected device failure" in text
    assert "PROTEIN-ID\tP1\t20" in text  # grouping still ran (no hits)
    assert "CALL" not in text
