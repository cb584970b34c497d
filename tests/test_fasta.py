import gzip
import io

import pytest

from kmergutsjava_tpu.formats.fasta import FastaError, read_fasta


def parse(text: str):
    return list(read_fasta(io.StringIO(text)))


def test_basic():
    recs = parse(">id1 some description here\nACGT\nGGCC\n>id2\nTTTT\n")
    assert recs[0].id == "id1"
    assert recs[0].descr == "some description here"
    assert recs[0].seq == "ACGTGGCC"
    assert recs[1] == ("id2", "TTTT", "")


def test_id_tokenization_tabs():
    recs = parse(">abc\tdef  ghi\nAAAA\n")
    assert recs[0].id == "abc"
    assert recs[0].descr == "def ghi"


def test_short_lines_skipped_while_seeking():
    # trimmed length <= 1 lines are skipped while seeking a caption,
    # including a bare '>' (ref :1144-1161)
    recs = parse("\n \n>\nA\n>id AB\nACGT\n")
    # "A" is a 1-char line -> skipped; then caption parsed
    assert recs == [("id", "ACGT", "AB")]


def test_wrong_caption_line():
    with pytest.raises(FastaError, match="Wrong caption line"):
        parse("garbage line\n>id\nACGT\n")


def test_caption_without_sequence():
    with pytest.raises(FastaError, match="No sequence for caption: id1"):
        parse(">id1\n>id2\nACGT\n")
    with pytest.raises(FastaError, match="No sequence for caption: id1"):
        parse(">id1\n\n\n")


def test_raw_line_append_preserves_interior_spaces():
    # sequence lines are appended untrimmed (ref :1175-1180)
    recs = parse(">id\nAC GT\nTT\n")
    assert recs[0].seq == "AC GTTT"


def test_blank_lines_before_first_seq_line_skipped():
    recs = parse(">id\n\n\nACGT\n")
    assert recs[0].seq == "ACGT"


def test_blank_line_within_sequence_kept_as_empty():
    recs = parse(">id\nAC\n\nGT\n")
    assert recs[0].seq == "ACGT"


def test_gz_roundtrip(tmp_path):
    p = tmp_path / "x.fasta.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a d1\nACGT\n>b\nGGGG\n")
    recs = list(read_fasta(str(p)))
    assert [r.id for r in recs] == ["a", "b"]
    assert recs[0].seq == "ACGT"
