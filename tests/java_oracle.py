"""Independent pure-Python oracle implementing the reference's Java semantics
with scalar loops, transcribed from behavior (not shared with the framework
code under test). Used for differential testing of ops/ and the prepare
pipeline, including the reference's buffer-reuse quirk across frames
(prepareQuery, ref KmerGutsJava.java:1051-1074)."""
from __future__ import annotations

K = 8
GENETIC_CODE = ("KNKNTTTTRSRSIIMI"
                "QHQHPPPPRRRRLLLL"
                "EDEDAAAAGGGGVVVV"
                "*Y*YSSSS*CWCLFLF")
PROT_ALPHA = "ACDEFGHIKLMNPQRSTVWY"
_AA_OFF = {c: i for i, c in enumerate(PROT_ALPHA)}

_COMPL = {}
for pair in ["at", "AT", "cg", "CG", "gc", "GC", "ta", "ua", "TA", "UA",
             "mk", "MK", "ry", "RY", "ww", "WW", "sS", "SS", "yr", "YR",
             "km", "KM", "bv", "BV", "dh", "DH", "hd", "HD", "vb", "VB",
             "nn", "NN"]:
    _COMPL[pair[0]] = pair[1]


def to_aa_off(c: str) -> int:
    return _AA_OFF.get(c, 20)


def compl(c: str) -> str:
    return _COMPL.get(c, c)


def rev_comp(seq: str) -> str:
    return "".join(compl(c) for c in reversed(seq))


def dna_char(c: str) -> int:
    return {"a": 0, "A": 0, "c": 1, "C": 1, "g": 2, "G": 2,
            "t": 3, "u": 3, "T": 3, "U": 3}.get(c, 4)


def translate_into(seq: str, off: int, pseq: list, piseq: list) -> None:
    """Exact transcription of translate (ref :320-343), mutating the reused
    buffers like the Java code does."""
    maxi = len(seq) - 3
    p = 0
    i = off
    while i <= maxi:
        c1, c2, c3 = dna_char(seq[i]), dna_char(seq[i + 1]), dna_char(seq[i + 2])
        i += 3
        if c1 < 4 and c2 < 4 and c3 < 4:
            prot_c = GENETIC_CODE[c1 * 16 + c2 * 4 + c3]
            pseq[p] = prot_c
            piseq[p] = to_aa_off(prot_c)
        else:
            pseq[p] = "x"
            piseq[p] = 20
        p += 1
    if p < len(pseq):
        pseq[p] = "\0"
        piseq[p] = 21


def encoded_kmer(data: list, pos: int) -> int:
    value = 0
    for i in range(K):
        add = data[pos + i]
        if add >= 20:
            return -1
        value = value * 20 + add
    return value


def add_kmers(piseq: list):
    """ref addKmers :900-922 — yields (value, pos) for one container."""
    out = []
    for i in range(len(piseq) - K):
        v = encoded_kmer(piseq, i)
        if v >= 0:
            out.append((v, i))
    return out


def prepare_query(seq: str, aa: bool):
    """ref prepareQuery :1051-1074 — returns list of per-container
    [(value, pos), ...] in container creation order (+0,+1,+2,-0,-1,-2 for
    DNA; single container for aa), with exact buffer-reuse semantics."""
    containers = []
    if aa:
        piseq = [to_aa_off(c) for c in seq]
        containers.append(add_kmers(piseq))
    else:
        ln = len(seq) // 3 + 1
        pseq = ["\0"] * ln
        piseq = [0] * ln
        for frame in range(3):
            translate_into(seq, frame, pseq, piseq)
            containers.append(add_kmers(piseq))
        compl_seq = rev_comp(seq)
        for frame in range(3):
            translate_into(compl_seq, frame, pseq, piseq)
            containers.append(add_kmers(piseq))
    return containers
