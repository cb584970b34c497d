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


# --- independent transcription of the grouping/OTU state machine ---
# (ref gatherHits :457-514, processSetOfHits :385-455, tabulate :516-524)
# Deliberately written as a direct line-by-line port, separate from
# kmergutsjava_tpu/calls/grouping.py, to differentially test it.

OI_BUFSZ = 5
MAX_HITS_PER_SEQ = 40000


class _F32:
    """Minimal float32 accumulator matching Java float addition."""

    def __init__(self):
        import numpy as _np
        self._np = _np
        self.v = _np.float32(0.0)

    def add(self, x):
        self.v = self._np.float32(self.v + self._np.float32(x))


def oracle_process_set(hits, functions, current_fi, oi_counts, lines, params):
    min_hits, min_weighted, max_gap, order_c, debug = params
    fi_count = 0
    acc = _F32()
    last_hit = 0
    for i in range(len(hits)):
        if hits[i][3] == current_fi:
            last_hit = i
            fi_count += 1
            acc.add(hits[i][4])
    if fi_count >= min_hits and float(acc.v) >= min_weighted:
        from kmergutsjava_tpu.utils.javafmt import jformat
        lines.append("CALL\t%d\t%d\t%d\t%d\t%s\t%s" % (
            hits[0][0], hits[last_hit][0] + 7, fi_count, current_fi,
            functions[current_fi], jformat(float(acc.v))))
        for i in range(last_hit + 1):
            if hits[i][3] == current_fi:
                oi = hits[i][1]
                j = 0
                while j < len(oi_counts) and oi_counts[j][0] != oi:
                    j += 1
                if j == len(oi_counts):
                    if len(oi_counts) == OI_BUFSZ:
                        j -= 1
                    else:
                        oi_counts.append([0, 0])
                    oi_counts[j][0] = oi
                    oi_counts[j][1] = 1
                else:
                    oi_counts[j][1] += 1
                while j > 0 and oi_counts[j - 1][1] <= oi_counts[j][1]:
                    oi_counts[j - 1], oi_counts[j] = (oi_counts[j],
                                                      oi_counts[j - 1])
                    j -= 1
    num = len(hits)
    if hits[num - 2][3] != current_fi and hits[num - 2][3] == hits[num - 1][3]:
        current_fi = hits[num - 1][3]
        a, b = hits[num - 2], hits[num - 1]
        del hits[:]
        hits.extend([a, b])
    else:
        del hits[:]
    return current_fi


def oracle_gather_hits(all_hits, functions, oi_counts, params):
    """Returns the CALL lines for one container (non-debug)."""
    min_hits, min_weighted, max_gap, order_c, debug = params
    lines = []
    all_hits = sorted(all_hits, key=lambda h: h[0])
    hits = []
    current_fi = 0
    for ph in all_hits:
        avg_off_end = ph[2]
        fi = ph[3]
        if len(hits) > 0 and hits[-1][0] + max_gap < ph[0]:
            if len(hits) >= min_hits:
                current_fi = oracle_process_set(hits, functions, current_fi,
                                                oi_counts, lines, params)
            else:
                del hits[:]
        if len(hits) == 0:
            current_fi = fi
        if ((not order_c) or len(hits) == 0
                or (fi == hits[-1][3]
                    and abs((ph[0] - hits[-1][0])
                            - (hits[-1][2] - avg_off_end)) <= 20)):
            if len(hits) < MAX_HITS_PER_SEQ - 2:
                hits.append(ph)
            if (len(hits) > 1 and current_fi != fi
                    and hits[-2][3] == hits[-1][3]):
                current_fi = oracle_process_set(hits, functions, current_fi,
                                                oi_counts, lines, params)
    if len(hits) >= min_hits:
        oracle_process_set(hits, functions, current_fi, oi_counts, lines,
                           params)
    return lines


def oracle_gather_hits_debug(all_hits, functions, oi_counts, params):
    """Debug-mode variant: also emits HIT / after-hit: / after-call: lines
    (ref :472-475, :498-501, :406-409)."""
    from kmergutsjava_tpu.utils.javafmt import jformat
    min_hits, min_weighted, max_gap, order_c, _ = params
    lines = []

    def display(hits, prefix):
        parts = [prefix + "hits: "]
        for h in hits:
            parts.append("%d/%s/%d " % (h[0], jformat(float(h[4])), h[3]))
        lines.append("".join(parts))

    def process(hits, current_fi):
        fi_count = 0
        acc = _F32()
        last_hit = 0
        for i in range(len(hits)):
            if hits[i][3] == current_fi:
                last_hit = i
                fi_count += 1
                acc.add(hits[i][4])
        if fi_count >= min_hits and float(acc.v) >= min_weighted:
            lines.append("CALL\t%d\t%d\t%d\t%d\t%s\t%s" % (
                hits[0][0], hits[last_hit][0] + 7, fi_count, current_fi,
                functions[current_fi], jformat(float(acc.v))))
            display(hits, "after-call: ")
            for i in range(last_hit + 1):
                if hits[i][3] == current_fi:
                    oi = hits[i][1]
                    j = 0
                    while j < len(oi_counts) and oi_counts[j][0] != oi:
                        j += 1
                    if j == len(oi_counts):
                        if len(oi_counts) == OI_BUFSZ:
                            j -= 1
                        else:
                            oi_counts.append([0, 0])
                        oi_counts[j][0] = oi
                        oi_counts[j][1] = 1
                    else:
                        oi_counts[j][1] += 1
                    while j > 0 and oi_counts[j - 1][1] <= oi_counts[j][1]:
                        oi_counts[j - 1], oi_counts[j] = (oi_counts[j],
                                                          oi_counts[j - 1])
                        j -= 1
        num = len(hits)
        if (hits[num - 2][3] != current_fi
                and hits[num - 2][3] == hits[num - 1][3]):
            current_fi = hits[num - 1][3]
            a, b = hits[num - 2], hits[num - 1]
            del hits[:]
            hits.extend([a, b])
        else:
            del hits[:]
        return current_fi

    all_hits = sorted(all_hits, key=lambda h: h[0])
    hits = []
    current_fi = 0
    for ph in all_hits:
        avg_off_end = ph[2]
        fi = ph[3]
        lines.append("HIT\t%d\t%d\t%d\t%d\t%s\t%d" % (
            ph[0], 0, avg_off_end, fi, jformat(float(ph[4]), 3), ph[1]))
        if len(hits) > 0 and hits[-1][0] + max_gap < ph[0]:
            if len(hits) >= min_hits:
                current_fi = process(hits, current_fi)
            else:
                del hits[:]
        if len(hits) == 0:
            current_fi = fi
        if ((not order_c) or len(hits) == 0
                or (fi == hits[-1][3]
                    and abs((ph[0] - hits[-1][0])
                            - (hits[-1][2] - avg_off_end)) <= 20)):
            if len(hits) < MAX_HITS_PER_SEQ - 2:
                hits.append(ph)
                display(hits, "after-hit: ")
            if (len(hits) > 1 and current_fi != fi
                    and hits[-2][3] == hits[-1][3]):
                current_fi = process(hits, current_fi)
    if len(hits) >= min_hits:
        process(hits, current_fi)
    return lines


def _java_trim(s):
    start, end = 0, len(s)
    while start < end and s[start] <= " ":
        start += 1
    while end > start and s[end - 1] <= " ":
        end -= 1
    return s[start:end]


def oracle_read_fasta(lines):
    """Line-by-line port of readFasta (ref :1132-1192) over a line list.
    Returns list of (id, seq, descr); raises ValueError on format errors."""
    it = iter(lines)

    def readline():
        try:
            return next(it)
        except StopIteration:
            return None

    out = []
    str1 = None
    first = True
    while True:
        prot_name = None
        prot_descr = None
        if first or str1 is None:
            if str1 is None:
                str1 = readline()
            first = False
        while True:
            if str1 is None:
                break
            str2 = _java_trim(str1)
            if len(str2) > 1:
                if str2[0] == ">" and len(_java_trim(str2[1:])) > 0:
                    toks = [t for t in str2[1:].replace("\t", " ").split(" ")
                            if t]
                    prot_name = toks[0]
                    prot_descr = " ".join(toks[1:])
                    break
                raise ValueError("Wrong caption line: " + str2)
            str1 = readline()
        if prot_name is None:
            return out
        while True:
            str1 = readline()
            if str1 is None or _java_trim(str1).startswith(">"):
                raise ValueError("No sequence for caption: " + prot_name)
            if len(_java_trim(str1)) > 0:
                break
        sb = []
        while True:
            sb.append(str1)
            str1 = readline()
            if str1 is None or _java_trim(str1).startswith(">"):
                break
        seq = "".join(sb)
        if len(seq) == 0:
            raise ValueError("No sequence for caption: " + prot_name)
        out.append((prot_name, seq, prot_descr))
