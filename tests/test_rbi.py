"""rbi family end-to-end: e>=1 recovery, the dna4 variant, and the mirror
seqId contract (CONFORMANCE.md §4: ids [m, 2m) are reverse-orientation
hits in the mirrored copy's coordinates)."""

import re

import numpy as np
import pytest

from sahara_tpu.cli.main import main
from sahara_tpu.io.fasta import FastaRecord, read_fasta, write_fasta

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


@pytest.fixture(scope="module")
def rbi_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rbi")
    rng = np.random.default_rng(23)
    seqs = [
        FastaRecord(id=f"chr{i}", seq=bytes(b"ACGT"[j] for j in rng.integers(0, 4, size=n)))
        for i, n in enumerate((600, 300))
    ]
    ref = tmp / "ref.fasta"
    write_fasta(ref, seqs)
    reads = tmp / "reads.fasta"
    assert main(["read_simulator", "-i", str(ref), "-o", str(reads),
                 "-n", "10", "-l", "40", "-e", "1", "--seed", "12"]) == 0
    assert main(["rbi-index", str(ref)]) == 0
    assert main(["rbi-index-dna4", str(ref)]) == 0
    return tmp, str(ref), seqs


def _hits(path):
    out = set()
    for line in open(path):
        q, s, p = map(int, line.split())
        out.add((q, s, p))
    return out


def _truth(reads_path):
    for i, rec in enumerate(read_fasta(reads_path)):
        m = re.search(r"seqid:(\d+), pos:(\d+), trans:([MSID]+)", rec.id)
        yield i, int(m.group(1)), int(m.group(2)), rec.seq


def test_rbi_search_e1_recovers_planted_reads(rbi_corpus, tmp_path):
    tmp, ref, seqs = rbi_corpus
    out = tmp_path / "out.txt"
    assert main(["rbi-search", "-q", str(tmp / "reads.fasta"), "-i", ref + ".rbi.idx",
                 "-o", str(out), "-e", "1", "-g", "optimum"]) == 0
    hits = _hits(out)
    for qid, sid, pos, _ in _truth(tmp / "reads.fasta"):
        assert (qid, sid, pos) in hits, f"read {qid} not recovered at ({sid},{pos})"


def test_rbi_dna4_search_e1_recovers_planted_reads(rbi_corpus, tmp_path):
    tmp, ref, seqs = rbi_corpus
    out = tmp_path / "out4.txt"
    assert main(["rbi-search-dna4", "-q", str(tmp / "reads.fasta"), "-i", ref + ".rbi4.idx",
                 "-o", str(out), "-e", "1", "-g", "optimum"]) == 0
    hits = _hits(out)
    for qid, sid, pos, _ in _truth(tmp / "reads.fasta"):
        assert (qid, sid, pos) in hits, f"read {qid} not recovered at ({sid},{pos})"


def test_rbi_mirror_seqid_contract(rbi_corpus, tmp_path):
    """A reverse-complement query hits the mirror copy: seqId = sid + m,
    pos = len(seq) - pos - span (exact match, e=0)."""
    tmp, ref, seqs = rbi_corpus
    span = 30
    sid, pos = 0, 100
    fwd = seqs[sid].seq[pos : pos + span]
    rc = fwd.translate(_COMP)[::-1]
    qpath = tmp_path / "rc.fasta"
    write_fasta(qpath, [FastaRecord(id="rc0", seq=rc)])
    out = tmp_path / "rc_out.txt"
    assert main(["rbi-search", "-q", str(qpath), "-i", ref + ".rbi.idx",
                 "-o", str(out), "-e", "0", "-g", "optimum"]) == 0
    hits = _hits(out)
    m = len(seqs)
    mirror_pos = len(seqs[sid].seq) - pos - span
    assert (0, sid + m, mirror_pos) in hits, sorted(hits)[:10]