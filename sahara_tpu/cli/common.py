"""Shared CLI plumbing: timing/stats blocks, FASTA-to-rank loading.

Reproduces the reference's console conventions: a ``config:`` block echoing
flags, phase timings accumulated into a ``stats:`` block with derived
queries/sec (e.g. search.cpp:134-147, 265-273)."""

from __future__ import annotations

import sys

import numpy as np

from sahara_tpu.alphabet import Alphabet
from sahara_tpu.io.fasta import read_fasta
from sahara_tpu.utils.errors import SaharaError
from sahara_tpu.utils.stopwatch import Timings  # noqa: F401  (re-exported for commands)


def load_queries_ranked(
    path, alphabet: Alphabet, *, add_revcomp: bool, context: str = "query"
) -> list[np.ndarray]:
    """Load a FASTA into rank arrays, optionally appending the reverse
    complement after each record (search.cpp:115-124: queryIds count both
    strands)."""
    queries: list[np.ndarray] = []
    for record in read_fasta(path):
        ranks = alphabet.char_to_rank(record.seq)
        if (pos := alphabet.verify_rank(ranks)) is not None:
            raise SaharaError(
                f"{context} '{record.id}' ({len(queries) + 1}) has invalid character at "
                f"position {pos} '{chr(record.seq[pos])}'({record.seq[pos]:x})"
            )
        queries.append(ranks)
        if add_revcomp:
            queries.append(alphabet.reverse_complement_rank(ranks))
    return queries


def load_reference_ranked(
    path, alphabet: Alphabet, *, ignore_unknown: bool, unknown_policy: str = "N", rng=None
) -> list[np.ndarray]:
    """Load reference FASTA into rank arrays.

    unknown_policy 'N': invalid chars become the N rank (index.cpp:63-67);
    'random-acgt': invalid (incl. N) become random A/C/G/T ranks
    (index.cpp:56-61); 'random-12': random rank 1/2 for dr_dna4
    (rbi-index-dna4.cpp:52-56)."""
    from sahara_tpu.alphabet import INVALID_RANK

    seqs: list[np.ndarray] = []
    for record in read_fasta(path):
        ranks = alphabet.char_to_rank(record.seq)
        if ignore_unknown:
            bad = ranks == INVALID_RANK
            if unknown_policy == "random-acgt":
                n_rank = alphabet.char_to_rank(b"N")[0]
                bad = bad | (ranks == n_rank)
            if bad.any():
                ranks = ranks.copy()
                if unknown_policy == "N":
                    ranks[bad] = alphabet.char_to_rank(b"N")[0]
                elif unknown_policy == "random-acgt":
                    r = np.random.default_rng(0) if rng is None else rng
                    ranks[bad] = r.integers(1, 5, size=int(bad.sum()))
                elif unknown_policy == "random-12":
                    r = np.random.default_rng(0) if rng is None else rng
                    ranks[bad] = r.integers(1, 3, size=int(bad.sum()))
                else:
                    raise ValueError(unknown_policy)
        if (pos := alphabet.verify_rank(ranks)) is not None:
            raise SaharaError(
                f"ref '{record.id}' ({len(seqs) + 1}) has invalid character "
                f"'{chr(record.seq[pos])}' (0x{record.seq[pos]:02x}) at position {pos}"
            )
        seqs.append(ranks)
    return seqs


def write_hits(path, rows) -> int:
    """Write ``queryId seqId pos`` lines (search.cpp:256-261)."""
    n = 0
    with open(path, "w") as fh:
        for query_id, seq_id, pos, *_ in rows:
            fh.write(f"{query_id} {seq_id} {pos}\n")
            n += 1
    return n


def die(msg: str) -> None:
    print(msg, file=sys.stderr)
    raise SystemExit(1)
