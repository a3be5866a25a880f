"""FM-index containers (host-side NumPy arrays) + versioned serialization.

TPU-native equivalents of ``fmc::FMIndex`` / ``fmc::BiFMIndex`` +
``fmc::DenseCSA`` (reference construction sites: index.cpp:87,
uni-index.cpp:70).  The cereal binary archives of the reference become a
flat ``.npz`` container with an explicit format version — the reference only
requires *search output* parity, not index file compatibility (SURVEY.md §2.2).

Text layout invariant: sequences are concatenated, each padded with sentinel
zeros so every sequence starts at a multiple of the SA sampling rate.  Hence
every LF-walk from a hit (which always starts inside a sequence — matched
substrings never contain rank 0) terminates at a sampled text position inside
the *same* sequence after < rate steps.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

FORMAT_VERSION = 2  # v2 adds the optional packed text store (text4)
_READABLE_VERSIONS = (1, 2)


@dataclasses.dataclass
class FMIndex:
    """Unidirectional FM-index over a sequence collection."""

    sigma: int
    alphabet_name: str
    rate: int  # SA sampling rate (reference default 16, index.cpp:87)
    n: int  # total text length (reference `index.size()`, search.cpp:193)
    occ: np.ndarray  # int32[W, 2*sigma] — see occtable.build_occ
    c_arr: np.ndarray  # int32[sigma+1] — C[c] = #symbols < c in the text
    sampled: np.ndarray  # int32[W, 2] — occ-structure over the sampled-row bitvector
    sample_seq: np.ndarray  # int32[S] — seqId per sampled row (row-rank order)
    sample_pos: np.ndarray  # int32[S] — seqPos per sampled row
    seq_lens: np.ndarray  # int64[m] — original sequence lengths
    # packed indexed text (index/textstore.py), int32[ceil(n/8)] or None for
    # indexes built before v2 / with sigma > 15.  Feeds the seed-and-verify
    # engine; every search path works without it (workq fallback).
    text4: np.ndarray | None = None

    @property
    def num_seqs(self) -> int:
        return len(self.seq_lens)

    def size(self) -> int:
        return self.n

    def seq_starts(self) -> np.ndarray:
        """Start offset of each sequence in the padded text layout
        (recomputed from seq_lens — the layout is deterministic,
        see build.build_text)."""
        padded = (self.seq_lens + self.rate) // self.rate * self.rate
        return np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)


@dataclasses.dataclass
class BiFMIndex(FMIndex):
    """Bidirectional FM-index: adds the reversed-text occ table.

    ``mirrored=True`` realizes the reference's MirroredBiFMIndex memory
    optimization (rbi-index.cpp:76): when the sequence collection is
    closed under reversal (each sequence's reverse is also present — the
    rbi build appends mirrors), the reverse cursor of any pattern P is
    itself a FORWARD-index interval (of reverse(P), equal size by mirror
    closure), so right extensions rank the forward table too and
    ``occ_rev`` is never needed — HALF the occ footprint on host, disk,
    and HBM."""

    occ_rev: np.ndarray | None = None  # int32[W, 2*sigma]; None iff mirrored
    mirrored: bool = False


def save_index(path: str, index: FMIndex) -> None:
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "bi" if isinstance(index, BiFMIndex) else "uni",
        "sigma": index.sigma,
        "alphabet": index.alphabet_name,
        "rate": index.rate,
        "n": index.n,
        "mirrored": bool(getattr(index, "mirrored", False)),
    }
    arrays = {
        "occ": index.occ,
        "c_arr": index.c_arr,
        "sampled": index.sampled,
        "sample_seq": index.sample_seq,
        "sample_pos": index.sample_pos,
        "seq_lens": index.seq_lens,
        "meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    if isinstance(index, BiFMIndex) and index.occ_rev is not None:
        arrays["occ_rev"] = index.occ_rev
    if index.text4 is not None:
        arrays["text4"] = index.text4
    if hasattr(path, "write"):
        np.savez(path, **arrays)
    else:
        with open(path, "wb") as fh:
            np.savez(fh, **arrays)


def load_index(path: str) -> FMIndex:
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        if meta["format_version"] not in _READABLE_VERSIONS:
            raise ValueError(f"unknown file format version for index: {meta['format_version']}")
        common = dict(
            text4=data["text4"] if "text4" in data.files else None,
            sigma=meta["sigma"],
            alphabet_name=meta["alphabet"],
            rate=meta["rate"],
            n=meta["n"],
            occ=data["occ"],
            c_arr=data["c_arr"],
            sampled=data["sampled"],
            sample_seq=data["sample_seq"],
            sample_pos=data["sample_pos"],
            seq_lens=data["seq_lens"],
        )
        if meta["kind"] == "bi":
            return BiFMIndex(
                **common,
                occ_rev=data["occ_rev"] if "occ_rev" in data.files else None,
                mirrored=bool(meta.get("mirrored", False)),
            )
        return FMIndex(**common)


def peek_sigma(path: str) -> int:
    """Read just the alphabet size from an index file (search.cpp:278-283)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        return int(meta["sigma"])
