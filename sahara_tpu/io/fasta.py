"""Streaming FASTA reader/writer.

TPU-native framework's equivalent of the ivio FASTA layer used by the
reference (e.g. /root/reference/src/sahara/search.cpp:115,
read_simulator.cpp:254-256: writer wraps sequence lines at a configurable
length).
"""

from __future__ import annotations

import dataclasses
import io
import os
from collections.abc import Iterator


@dataclasses.dataclass
class FastaRecord:
    id: str
    seq: bytes


def read_fasta(path: str | os.PathLike) -> Iterator[FastaRecord]:
    """Iterate records of a FASTA file (sequence returned as bytes)."""
    rec_id: str | None = None
    chunks: list[bytes] = []
    with open(path, "rb") as fh:
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if not line:
                continue
            if line.startswith(b">"):
                if rec_id is not None:
                    yield FastaRecord(rec_id, b"".join(chunks))
                rec_id = line[1:].decode()
                chunks = []
            elif line.startswith(b";"):
                continue  # legacy comment line
            else:
                if rec_id is None:
                    raise ValueError(f"{path}: sequence data before first '>' header")
                chunks.append(line)
        if rec_id is not None:
            yield FastaRecord(rec_id, b"".join(chunks))


def write_fasta(
    path: str | os.PathLike | io.IOBase,
    records: Iterator[FastaRecord] | list[FastaRecord],
    line_length: int = 80,
) -> None:
    """Write records, wrapping sequence lines at ``line_length`` (0 = no wrap).

    Matches the reference writer semantics (read_simulator.cpp:254-256).
    """
    own = not isinstance(path, io.IOBase)
    fh = open(path, "wb") if own else path
    try:
        for rec in records:
            fh.write(b">" + rec.id.encode() + b"\n")
            seq = rec.seq
            if line_length <= 0:
                fh.write(seq + b"\n")
            else:
                for i in range(0, len(seq), line_length):
                    fh.write(seq[i : i + line_length] + b"\n")
                if not seq:
                    fh.write(b"\n")
    finally:
        if own:
            fh.close()
