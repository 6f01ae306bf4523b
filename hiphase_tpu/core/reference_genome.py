"""Whole-genome FASTA store (ref: src/data_types/reference_genome.rs).

Loads the full FASTA (plain or gzip, sniffed by extension) into memory as
uppercased byte strings per contig, preserving file order of contigs.
"""

from __future__ import annotations

import gzip
import logging

logger = logging.getLogger(__name__)


class ReferenceGenome:
    def __init__(self, filename: str | None = None):
        self._contigs: dict[str, bytes] = {}
        self.filename = filename
        if filename is not None:
            self._load(filename)

    @classmethod
    def from_fasta(cls, filename: str) -> "ReferenceGenome":
        return cls(filename)

    @classmethod
    def from_dict(cls, contigs: dict[str, bytes]) -> "ReferenceGenome":
        rg = cls(None)
        rg._contigs = {k: bytes(v).upper() for k, v in contigs.items()}
        return rg

    def _load(self, filename: str) -> None:
        opener = gzip.open if filename.endswith(".gz") else open
        name = None
        chunks: list[bytes] = []
        with opener(filename, "rb") as fh:
            for line in fh:
                line = line.rstrip()
                if line.startswith(b">"):
                    if name is not None:
                        self._contigs[name] = b"".join(chunks).upper()
                    name = line[1:].split()[0].decode()
                    chunks = []
                else:
                    chunks.append(line)
        if name is not None:
            self._contigs[name] = b"".join(chunks).upper()

    def contig_keys(self) -> list[str]:
        """Contig names in file order (ref: reference_genome.rs:65)."""
        return list(self._contigs.keys())

    def has_contig(self, chrom: str) -> bool:
        return chrom in self._contigs

    def contig_length(self, chrom: str) -> int:
        return len(self._contigs[chrom])

    def get_full_chromosome(self, chrom: str) -> bytes:
        return self._contigs[chrom]

    def get_slice(self, chrom: str, start: int, end: int) -> bytes:
        """[start, end) slice with clamping warnings
        (ref: reference_genome.rs:78-90)."""
        seq = self._contigs[chrom]
        if start > len(seq) or end > len(seq):
            logger.warning(
                "get_slice(%s, %d, %d) clamped to contig length %d",
                chrom, start, end, len(seq))
            start = min(start, len(seq))
            end = min(end, len(seq))
        return seq[start:end]
