"""Minimal `screed` compatibility shim over sourmash_tpu.sequence_io.

The reference code base and its test suite import the external `screed`
library for FASTA/FASTQ reading (reference command_sketch.py:318,
tests/test_sourmash.py:8). This framework has its own parser
(sourmash_tpu/sequence_io.py); this package provides the small screed API
surface those tests and user scripts rely on: `screed.open`, `screed.rc`,
`screed.fasta.fasta_iter`, and `__version__`.
"""

from __future__ import annotations

__version__ = "1.1.3-compat"

from . import fasta  # noqa: E402,F401
from .fasta import Record, iter_records  # noqa: E402

# IUPAC-complete complement table (matches screed.dna behavior: case is
# preserved; non-IUPAC characters pass through unchanged).
_COMP = str.maketrans(
    "ACGTURYSWKMBDHVNacgturyswkmbdhvn",
    "TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn",
)


def rc(sequence: str) -> str:
    "Reverse complement (IUPAC-aware, case preserving)."
    return sequence.translate(_COMP)[::-1]


class ScreedIter:
    """Iterable + context manager over the records of a sequence file."""

    def __init__(self, filename):
        from sourmash_tpu.sequence_io import open_reader

        self._fp = open_reader(filename)

    def __iter__(self):
        return iter_records(self._fp)

    def __bool__(self):
        return True

    def close(self):
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(filename):  # noqa: A001 - screed API name
    "Open a FASTA/FASTQ file (gzip/bzip2 autodetected) for record iteration."
    return ScreedIter(filename)
