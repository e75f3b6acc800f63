"""screed.fasta compatibility: `fasta_iter` plus the shared record parser.

API surface from the external screed library's screed/fasta.py, as used by
the reference test suite (tests/test_hll.py:4 `from screed.fasta import
fasta_iter`).
"""

from __future__ import annotations


class Record(dict):
    "dict with attribute access, like screed.Record; len() is sequence length."

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __len__(self):
        return len(self["sequence"])


def _text(line):
    if isinstance(line, bytes):
        return line.decode("utf-8", "replace")
    return line


def iter_records(fp):
    "Yield Records from a FASTA or FASTQ stream (text or binary)."
    it = iter(fp)
    first = None
    for line in it:
        line = _text(line).rstrip("\r\n")
        if line:
            first = line
            break
    if first is None:
        return
    if first.startswith("@"):
        yield from _fastq_records(first, it)
    else:
        yield from _fasta_records(first, it)


def _fasta_records(first, it):
    if not first.startswith(">"):
        raise ValueError(f"invalid FASTA header: {first!r}")
    name = first[1:]
    chunks = []
    for line in it:
        line = _text(line).rstrip("\r\n")
        if line.startswith(">"):
            yield Record(name=name, sequence="".join(chunks))
            name = line[1:]
            chunks = []
        else:
            chunks.append(line)
    yield Record(name=name, sequence="".join(chunks))


def _fastq_records(first, it):
    header = first
    while True:
        if not header.startswith("@"):
            raise ValueError(f"invalid FASTQ header: {header!r}")
        try:
            seq = _text(next(it)).rstrip("\r\n")
            plus = _text(next(it)).rstrip("\r\n")
            if not plus.startswith("+"):
                raise ValueError("malformed FASTQ record separator")
            qual = _text(next(it)).rstrip("\r\n")
        except StopIteration:
            raise ValueError("truncated FASTQ record")
        yield Record(name=header[1:], sequence=seq, quality=qual)
        header = None
        for line in it:
            line = _text(line).rstrip("\r\n")
            if line:
                header = line
                break
        if header is None:
            return


def fasta_iter(handle, parse_description=False, line=None):
    "Iterator over a FASTA stream, yielding screed-style records."
    yield from iter_records(handle)
