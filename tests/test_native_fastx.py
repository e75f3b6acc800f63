"""Native C++ FASTA/FASTQ parser vs the pure-Python reader (byte parity)."""

import io
import os
import subprocess

import pytest

from sourmash_tpu import native
from sourmash_tpu import sequence_io as sio

from conftest import utils_test_data


def _py_records(path):
    f = sio._open_maybe_compressed(path)
    first = f.read(1)
    stream = io.BufferedReader(sio._Chain(first, f))
    it = sio._iter_fasta(stream) if first == b">" else sio._iter_fastq(stream)
    out = list(it)
    f.close()
    return out


needs_native = pytest.mark.skipif(
    not native.available(), reason="no g++/zlib to build native parser"
)


@needs_native
@pytest.mark.parametrize(
    "fn",
    ["short.fa", "ecoli.genes.fna", "genome-s10.fa.gz", "ecoli.faa"],
)
def test_native_matches_python(fn):
    path = utils_test_data(fn)
    assert _py_records(path) == list(native.iter_records_bytes(path))


@needs_native
def test_native_fastq_roundtrip(tmp_path):
    p = tmp_path / "t.fastq"
    with open(p, "w") as f:
        for i in range(100):
            f.write(f"@read{i} desc\nACGTACGTAC\n+\n!!!!!!!!!!\n")
    recs = list(native.iter_records_bytes(str(p)))
    assert len(recs) == 100
    assert recs[0] == ("read0 desc", b"ACGTACGTAC")
    assert _py_records(str(p)) == recs

    subprocess.run(["gzip", "-kf", str(p)], check=True)
    assert list(native.iter_records_bytes(str(p) + ".gz")) == recs


@needs_native
def test_native_multiline_and_crlf(tmp_path):
    p = tmp_path / "t.fa"
    with open(p, "wb") as f:
        f.write(b">a desc\r\nACGT\r\nTTTT\r\n>b\nGG\n\nCC\n")
    recs = list(native.iter_records_bytes(str(p)))
    assert recs == [("a desc", b"ACGTTTTT"), ("b", b"GGCC")]
    assert _py_records(str(p)) == recs


@needs_native
def test_native_batches_match_python_batches():
    path = utils_test_data("ecoli.genes.fna")
    nb = list(sio.iter_record_batches(path, 31))
    orig = sio._native_ok
    sio._native_ok = lambda p: False
    try:
        pb = list(sio.iter_record_batches(path, 31))
    finally:
        sio._native_ok = orig
    assert [n for n, _ in nb] == [n for n, _ in pb]
    assert [bytes(s) for _, s in nb] == [s for _, s in pb]


@needs_native
def test_native_malformed(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("this is not fasta\n")
    with pytest.raises(ValueError):
        list(native.iter_records_bytes(str(p)))
