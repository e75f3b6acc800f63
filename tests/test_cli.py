"""CLI end-to-end tests: run the real entry point in-process and assert on
stdout/CSV outputs (reference pattern: `tests/sourmash_tst_utils.py:50-105`
RunnerContext; original code)."""

import csv
import io
import json
import os
import sys
from contextlib import redirect_stderr, redirect_stdout

import pytest

from conftest import utils_test_data


class Runner:
    "In-process `sourmash ...` runner capturing stdout/stderr/status."

    def __init__(self, cwd):
        self.cwd = str(cwd)
        self.out = ""
        self.err = ""
        self.status = 0

    def sourmash(self, *args, fail_ok=False):
        from sourmash_tpu.__main__ import main

        old = os.getcwd()
        os.chdir(self.cwd)
        o, e = io.StringIO(), io.StringIO()
        status = 0
        try:
            with redirect_stdout(o), redirect_stderr(e):
                ret = main(list(str(a) for a in args))
            status = int(ret) if ret else 0
        except SystemExit as exc:
            status = exc.code if isinstance(exc.code, int) else 1
        finally:
            os.chdir(old)
        self.out, self.err, self.status = o.getvalue(), e.getvalue(), status
        if status != 0 and not fail_ok:
            raise AssertionError(
                f"sourmash {' '.join(map(str, args))} failed "
                f"({status}):\n{self.err}"
            )
        return self

    def output(self, name):
        return os.path.join(self.cwd, name)


@pytest.fixture
def runtmp(tmp_path):
    return Runner(tmp_path)


def test_cli_sketch_and_describe(runtmp):
    runtmp.sourmash(
        "sketch", "dna", "-p", "k=31,scaled=1000",
        utils_test_data("ecoli.genes.fna"), "-o", "e.sig",
    )
    runtmp.sourmash("sig", "describe", runtmp.output("e.sig"))
    assert "k=31 molecule=DNA" in runtmp.out
    assert "num=0" in runtmp.out


def test_cli_search_known_value(runtmp):
    runtmp.sourmash(
        "search", utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
        "--threshold", "0.0",
    )
    assert "32.1%" in runtmp.out
    assert "NC_011663.1" in runtmp.out


def test_cli_compare_csv(runtmp):
    runtmp.sourmash(
        "compare",
        utils_test_data("47.fa.sig"),
        utils_test_data("63.fa.sig"),
        "--csv", "cmp.csv",
    )
    with open(runtmp.output("cmp.csv")) as fp:
        rows = list(csv.reader(fp))
    # 2x2 similarity matrix with 1.0 diagonal and the known 0.3207 jaccard
    vals = [[float(x) for x in row] for row in rows[1:]]
    assert vals[0][0] == 1.0 and vals[1][1] == 1.0
    assert round(vals[0][1], 4) == round(0.3206949023586102, 4)


def test_cli_gather_known_values(runtmp):
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"),
        utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
        "-o", "g.csv",
    )
    assert "found 2 matches total" in runtmp.out
    with open(runtmp.output("g.csv")) as fp:
        rows = list(csv.DictReader(fp))
    assert [r["intersect_bp"] for r in rows] == ["5238000", "5177000"]
    assert rows[0]["f_orig_query"].startswith("0.664215")


def test_cli_index_and_search_sbt(runtmp):
    runtmp.sourmash(
        "index", "mysbt", utils_test_data("47.fa.sig"),
        utils_test_data("63.fa.sig"), "-k", "31",
    )
    assert os.path.exists(runtmp.output("mysbt.sbt.zip"))
    runtmp.sourmash(
        "search", utils_test_data("47.fa.sig"), "mysbt.sbt.zip",
        "--threshold", "0.0",
    )
    assert "100.0%" in runtmp.out
    assert "32.1%" in runtmp.out


def test_cli_prefetch(runtmp):
    runtmp.sourmash(
        "prefetch", utils_test_data("47+63.fa.sig"),
        utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
    )
    assert "of 7886 distinct query hashes, 7886 were found" in runtmp.err


def test_cli_compute_legacy(runtmp):
    runtmp.sourmash(
        "compute", utils_test_data("short.fa"), "-o", "c.sig", "-k", "21,31"
    )
    d = json.load(open(runtmp.output("c.sig")))
    assert [s["ksize"] for s in d[0]["signatures"]] == [21, 31]


def test_cli_categorize(runtmp):
    runtmp.sourmash(
        "categorize",
        utils_test_data("47.fa.sig"),
        utils_test_data("63.fa.sig"),
        "--ksize", "31",
        "--csv", "cat.csv",
    )
    with open(runtmp.output("cat.csv")) as fp:
        text = fp.read()
    assert "NC_011663.1" in text


class _FakeStdin:
    def __init__(self, data):
        self.buffer = io.BytesIO(data)

    def read(self, *a):
        return self.buffer.read(*a).decode("ascii")


def test_cli_watch(runtmp):
    runtmp.sourmash(
        "index", "db", utils_test_data("genome-s10.fa.gz.sig"), "-k", "21",
    )
    import gzip

    data = gzip.open(utils_test_data("genome-s10.fa.gz"), "rb").read()
    old_stdin = sys.stdin
    try:
        sys.stdin = _FakeStdin(data)
        runtmp.sourmash("watch", "--ksize", "21", "db.sbt.zip")
    finally:
        sys.stdin = old_stdin
    assert "FOUND" in runtmp.err or "found" in runtmp.err


def test_cli_lca_index_classify_summarize(runtmp):
    runtmp.sourmash(
        "lca", "index", utils_test_data("lca/delmont-1.csv"),
        "delmont.lca.json",
        utils_test_data("lca/TARA_ASE_MAG_00031.sig"),
        utils_test_data("lca/TARA_PSW_MAG_00136.sig"),
    )
    assert os.path.exists(runtmp.output("delmont.lca.json"))

    runtmp.sourmash(
        "lca", "classify", "--db", "delmont.lca.json",
        "--query", utils_test_data("lca/TARA_ASE_MAG_00031.sig"),
    )
    assert "TARA_ASE_MAG_00031,found" in runtmp.out
    assert "Alteromonas_macleodii" in runtmp.out

    runtmp.sourmash(
        "lca", "summarize", "--db", "delmont.lca.json",
        "--query", utils_test_data("lca/TARA_ASE_MAG_00031.sig"),
    )
    assert "100.0%" in runtmp.out


def test_cli_tax_metagenome(runtmp):
    runtmp.sourmash(
        "tax", "metagenome",
        "-g", utils_test_data("tax/test1.gather.csv"),
        "-t", utils_test_data("tax/test.taxonomy.csv"),
    )
    assert "query_name" in runtmp.out
    assert "superkingdom" in runtmp.out


def test_cli_multigather(runtmp):
    runtmp.sourmash(
        "multigather", "--query", utils_test_data("47+63.fa.sig"),
        "--db", utils_test_data("47.fa.sig"), utils_test_data("63.fa.sig"),
    )
    assert "found 2 matches total" in runtmp.out
    # output files named after query md5 land in cwd
    outs = os.listdir(runtmp.cwd)
    assert any(f.endswith(".matches.sig") for f in outs)


def test_cli_bad_command(runtmp):
    runtmp.sourmash("frobnicate", fail_ok=True)
    assert runtmp.status != 0


def test_cli_gather_abund_10_1(runtmp):
    "Abundance-weighted gather scenario (reference test_sourmash.py:6442-6540)."
    against = [
        utils_test_data(f"gather-abund/genome-s1{i}.fa.gz.sig") for i in "012"
    ]
    runtmp.sourmash(
        "gather", utils_test_data("gather-abund/reads-s10x10-s11.sig"),
        "-o", "xxx.csv", *against,
    )
    assert "91.0%  100.0%      14.5" in runtmp.out
    assert "9.0%   80.0%       1.9" in runtmp.out
    assert "genome-s12.fa.gz" not in runtmp.out
    assert (
        "the recovered matches hit 100.0% of the abundance-weighted query"
        in runtmp.out
    )

    with open(runtmp.output("xxx.csv")) as fp:
        rows = list(csv.DictReader(fp))
    sofar = 0.0
    for n, row in enumerate(rows):
        assert int(row["gather_result_rank"]) == n
        nw = float(row["n_unique_weighted_found"])
        sofar += nw
        assert float(row["sum_weighted_found"]) == sofar
        assert float(row["total_weighted_hashes"]) == 7986
        assert abs(float(row["f_unique_weighted"]) - nw / 7986) < 1e-12
    assert sofar == 7986


def test_cli_gather_abund_1_1(runtmp):
    against = [
        utils_test_data(f"gather-abund/genome-s1{i}.fa.gz.sig") for i in "012"
    ]
    runtmp.sourmash(
        "gather", utils_test_data("gather-abund/reads-s10-s11.sig"), *against,
    )
    assert "49.6%   78.5%       1.8" in runtmp.out
    assert "50.4%   80.0%       1.9" in runtmp.out
    assert "genome-s12.fa.gz" not in runtmp.out


def test_cli_gather_ani_csv(runtmp):
    "ANI columns in gather CSV (reference test_sourmash.py:8248-8296)."
    runtmp.sourmash("index", "-k", "31", "zzz", utils_test_data("47+63.fa.sig"))
    runtmp.sourmash(
        "gather", utils_test_data("63.fa.sig"), "zzz",
        "-o", "foo.csv", "--threshold-bp=1",
    )
    with open(runtmp.output("foo.csv")) as fp:
        row = next(csv.DictReader(fp))
    assert float(row["intersect_bp"]) == 5238000.0
    assert float(row["f_match"]) == 0.6642150646715699
    assert row["md5"] == "491c0a81b2cfb0188c0d3b46837c2f42"
    assert row["query_md5"] == "38729c63"
    assert row["query_containment_ani"] == "1.0"
    assert round(float(row["match_containment_ani"]), 3) == 0.987
    assert round(float(row["average_containment_ani"]), 3) == 0.993
    assert round(float(row["max_containment_ani"]), 3) == 1.0
    assert row["potential_false_negative"] == "False"


def test_cli_search_ani_jaccard(runtmp):
    "ANI column in search CSV (reference test_sourmash.py:7892-7918)."
    runtmp.sourmash(
        "search", utils_test_data("47.fa.sig"), utils_test_data("47+63.fa.sig"),
        "-o", "xxx.csv",
    )
    with open(runtmp.output("xxx.csv")) as fp:
        row = next(csv.DictReader(fp))
    assert float(row["similarity"]) == 0.6564798376870403
    assert row["md5"] == "491c0a81b2cfb0188c0d3b46837c2f42"
    assert row["query_md5"] == "09a08691"
    assert row["ani"] == "0.992530907924384"


def test_sig_save_gzip_deterministic(runtmp):
    """Serialized .sig.gz bytes must be identical across calls: zip-saver
    dedup compares compressed content (reference flate2 gzip carries no
    timestamp; reference tests/test_cmd_signature.py
    test_sig_rename_4_pattern_exclude depends on the dedup)."""
    import time

    from sourmash_tpu.signature import (
        load_signatures_from_json,
        save_signatures_to_json,
    )

    with open(utils_test_data("47.fa.sig")) as fp:
        sigs = list(load_signatures_from_json(fp.read()))
    b1 = save_signatures_to_json(sigs, compression=1)
    time.sleep(1.1)  # cross a gzip-mtime second boundary
    b2 = save_signatures_to_json(sigs, compression=1)
    assert b1 == b2


def test_sig_rename_zip_dedup(runtmp):
    """Renaming the same sketch loaded from several sources into one .zip
    keeps a single entry per unique content (reference
    test_cmd_signature.py::test_sig_rename_4_pattern_exclude)."""
    import sourmash

    d = utils_test_data("prot")
    files = [
        f"{d}/protein.sbt.zip", f"{d}/dayhoff.zip", f"{d}/hp.sbt.zip",
        f"{d}/protein.zip", f"{d}/all.zip", f"{d}/hp.zip",
        f"{d}/dayhoff.sbt.zip",
    ]
    runtmp.sourmash(
        "sig", "rename", "--exclude", "shewanella", *files, "NOSHEW",
        "-o", "out.zip",
    )
    idx = sourmash.load_file_as_index(runtmp.output("out.zip"))
    names = [ss.name for ss in idx.signatures()]
    assert all(n == "NOSHEW" for n in names)
    assert len(names) == 6


def test_cli_gather_two_revindex_scheduled_csv_identical(runtmp, monkeypatch):
    """`gather` against TWO revindex databases takes the device-scheduled
    path (one schedule spanning both; on this test mesh the round scan is
    sharded over 8 virtual devices) and its 25-column CSV is byte-identical
    to the host peek/consume rounds (SOURMASH_TPU_NO_SCHEDULE=1)."""
    runtmp.sourmash(
        "index", "-F", "revindex", "db47", utils_test_data("47.fa.sig"),
        "-k", "31",
    )
    runtmp.sourmash(
        "index", "-F", "revindex", "db63", utils_test_data("63.fa.sig"),
        "-k", "31",
    )

    import sourmash_tpu.index.flat as flat

    seen = {}
    orig = flat.DeviceGatherSchedule.compute

    def spy(self, threshold_bp):
        seen["counters"] = len(self.counters)
        return orig(self, threshold_bp)

    monkeypatch.setattr(flat.DeviceGatherSchedule, "compute", spy)
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"), "db47", "db63",
        "-o", "sched.csv",
    )
    assert seen.get("counters") == 2, "device schedule did not span both dbs"
    assert "found 2 matches total" in runtmp.out

    monkeypatch.setenv("SOURMASH_TPU_NO_SCHEDULE", "1")
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"), "db47", "db63",
        "-o", "host.csv",
    )

    with open(runtmp.output("sched.csv"), "rb") as f1, open(
        runtmp.output("host.csv"), "rb"
    ) as f2:
        assert f1.read() == f2.read()


def test_cli_gather_abund_revindex_scheduled_csv_identical(runtmp, monkeypatch):
    "Abundance-weighted gather through the scheduled revindex path."
    against = [
        utils_test_data(f"gather-abund/genome-s1{i}.fa.gz.sig") for i in "012"
    ]
    runtmp.sourmash("index", "-F", "revindex", "dbab", *against, "-k", "21")
    q = utils_test_data("gather-abund/reads-s10x10-s11.sig")
    runtmp.sourmash("gather", q, "dbab", "-o", "sched.csv")
    monkeypatch.setenv("SOURMASH_TPU_NO_SCHEDULE", "1")
    runtmp.sourmash("gather", q, "dbab", "-o", "host.csv")
    with open(runtmp.output("sched.csv"), "rb") as f1, open(
        runtmp.output("host.csv"), "rb"
    ) as f2:
        assert f1.read() == f2.read()


def test_cli_multigather_warm_batch_identical(runtmp, monkeypatch):
    """multigather with the batched query-count warm pass produces output
    CSVs byte-identical to the unwarmed (per-query device pass) run."""
    runtmp.sourmash(
        "index", "-F", "revindex", "dbz", utils_test_data("47.fa.sig"),
        utils_test_data("63.fa.sig"), "-k", "31",
    )

    def run(tag, warm):
        import sourmash_tpu.index.flat as flat

        if not warm:
            monkeypatch.setattr(
                flat.FlatIndex, "warm_gather_counts",
                lambda self, mhs, block=8: None,
            )
        else:
            monkeypatch.undo()
        d = os.path.join(runtmp.cwd, tag)
        os.makedirs(d)
        runtmp.sourmash(
            "multigather",
            "--query", utils_test_data("47+63.fa.sig"),
            utils_test_data("47.fa.sig"),
            "--db", "dbz", "--output-dir", tag,
        )
        return sorted(os.listdir(d)), d

    warm_files, warm_dir = run("warm", True)
    cold_files, cold_dir = run("cold", False)
    assert warm_files == cold_files and any(
        f.endswith(".csv") for f in warm_files
    )
    for f in warm_files:
        with open(os.path.join(warm_dir, f), "rb") as a, open(
            os.path.join(cold_dir, f), "rb"
        ) as b:
            assert a.read() == b.read(), f


def test_cli_gather_mixed_db_types_skips_schedule(runtmp):
    """gather against a revindex dir AND a plain .sig database mixes
    counter types — scheduling must be skipped (not crash) and the CSV
    must match an all-host run."""
    runtmp.sourmash(
        "index", "-F", "revindex", "dbmx", utils_test_data("47.fa.sig"),
        "-k", "31",
    )
    runtmp.sourmash(
        "gather", utils_test_data("47+63.fa.sig"), "dbmx",
        utils_test_data("63.fa.sig"), "-o", "mixed.csv",
    )
    assert "found 2 matches total" in runtmp.out
    os.environ["SOURMASH_TPU_NO_SCHEDULE"] = "1"
    try:
        runtmp.sourmash(
            "gather", utils_test_data("47+63.fa.sig"), "dbmx",
            utils_test_data("63.fa.sig"), "-o", "mixedhost.csv",
        )
    finally:
        del os.environ["SOURMASH_TPU_NO_SCHEDULE"]
    with open(runtmp.output("mixed.csv"), "rb") as a, open(
        runtmp.output("mixedhost.csv"), "rb"
    ) as b:
        assert a.read() == b.read()
