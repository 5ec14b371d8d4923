"""Harness-tool contracts (r14 ADVICE closures).

These pin the verification tooling itself: a misspelled filtered
oracle run must fail loudly (not print "0/0 pass" and exit 0), a hung
isolated-warm child must not leave its PySpark JVM grandchild alive
under later measurements, and the traded-shuffle repartition target
must never carry less parallelism than the exchange it replaces.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_oracle_check_rejects_unknown_query_name():
    """A typo'd positional name exits 2 BEFORE JVM startup — a filtered
    verification run with a misspelled query must read as an error, not
    as a green 0/0 pass (r13 ADVICE, tools/oracle_check.py)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
         "/root/testdata/sf0.001", "vector_knn_TYPO"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert out.returncode == 2, (out.returncode, out.stdout, out.stderr)
    assert "vector_knn_TYPO" in out.stderr


def test_oracle_check_rejects_non_directory_sf_dir():
    """Forgetting the sf_dir positional (``oracle_check.py <query>``)
    must exit 2 with a usage error BEFORE JVM startup — not treat the
    query name as a data dir and fail every query with PATH_NOT_FOUND
    (r14 verdict What's-wrong #1, tools/oracle_check.py). Diagnostics
    land on stderr, never on stdout (r15 ADVICE)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
         "winnow_neardup"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert out.returncode == 2, (out.returncode, out.stdout, out.stderr)
    assert "not a directory" in out.stderr
    assert "usage:" in out.stderr
    assert out.stdout == "", out.stdout


def test_oracle_check_validates_default_sf_dir(monkeypatch, capsys):
    """With NO positional, the default sf_dir is still validated before
    JVM startup (r15 ADVICE: the old `if pos` condition skipped the
    guard exactly when the default dir was the one in play). The real
    default exists in this env, so exercise the branch in-process with
    isdir patched False — the guard fires before any heavy import."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "oracle_check_under_test",
        os.path.join(REPO, "tools", "oracle_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["oracle_check.py"])
    monkeypatch.setattr(mod.os.path, "isdir", lambda p: False)
    try:
        mod.main()
        raise AssertionError("expected SystemExit(2)")
    except SystemExit as e:
        assert e.code == 2
    err = capsys.readouterr()
    assert "default sf data dir" in err.err
    assert err.out == "", err.out


def test_oracle_check_rejects_unknown_skip_name():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
         "/root/testdata/sf0.001", "vector_knn", "--skip=not_a_query"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert out.returncode == 2, (out.returncode, out.stdout, out.stderr)
    assert "not_a_query" in out.stderr


def test_isolated_warm_timeout_kills_process_group():
    """With a tiny ISOLATED_TIMEOUT the per-query children (which need
    ~10 s of JVM startup alone) must time out, emit clean error lines,
    and the sweep must CONTINUE to the next query — exercising the
    start_new_session + killpg path (r13 ADVICE, tools/isolated_warm.py).
    The multi-query branch requires >= 2 names."""
    env = dict(os.environ, ISOLATED_TIMEOUT="2", ISOLATED_RUNS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "isolated_warm.py"),
         "vector_knn", "group_topk", "--sf=/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=180, cwd=REPO, env=env)
    assert out.returncode == 0, (out.returncode, out.stderr[-400:])
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    assert [ln["query"] for ln in lines] == ["vector_knn", "group_topk"]
    assert all("timeout" in ln.get("error", "") for ln in lines), lines


def test_traded_shuffle_partitions_floor(spark):
    """The repartition that REPLACES a downstream shuffle must target at
    least spark.sql.shuffle.partitions — on clusters where shuffle
    partitions exceed core count, bare defaultParallelism would pin the
    traded pipeline below the plan it replaces (r13 ADVICE,
    fingerprint.py / q_graph_triangles)."""
    from pydata_vector_search_spark.session import traded_shuffle_partitions

    dp = spark.sparkContext.defaultParallelism
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(dp * 8))
        assert traded_shuffle_partitions(spark) == dp * 8
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        assert traded_shuffle_partitions(spark) == dp
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    # Re-derive the expectation the same guarded way the helper does, so
    # a harness that configures a non-numeric value doesn't error here.
    try:
        restored = int(before)
    except (TypeError, ValueError):
        restored = 0
    assert traded_shuffle_partitions(spark) == max(dp, restored)

    # Spark itself rejects non-numeric shuffle.partitions at set time,
    # so drive the documented sp=0 fallback ("auto" under some AQE
    # setups) through a stub session instead of a live conf.set.
    class _AutoConf:
        def get(self, key):
            return "auto"

    class _SC:
        defaultParallelism = dp

    class _Stub:
        conf = _AutoConf()
        sparkContext = _SC()

    assert traded_shuffle_partitions(_Stub()) == dp
