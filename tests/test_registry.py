"""Query-registry rotation tests: the driver verifies only the first
50 queries in `queries()` order per round, so the registry must sweep
unverified queries to the front automatically as CORRECTNESS files
accumulate."""

from __future__ import annotations

import json
import os

import pytest

from lab5_lakehouse_etl_spark import queries as Q

Q.load_all()


@pytest.fixture()
def correctness_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CORRECTNESS_DIR", str(tmp_path))
    return tmp_path


def _write(path, name, rows):
    with open(os.path.join(path, name), "w") as fh:
        json.dump(rows, fh)


def test_no_files_uses_priority_order(correctness_dir):
    names = list(Q.ordered_queries())
    assert names[: len(Q._PRIORITY)] == [
        n for n in Q._PRIORITY if n in Q.QUERIES
    ]
    assert sorted(names) == sorted(Q.QUERIES)


def test_verified_rotate_to_back(correctness_dir):
    all_names = list(Q.ordered_queries())
    front = all_names[:50]
    _write(
        correctness_dir,
        "CORRECTNESS_r05.json",
        {n: {"hash_match": True} for n in front},
    )
    rotated = list(Q.ordered_queries())
    # every name that was green moves behind every never-verified name
    n_unverified = len(all_names) - 50
    assert set(rotated[:n_unverified]).isdisjoint(front)
    assert sorted(rotated) == sorted(all_names)


def test_failed_rows_rerun_up_front(correctness_dir):
    all_names = list(Q.ordered_queries())
    target = all_names[0]
    _write(
        correctness_dir,
        "CORRECTNESS_r05.json",
        {target: {"hash_match": False, "err": "value mismatch"}},
    )
    # a FAILED row must not count as verified
    assert list(Q.ordered_queries())[0] == target


def test_rows_only_success_counts(correctness_dir):
    all_names = list(Q.ordered_queries())
    target = all_names[0]
    _write(
        correctness_dir,
        "CORRECTNESS_r05.json",
        {target: {"hash_match": None, "err": "no_oracle", "spark_rows": 7}},
    )
    assert list(Q.ordered_queries())[0] != target
