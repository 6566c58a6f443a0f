"""Driver-contract meta-tests: the queries()/oracle_sql()/COVERAGE.md
surfaces must stay in lockstep — every drift here has historically been
a hand-maintained count going stale."""

import importlib.util
import re

import pytest


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_query_has_an_oracle(entry):
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_registry_keys_unique_and_window_stable(entry):
    keys = list(entry.queries())
    assert len(keys) == len(set(keys))
    # the r6 driver window leads with the rotation set (late-r5
    # additions, previously tail-only); additions must queue BEHIND
    # position 50 (the driver records the first 50)
    assert keys[0] == "max_drawdown" and len(keys) >= 50


def test_coverage_doc_mentions_every_query(entry):
    text = open("/root/repo/COVERAGE.md").read()
    mentioned = set(re.findall(r"`([a-z0-9_]+)`", text))
    missing = [k for k in entry.queries() if k not in mentioned]
    assert not missing, missing


def test_coverage_registry_count_matches(entry):
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"first 50 of (\d+)", text)
    assert m and int(m.group(1)) == len(entry.queries())
    readme = open("/root/repo/README.md").read()
    m2 = re.search(r"(\d+) `queries\(\)`", readme)
    assert m2 and int(m2.group(1)) == len(entry.queries())
