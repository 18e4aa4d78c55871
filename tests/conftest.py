from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from duckdb_delta_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "table")
