from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
# python workers unpickle broadcast objects defined in test modules —
# forward the repo + tests dirs into their import path
import os  # noqa: E402

os.environ["PYTHONPATH"] = (
    f"{_ROOT}:{_ROOT / 'tests'}:" + os.environ.get("PYTHONPATH", "")
)

from dask_distributed_vanilla_spark.catalog import TABLES
from dask_distributed_vanilla_spark.plans.canonical import canonical
from dask_distributed_vanilla_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[8]",
        **{"spark.sql.warehouse.dir": "/tmp/ddvs-test-warehouse"},
    )
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def assert_matches_oracle(sdf: pd.DataFrame, odf: pd.DataFrame, name: str = "") -> None:
    s_schema, s_hash = canonical(sdf)
    o_schema, o_hash = canonical(odf)
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    assert s_schema == o_schema, f"{name}: schema {s_schema} != {o_schema}"
    assert s_hash == o_hash, f"{name}: value hash mismatch\nspark:\n{sdf.head()}\noracle:\n{odf.head()}"
