"""Cluster-control client APIs (reference client.py:2354-3060 surface)."""

from __future__ import annotations

import pytest

from dask_distributed_vanilla_spark.client import Client


@pytest.fixture(scope="module")
def client(spark):
    c = Client(spark)
    yield c
    c.close()


def test_run_driver_and_executors(client):
    assert client.run(lambda: 7) == 7
    out = client.run(lambda: 1, on_executors=True)
    assert sum(out) == client.nthreads()


def test_retry_clears_memo(client):
    state = {"fail": True}

    def flaky(marker: str):
        if state["fail"]:
            raise RuntimeError("first attempt fails")
        return marker

    # module-scope closure over mutable dict -> unpicklable-ish content;
    # use explicit retry API regardless of memo behavior
    f1 = client.submit(flaky, "ok")
    with pytest.raises(RuntimeError):
        f1.result()
    state["fail"] = False
    f2 = client.retry(flaky, "ok")
    assert f2.result() == "ok"


def test_wait_for_workers_and_profile(client):
    client.wait_for_workers(1, timeout=5)
    with pytest.raises(TimeoutError):
        client.wait_for_workers(10**6, timeout=0.6)
    prof = client.profile()
    assert prof["default_parallelism"] >= 1


def test_upload_file(client, tmp_path):
    mod = tmp_path / "uploaded_helper.py"
    mod.write_text("VALUE = 41\n")
    client.upload_file(str(mod))
    # addPyFile makes it importable on executors
    got = client.run(
        lambda: __import__("uploaded_helper").VALUE + 1, on_executors=True
    )
    assert set(got) == {42}
