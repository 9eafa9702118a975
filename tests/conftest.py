from __future__ import annotations

import json
import os

import pytest

from ghcrawler_datalake_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    spark = get_spark(app_name="tests")
    yield spark


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def write_docs(folder: str, docs: list[dict], fname: str = "docs.json") -> str:
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, fname)
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return path


def meta(
    type_: str,
    urn: str,
    fetched: str,
    processed: str,
    deleted: str | None = None,
    links: dict | None = None,
    version: int = 7,
):
    base_links = {"self": {"href": urn}}
    base_links.update(links or {})
    return {
        "type": type_,
        "version": version,
        "fetchedAt": fetched,
        "processedAt": processed,
        "deletedAt": deleted,
        "links": base_links,
    }
