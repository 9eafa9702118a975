"""The S8 stored-procedure surface end-to-end through the argparse CLI
(python -m ghcrawler_datalake_etl_spark ...): stage -> daily
(incremental) -> export, sharing the test session via getOrCreate."""

from __future__ import annotations

import json
import os

from ghcrawler_datalake_etl_spark.__main__ import main
from tests.conftest import meta, write_docs


def test_cli_stage_daily_export(spark, tmp_path):
    raw = tmp_path / "raw"
    docs = [
        {
            "_metadata": meta(
                "repo",
                "urn:gh:repo:cli1",
                "2024-01-05T10:00:00Z",
                "2024-01-05T11:00:00Z",
                links={"owner": {"href": "urn:gh:user:owner1"}},
            ),
            "id": 5,
            "name": "cliproj",
            "full_name": "acme/cliproj",
            "owner": {"login": "acme", "id": 7},
        }
    ]
    write_docs(str(raw), docs)
    staging = str(tmp_path / "staging")
    wh = str(tmp_path / "wh")
    out = str(tmp_path / "export")

    assert main(["stage", "--input", str(raw), "--staging", staging,
                 "--date", "2024-01-05"]) == 0
    assert main(["daily", "--staging", staging, "--warehouse", wh,
                 "--date", "2024-01-05", "--tables", "Repo",
                 "--incremental"]) == 0
    assert main(["export", "--warehouse", wh, "--org", "acme",
                 "--repo", "cliproj", "--out", out]) == 0

    assert os.path.isdir(os.path.join(out, "Repo"))
    tsvs = [
        f for f in os.listdir(os.path.join(out, "Repo"))
        if f.startswith("part-") and f.endswith(".csv")
    ]
    assert tsvs, "export produced no TSV part file"
    body = open(os.path.join(out, "Repo", tsvs[0])).read()
    assert "cliproj" in body
