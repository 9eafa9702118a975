"""Query/export layer: the GetRepoData equivalent.

The reference's only query-shaped consumer
(/root/reference/USQL/GetRepoData-unused.usql:7-134): point-filter one
repo, fan out joins Repo -> Event -> EventPayload* and Repo -> Issue ->
IssueLabel, and export 8 TSVs. Generalized here to any entity subgraph:
each export is (child table, join key column) against the selected repo's
URN set.

Plan shape: the repo side is a point filter (one row) - broadcast it so
every child scan is a pushdown-filtered scan + broadcast hash join, no
shuffle of the big side (the ADLA compiler made the same choice; SURVEY.md 3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.sources.sinks import ParquetCatalog, write_tsv

# (table, column that references the repo URN) - the 8 reference outputs
# (GetRepoData-unused.usql:17-110) plus the natural extension to every
# curated table that carries a RepoUrn.
DEFAULT_EXPORTS: tuple[tuple[str, str], ...] = (
    ("Event", "RepoUrn"),
    ("EventPayloadCommit", "RepoUrn"),
    ("EventPayloadIssueLabel", "RepoUrn"),
    ("EventPayloadPage", "RepoUrn"),
    ("EventPayloadPullRequest", "RepoUrn"),
    ("EventPayloadReleaseAsset", "RepoUrn"),
    ("Issue", "RepoUrn"),
    ("IssueLabel", "RepoUrn"),
)


def select_repo(catalog: ParquetCatalog, owner_login: str, name: str) -> DataFrame:
    """Point filter (GetRepoData-unused.usql:13)."""
    repo = catalog.read("Repo")
    return repo.filter(
        (F.col("OwnerLogin") == owner_login) & (F.col("Name") == name)
    )


def export_repo_data(
    catalog: ParquetCatalog,
    owner_login: str,
    name: str,
    out_folder: str,
    exports: tuple[tuple[str, str], ...] = DEFAULT_EXPORTS,
) -> dict[str, int]:
    """Join fan-out + TSV export for one repo. Returns rows per export."""
    repo = select_repo(catalog, owner_login, name)
    repo_urns = F.broadcast(
        repo.select(F.col("EtlSourceId").alias("_repo_urn")).distinct()
    )
    counts: dict[str, int] = {}
    write_tsv(repo, os.path.join(out_folder, "Repo"))
    counts["Repo"] = repo.count()
    for table, key in exports:
        if not catalog.exists(table):
            continue
        child = catalog.read(table)
        if key not in child.columns:
            continue
        joined = child.join(
            repo_urns, child[key] == repo_urns["_repo_urn"], "inner"
        ).drop("_repo_urn")
        write_tsv(joined, os.path.join(out_folder, table))
        counts[table] = joined.count()
    return counts
