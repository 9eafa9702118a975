"""ProcessDaily-equivalent: run the entity-spec catalog over one staged day.

The reference's ProcessDaily.usql is 3,593 lines of 24 mechanically
similar sections (/root/reference/USQL/ProcessDaily.usql); each section
here is ``build_table(spec)`` dispatching to the five pattern transforms.
The one-time backfill scripts (CreateAndInitialize*.usql) are the same
transforms with no previous snapshot - ``init_mode=True``.

Scale/plan notes:
- The day's staging partition is scanned once and cached (the reference
  re-scans it per section - quirk Q6, SURVEY.md 2.11); each entity filter
  then prunes from memory.
- Missing JSON paths project as typed NULLs (the reference's ``Get*``
  helpers are total - SURVEY.md 1.3), so schema drift across crawl days
  cannot fail the pipeline.
- Writes go through the atomic-swap catalog (fixes Q8) with file counts
  scaled by the reference's relative-size hints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ghcrawler_datalake_etl_spark.functions.core import (
    get_pii,
    greatest_touched,
    latest_by,
)
from ghcrawler_datalake_etl_spark.operators.patterns import (
    array_child,
    collection_refresh,
    snapshot_upsert,
    traffic_series,
    version_log,
)
from ghcrawler_datalake_etl_spark.plans.catalog import CATALOG, EntitySpec, Field
from ghcrawler_datalake_etl_spark.sources.sinks import ParquetCatalog
from ghcrawler_datalake_etl_spark.sources.staging import parse_entity, read_staging

_TYPE = {
    "string": T.StringType(),
    "long": T.LongType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "pii": T.StringType(),
}

# Envelope columns every curated table carries, from staging metadata
# (the reference emits EtlSourceId/Etl* per table, e.g.
# /root/reference/USQL/ProcessDaily.usql:98-103,141-145).
_ENVELOPE = ("EtlSourceId", "EtlIngestDate", "FetchedAt", "ProcessedAt", "DeletedAt")


def _has_path(dtype: T.DataType, path: list[str]) -> bool:
    for part in path:
        if not isinstance(dtype, T.StructType) or part not in dtype.fieldNames():
            return False
        dtype = dtype[part].dataType
    return True


def safe_field(df: DataFrame, root: str, fld: Field, scrub_pii: bool = True) -> Column:
    """Typed path extraction, total like the reference's Utility.Get*:
    absent path -> typed NULL, malformed value -> typed NULL (SURVEY.md
    2.6 F1-F6). try_cast, not cast: under ANSI mode (Spark 4 default) a
    plain cast would abort the whole daily run on one bad document."""
    root_type = df.schema[root].dataType
    parts = fld.path.split(".")
    if not _has_path(root_type, parts):
        return F.lit(None).cast(_TYPE[fld.type]).alias(fld.name)
    col = F.col(f"{root}.{fld.path}")
    if fld.type == "pii":
        return get_pii(col, scrub=scrub_pii).alias(fld.name)
    return col.try_cast(_TYPE[fld.type]).alias(fld.name)


def _element_field(elem_type: T.DataType, fld: Field, scrub_pii: bool) -> Column:
    parts = fld.path.split(".")
    if not _has_path(elem_type, parts):
        return F.lit(None).cast(_TYPE[fld.type]).alias(fld.name)
    col = F.col(f"element.{fld.path}")
    if fld.type == "pii":
        return get_pii(col, scrub=scrub_pii).alias(fld.name)
    return col.try_cast(_TYPE[fld.type]).alias(fld.name)


def _entity_filter(spec: EntitySpec) -> Column:
    op, val = spec.entity_filter
    c = F.col("entity_name")
    if op == "eq":
        return c == val  # P1
    if op == "like":
        return c.like(val)  # P2
    if op == "isin":
        return c.isin(*val)  # P3
    raise ValueError(f"unknown entity filter op {op}")


def _envelope_cols(with_urn: bool = False) -> list[Column]:
    """Staging-metadata columns every curated table carries.

    ``with_urn`` adds the reference's redundant leading ``Urn`` column
    (same value as EtlSourceId - scalar/traffic/log tables carry both,
    child tables don't; e.g. Commit CTAS leads with Urn while CommitFile
    starts at CommitUrn, /root/reference/USQL/CreateAndInitializeCommit.usql
    vs CreateAndInitializeCommitFile.usql). EtlIngestDate is a UTC
    timestamp like the reference's DateTime.Parse(IngestDate)
    (/root/reference/USQL/ProcessDaily.usql:32)."""
    cols = [
        F.col("urn").alias("EtlSourceId"),
        F.col("ingest_date").try_cast("timestamp").alias("EtlIngestDate"),
        F.col("fetched_at").alias("FetchedAt"),
        F.col("processed_at").alias("ProcessedAt"),
        F.col("deleted_at").alias("DeletedAt"),
    ]
    if with_urn:
        cols.insert(0, F.col("urn").alias("Urn"))
    return cols


def _touched() -> Column:
    return greatest_touched("DeletedAt", "ProcessedAt")


def project_entity(
    entity_day: DataFrame, spec: EntitySpec, scrub_pii: bool = True
) -> DataFrame:
    """Wide typed projection over the parsed entity rows (P7)."""
    cols = _envelope_cols(with_urn=True) + [
        safe_field(entity_day, "data", f, scrub_pii) for f in spec.fields
    ]
    return entity_day.select(*cols)


def build_table(
    spec: EntitySpec,
    entity_day: DataFrame,
    previous: DataFrame | None,
    scrub_pii: bool = True,
) -> DataFrame:
    """Compute the new full snapshot for one spec (one ProcessDaily
    section). ``entity_day`` is the day's staging rows already filtered
    to the spec's entity family and parsed (``data`` struct present)."""
    if spec.pattern == "A":
        new_df = project_entity(entity_day, spec, scrub_pii)
        return snapshot_upsert(
            new_df,
            previous,
            keys=list(spec.key),
            order_by=[_touched()],
            tiebreakers=["FetchedAt"],
        )

    if spec.pattern == "B":
        filtered = entity_day
        # Dedup parents BEFORE exploding (ref keeps RowNumber==1 inside the
        # explode filter, /root/reference/USQL/ProcessDaily.usql:292).
        parent_keys = [
            f.name for f in spec.fields if f.name in spec.key
        ] or list(spec.key)
        parents = filtered.select(
            *_envelope_cols(),
            *[safe_field(filtered, "data", f, scrub_pii) for f in spec.fields],
            F.col(f"data.{spec.array_path}").alias("_array")
            if _has_path(filtered.schema["data"].dataType, spec.array_path.split("."))
            else F.lit(None)
            .cast(T.ArrayType(T.StringType()))
            .alias("_array"),
        )
        dedup_keys = [k for k in spec.key if k in parents.columns] or ["EtlSourceId"]
        parents = latest_by(parents, dedup_keys, [_touched(), F.col("FetchedAt")])
        exploded = array_child(
            parents,
            "_array",
            [c for c in parents.columns if c != "_array"],
            spec.child_id,
        )
        elem_type = exploded.schema["element"].dataType
        new_df = exploded.select(
            *[c for c in exploded.columns if c != "element"],
            *[_element_field(elem_type, f, scrub_pii) for f in spec.element_fields],
        )
        if spec.extra.get("ordinal_internal"):
            # the reference's final projection overwrites the explode
            # ordinal with an element field of the same role (e.g.
            # EventPayloadReleaseAssetId = the asset's own id,
            # /root/reference/USQL/ProcessDaily.usql:1397-1398); the
            # ordinal stays internal.
            new_df = new_df.drop(spec.child_id)
        # Replace-by-parent: a re-crawled parent's children are replaced
        # wholesale (handles shrinking arrays). The literal reference
        # dedups child rows by EtlSourceId ALONE (e.g. CommitFile,
        # /root/reference/USQL/ProcessDaily.usql:329-331), which would
        # collapse every child of a document to one arbitrary row - a
        # latent bug in the Q1/Q3 family; we implement the intended
        # semantics (child key = parent key + array position, wholesale
        # refresh on re-crawl) and pin it by test.
        if previous is None:
            return new_df
        refreshed = parents.select(*dedup_keys).distinct()
        carryover = previous.join(F.broadcast(refreshed), dedup_keys, "left_anti")
        return new_df.unionByName(carryover, allowMissingColumns=True)

    if spec.pattern == "C":
        filtered = entity_day
        origin_like = spec.extra.get("origin_like")
        # Collection pages carry origin (owner) + resources (member hrefs)
        # links (/root/reference/USQL/ProcessDaily.usql:39-61).
        data_type = filtered.schema["data"].dataType
        res_path = "_metadata.links.resources.hrefs"
        resources = (
            F.col(f"data.{res_path}")
            if _has_path(data_type, res_path.split("."))
            else F.lit(None).cast(T.ArrayType(T.StringType()))
        )
        pages = filtered.select(
            safe_field(filtered, "data", Field(spec.origin_col, "_metadata.links.origin.href")),
            safe_field(filtered, "data", Field("UniqueUrn", "_metadata.links.unique.href")),
            resources.alias("resources"),
            F.col("processed_at").alias("ProcessedAt"),
            F.col("fetched_at").alias("FetchedAt"),
            F.col("ingest_date").try_cast("timestamp").alias("EtlIngestDate"),
        ).filter(F.col(spec.origin_col).isNotNull())
        if origin_like:
            # The `members` entity feeds OrgMembers and TeamMembers from one
            # scan, split by origin URN (ProcessDaily.usql:1747-1763).
            pages = pages.filter(F.col(spec.origin_col).like(origin_like))
        members = collection_refresh(
            pages,
            previous,
            origin_col=spec.origin_col,
            member_col=spec.member_col,
            page_order=[F.col("ProcessedAt"), F.col("FetchedAt")],
            # page-constant passthroughs: the reference's membership rows
            # carry the page's timestamps + UniqueUrn
            # (/root/reference/USQL/ProcessDaily.usql:82-91)
            extra_cols=("FetchedAt", "ProcessedAt", "EtlIngestDate", "UniqueUrn"),
        )
        return members

    if spec.pattern == "D":
        filtered = entity_day
        base = filtered.select(
            *_envelope_cols(with_urn=True),
            *[safe_field(filtered, "data", f, scrub_pii) for f in spec.fields],
            F.posexplode_outer(F.col(f"data.{spec.array_path}")).alias(
                "_pos", "element"
            ),
        ).filter(F.col("element").isNotNull())
        elem_type = base.schema["element"].dataType
        new_df = base.select(
            *[c for c in base.columns if c not in ("element", "_pos")],
            *[_element_field(elem_type, f, scrub_pii) for f in spec.element_fields],
        )
        unordered = bool(spec.extra.get("unordered_dedup"))
        return traffic_series(
            new_df,
            previous,
            natural_key=list(spec.key),
            order_by=None if unordered else [_touched(), F.col("FetchedAt")],
        )

    if spec.pattern == "E":
        new_df = project_entity(entity_day, spec, scrub_pii)
        return version_log(
            new_df,
            previous,
            keys=list(spec.key),
            order_by=[_touched()],
            tiebreakers=["FetchedAt"],
        )

    raise ValueError(f"unknown pattern {spec.pattern}")


def build_delta(
    spec: EntitySpec,
    entity_day: DataFrame,
    previous: DataFrame,
    scrub_pii: bool = True,
) -> DataFrame:
    """Incremental form of build_table for the keyed snapshot patterns
    (A/E): the merged result restricted to the keys the day TOUCHES.

    Semantics are identical to the full path - the day's typed rows are
    resolved against the previous snapshot's rows FOR THOSE KEYS with
    the same latest-wins window (the old row can still win a late
    re-crawl), so handing the result to ``ParquetCatalog.merge_upsert``
    (delta-wins per key) reproduces ``build_table`` + ``overwrite``
    exactly while rewriting only the touched hash buckets. The
    reference rewrites every table in full daily
    (/root/reference/USQL/ProcessDaily.usql:142-177, TRUNCATE+INSERT) -
    at 100 TB that full rewrite IS the job's cost, which is why the
    incremental path exists.
    """
    if spec.pattern not in ("A", "E"):
        raise ValueError(f"build_delta supports patterns A/E, not {spec.pattern}")
    new_df = project_entity(entity_day, spec, scrub_pii)
    keys = list(spec.key)
    prev_subset = previous.join(
        F.broadcast(new_df.select(*keys).distinct()), keys, "left_semi"
    )
    resolve = snapshot_upsert if spec.pattern == "A" else version_log
    return resolve(
        new_df,
        prev_subset,
        keys=keys,
        order_by=[_touched()],
        tiebreakers=["FetchedAt"],
    )


def run_daily(
    spark: SparkSession,
    staging_path: str,
    ingest_date: str,
    catalog: ParquetCatalog,
    specs: tuple[EntitySpec, ...] = CATALOG,
    scrub_pii: bool = True,
    init_mode: bool = False,
    entity_schemas: dict | None = None,
    incremental: bool = False,
) -> list[str]:
    """Run every spec for one day (ProcessDaily); ``init_mode`` ignores
    previous snapshots (CreateAndInitialize* backfill path).

    ``entity_schemas`` maps ``spec.entity_filter`` -> DDL schema string
    for the production no-inference path (SURVEY.md 1.3); unregistered
    entities fall back to per-day inference (sources.staging.parse_entity).

    ``incremental=True`` routes the keyed snapshot patterns (A/E)
    through ``build_delta`` + ``merge_upsert``: only the hash buckets
    the day's keys land in are rewritten, untouched buckets hard-link
    into the new version. Results are identical to the full path (the
    first incremental run of a table pays a one-time re-bucket).
    Patterns B/C/D keep the full rewrite (their refresh unit is the
    parent document / collection page, not a row key).
    """
    staging_day = read_staging(spark, staging_path, ingest_date).cache()  # Q6
    entity_schemas = entity_schemas or {}
    parsed: dict = {}  # one parse per entity family, shared across specs (Q6)
    built = []
    try:
        for spec in specs:
            fkey = spec.entity_filter
            if fkey not in parsed:
                filtered = staging_day.filter(_entity_filter(spec))
                parsed[fkey] = parse_entity(
                    spark, filtered, schema=entity_schemas.get(fkey)
                ).cache()
            previous = None if init_mode else catalog.read_or_none(spec.table)
            if incremental and spec.pattern in ("A", "E"):
                # first run bootstraps the bucketed layout through the
                # same sink, so day 2 is already link-incremental
                delta = (
                    build_table(spec, parsed[fkey], None, scrub_pii)
                    if previous is None
                    else build_delta(spec, parsed[fkey], previous, scrub_pii)
                )
                catalog.merge_upsert(delta, spec.table, list(spec.key))
            else:
                snapshot = build_table(spec, parsed[fkey], previous, scrub_pii)
                catalog.overwrite(
                    snapshot,
                    spec.table,
                    num_files=max(1, spec.size_hint // 20),
                    sort_by=[k for k in spec.key if k in snapshot.columns],
                )
            built.append(spec.table)
    finally:
        for df in parsed.values():
            df.unpersist()
        staging_day.unpersist()
    return built
