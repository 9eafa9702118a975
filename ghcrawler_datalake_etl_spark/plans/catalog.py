"""Declarative entity-spec catalog: the 31-table output surface of the
reference (SURVEY.md section 1.4) as data, not code.

The reference hand-writes each table's wide typed projection as a
30-140-line SELECT (e.g. Commit at /root/reference/USQL/ProcessDaily.usql:98-129,
Event at :502-634). Those scripts are mechanically repetitive; here each
table is one ``EntitySpec`` and the five pattern transforms
(operators.patterns) consume the specs uniformly. Column lists hold the
load-bearing columns per entity (keys, link urns, timestamps, counters,
PII fields); the machinery is column-count-agnostic, so widening a spec
is data entry, not code.

Path convention: ``fields`` paths are dotted struct paths inside the
staging ``data`` column (native nesting replaces the reference's
flattened path->bytes map, SURVEY.md 1.1). Envelope columns
(entity_name, ingest_date, fetched_at, processed_at, deleted_at, urn)
come from staging metadata and are added to every table automatically by
the pipeline: ``urn`` doubles as ``EtlSourceId``
(/root/reference/USQL/StageData.usql:29-35).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Field types understood by the projector (functions.core): string, long,
# boolean, timestamp, pii (string scrubbed via sha2 - SURVEY.md F3).


@dataclass(frozen=True)
class Field:
    name: str  # output column name
    path: str  # dotted path inside data struct
    type: str = "string"


@dataclass(frozen=True)
class EntitySpec:
    """One curated table.

    pattern: A scalar snapshot | B nested-array child | C collection
    membership | D traffic series | E version log (SURVEY.md 2.9).
    entity_filter: (op, value) with op in {eq, like, isin} applied to
    staging.entity_name (P1-P3).
    key: dedup key columns (latest wins) - pattern A/B/E.
    array_path: pattern B/D source array inside data.
    child_id: pattern B child ordinal column name (the reference parses
    it out of ``files[3].x`` path strings; posexplode position for us).
    origin / traffic knobs are pattern C / D specific.
    size_hint: the reference's DISTRIBUTE HASH INTO n (20/60/200) -
    relative-size signal only, used for write partition-count defaults.
    """

    table: str
    pattern: str
    entity_filter: tuple[str, str | tuple[str, ...]]
    fields: tuple[Field, ...]
    key: tuple[str, ...] = ("EtlSourceId",)
    array_path: str | None = None
    child_id: str | None = None
    element_fields: tuple[Field, ...] = ()
    origin_col: str | None = None
    member_col: str | None = None
    size_hint: int = 20
    ref: str = ""
    extra: dict = field(default_factory=dict)


def _meta_links(*names: str) -> tuple[Field, ...]:
    return tuple(
        Field(f"{n.capitalize()}Urn", f"_metadata.links.{n}.href") for n in names
    )


_COMMON = (Field("SchemaVersion", "_metadata.version", "long"),)

CATALOG: tuple[EntitySpec, ...] = (
    # -- Pattern A: scalar entity snapshots ------------------------------
    EntitySpec(
        table="Commit",
        pattern="A",
        entity_filter=("eq", "commit"),
        ref="/root/reference/USQL/ProcessDaily.usql:98-177",
        size_hint=200,
        fields=_meta_links("repo")
        + (
            Field("Sha", "sha"),
            Field("AuthorDate", "commit.author.date", "timestamp"),
            Field("AuthorName", "commit.author.name", "pii"),
            Field("AuthorEmail", "commit.author.email", "pii"),
            Field("CommitterDate", "commit.committer.date", "timestamp"),
            Field("CommitterName", "commit.committer.name", "pii"),
            Field("CommitterEmail", "commit.committer.email", "pii"),
            Field("Message", "commit.message"),
            Field("CommentCount", "commit.comment_count", "long"),
            Field("Additions", "stats.additions", "long"),
            Field("Deletions", "stats.deletions", "long"),
            Field("Total", "stats.total", "long"),
            Field("AuthorLogin", "author.login"),
            Field("AuthorId", "author.id", "long"),
            Field("CommitterLogin", "committer.login"),
            Field("CommitterId", "committer.id", "long"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="CommitComment",
        pattern="A",
        entity_filter=("eq", "commit_comment"),
        ref="/root/reference/USQL/ProcessDaily.usql:184-245",
        fields=_meta_links("repo")
        + (
            Field("Id", "id", "long"),
            Field("CommitId", "commit_id"),
            Field("Path", "path"),
            Field("Position", "position", "long"),
            Field("Line", "line", "long"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("UserId", "user.id", "long"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="Issue",
        pattern="A",
        entity_filter=("eq", "issue"),
        ref="/root/reference/USQL/ProcessDaily.usql:1455-1570",
        fields=_meta_links("repo", "user", "assignee")
        + (
            Field("Id", "id", "long"),
            Field("Number", "number", "long"),
            Field("State", "state"),
            Field("Title", "title"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("Comments", "comments", "long"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
            Field("ClosedAt", "closed_at", "timestamp"),
            Field("Locked", "locked", "boolean"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="IssueComment",
        pattern="A",
        entity_filter=("eq", "issue_comment"),
        ref="/root/reference/USQL/ProcessDaily.usql:1577-1630",
        fields=_meta_links("repo", "issue")
        + (
            Field("Id", "id", "long"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("UserId", "user.id", "long"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="Org",
        pattern="A",
        entity_filter=("eq", "org"),
        ref="/root/reference/USQL/ProcessDaily.usql:1864-1955",
        size_hint=200,
        fields=(
            Field("Id", "id", "long"),
            Field("Login", "login"),
            Field("Name", "name", "pii"),
            Field("Email", "email", "pii"),
            Field("Blog", "blog", "pii"),
            Field("Company", "company", "pii"),
            Field("Location", "location"),
            Field("PublicRepos", "public_repos", "long"),
            Field("Followers", "followers", "long"),
            Field("Following", "following", "long"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="PullRequest",
        pattern="A",
        entity_filter=("eq", "pull_request"),
        ref="/root/reference/USQL/ProcessDaily.usql:1963-2266",
        fields=_meta_links("repo", "user")
        + (
            Field("Id", "id", "long"),
            Field("Number", "number", "long"),
            Field("State", "state"),
            Field("Title", "title"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("Merged", "merged", "boolean"),
            Field("MergedAt", "merged_at", "timestamp"),
            Field("MergeCommitSha", "merge_commit_sha"),
            Field("Commits", "commits", "long"),
            Field("Additions", "additions", "long"),
            Field("Deletions", "deletions", "long"),
            Field("ChangedFiles", "changed_files", "long"),
            Field("BaseRef", "base.ref"),
            Field("BaseSha", "base.sha"),
            Field("HeadRef", "head.ref"),
            Field("HeadSha", "head.sha"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
            Field("ClosedAt", "closed_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="PullRequestCommit",
        pattern="A",
        entity_filter=("eq", "pull_request_commit"),
        ref="/root/reference/USQL/ProcessDaily.usql:2271-2356",
        size_hint=200,
        fields=_meta_links("repo", "pull_request")
        + (
            Field("Sha", "sha"),
            Field("AuthorDate", "commit.author.date", "timestamp"),
            Field("AuthorName", "commit.author.name", "pii"),
            Field("Message", "commit.message"),
            Field("AuthorLogin", "author.login"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="PullRequestCommitComment",
        pattern="A",
        entity_filter=("eq", "pull_request_commit_comment"),
        ref="/root/reference/USQL/ProcessDaily.usql:2361-2422",
        fields=_meta_links("repo")
        + (
            Field("Id", "id", "long"),
            Field("CommitId", "commit_id"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("CreatedAt", "created_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="PullRequestComment",
        pattern="A",
        entity_filter=("eq", "review_comment"),
        ref="/root/reference/USQL/ProcessDaily.usql:2428-2499",
        fields=_meta_links("repo", "pull_request")
        + (
            Field("Id", "id", "long"),
            Field("Path", "path"),
            Field("Position", "position", "long"),
            Field("Body", "body"),
            Field("UserLogin", "user.login"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="Repo",
        pattern="A",
        entity_filter=("eq", "repo"),
        ref="/root/reference/USQL/ProcessDaily.usql:2506-2745",
        fields=_meta_links("owner")
        + (
            Field("Id", "id", "long"),
            Field("Name", "name"),
            Field("FullName", "full_name"),
            Field("OwnerLogin", "owner.login"),
            Field("OwnerId", "owner.id", "long"),
            Field("Description", "description"),
            Field("Private", "private", "boolean"),
            Field("Fork", "fork", "boolean"),
            Field("Language", "language"),
            Field("ForksCount", "forks_count", "long"),
            Field("StargazersCount", "stargazers_count", "long"),
            Field("WatchersCount", "watchers_count", "long"),
            Field("SubscribersCount", "subscribers_count", "long"),
            Field("OpenIssuesCount", "open_issues_count", "long"),
            Field("Size", "size", "long"),
            Field("DefaultBranch", "default_branch"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
            Field("PushedAt", "pushed_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="Team",
        pattern="A",
        entity_filter=("eq", "team"),
        ref="/root/reference/USQL/ProcessDaily.usql:3086-3147",
        size_hint=200,
        fields=_meta_links("org")
        + (
            Field("Id", "id", "long"),
            Field("Name", "name"),
            Field("Slug", "slug"),
            Field("Privacy", "privacy"),
            Field("Permission", "permission"),
            Field("MembersCount", "members_count", "long"),
            Field("ReposCount", "repos_count", "long"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="User",
        pattern="A",
        entity_filter=("eq", "user"),
        ref="/root/reference/USQL/ProcessDaily.usql:3153-3220",
        fields=(
            Field("Id", "id", "long"),
            Field("Login", "login"),
            Field("Name", "name", "pii"),
            Field("Email", "email", "pii"),
            Field("Company", "company", "pii"),
            Field("Blog", "blog", "pii"),
            Field("Location", "location"),
            Field("Hireable", "hireable", "boolean"),
            Field("PublicRepos", "public_repos", "long"),
            Field("Followers", "followers", "long"),
            Field("Following", "following", "long"),
            Field("Type", "type"),
            Field("SiteAdmin", "site_admin", "boolean"),
            Field("CreatedAt", "created_at", "timestamp"),
            Field("UpdatedAt", "updated_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="Event",
        pattern="A",
        entity_filter=("like", "%Event"),
        ref="/root/reference/USQL/ProcessDaily.usql:502-782",
        size_hint=60,
        fields=_meta_links("repo", "org", "actor")
        + (
            Field("Id", "id"),
            Field("Type", "type"),
            Field("Public", "public", "boolean"),
            Field("ActorLogin", "actor.login"),
            Field("ActorId", "actor.id", "long"),
            Field("RepoName", "repo.name"),
            Field("RepoId", "repo.id", "long"),
            Field("OrgLogin", "org.login"),
            Field("OrgId", "org.id", "long"),
            Field("PayloadAction", "payload.action"),
            Field("PayloadRef", "payload.ref"),
            Field("PayloadRefType", "payload.ref_type"),
            Field("PayloadPushId", "payload.push_id", "long"),
            Field("PayloadSize", "payload.size", "long"),
            Field("PayloadIssueNumber", "payload.issue.number", "long"),
            Field("PayloadPullRequestNumber", "payload.pull_request.number", "long"),
            Field("CreatedAt", "created_at", "timestamp"),
        )
        + _COMMON,
    ),
    EntitySpec(
        table="EventPayloadPullRequest",
        pattern="A",
        entity_filter=("like", "PullRequest%Event"),
        key=("EventUrn",),
        ref="/root/reference/USQL/ProcessDaily.usql:1078-1343",
        size_hint=60,
        fields=_meta_links("repo")
        + (
            Field("EventUrn", "_metadata.links.self.href"),
            Field("Id", "payload.pull_request.id", "long"),
            Field("Number", "payload.pull_request.number", "long"),
            Field("State", "payload.pull_request.state"),
            Field("Title", "payload.pull_request.title"),
            Field("Merged", "payload.pull_request.merged", "boolean"),
            Field("Commits", "payload.pull_request.commits", "long"),
            Field("Additions", "payload.pull_request.additions", "long"),
            Field("Deletions", "payload.pull_request.deletions", "long"),
            Field("CreatedAt", "payload.pull_request.created_at", "timestamp"),
        )
        + _COMMON,
    ),
    # -- Pattern B: nested-array child tables -----------------------------
    EntitySpec(
        table="CommitFile",
        pattern="B",
        entity_filter=("eq", "commit"),
        array_path="files",
        child_id="CommitFileId",
        ref="/root/reference/USQL/ProcessDaily.usql:277-351",
        fields=_meta_links("repo") + (Field("Sha", "sha"),),
        element_fields=(
            Field("FileSha", "sha"),
            Field("Filename", "filename"),
            Field("Status", "status"),
            Field("Additions", "additions", "long"),
            Field("Deletions", "deletions", "long"),
            Field("Changes", "changes", "long"),
            Field("Patch", "patch"),
        ),
    ),
    EntitySpec(
        table="CommitParent",
        pattern="B",
        entity_filter=("eq", "commit"),
        array_path="parents",
        child_id="CommitParentId",
        ref="/root/reference/USQL/ProcessDaily.usql:359-421",
        fields=_meta_links("repo") + (Field("Sha", "sha"),),
        element_fields=(
            Field("ParentSha", "sha"),
            Field("ParentUrn", "url"),
        ),
    ),
    EntitySpec(
        table="EventPayloadCommit",
        pattern="B",
        entity_filter=("eq", "PushEvent"),
        array_path="payload.commits",
        child_id="EventPayloadCommitId",
        key=("EventUrn",),
        size_hint=60,
        ref="/root/reference/USQL/ProcessDaily.usql:788-875",
        fields=_meta_links("repo") + (Field("EventUrn", "_metadata.links.self.href"),),
        element_fields=(
            Field("Sha", "sha"),
            Field("Message", "message"),
            Field("AuthorName", "author.name", "pii"),
            Field("AuthorEmail", "author.email", "pii"),
            Field("Distinct", "distinct", "boolean"),
        ),
    ),
    EntitySpec(
        table="EventPayloadIssueLabel",
        pattern="B",
        entity_filter=("isin", ("IssueEvent", "IssueCommentEvent")),
        array_path="payload.issue.labels",
        child_id="EventPayloadIssueLabelId",
        key=("EventUrn",),
        ref="/root/reference/USQL/ProcessDaily.usql:882-965",
        fields=_meta_links("repo") + (Field("EventUrn", "_metadata.links.self.href"),),
        element_fields=(
            Field("Name", "name"),
            Field("Color", "color"),
            Field("IsDefault", "default", "boolean"),
        ),
    ),
    EntitySpec(
        table="EventPayloadPage",
        pattern="B",
        entity_filter=("eq", "GollumEvent"),
        array_path="payload.pages",
        child_id="EventPayloadPageId",
        key=("EventUrn",),
        ref="/root/reference/USQL/ProcessDaily.usql:971-1071",
        fields=_meta_links("repo") + (Field("EventUrn", "_metadata.links.self.href"),),
        element_fields=(
            Field("PageName", "page_name"),
            Field("Title", "title"),
            Field("Action", "action"),
            Field("Sha", "sha"),
        ),
    ),
    EntitySpec(
        table="EventPayloadReleaseAsset",
        pattern="B",
        entity_filter=("eq", "ReleaseEvent"),
        array_path="payload.release.assets",
        child_id="EventPayloadReleaseAssetId",
        key=("EventUrn",),
        ref="/root/reference/USQL/ProcessDaily.usql:1348-1449",
        fields=_meta_links("repo") + (Field("EventUrn", "_metadata.links.self.href"),),
        element_fields=(
            Field("Id", "id", "long"),
            Field("Name", "name"),
            Field("ContentType", "content_type"),
            Field("Size", "size", "long"),
            Field("DownloadCount", "download_count", "long"),
        ),
    ),
    EntitySpec(
        table="IssueLabel",
        pattern="B",
        entity_filter=("eq", "issue"),
        array_path="labels",
        child_id="IssueLabelId",
        key=("IssueUrn",),
        ref="/root/reference/USQL/ProcessDaily.usql:1636-1726",
        fields=_meta_links("repo") + (Field("IssueUrn", "_metadata.links.self.href"),),
        element_fields=(
            Field("Name", "name"),
            Field("Color", "color"),
            Field("IsDefault", "default", "boolean"),
        ),
    ),
    # -- Pattern C: collection membership ---------------------------------
    EntitySpec(
        table="RepoCollaborators",
        pattern="C",
        entity_filter=("eq", "collaborators"),
        origin_col="RepoUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:20-91",
        fields=(),
    ),
    EntitySpec(
        table="RepoContributors",
        pattern="C",
        entity_filter=("eq", "contributors"),
        origin_col="RepoUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:428-494",
        fields=(),
    ),
    EntitySpec(
        table="RepoStargazers",
        pattern="C",
        entity_filter=("eq", "stargazers"),
        origin_col="RepoUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:2939-3007",
        fields=(),
    ),
    EntitySpec(
        table="RepoSubscribers",
        pattern="C",
        entity_filter=("eq", "subscribers"),
        origin_col="RepoUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:3013-3080",
        fields=(),
    ),
    EntitySpec(
        table="RepoTeams",
        pattern="C",
        entity_filter=("eq", "teams"),
        origin_col="RepoUrn",
        member_col="TeamUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:2865-2932",
        fields=(),
    ),
    EntitySpec(
        table="OrgMembers",
        pattern="C",
        entity_filter=("eq", "members"),
        origin_col="OrgUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:1732-1829",
        fields=(),
        extra={"origin_like": "%:org:%"},
    ),
    EntitySpec(
        table="TeamMembers",
        pattern="C",
        entity_filter=("eq", "members"),
        origin_col="TeamUrn",
        member_col="UserUrn",
        ref="/root/reference/USQL/ProcessDaily.usql:1831-1859",
        fields=(),
        extra={"origin_like": "%:team:%"},
    ),
    # -- Pattern D: traffic time-series -----------------------------------
    EntitySpec(
        table="Clones",
        pattern="D",
        entity_filter=("eq", "clones"),
        array_path="clones",
        key=("RepoUrn", "DataDate"),
        ref="/root/reference/USQL/ProcessDaily.usql:3227-3313",
        fields=_meta_links("repo"),
        element_fields=(
            Field("DataDate", "timestamp", "timestamp"),
            Field("Count", "count", "long"),
            Field("Uniques", "uniques", "long"),
        ),
    ),
    EntitySpec(
        table="Views",
        pattern="D",
        entity_filter=("eq", "views"),
        array_path="views",
        key=("RepoUrn", "DataDate"),
        ref="/root/reference/USQL/ProcessDaily.usql:3505-3591",
        fields=_meta_links("repo"),
        element_fields=(
            Field("DataDate", "timestamp", "timestamp"),
            Field("Count", "count", "long"),
            Field("Uniques", "uniques", "long"),
        ),
    ),
    EntitySpec(
        table="Referrers",
        pattern="D",
        entity_filter=("eq", "referrers"),
        array_path="referrers",
        key=("RepoUrn", "Referrer", "ProcessedAt"),
        ref="/root/reference/USQL/ProcessDaily.usql:3318-3406",
        fields=_meta_links("repo"),
        element_fields=(
            Field("Referrer", "referrer"),
            Field("Count", "count", "long"),
            Field("Uniques", "uniques", "long"),
        ),
        extra={"unordered_dedup": True},  # W2/Q2: dropDuplicates, no order
    ),
    EntitySpec(
        table="Paths",
        pattern="D",
        entity_filter=("eq", "paths"),
        array_path="paths",
        key=("RepoUrn", "Path", "ProcessedAt"),
        ref="/root/reference/USQL/ProcessDaily.usql:3411-3499",
        fields=_meta_links("repo"),
        element_fields=(
            Field("Path", "path"),
            Field("Title", "title"),
            Field("Count", "count", "long"),
            Field("Uniques", "uniques", "long"),
        ),
        extra={"unordered_dedup": True},
    ),
    # -- Pattern E: version log --------------------------------------------
    EntitySpec(
        table="RepoLog",
        pattern="E",
        entity_filter=("eq", "repo"),
        key=("EtlSourceId", "UpdatedAt"),
        ref="/root/reference/USQL/ProcessDaily.usql:2747-2859",
        fields=_meta_links("owner")
        + (
            Field("Id", "id", "long"),
            Field("Name", "name"),
            Field("FullName", "full_name"),
            Field("ForksCount", "forks_count", "long"),
            Field("StargazersCount", "stargazers_count", "long"),
            Field("WatchersCount", "watchers_count", "long"),
            Field("OpenIssuesCount", "open_issues_count", "long"),
            Field("Size", "size", "long"),
            Field("UpdatedAt", "updated_at", "timestamp"),
            Field("PushedAt", "pushed_at", "timestamp"),
        )
        + _COMMON,
    ),
)


def spec_for(table: str) -> EntitySpec:
    for s in CATALOG:
        if s.table == table:
            return s
    raise KeyError(table)
