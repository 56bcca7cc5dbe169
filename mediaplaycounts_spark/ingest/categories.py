"""Category membership snapshot builder (REF GetData::category_*,
VERDICT r4 missing #2).

The reference resolves a Commons category to its member files at
REQUEST time by recursively walking the MediaWiki API
(``action=query&list=categorymembers``, following ``cmcontinue``
pagination and descending into subcategories). At 100 TB request-time
recursion over a rate-limited HTTP API is the wrong architecture; the
engine's design (SURVEY.md §3.2) replaces it with a PRE-BUILT membership
snapshot table that `join_semi_membership` / the API layer consume via
broadcast semi-join.

This module is the missing producer: it turns RECORDED API responses
into that snapshot. Recording format (one JSON object per line — what a
thin fetch loop against the live API would append per request):

    {"category": "Category:Birds", "response": {<the raw MediaWiki
     categorymembers response for one page of that category>}}

Pagination needs no special handling: each continued page is simply
another line for the same category, and the explode unions them.

The recursive descent itself is BOUNDED BFS expressed as iterative
broadcast joins over the (parent -> member) edge table — the same
shape as `sql_recursive_cte` / `graph_bfs_hops`, cycle-safe via a
visited set (Commons category graphs DO contain cycles), and one
snapshot build serves every later query. At scale: the edge table is
millions of rows (shuffle-partitioned once); each BFS round joins a
tiny frontier (broadcast) against it, so rounds cost one scan each and
depth is capped by ``max_depth``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: MediaWiki namespace ids (public API constants).
NS_FILE = 6
NS_CATEGORY = 14

_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField(
                        "query",
                        T.StructType(
                            [
                                T.StructField(
                                    "categorymembers",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("pageid", T.LongType()),
                                                T.StructField("ns", T.LongType()),
                                                T.StructField("title", T.StringType()),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)


def parse_recorded_pages(spark: SparkSession, path: str) -> DataFrame:
    """Recorded JSONL -> edge table (parent, title, ns).

    ``spark.read.text`` + ``from_json`` with an explicit schema (never
    schema inference on untrusted recordings); rows that fail to parse
    yield NULL structs and are dropped — same corrupt-record posture as
    the mediacounts ingest.
    """
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json("value", _RESPONSE_SCHEMA).alias("r")
    ).select(
        F.col("r.category").alias("parent"),
        F.explode_outer("r.response.query.categorymembers").alias("m"),
    )
    return (
        parsed.filter(F.col("parent").isNotNull() & F.col("m").isNotNull())
        .select(
            "parent",
            F.col("m.title").alias("title"),
            F.col("m.ns").alias("ns"),
        )
        .distinct()
    )


def build_membership_snapshot(
    spark: SparkSession,
    recorded_path: str,
    root_category: str,
    max_depth: int = 5,
) -> DataFrame:
    """(category, file) membership rows for ``root_category``, following
    subcategories to ``max_depth`` hops.

    Output matches the members table `join_semi_membership` consumes:
    ``category`` = the ROOT (a file found in a subcategory belongs to
    the root's result set, exactly as the reference's recursive walk
    returns a flat file list), ``file`` = title without the ``File:``
    namespace prefix.
    """
    edges = parse_recorded_pages(spark, recorded_path)
    files = edges.filter(F.col("ns") == NS_FILE).select("parent", "title")
    subcats = edges.filter(F.col("ns") == NS_CATEGORY).select(
        "parent", F.col("title").alias("child")
    )

    frontier = spark.createDataFrame([(root_category,)], "cat string")
    visited = frontier
    collected = files.join(
        F.broadcast(frontier), files.parent == frontier.cat, "leftsemi"
    )
    for _ in range(max_depth):
        nxt = (
            subcats.join(
                F.broadcast(frontier), subcats.parent == frontier.cat, "leftsemi"
            )
            .select(F.col("child").alias("cat"))
            .distinct()
            .join(visited, "cat", "left_anti")  # cycle guard
        )
        # Frontiers are category lists — tiny by construction; localize
        # them so the loop's lineage doesn't re-walk every prior round.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        frontier = nxt
        visited = visited.unionByName(frontier).distinct().localCheckpoint(True)
        collected = collected.unionByName(
            files.join(F.broadcast(frontier), files.parent == frontier.cat, "leftsemi")
        )
    return (
        collected.select(
            F.lit(root_category).alias("category"),
            F.regexp_replace("title", r"^File:", "").alias("file"),
        )
        .distinct()
    )
