"""PageRank workload: rank nations by weighted trade flow.

Builds the nation→nation trade graph (supplier nation → customer
nation, weighted by lineitem revenue — the q7 join shape aggregated to
graph edges) and runs weighted PageRank over it.

The power iteration IS oracle-checkable despite the per-round global
dangling-mass scalar: augment the normalized edge list with (a) an
explicit 1/n edge from every dangling node to every node — turning the
dangling redistribution into ordinary edge contributions — and (b) a
p=0 self-loop per node so every node has an in-edge. One recursive-CTE
step per iteration then references the rank table exactly once
(window-SUM + DISTINCT, same device as the k-core oracle below), and
the unrolled 10-iteration CTE reproduces the exact formula of
``operators/graph._pagerank_driver``. Both engines accumulate float64
in different orders, but the ≤|nations| term sums drift ~1e-15 while
the output is rounded to 8 decimals — the hash check compares the
rounded grain. A numpy power-iteration golden (tests/test_graph.py)
independently pins the math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators.graph import pagerank
from big_data_pipeline_spark.oracle import exact_avg, exact_sum


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-nation → customer-nation edges weighted by revenue."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("src")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("dst")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy("src", "dst")
        .agg(exact_sum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


# --- driver-solved graph loops (r10) -----------------------------------------
# The BFS/Bellman-Ford/peel loops below iterate a KEY-BOUNDED aggregated
# graph (|edges| <= |nations|^2 at any corpus size) through cluster jobs
# — the same scheduling-dominated shape `operators/graph._pagerank_driver`
# and `dedup/clusters._cc_driver` already solve with one bounded collect
# + a numpy loop. Each solver below replicates its distributed loop's
# EXACT synchronous round structure (same round caps, same early-exit
# conditions), so the emitted row set is identical even when the round
# budget stops short of convergence. The distributed loops stay in place
# for corpus-scale graphs (gate: count-first, `0` disables the driver
# path; equivalence pinned in tests/test_graph_driver.py).

_GRAPH_DRIVER_MAX_EDGES = 2_000_000


def _edges_if_driver_small(und: DataFrame, max_edges: int):
    """Count-first gate; the count also materializes the frame's lazy
    checkpoint in-job (round 1's probe paid that job before). Returns
    a pandas frame of the edges, or None to take the distributed loop."""
    if not max_edges or und.count() > max_edges:
        return None
    return und.toPandas()


def _bfs_hops_driver(pdf, source, max_hops: int) -> list[tuple]:
    """Frontier BFS over a symmetric (a, b) edge array — one numpy
    scatter per hop level; identical (node, hop) rows to the
    distributed frontier loop (hop = first-reach level, <= max_hops)."""
    import numpy as np

    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    n = len(ids)
    src_pos = int(np.searchsorted(ids, source))
    if src_pos >= n or ids[src_pos] != source:
        return [(source, 0)]  # source absent: visited = {source}
    hop = np.full(n, -1, dtype=np.int64)
    hop[src_pos] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[src_pos] = True
    for h in range(1, max_hops + 1):
        nxt = np.zeros(n, dtype=bool)
        nxt[v[frontier[u]]] = True
        nxt &= hop == -1
        if not nxt.any():
            break
        hop[nxt] = h
        frontier = nxt
    reached = np.flatnonzero(hop >= 0)
    return list(zip(ids[reached].tolist(), hop[reached].tolist()))


def _sssp_driver(pdf, source, max_rounds: int) -> list[tuple]:
    """Synchronous Bellman-Ford rounds over (a, b, w) edges with the
    SAME bounded-round + no-improvement early exit as the distributed
    loop (integer costs, so ties and partial convergence agree)."""
    import numpy as np

    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    w = pdf.iloc[:, 2].to_numpy().astype(np.int64)
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    n = len(ids)
    src_pos = int(np.searchsorted(ids, source))
    if src_pos >= n or ids[src_pos] != source:
        return [(source, 0)]
    inf = np.iinfo(np.int64).max // 2
    dist = np.full(n, inf, dtype=np.int64)
    dist[src_pos] = 0
    for _ in range(max_rounds):
        reached = dist[u] < inf
        new = dist.copy()
        np.minimum.at(new, v[reached], dist[u[reached]] + w[reached])
        if np.array_equal(new, dist):
            break
        dist = new
    got = np.flatnonzero(dist < inf)
    return list(zip(ids[got].tolist(), dist[got].tolist()))


def _kcore_driver(pdf, k: int, rounds: int) -> list[tuple]:
    """Degree-peel rounds over the symmetric directed (u, v) edge
    array; same round cap and fixpoint break as kcore_peel's loop."""
    import numpy as np

    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    n = len(ids)
    alive = np.ones(len(u), dtype=bool)
    n_edges = len(u)
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = np.bincount(u[alive], minlength=n)
        keep = alive & (deg[u] >= k) & (deg[v] >= k)
        n_next = int(keep.sum())
        alive = keep
        if n_next == n_edges:
            break
        n_edges = n_next
    return list(zip(ids[u[alive]].tolist(), ids[v[alive]].tolist()))


# dense all-sources BFS: n^2 bools + an n^2 matmul per hop; nation-like
# aggregated graphs are tiny, corpus-node-scale graphs take the
# distributed keyed frontier
_CLOSENESS_DRIVER_MAX_NODES = 2_048


def _lpa_driver(pdf, iters: int, enc: int) -> list[tuple]:
    """Deterministic min-encoded label propagation over the symmetric
    directed (src, dst) edge array — the EXACT integer update of the
    distributed loop: per round every node takes, over its incoming
    labels, min((enc - count) * enc + label) % enc (most-frequent label,
    smallest on ties). Labels are always < enc, so (dst, label) pairs
    pack injectively into one int64 key for the count pass."""
    import numpy as np

    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    n = len(ids)
    lab = ids.astype(np.int64).copy()  # initial label = node id
    sentinel = np.iinfo(np.int64).max
    for _ in range(iters):
        key = v * enc + lab[u]
        uk, cnt = np.unique(key, return_counts=True)
        encoded = (enc - cnt) * enc + (uk % enc)
        best = np.full(n, sentinel, dtype=np.int64)
        np.minimum.at(best, uk // enc, encoded)
        lab = best % enc
    return list(zip(ids.tolist(), [int(x) for x in lab.tolist()]))


def _closeness_driver(pdf, max_hops: int) -> list[tuple] | None:
    """All-sources frontier BFS: every source advances one hop per
    round exactly like the keyed distributed frontier — returns the
    (source, node, hop) first-reach rows, or None when the node count
    exceeds the dense-matrix bound."""
    import numpy as np

    a = pdf.iloc[:, 0].to_numpy()
    b = pdf.iloc[:, 1].to_numpy()
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a):]
    n = len(ids)
    if n > _CLOSENESS_DRIVER_MAX_NODES:
        return None
    adj = np.zeros((n, n), dtype=np.float32)
    adj[u, v] = 1.0
    hop = np.full((n, n), -1, dtype=np.int64)  # [source, node]
    np.fill_diagonal(hop, 0)
    frontier = np.eye(n, dtype=np.float32)
    for h in range(1, max_hops + 1):
        nxt = (frontier @ adj) > 0
        nxt &= hop == -1
        if not nxt.any():
            break
        hop[nxt] = h
        frontier = nxt.astype(np.float32)
    si, ni = np.nonzero(hop >= 0)
    return list(
        zip(ids[si].tolist(), ids[ni].tolist(), hop[si, ni].tolist())
    )


def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = trade_edges(spark, sf_dir)
    ranks = pagerank(edges, damping=0.85, max_iter=10, weight="revenue")
    return (
        ranks.select(
            F.col("id").alias("nation"), F.round("rank", 8).alias("rank")
        )
        .orderBy(F.desc("rank"), "nation")
    )


# --- triangle_count_trade: multi-way self-join graph motif ------------------
# Triangle counting = the canonical graph-motif join: canonicalize the
# strong-trade graph to undirected a<b edges, then one two-hop join
# closed by a third edge check, with a<b<c ordering so each triangle
# counts exactly once. Edge threshold is RELATIVE (1.8× the mean edge
# revenue) so the query is scale-free across sf. Per-nation output =
# explode each triangle's three corners.
#
# Scale: |edges| after thresholding is per-nation-pair aggregated —
# graph size is bounded by key cardinality squared, never row count;
# the joins are edge-sized, and the a<b<c ordering halves/serializes
# the candidate space exactly as in the MapReduce triangle literature.


def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # key-bounded frame consumed by the avg scalar AND the threshold
    # probe below — one corpus pass instead of a replay per consumer
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    # exact decimal avg: a raw double AVG is partial-agg-order sensitive
    # and the threshold compare must be deterministic on both engines
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    strong = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > 1.8 * F.col("avg_rev"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # strong is consumed 3× (e1/e2/e3); without a lineage cut the
        # upstream 5-way join + agg replays per consumer unless exchange
        # reuse happens to rescue it. Materialize once — the thresholded
        # edge list is key-cardinality-bounded (≤ |nations|²), so this
        # is a tiny cached table even at 100 TB input. Same pattern as
        # pagerank/star-CC (commit 495263f).
        .localCheckpoint(eager=True)
    )
    e1 = strong.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = strong.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = strong.select(F.col("a").alias("x"), F.col("b").alias("z"))
    # triangles also feeds 3 corner projections; it's triangle-count
    # sized (tiny), so cut lineage here too.
    triangles = e1.join(e2, "y").join(e3, ["x", "z"]).localCheckpoint(eager=True)
    corners = (
        triangles.select(F.col("x").alias("nation"))
        .unionAll(triangles.select(F.col("y").alias("nation")))
        .unionAll(triangles.select(F.col("z").alias("nation")))
    )
    return (
        corners.groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "nation")
    )


_TRIANGLE_SQL = """
WITH e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  GROUP BY 1, 2
),
strong AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e, (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
                    / COUNT(*) AS avg_rev FROM e) t
  WHERE revenue > 1.8 * avg_rev AND src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM strong e1
  JOIN strong e2 ON e1.b = e2.a
  JOIN strong e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS nation FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT nation, COUNT(*) AS n_triangles
FROM corners GROUP BY nation
ORDER BY n_triangles DESC, nation
"""


# --- kcore_trade_graph: iterative k-core peel --------------------------------
# The k-core (Seidman 1983): repeatedly delete nodes with degree < k
# until none remain; what survives is the graph's cohesive backbone —
# the standard prefilter before community detection and the "dense
# cluster of near-dup sources" probe on a dedup similarity graph.
#
# Distributed design: the state is the SYMMETRIC directed edge list
# (each undirected edge as (u,v) and (v,u)), so one per-key count gives
# every node's degree and an edge survives iff both endpoint degrees
# >= k — one groupBy + two joins per round, lineage cut per round
# (localCheckpoint, same as star-CC), rounds bounded by the peel depth
# (<= |nodes|, in practice a handful). No driver-side graph state.
#
# Oracle: genuinely SQL-expressible — a recursive CTE over the directed
# edge state where window COUNTs over (u) and (v) are both endpoint
# degrees (the symmetric trick avoids the single-recursive-reference
# restriction), unrolled a fixed _KCORE_ROUNDS >= |nations| rounds so
# the final iteration IS the fixpoint. The driver hash-checks the
# Spark loop against DuckDB's recursion — an independent-implementation
# check of the whole iteration, not just one round.

_KCORE_K = 3
_KCORE_ROUNDS = 30  # >= max peel depth for a <=25-node nation graph


def kcore_peel(
    und: DataFrame,
    k: int,
    rounds: int = _KCORE_ROUNDS,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Peel an undirected (a, b) edge list to its k-core; returns the
    surviving symmetric edges (u, v). Exposed for direct testing on
    crafted graphs."""
    # lazy lineage cuts: each round's count is a full action, so it
    # materializes that round's checkpoint in the same job — one job per
    # peel round instead of an eager-checkpoint job plus a count job
    sym = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )
    n_edges = sym.count()
    if driver_max_edges is None:
        driver_max_edges = _GRAPH_DRIVER_MAX_EDGES
    if driver_max_edges and n_edges <= driver_max_edges:
        rows = _kcore_driver(sym.toPandas(), k, rounds)
        return und.sparkSession.createDataFrame(rows, sym.schema)
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        du = deg.select(F.col("u"), F.col("deg").alias("du"))
        dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("dv"))
        nxt = (
            sym.join(F.broadcast(du), "u")
            .join(F.broadcast(dv), "v")
            .filter((F.col("du") >= k) & (F.col("dv") >= k))
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()
        sym = nxt
        if n_next == n_edges:  # fixpoint
            break
        n_edges = n_next
    return sym


def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the aggregated edge frame is key-bounded (<= |nations|^2 rows) and
    # feeds BOTH the exact-avg threshold scalar and the probe side of the
    # threshold filter — without the cut the 5-way corpus join + groupBy
    # is planned once per consumer (4 lineitem scans in the und build
    # plan; runtime exchange reuse rescued most but not all of it, r10)
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    und = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > F.col("avg_rev"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = kcore_peel(und, _KCORE_K)
    return (
        sym.groupBy(F.col("u").alias("nation"))
        .agg(F.count(F.lit(1)).alias("kcore_degree"))
        .orderBy(F.desc("kcore_degree"), "nation")
    )


_KCORE_SQL = f"""
WITH RECURSIVE und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (
    SELECT s.n_name AS src, c2.n_name AS dst,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation s ON supplier.s_nationkey = s.n_nationkey
    JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
    GROUP BY 1, 2
  ) e,
  (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
            / COUNT(*) AS avg_rev
   FROM (
     SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
     FROM lineitem
     JOIN orders ON l_orderkey = o_orderkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN customer ON o_custkey = c_custkey
     JOIN nation s ON supplier.s_nationkey = s.n_nationkey
     JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
     GROUP BY s.n_name, c2.n_name
   )) t
  WHERE revenue > avg_rev AND src <> dst
),
peel(iter, u, v) AS (
  SELECT 0, a, b FROM und
  UNION ALL SELECT 0, b, a FROM und
  UNION ALL
  SELECT iter + 1, u, v
  FROM (
    SELECT iter, u, v,
           COUNT(*) OVER (PARTITION BY u) AS du,
           COUNT(*) OVER (PARTITION BY v) AS dv
    FROM peel
  )
  WHERE iter < {_KCORE_ROUNDS}
    AND du >= {_KCORE_K} AND dv >= {_KCORE_K}
)
SELECT u AS nation, COUNT(*) AS kcore_degree
FROM peel WHERE iter = {_KCORE_ROUNDS}
GROUP BY u
ORDER BY kcore_degree DESC, nation
"""


# PageRank oracle: see module docstring. Iteration count / damping are
# pinned to pagerank_nation_trade's call (max_iter=10, damping=0.85);
# `aug` is the augmented transition list (real normalized edges +
# dangling→all 1/n edges + p=0 self-loops).
_PAGERANK_SQL = """
WITH RECURSIVE e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  GROUP BY 1, 2
),
-- under WITH RECURSIVE, a CTE whose body is a TOP-LEVEL set operation
-- is parsed as base/recursive parts (DuckDB applies this even when the
-- right arm never references the CTE, silently dropping UNION dedup) —
-- so every non-recursive union here hides inside a subquery
nodes AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
aug AS (SELECT * FROM (
  SELECT src, dst, w / out_w AS p FROM e JOIN outw USING (src)
  UNION ALL
  SELECT d.id AS src, nd.id AS dst, 1.0 / (SELECT n FROM nn) AS p
  FROM (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)) d,
       nodes nd
  UNION ALL
  SELECT id AS src, id AS dst, CAST(0 AS DOUBLE) AS p FROM nodes)),
pr(iter, id, rank) AS (
  SELECT 0, id, 1.0 / (SELECT n FROM nn) FROM nodes
  UNION ALL
  SELECT DISTINCT r.iter + 1, a.dst,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * SUM(a.p * r.rank) OVER (PARTITION BY a.dst)
  FROM pr r JOIN aug a ON a.src = r.id
  WHERE r.iter < 10
)
SELECT id AS nation, ROUND(rank, 8) AS rank
FROM pr WHERE iter = 10
ORDER BY rank DESC, nation
"""


# --- lpa_trade_communities: synchronous label propagation -------------------
#
# Community detection by label propagation (Raghavan et al. 2007),
# SYNCHRONOUS variant with a total tie-break so the result is exactly
# reproducible on any engine: at each step every node adopts the most
# frequent label among its neighbors, ties broken by MIN label. All
# state is integer (labels are nation keys, counts are degrees), so
# there is no floating-point anywhere in the iteration — the oracle is
# a recursive CTE computing the identical fixed 4 rounds.
#
# The per-round argmax is encoded as a pure MIN aggregate:
# (64 - cnt) * 64 + label is strictly decreasing in cnt and increasing
# in label, so MIN picks (max count, then min label); % 64 decodes the
# label. That keeps the recursive arm window-free (two stacked GROUP
# BYs), and on the Spark side makes each round ONE keyed aggregation —
# map-side combinable, no row_number shuffle-and-filter.
#
# Scale: per-round cost is |edges| message rows into a groupBy on
# (node, label) — the standard Pregel round as one shuffle. The
# nation graph is key-bounded (≤ 25² edges after per-pair aggregation
# regardless of input size); for web-scale graphs the same loop runs
# with the label frame localCheckpoint'ed per round (lineage cut, as
# in the star-CC operator) — exactly what this implementation does.

_LPA_ITERS = 4
_LPA_THRESHOLD = 2.2  # x mean edge revenue (sparser than triangle's 1.8)
_LPA_ENC = 64  # > max(label) and > max(count): safe min-encoding radix


def lpa_trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    edges = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(exact_sum("l_extendedprice * (1 - l_discount)", "revenue"))
        # key-bounded frame consumed by the avg scalar AND the threshold
        # probe below — one corpus pass instead of a replay per consumer
        .localCheckpoint(eager=False)
    )
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    und = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > _LPA_THRESHOLD * F.col("avg_rev"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
        )
        .distinct()
    )
    sym = (
        und.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionAll(und.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        # consumed every round: cut the 4-join lineage. Lazy — the gate
        # count below materializes it in the same job (r9 convention)
        .localCheckpoint(eager=False)
    )
    pdf = _edges_if_driver_small(sym, _GRAPH_DRIVER_MAX_EDGES)
    if pdf is not None:
        from pyspark.sql import types as T

        labels = spark.createDataFrame(
            _lpa_driver(pdf, _LPA_ITERS, _LPA_ENC),
            T.StructType(
                [
                    T.StructField("id", sym.schema["src"].dataType),
                    T.StructField("label", T.IntegerType()),
                ]
            ),
        )
    else:
        labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
            "label", F.col("id")
        )
        enc = F.lit(_LPA_ENC)
        for _ in range(_LPA_ITERS):
            labels = (
                sym.join(labels, sym.src == labels.id)
                .groupBy(F.col("dst").alias("nid"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .groupBy(F.col("nid").alias("id"))
                .agg(
                    (F.min((enc - F.col("cnt")) * enc + F.col("label")) % enc)
                    .cast("int")
                    .alias("label")
                )
                .localCheckpoint(eager=True)
            )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))
    names = nation.select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("nation")
    )
    return (
        labels.join(F.broadcast(sizes), "label")
        .join(F.broadcast(names), "id")
        .select("nation", F.col("label").alias("community"), "community_size")
    )


_LPA_SQL = f"""
WITH RECURSIVE e AS (
  SELECT supplier.s_nationkey AS src, customer.c_nationkey AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
a AS (
  SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS avg_rev
  FROM e
),
und AS (
  SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
  FROM e, a
  WHERE revenue > {_LPA_THRESHOLD} * avg_rev AND src <> dst
),
sym AS (SELECT * FROM (
  SELECT x AS src, y AS dst FROM und UNION ALL SELECT y, x FROM und)),
nodes AS (SELECT DISTINCT src AS id FROM sym),
lab(iter, id, label) AS (
  SELECT 0, id, id FROM nodes
  UNION ALL
  SELECT iter + 1, nid,
         CAST(MIN(({_LPA_ENC} - cnt) * {_LPA_ENC} + label) % {_LPA_ENC} AS INT)
  FROM (
    SELECT l.iter AS iter, s.dst AS nid, l.label AS label, COUNT(*) AS cnt
    FROM lab l JOIN sym s ON s.src = l.id
    WHERE l.iter < {_LPA_ITERS}
    GROUP BY 1, 2, 3
  )
  GROUP BY 1, 2
),
final AS (SELECT id, label FROM lab WHERE iter = {_LPA_ITERS}),
sizes AS (SELECT label, COUNT(*) AS community_size FROM final GROUP BY label)
SELECT n.n_name AS nation, f.label AS community, s.community_size
FROM final f JOIN sizes s USING (label) JOIN nation n ON n.n_nationkey = f.id
"""


# --- bfs_trade_hops: shortest hop distance (frontier BFS) --------------------
# The remaining classic graph primitive: single-source shortest paths
# in hops over the thresholded strong-trade graph (same exact-decimal
# threshold discipline as the triangle query). Distributed frontier
# BFS: each round joins the CURRENT frontier (shrinking) against the
# edge list, anti-joins the visited set, and cuts lineage — O(diameter)
# rounds, never a full-graph recomputation per round. The DuckDB
# oracle walks the same graph with a recursive CTE and takes MIN(hop)
# per node — a different traversal that must agree cell-exact.
#
# Scale: the frontier join keys on the node id (keyed shuffle against
# the materialized, key-cardinality-bounded edge list); visited/
# frontier are node-sized. Unreachable nodes are simply absent —
# semantics every BFS consumer expects.

_BFS_SOURCE = "NATION_0"
_BFS_FACTOR = 2.3
_BFS_MAX_HOPS = 6


def bfs_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the aggregated edge frame is key-bounded (<= |nations|^2 rows) and
    # feeds BOTH the exact-avg threshold scalar and the probe side of the
    # threshold filter — without the cut the 5-way corpus join + groupBy
    # is planned once per consumer (4 lineitem scans in the und build
    # plan; runtime exchange reuse rescued most but not all of it, r10)
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    strong = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > _BFS_FACTOR * F.col("avg_rev"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # lazy lineage cuts: each round's frontier count is a full action and
    # materializes und (round 1), the new frontier, and the previous
    # visited union in ONE job — the eager form paid three jobs per round
    und = (
        strong.unionByName(
            strong.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    pdf = _edges_if_driver_small(und, _GRAPH_DRIVER_MAX_EDGES)
    if pdf is not None:
        return spark.createDataFrame(
            _bfs_hops_driver(pdf, _BFS_SOURCE, _BFS_MAX_HOPS),
            "nation string, hop int",
        )
    # a 1-row local relation: no lineage to cut, checkpoint buys nothing
    frontier = spark.createDataFrame(
        [(_BFS_SOURCE, 0)], "nation string, hop int"
    )
    visited = frontier
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier["nation"] == und["a"])
            .select(F.col("b").alias("nation"))
            .distinct()
            .join(visited.select("nation"), "nation", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited


_BFS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  GROUP BY 1, 2
),
strong AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e, (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR)
                       AS DOUBLE) / COUNT(*) AS avg_rev FROM e) t
  WHERE revenue > {_BFS_FACTOR} * avg_rev AND src <> dst
),
und AS (SELECT a, b FROM strong UNION SELECT b AS a, a AS b FROM strong),
walk(n, hop) AS (
  SELECT '{_BFS_SOURCE}', 0
  UNION
  SELECT u.b, w.hop + 1
  FROM walk w JOIN und u ON u.a = w.n
  WHERE w.hop < {_BFS_MAX_HOPS}
)
SELECT n AS nation, CAST(MIN(hop) AS INTEGER) AS hop
FROM walk GROUP BY n
"""


# --- sssp_trade_cost: weighted shortest paths (Bellman-Ford rounds) ----------
# The weighted sibling of bfs_trade_hops: minimum total edge cost from
# the source over the SAME strong-trade graph, with integer edge costs
# (floor(revenue/1e5)+1 — heavier trade = cheaper hop is deliberately
# NOT used; cost grows with bucketed revenue so paths differ from hop
# counts). Distributed Bellman-Ford: each round joins current
# distances against the edge list, takes the min per node, and cuts
# lineage — |V|-1 rounds bound exact convergence; the fixed round
# budget matches the BFS diameter bound. Integer arithmetic end to
# end, so the DuckDB oracle (bounded-depth recursive walk + MIN) is
# cell-exact.

_SSSP_MAX_ROUNDS = 6


def sssp_trade_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the aggregated edge frame is key-bounded (<= |nations|^2 rows) and
    # feeds BOTH the exact-avg threshold scalar and the probe side of the
    # threshold filter — without the cut the 5-way corpus join + groupBy
    # is planned once per consumer (4 lineitem scans in the und build
    # plan; runtime exchange reuse rescued most but not all of it, r10)
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    strong = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > _BFS_FACTOR * F.col("avg_rev"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.floor(F.col("revenue") / F.lit(100000.0)) + 1)
            .cast("long")
            .alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    und = (
        strong.unionByName(
            strong.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "w"
            )
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        # lazy lineage cuts: round 1's improvement count materializes
        # und and relaxed in one job (eager form: one checkpoint job +
        # one probe job per round)
        .localCheckpoint(eager=False)
    )
    pdf = _edges_if_driver_small(und, _GRAPH_DRIVER_MAX_EDGES)
    if pdf is not None:
        return spark.createDataFrame(
            _sssp_driver(pdf, _BFS_SOURCE, _SSSP_MAX_ROUNDS),
            "nation string, cost long",
        )
    # a 1-row local relation: no lineage to cut, checkpoint buys nothing
    dist = spark.createDataFrame(
        [(_BFS_SOURCE, 0)], "nation string, cost long"
    )
    for _ in range(_SSSP_MAX_ROUNDS):
        relaxed = (
            dist.join(und, dist["nation"] == und["a"])
            .select(
                F.col("b").alias("nation"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .unionByName(dist)
            .groupBy("nation")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=False)
        )
        # converged when no distance improved this round (full-action
        # count, so it also materializes relaxed's checkpoint in-job)
        n_improved = (
            relaxed.join(
                dist.withColumnRenamed("cost", "old"), "nation", "left"
            )
            .filter(
                F.col("old").isNull() | (F.col("cost") < F.col("old"))
            )
            .count()
        )
        dist = relaxed
        if n_improved == 0:
            break
    return dist


_SSSP_SQL = f"""
WITH RECURSIVE e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  GROUP BY 1, 2
),
strong AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         MIN(CAST(FLOOR(revenue / 100000.0) + 1 AS BIGINT)) AS w
  FROM e, (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR)
                       AS DOUBLE) / COUNT(*) AS avg_rev FROM e) t
  WHERE revenue > {_BFS_FACTOR} * avg_rev AND src <> dst
  GROUP BY 1, 2
),
und AS (
  SELECT a, b, MIN(w) AS w FROM (
    SELECT a, b, w FROM strong
    UNION ALL
    SELECT b AS a, a AS b, w FROM strong
  ) GROUP BY a, b
),
walk(n, cost, hop) AS (
  SELECT '{_BFS_SOURCE}', CAST(0 AS BIGINT), 0
  UNION
  SELECT u.b, w.cost + u.w, w.hop + 1
  FROM walk w JOIN und u ON u.a = w.n
  WHERE w.hop < {_SSSP_MAX_ROUNDS}
)
SELECT n AS nation, MIN(cost) AS cost
FROM walk GROUP BY n
"""


# --- closeness_trade_centrality: multi-source BFS centrality -----------------
# The centrality family member PageRank can't substitute for:
# closeness = (reachable-1) / Σ hop-distance, computed for EVERY node
# at once. Same frontier machinery as bfs_trade_hops with the source
# id carried in the key — ALL single-source searches advance in the
# same round's keyed join ((src, node) frontier vs the edge list), so
# all-pairs distances cost diameter rounds, not |V| sequential runs.
# Distance sums are exact integers; one double division per node.


def closeness_trade_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the aggregated edge frame is key-bounded (<= |nations|^2 rows) and
    # feeds BOTH the exact-avg threshold scalar and the probe side of the
    # threshold filter — without the cut the 5-way corpus join + groupBy
    # is planned once per consumer (4 lineitem scans in the und build
    # plan; runtime exchange reuse rescued most but not all of it, r10)
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    strong = (
        edges.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("revenue") > _BFS_FACTOR * F.col("avg_rev"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # lazy lineage cuts (same device as bfs_trade_hops): the per-round
    # frontier count materializes everything this round needs in one job
    und = (
        strong.unionByName(
            strong.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    rows = None
    pdf = _edges_if_driver_small(und, _GRAPH_DRIVER_MAX_EDGES)
    if pdf is not None:
        # may still decline (node count above the dense-matrix bound)
        rows = _closeness_driver(pdf, _BFS_MAX_HOPS)
    if rows is not None:
        visited = spark.createDataFrame(
            rows, "source string, nation string, hop int"
        )
        return _closeness_agg(visited)
    nodes = und.select(F.col("a").alias("nation")).distinct()
    frontier = nodes.select(
        F.col("nation").alias("source"), "nation", F.lit(0).alias("hop")
    ).localCheckpoint(eager=False)
    visited = frontier
    for hop in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier["nation"] == und["a"])
            .select("source", F.col("b").alias("nation"))
            .distinct()
            .join(
                visited.select("source", "nation"),
                ["source", "nation"],
                "left_anti",
            )
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return _closeness_agg(visited)


def _closeness_agg(visited: DataFrame) -> DataFrame:
    return visited.groupBy(F.col("source").alias("nation")).agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reachable"),
        F.sum("hop").cast("bigint").alias("total_dist"),
        (
            (F.count(F.lit(1)) - 1).cast("double") / F.sum("hop")
        ).alias("closeness"),
    ).filter(F.col("total_dist") > 0)


_CLOSENESS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  GROUP BY 1, 2
),
strong AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e, (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR)
                       AS DOUBLE) / COUNT(*) AS avg_rev FROM e) t
  WHERE revenue > {_BFS_FACTOR} * avg_rev AND src <> dst
),
und AS (SELECT a, b FROM strong UNION SELECT b AS a, a AS b FROM strong),
walk(source, n, hop) AS (
  SELECT a, a, 0 FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT w.source, u.b, w.hop + 1
  FROM walk w JOIN und u ON u.a = w.n
  WHERE w.hop < {_BFS_MAX_HOPS}
),
dists AS (
  SELECT source, n, MIN(hop) AS hop FROM walk GROUP BY source, n
)
SELECT source AS nation,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reachable,
       CAST(SUM(hop) AS BIGINT) AS total_dist,
       CAST(COUNT(*) - 1 AS DOUBLE) / SUM(hop) AS closeness
FROM dists
GROUP BY source
HAVING SUM(hop) > 0
"""


# --- degree_assortativity_trade: do hubs trade with hubs? --------------------
# Newman's degree assortativity (2002): the Pearson correlation of
# endpoint degrees over the SYMMETRIZED undirected edge list (each
# edge contributes both orientations, so Σx = Σy by construction).
# r > 0 means high-degree nations preferentially trade with each
# other (assortative core); r < 0 means a hub-and-spoke topology.
# All five moments are exact integer sums over the edge meetings; the
# only IEEE ops are the final products, one sqrt, one division —
# identical expressions on both engines.
#
# Scale: the nation graph is key-bounded (|edges| <= |nations|^2);
# degrees are one groupBy of the symmetric edge list, the moment pass
# one aggregate. On a vertex-scale graph the same plan holds: degree
# table broadcast only if model-sized, else a keyed join.


def degree_assortativity_trade(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    edges = (
        trade_edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        # key-bounded frame consumed by the avg scalar AND the threshold
        # probe below — one corpus pass instead of a replay per consumer
        .localCheckpoint(eager=False)
    )
    # the STRONG-trade graph (relative threshold, same rule as the
    # triangle/k-core ops): the raw nation graph saturates to a
    # complete graph as data grows, where every degree is equal and
    # assortativity is undefined (zero variance)
    avg_rev = edges.agg(exact_avg("revenue", "avg_rev"))
    edges = edges.crossJoin(F.broadcast(avg_rev)).filter(
        F.col("revenue") > 1.8 * F.col("avg_rev")
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        # materialize the thresholded edge list once: it fans out into
        # sym (twice), deg and the moment join — without the cut the
        # 5-way join + aggregate pipeline replays per consumer (the
        # before-plan held 144 parquet scans). Key-cardinality-bounded
        # (≤ |nations|²), so a tiny cached table at any input size —
        # same device as triangle_count_trade's `strong`.
        .localCheckpoint(eager=True)
    )
    sym = und.union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    met = (
        sym.join(deg, "a")
        .withColumnRenamed("deg", "dx")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("dy")),
            "b",
        )
    )
    m = met.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        # NULL (not an error) on a degree-regular graph: zero variance
        # makes the coefficient undefined; both engines agree via the
        # same guarded division
        F.try_divide(num, F.sqrt(denx * deny)).alias("assortativity"),
    )


_ASSORT_SQL = """
WITH e AS (
  SELECT s.n_name AS src, c2.n_name AS dst,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation s ON supplier.s_nationkey = s.n_nationkey
  JOIN nation c2 ON customer.c_nationkey = c2.n_nationkey
  WHERE s.n_name <> c2.n_name
  GROUP BY 1, 2
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e, (SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR)
                       AS DOUBLE) / COUNT(*) AS avg_rev FROM e) t
  WHERE revenue > 1.8 * avg_rev
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
met AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM sym JOIN deg da ON sym.a = da.a
  JOIN deg db ON sym.b = db.a
),
mo AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM met
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / NULLIF(sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                       * CAST(m * syy - sy * sy AS DOUBLE)), 0.0)
         AS assortativity
FROM mo
"""


QUERIES = {
    "degree_assortativity_trade": degree_assortativity_trade,
    "pagerank_nation_trade": pagerank_nation_trade,
    "triangle_count_trade": triangle_count_trade,
    "kcore_trade_graph": kcore_trade_graph,
    "lpa_trade_communities": lpa_trade_communities,
    "bfs_trade_hops": bfs_trade_hops,
    "sssp_trade_cost": sssp_trade_cost,
    "closeness_trade_centrality": closeness_trade_centrality,
}

ORACLE: dict[str, str] = {
    "degree_assortativity_trade": _ASSORT_SQL,
    "bfs_trade_hops": _BFS_SQL,
    "sssp_trade_cost": _SSSP_SQL,
    "closeness_trade_centrality": _CLOSENESS_SQL,
    "pagerank_nation_trade": _PAGERANK_SQL,
    "triangle_count_trade": _TRIANGLE_SQL,
    "kcore_trade_graph": _KCORE_SQL,
    "lpa_trade_communities": _LPA_SQL,
}
