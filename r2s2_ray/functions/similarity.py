"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is broadcast via
  ``ray.put`` ONCE; every batch does one numpy matmul and emits only its local
  top-k per query; a tiny driver-side merge finishes. Shuffle-free; scales linearly
  with corpus size.
* :func:`lsh_topk` — the scale path: random-hyperplane bucketing first, exact
  cosine only against candidates whose bucket matches the query's (probing nearby
  buckets by Hamming distance), trading recall for a ~2^planes candidate reduction.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


class _TopKScorer:
    """Actor-pool stage: per-batch exact cosine vs the broadcast query matrix,
    emitting per-(query, batch) local top-k rows."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        q = np.asarray(ray.get(queries_ref), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q = q / qn  # normalized once per actor
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[self.vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[self.id_col].to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ self.q.T  # (n, nq)
        k = min(self.k, len(ids))
        qidx, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            # deterministic local top-k: (cos DESC, id ASC) — ties at the k
            # boundary must survive to the driver merge exactly as the oracle's
            # ORDER BY would keep them
            rows = np.lexsort((ids, -sims[:, qi]))[:k]
            qidx.extend([qi] * len(rows))
            out_id.extend(ids[rows])
            out_sim.extend(sims[rows, qi])
        return pa.table(
            {
                "qid": pa.array(qidx, pa.int32()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    k: int = 5,
    concurrency=(1, 8),
) -> list[dict]:
    """Exact top-k rows [{qid, id, cosine, rank}] — result size k x nq (tiny), so the
    final merge happens on the driver."""
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        _TopKScorer,
        fn_constructor_args=(ref, id_col, vec_col, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    heaps: dict[int, list] = {}
    for r in local:
        # tie-break by ascending id (matches ORDER BY cos DESC, id ASC)
        heaps.setdefault(r["qid"], []).append((-r["cosine"], r[id_col]))
    out = []
    for qid, rows in sorted(heaps.items()):
        best = heapq.nsmallest(k, rows)
        for rank, (negsim, vid) in enumerate(best):
            out.append({"qid": qid, id_col: vid, "cosine": -negsim, "rank": rank})
    return out


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 8,
    hamming_probe: int = 1,
) -> list[dict]:
    """Approximate top-k: score only vectors whose hyperplane sign-bucket is within
    ``hamming_probe`` bits of the query's bucket. Same output shape as
    :func:`brute_force_topk`; recall < 1 by design (scale path)."""
    from .hashing import plane_matrix

    q = np.asarray(queries, dtype=np.float64)
    # deterministic Rademacher planes (SQL-expressible; see functions/hashing.py)
    planes = plane_matrix(0, num_planes, q.shape[1])
    qsig = ((q @ planes) > 0).astype(np.int64) @ (1 << np.arange(num_planes))
    allowed: set[int] = set()
    for s in qsig:
        allowed.add(int(s))
        if hamming_probe >= 1:
            for bit in range(num_planes):
                allowed.add(int(s) ^ (1 << bit))
    allowed_arr = pa.array(sorted(allowed), pa.int64())

    def prefilter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        sig = ((vecs @ planes) > 0).astype(np.int64) @ (1 << np.arange(num_planes))
        mask = pc.is_in(pa.array(sig, pa.int64()), value_set=allowed_arr)
        return b.filter(mask)

    cand = ds.map_batches(prefilter, batch_format="pyarrow")
    return brute_force_topk(cand, q, id_col, vec_col, k)


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
) -> list[dict]:
    """IVF-flat approximate top-k: a coarse codebook partitions the corpus
    into ``n_centroids`` inverted lists by nearest-centroid cosine; each query
    probes its ``nprobe`` nearest lists and exact cosine runs only inside the
    probed lists (the classic Faiss-style IVF structure — candidate volume
    ~ nprobe/n_centroids of the corpus, vs the LSH path's Hamming buckets).

    The codebook is the DETERMINISTIC stand-in ``n_centroids smallest-id
    vectors`` (fetched via per-block mins + a metadata-scale driver merge) so
    the whole search path is SQL-oracle-reproducible; a k-means-trained
    codebook drops in without changing assignment or probing. Ties in
    assignment and probing break toward the lower centroid index; the final
    scoring reuses :func:`brute_force_topk` (cos DESC, id ASC)."""
    q = np.asarray(queries, dtype=np.float64)

    def local_min(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)[: n_centroids]
        return b.select([id_col, vec_col]).take(pa.array(order, pa.int64()))

    rows = ds.map_batches(local_min, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    cent = rows[:n_centroids]
    if not cent:
        return []
    c_mat = np.asarray([r[vec_col] for r in cent], dtype=np.float64)
    cn = np.linalg.norm(c_mat, axis=1)
    cn[cn == 0] = 1.0

    def _cos_to_cents(vecs: np.ndarray) -> np.ndarray:
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0] = 1.0
        # dot / (|a| * |b|) — the same formula (and ordering hazard class) the
        # oracle's list_cosine_similarity uses
        return (vecs @ c_mat.T) / np.outer(vn, cn)

    qs = _cos_to_cents(q)
    probed: set[int] = set()
    for qi in range(qs.shape[0]):
        order = np.lexsort((np.arange(len(cent)), -qs[qi]))[:nprobe]
        probed.update(int(x) for x in order)
    probed_arr = np.array(sorted(probed), dtype=np.int64)

    def prefilter(b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        if not len(vecs):
            return b
        sims = _cos_to_cents(vecs)
        # argmax returns the FIRST maximum — the tie-to-lowest-index rule
        assign = np.argmax(sims, axis=1)
        return b.filter(pa.array(np.isin(assign, probed_arr)))

    cand = ds.map_batches(prefilter, batch_format="pyarrow")
    return brute_force_topk(cand, q, id_col, vec_col, k)


def kmeans(
    ds: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    *,
    k: int = 8,
    n_iters: int = 3,
    scale_bits: int = 20,
    concurrency=(1, 8),
    return_centroids: bool = False,
) -> ray.data.Dataset:
    """Distributed Lloyd's k-means over the embedding column, returning one
    (id, cluster) row per vector (with ``return_centroids`` also the final
    quantized k x dim int64 centroid matrix, already on the driver — it is
    reduced there every iteration anyway) — the standard corpus-clustering /
    topic-bucketing primitive for training-data curation.

    The whole algorithm runs in INTEGER arithmetic so the result is
    deterministic and SQL-oracle-exact despite being iterative:

    - components quantize to ``floor(v * 2**scale_bits + 0.5)`` (exact in
      float64 on both engines — scaling by a power of two is lossless);
    - squared-euclidean distances and per-cluster component sums are int64
      (exact and ORDER-FREE, so block order cannot perturb centroids the way
      float partial sums would);
    - the centroid update is the round-half-up integer mean
      ``(2*s + n) // (2*n)`` with floor semantics (mirrored in SQL via the
      positive-mod floor-division identity);
    - ties (equal distances, empty clusters) break to the lower cluster
      index / keep the previous centroid.

    Init is the ``k`` lowest-id vectors (cluster index = id rank), the same
    deterministic codebook rule :func:`ivf_topk` uses. Per iteration the
    centroid matrix is broadcast via ``ray.put`` (k x dim ints), every block
    does one int64 matmul and emits k*(dim+1) PARTIAL rows (sums + count —
    never per-point traffic), and a tiny groupby-sum exchange reduces them;
    the driver only ever sees k*(dim+1) integers per iteration. The quantized
    projection is materialized once and re-scanned per iteration."""

    def quant(b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        if not len(vecs):
            return pa.table(
                {id_col: b[id_col], "qvec": pa.array([], pa.list_(pa.int64()))}
            )
        q = np.floor(vecs * float(1 << scale_bits) + 0.5).astype(np.int64)
        return pa.table(
            {id_col: b[id_col], "qvec": pa.array(list(q), pa.list_(pa.int64()))}
        )

    qds = ds.map_batches(quant, batch_format="pyarrow").materialize()

    def local_min(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)[:k]
        return b.take(pa.array(order, pa.int64()))

    seed = qds.map_batches(local_min, batch_format="pyarrow").take_all()
    seed.sort(key=lambda r: r[id_col])
    cent = np.asarray([r["qvec"] for r in seed[:k]], dtype=np.int64)
    if not len(cent):
        empty = ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        )
        return (empty, cent) if return_centroids else empty
    kk, dim = cent.shape

    def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        # expanded squared euclidean, all int64-exact at scale_bits<=20 and
        # dims in the hundreds; argmin takes the FIRST (lowest) cluster on ties
        xx = (X * X).sum(axis=1)
        cc = (C * C).sum(axis=1)
        d2 = xx[:, None] - 2 * (X @ C.T) + cc[None, :]
        return np.argmin(d2, axis=1)

    from ray.data.aggregate import Sum

    for _ in range(n_iters):
        ref = ray.put(cent)

        def partials(b: pa.Table, _ref=ref) -> pa.Table:
            C = ray.get(_ref)
            X = np.asarray(b["qvec"].to_pylist(), dtype=np.int64)
            if not len(X):
                return pa.table(
                    {"key": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
                )
            a = _assign(X, C)
            keys, sums = [], []
            for c in np.unique(a):
                rows = X[a == c]
                base = int(c) * (dim + 1)
                keys.extend(range(base, base + dim))
                sums.extend(rows.sum(axis=0).tolist())
                keys.append(base + dim)
                sums.append(int(len(rows)))
            return pa.table(
                {"key": pa.array(keys, pa.int64()), "s": pa.array(sums, pa.int64())}
            )

        folded = (
            qds.map_batches(partials, batch_format="pyarrow")
            .groupby("key")
            .aggregate(Sum(on="s", alias_name="s"))
            .take_all()
        )
        sums = np.zeros((kk, dim), dtype=np.int64)
        counts = np.zeros(kk, dtype=np.int64)
        for r in folded:
            c, d = divmod(int(r["key"]), dim + 1)
            if d == dim:
                counts[c] = int(r["s"])
            else:
                sums[c, d] = int(r["s"])
        new = cent.copy()
        nz = counts > 0  # empty clusters keep their previous centroid
        new[nz] = (2 * sums[nz] + counts[nz, None]) // (2 * counts[nz, None])
        cent = new

    ref = ray.put(cent)

    def finalize(b: pa.Table, _ref=ref) -> pa.Table:
        C = ray.get(_ref)
        X = np.asarray(b["qvec"].to_pylist(), dtype=np.int64)
        if not len(X):
            return pa.table(
                {id_col: b[id_col], "cluster": pa.array([], pa.int64())}
            )
        a = _assign(X, C).astype(np.int64)
        return pa.table({id_col: b[id_col], "cluster": pa.array(a, pa.int64())})

    out = qds.map_batches(finalize, batch_format="pyarrow")
    return (out, cent) if return_centroids else out


def quantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    *,
    bits: int = 8,
) -> ray.data.Dataset:
    """Symmetric per-dimension integer quantization of an embedding column —
    the standard ANN memory-reduction step (float32 -> int8 is a 4x index
    shrink before IVF/PQ-style search).

    Deterministic, oracle-exact contract: scale_d = max(|x_d|) over the corpus
    (per dimension), q = floor(x * (2^(bits-1) - 1) / scale_d) computed in
    IEEE float64 (both engines evaluate the identical (x * L) / s expression),
    q = 0 where scale_d = 0. Emits long-format ``(id, i, q)`` rows (i 1-based)
    so the SQL oracle compares integer-for-integer.

    Stage shape: pass 1 reduces one dim-length max-abs vector per BLOCK to the
    driver (nblocks x dim floats — metadata scale); the scale vector is
    broadcast via ``ray.put`` once and every pass-2 batch quantizes with two
    vectorized numpy ops. No shuffle anywhere."""
    levels = float((1 << (bits - 1)) - 1)

    def _matrix(b: pa.Table) -> tuple[np.ndarray, pa.Array]:
        col = b[vec_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), flat.size // max(1, len(col))), col

    def partial(b: pa.Table) -> pa.Table:
        X, _ = _matrix(b)
        m = np.abs(X).max(axis=0)
        return pa.table({"dim_max": pa.array([m.tolist()], pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    scale = np.max(np.stack([np.asarray(r["dim_max"]) for r in parts]), axis=0)
    sref = ray.put(scale)

    def quant(b: pa.Table, _sref=sref) -> pa.Table:
        s = ray.get(_sref)
        X, _ = _matrix(b)
        n, d = X.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((X * levels) / s)
        q = np.where(s == 0, 0.0, q).astype(np.int64)
        ids = np.asarray(
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(b[id_col], pa.ChunkedArray)
            else b[id_col].to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d), pa.int64()),
                "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n), pa.int64()),
                "q": pa.array(q.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def pq_codes(
    ds: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    k: int = 8,
    n_iters: int = 2,
    scale_bits: int = 20,
) -> ray.data.Dataset:
    """Product-quantization codebook assignment: the embedding splits into
    ``m`` contiguous subspaces, each clustered independently with the
    integer-exact :func:`kmeans`, and every vector gets one code per subspace
    — the classic IVF-PQ compression step (m bytes replace dim floats in the
    ANN index). Emits ``(id, subspace, code)`` long-format rows.

    The subspace loop runs on the driver (m is a small constant); each
    iteration is the kmeans pipeline over a column SLICE — the slice happens
    inside ``map_batches``, so only the narrowed vectors enter each kmeans
    exchange. Deterministic end to end: kmeans is all-integer, so the oracle
    unrolls the same iterations per subspace in SQL."""
    import polars as pl

    outs = []
    # subspace width from the first row's dim (metadata probe, one row)
    dim = len(ds.take(1)[0][vec_col])
    w = dim // m

    def slicer(lo: int, ln: int):
        def fn(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b.select([id_col, vec_col]))
            return df.with_columns(
                pl.col(vec_col).list.slice(lo, ln).alias(vec_col)
            ).to_arrow()

        return fn

    for j in range(m):
        sub = ds.map_batches(slicer(j * w, w), batch_format="pyarrow")
        res = kmeans(
            sub, id_col, vec_col, k=k, n_iters=n_iters, scale_bits=scale_bits
        )

        def tag(b: pa.Table, _j=j) -> pa.Table:
            return pa.table(
                {
                    id_col: b[id_col],
                    "subspace": pa.array(
                        np.full(b.num_rows, _j, dtype=np.int64), pa.int64()
                    ),
                    "code": b["cluster"],
                }
            )

        outs.append(res.map_batches(tag, batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def pq_adc_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    k_codes: int = 8,
    n_iters: int = 2,
    scale_bits: int = 20,
    k: int = 5,
) -> pa.Table:
    """Asymmetric-distance PQ search (the query side of IVF-PQ): per-subspace
    kmeans codebooks compress every vector to ``m`` codes; each query
    precomputes an ``m x k_codes`` table of integer squared distances to the
    subspace centroids, and a vector's score is ``m`` table lookups summed —
    never a full-dimension scan of the corpus.

    All-integer (quantized components, int64 squared distances), so the SQL
    oracle reproduces the exact ranking. Stage shape: per subspace one kmeans
    (codes stay distributed) + a broadcast nq x k_codes lookup table; lookups
    emit (id, qid, part) rows into ONE (id, qid) groupby-sum; per-block local
    top-k (dist ASC, id ASC) and a k x nq x nblocks driver merge finish.
    Returns a (qid, id, dist) arrow table."""
    import heapq

    qq = np.floor(
        np.asarray(queries, dtype=np.float64) * float(1 << scale_bits) + 0.5
    ).astype(np.int64)
    nq, dim = qq.shape
    w = dim // m
    import polars as pl

    def slicer(lo: int, ln: int):
        def fn(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b.select([id_col, vec_col]))
            return df.with_columns(
                pl.col(vec_col).list.slice(lo, ln).alias(vec_col)
            ).to_arrow()

        return fn

    parts = []
    for j in range(m):
        sub = ds.map_batches(slicer(j * w, w), batch_format="pyarrow")
        codes, cent = kmeans(
            sub,
            id_col,
            vec_col,
            k=k_codes,
            n_iters=n_iters,
            scale_bits=scale_bits,
            return_centroids=True,
        )
        qsub = qq[:, j * w : (j + 1) * w]
        # nq x k_codes integer squared distances, computed once on the driver
        D = ((qsub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        dref = ray.put(D)

        def lookup(b: pa.Table, _ref=dref) -> pa.Table:
            Dj = ray.get(_ref)
            ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
            cd = np.asarray(b["cluster"].to_pylist(), dtype=np.int64)
            n = len(ids)
            qidx = np.tile(np.arange(Dj.shape[0], dtype=np.int64), n)
            return pa.table(
                {
                    id_col: pa.array(np.repeat(ids, Dj.shape[0]), pa.int64()),
                    "qid": pa.array(qidx, pa.int64()),
                    "part": pa.array(
                        Dj[qidx, np.repeat(cd, Dj.shape[0])], pa.int64()
                    ),
                }
            )

        parts.append(codes.map_batches(lookup, batch_format="pyarrow"))

    allparts = parts[0]
    for p in parts[1:]:
        allparts = allparts.union(p)
    from ray.data.aggregate import Sum as _Sum

    dists = allparts.groupby([id_col, "qid"]).aggregate(_Sum("part", alias_name="dist"))

    def local_topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.sort(["qid", "dist", id_col])
            .with_columns(pl.col("dist").cum_count().over("qid").cast(pl.Int64).alias("rk"))
            .filter(pl.col("rk") <= k)
            .select(["qid", id_col, "dist"])
            .to_arrow()
        )

    rows = dists.map_batches(local_topk, batch_format="pyarrow").take_all()
    best: dict[int, list] = {}
    for r in rows:
        best.setdefault(int(r["qid"]), []).append((int(r["dist"]), int(r[id_col])))
    out_q, out_id, out_d = [], [], []
    for qid in sorted(best):
        for d, i in heapq.nsmallest(k, best[qid]):
            out_q.append(qid)
            out_id.append(i)
            out_d.append(d)
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        }
    )


def knn_classify(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
    concurrency=(1, 8),
) -> list[dict]:
    """kNN label classification over the embedding table: exact cosine top-k
    per query with the LABEL carried through the scorer (no second corpus
    scan), then a driver-side majority vote over the nq x k winner rows
    (tie -> smallest label). Returns [{qid, label_pred, n_votes}].

    Same distribution shape as brute_force_topk: broadcast query matrix,
    per-block local top-k, tiny driver merge — the deterministic tie order
    (cos DESC, id ASC) matches the SQL oracle's ORDER BY exactly."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qnorm = q / qn
    ref = ray.put(qnorm)

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        Q = ray.get(_ref)
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        labels = np.asarray(b[label_col].to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ Q.T
        kk = min(k, len(ids))
        qidx, out_id, out_lab, out_sim = [], [], [], []
        for qi in range(Q.shape[0]):
            rows = np.lexsort((ids, -sims[:, qi]))[:kk]
            qidx.extend([qi] * len(rows))
            out_id.extend(ids[rows])
            out_lab.extend(labels[rows])
            out_sim.extend(sims[rows, qi])
        return pa.table(
            {
                "qid": pa.array(qidx, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                label_col: pa.array(out_lab, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    local = ds.map_batches(score, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in local:
        heaps.setdefault(r["qid"], []).append((-r["cosine"], r[id_col], r[label_col]))
    out = []
    for qid, rows in sorted(heaps.items()):
        best = heapq.nsmallest(k, rows)
        votes: dict[int, int] = {}
        for _negsim, _vid, lab in best:
            votes[lab] = votes.get(lab, 0) + 1
        pred, n = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append({"qid": qid, "label_pred": pred, "n_votes": n})
    return out


class _RangeScorer:
    """Actor-pool stage: per-batch exact cosine vs the broadcast query matrix,
    emitting every (qid, id) whose similarity clears the radius. Unlike the
    top-k scorers there is no per-query state to merge — the output is a plain
    filtered stream, so range search is embarrassingly parallel end-to-end."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, radius: float):
        q = np.asarray(ray.get(queries_ref), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q = q / qn
        self.id_col, self.vec_col, self.radius = id_col, vec_col, radius

    def __call__(self, b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[self.vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[self.id_col].to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (vecs / norms) @ self.q.T  # (n, nq)
        rows, qidx = np.nonzero(sims >= self.radius)
        return pa.table(
            {
                "qid": pa.array(qidx.astype(np.int64), pa.int64()),
                self.id_col: pa.array(ids[rows], pa.int64()),
            }
        )


def range_search(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    radius: float,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Radius search: all corpus vectors within cosine ``radius`` of each
    query. The dual of top-k retrieval (fixed similarity bar instead of fixed
    result count) — the primitive behind near-duplicate *lookup* (is this new
    document close to anything indexed?) and density estimation. Returns a
    streaming (qid, id) Dataset — result size is data-dependent, so nothing
    is merged on the driver. Scale path: same linear broadcast scan as
    brute_force_topk; pair with the IVF bucketer when the corpus outgrows a
    full scan per query batch."""
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    return ds.map_batches(
        _RangeScorer,
        fn_constructor_args=(ref, id_col, vec_col, radius),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def jl_project(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_dims: int = 16,
    quant: int = 1_000_000,
) -> ray.data.Dataset:
    """Johnson-Lindenstrauss dimensionality reduction with the Rademacher
    (+-1) construction (Achlioptas 2003): project each embedding onto
    ``out_dims`` deterministic sign planes — the cheap dense projection that
    preserves pairwise distances within (1 +- eps) and shrinks the ANN
    working set. INTEGER-EXACT contract: coordinates quantize by
    ``floor(x * quant)`` (float64 ops identical in numpy and SQL) and the
    projection is an int64 matvec against the SQL-expressible plane matrix
    (hashing.plane_matrix table 0), so sums are order-independent and the
    oracle is bit-exact — no float-accumulation drift anywhere.

    Embarrassingly parallel: one vectorized int matmul per batch, planes
    built once per actor in the closure. Returns long-format
    (id, dim, proj)."""
    from .hashing import plane_matrix

    planes: dict[int, np.ndarray] = {}

    def block(b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        if not len(ids):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "proj": pa.array([], pa.int64()),
                }
            )
        if 0 not in planes:
            planes[0] = plane_matrix(0, out_dims, vecs.shape[1]).astype(np.int64)
        q = np.floor(vecs * quant).astype(np.int64)
        proj = q @ planes[0]  # exact int64 matmul, any summation order
        n = len(ids)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dims), pa.int64()),
                "dim": pa.array(np.tile(np.arange(out_dims, dtype=np.int64), n)),
                "proj": pa.array(proj.reshape(-1), pa.int64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        block, batch_format="pyarrow"
    )


def label_centroids(
    ds: ray.data.Dataset,
    label_col: str = "label",
    vec_col: str = "embedding",
    *,
    quant: int = 1_000_000,
) -> ray.data.Dataset:
    """Per-label centroid prototypes (class means — nearest-prototype
    classification, SemDeDup seeds, drift monitoring) with an INTEGER-EXACT
    contract: coordinates quantize by floor(x * quant), per-(label, dim)
    SUMS and COUNTS are int64 (order-independent — no float-mean drift), and
    the mean stays a rational (sum, n) pair the caller divides as needed.
    One vectorized expand per batch (label, dim, qx) with block-level
    pre-aggregation riding the groupby's combiner; output long-format
    (label, dim, qsum, n)."""
    from ray.data.aggregate import Count, Sum

    def expand(b: pa.Table) -> pa.Table:
        import polars as pl

        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        labels = np.asarray(
            b[label_col].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        if not len(labels):
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "qx": pa.array([], pa.int64()),
                }
            )
        n, d = vecs.shape
        q = np.floor(vecs * quant).astype(np.int64)
        df = pl.DataFrame(
            {
                "label": np.repeat(labels, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), n),
                "qx": q.reshape(-1),
            }
        )
        # block-level partial: one (label, dim) row per block leaves the map
        return (
            df.group_by(["label", "dim"])
            .agg(pl.col("qx").sum(), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    return (
        ds.select_columns([label_col, vec_col])
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("qx", alias_name="qsum"), Sum("n", alias_name="n"))
    )


def ivf_persist(
    ds: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    index_dir: str,
    *,
    n_centroids: int = 16,
) -> None:
    """BUILD phase of the persisted IVF index: the deterministic coarse
    codebook (same smallest-id rule as :func:`ivf_topk`) lands in
    ``index_dir/centroids.parquet`` (codebook-sized); every vector's
    nearest-centroid assignment is computed vectorized per batch and the
    corpus is written HIVE-PARTITIONED BY CENTROID
    (``index_dir/lists/centroid=<c>/``) — the inverted lists ARE the
    directory layout, so a query later touches only its probed partitions'
    bytes (path-level pruning, no index process to keep alive). Rebuild is
    idempotent (same inputs → same files)."""
    import pyarrow.parquet as pq

    from ..util import fs_makedirs

    def local_min(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        order = np.argsort(ids)[:n_centroids]
        return b.select([id_col, vec_col]).take(pa.array(order, pa.int64()))

    rows = ds.map_batches(local_min, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    cent = rows[:n_centroids]
    c_mat = np.asarray([r[vec_col] for r in cent], dtype=np.float64)
    cn = np.linalg.norm(c_mat, axis=1)
    cn[cn == 0] = 1.0
    fs_makedirs(index_dir)
    pq.write_table(
        pa.table(
            {
                "centroid": pa.array(np.arange(len(cent), dtype=np.int64)),
                "vector": pa.array([list(map(float, v)) for v in c_mat]),
            }
        ),
        f"{index_dir}/centroids.parquet",
    )

    def assign(b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        if not len(vecs):
            return b.append_column("centroid", pa.array([], pa.int64()))
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0] = 1.0
        sims = (vecs @ c_mat.T) / np.outer(vn, cn)
        a = np.argmax(sims, axis=1).astype(np.int64)  # first max = low index
        return b.select([id_col, vec_col]).append_column(
            "centroid", pa.array(a, pa.int64())
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        f"{index_dir}/lists", partition_cols=["centroid"]
    )


def ivf_persist_topk(
    index_dir: str,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> list[dict]:
    """QUERY phase over a :func:`ivf_persist` index, cold-start: load the
    codebook parquet (codebook-sized), pick each query's ``nprobe`` nearest
    lists, and ``read_parquet`` ONLY those ``centroid=<c>`` partition
    directories — unprobed lists' bytes never leave storage. Scoring reuses
    brute_force_topk, so results are bit-identical to the in-memory
    :func:`ivf_topk` with the same codebook (the driver oracle is shared)."""
    import pyarrow.parquet as pq

    q = np.asarray(queries, dtype=np.float64)
    ct = pq.read_table(f"{index_dir}/centroids.parquet")
    c_mat = np.asarray(ct["vector"].to_pylist(), dtype=np.float64)
    if not len(c_mat):
        return []
    cn = np.linalg.norm(c_mat, axis=1)
    cn[cn == 0] = 1.0
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qs = (q @ c_mat.T) / np.outer(qn, cn)
    probed: set[int] = set()
    for qi in range(qs.shape[0]):
        order = np.lexsort((np.arange(len(c_mat)), -qs[qi]))[:nprobe]
        probed.update(int(x) for x in order)
    import glob

    paths = [
        f
        for c in sorted(probed)
        for f in sorted(glob.glob(f"{index_dir}/lists/centroid={c}/*.parquet"))
    ]
    cand = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return brute_force_topk(cand, q, id_col, vec_col, k)


def mmr_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
    pool: int = 32,
    concurrency=(1, 8),
) -> pa.Table:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    '98) — the retrieval re-ranking shape: stage 1 generates the exact
    top-``pool`` candidates per query with the distributed brute-force
    scorer (per-batch local top-pool, one intermediate fold, pool x nq rows
    to the driver); stage 2 re-ranks the pool greedily with lambda = 1/2:

        pick argmax over remaining c of round(0.5*rel(c) - 0.5*maxsim(c), 9)

    where rel = cos(query, c), maxsim = max cosine against the already
    selected set (0 for the first pick), ties by id ASC. The greedy loop
    runs on the driver over the POOL (metadata-scale by construction — the
    pool is the re-rank budget; the corpus scan is not). Integer output
    (qid, rank, id), so the unrolled-CTE SQL oracle hash-matches; the
    round-to-9 contract applies at BOTH the rel computation (pinning pool
    membership at the pool-th boundary) and the greedy score, absorbing
    <=1-ulp numpy/DuckDB dot disagreement on each."""
    import polars as pl

    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    ref = ray.put(q / qn)

    def local_pool(b: pa.Table) -> pa.Table:
        qm = ray.get(ref)
        vecs = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        # round-to-9 at rel computation: pool membership (here, in fold_pool,
        # and at the driver cut) then ranks on the SAME value the SQL oracle
        # ranks on — a sub-ulp numpy/DuckDB cosine disagreement at the
        # pool-th boundary can no longer flip membership
        sims = np.round(vn @ qm.T, 9)
        kk = min(pool, len(ids))
        qidx: list[int] = []
        out_id: list[int] = []
        out_rel: list[float] = []
        out_vec: list[list[float]] = []
        for qi in range(qm.shape[0]):
            rows = np.lexsort((ids, -sims[:, qi]))[:kk]
            qidx.extend([qi] * len(rows))
            out_id.extend(ids[rows].tolist())
            out_rel.extend(sims[rows, qi].tolist())
            out_vec.extend(vn[rows].tolist())
        return pa.table(
            {
                "qid": pa.array(qidx, pa.int64()),
                "id": pa.array(out_id, pa.int64()),
                "rel": pa.array(out_rel, pa.float64()),
                "vec": pa.array(out_vec, pa.list_(pa.float64())),
            }
        )

    def fold_pool(b: pa.Table) -> pa.Table:
        # already-scored rows -> per-qid top-pool again (tree fold: bounds
        # driver traffic to n_blocks_after_fold * pool * nq rows)
        return (
            pl.from_arrow(b)
            .sort(["qid", "rel", "id"], descending=[False, True, False])
            .group_by("qid", maintain_order=True)
            .head(pool)
            .to_arrow()
        )

    rows = (
        ds.map_batches(local_pool, batch_format="pyarrow")
        .repartition(8)
        .map_batches(fold_pool, batch_format="pyarrow", batch_size=None)
        .take_all()
    )

    byq: dict[int, list] = {}
    for r in rows:
        byq.setdefault(int(r["qid"]), []).append(
            (float(r["rel"]), int(r["id"]), np.asarray(r["vec"], dtype=np.float64))
        )
    out_q: list[int] = []
    out_rank: list[int] = []
    out_id: list[int] = []
    for qid in sorted(byq):
        cand = sorted(byq[qid], key=lambda x: (-x[0], x[1]))[:pool]
        selvecs: list[np.ndarray] = []
        remaining = list(cand)
        for rank in range(min(k, len(cand))):
            best = None
            for rel, vid, v in remaining:
                ms = max((float(v @ s) for s in selvecs), default=0.0)
                score = round(0.5 * rel - 0.5 * ms, 9)
                key = (-score, vid)
                if best is None or key < best[0]:
                    best = (key, vid, v)
            out_q.append(qid)
            out_rank.append(rank)
            out_id.append(best[1])
            selvecs.append(best[2])
            remaining = [c for c in remaining if c[1] != best[1]]
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
        }
    )
