"""Incremental (delta) load: per-bucket quad state — equivalence with the
one-shot batch fold, delta-locality, and convergent re-merge.

The scale contract under test (stages/incremental.py): only the delta crosses
the exchange; touched buckets rewrite locally; untouched buckets are not even
read; re-running the same delta converges to the identical state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from conftest import SF_SMALL


def _half(parity: int):
    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.stages.fold import route
    from r2s2_ray.transcripts import read_transcripts

    ds = read_transcripts(SF_SMALL)

    def f(b: pa.Table) -> pa.Table:
        digits = pc.utf8_slice_codeunits(b["conv_id"], 5, 99)
        par = pc.bit_wise_and(pc.cast(digits, pa.int64()), 1)
        return b.filter(pc.equal(par, parity))

    return route(extract_triples(ds.map_batches(f, batch_format="pyarrow")))


def _norm(ds):
    df = ds.to_pandas()
    df["graphs_s"] = df["graphs"].map(lambda g: ",".join(list(g)))
    df = df.drop(columns=["graphs"])
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_incremental_equals_one_shot_and_converges(ray_session, tmp_path):
    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.stages.fold import fold, route
    from r2s2_ray.stages.incremental import (
        quad_state_build,
        quad_state_merge,
        state_folded,
    )
    from r2s2_ray.transcripts import read_transcripts
    from r2s2_ray.util import fs_list_parquet

    import glob

    state = str(tmp_path / "state")
    quad_state_build(_half(0), state, num_buckets=16)
    files_after_build = sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    merge_stats = quad_state_merge(_half(1), state, num_buckets=16)

    # lineage rows are per-bucket and metadata-scale
    assert all(r["n_quads"] >= r["n_delta"] for r in merge_stats)
    assert all(r["n_quads"] <= r["n_old"] + r["n_delta"] for r in merge_stats)
    # delta-locality: buckets the merge did NOT report are untouched on disk —
    # same content-tagged file as the initial build left there
    touched = {f"bucket={r['bucket']:07d}" for r in merge_stats}
    untouched_before = {f for f in files_after_build if f.rsplit("/", 2)[1] not in touched}
    files_after_merge = set(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    assert untouched_before <= files_after_merge

    inc = _norm(state_folded(state))
    full = _norm(
        fold(route(extract_triples(read_transcripts(SF_SMALL))), num_buckets=16)
    )
    assert len(inc) == len(full) > 0
    assert inc.equals(full)

    # convergence: re-merging the SAME delta is a no-op on file content —
    # content-tagged names mean the file set is identical afterwards
    before = sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    remerge = quad_state_merge(_half(1), state, num_buckets=16)
    after = sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    assert before == after
    assert all(r["n_quads"] == r["n_old"] for r in remerge)  # nothing new
    # one generation per bucket (stale files were removed)
    dirs = {f.rsplit("/", 1)[0] for f in after}
    assert len(after) == len(dirs)
    for d in dirs:
        assert len(fs_list_parquet(d)) == 1


def test_fp_incremental_dedup_cycle(ray_session, tmp_path):
    """Fingerprint-state incremental dedup: delta survivors exclude
    already-ingested texts and in-delta repeats (keep min id); after the
    phase-2 append, re-running the SAME delta yields zero survivors and the
    append is convergent (identical state files)."""
    import glob

    import ray.data

    from r2s2_ray.stages.incremental import (
        fp_dedup_delta,
        fp_state_append,
        fp_state_build,
    )

    state = str(tmp_path / "fpstate")
    base = ray.data.from_items(
        [{"doc_id": 1, "text": "alpha beta"}, {"doc_id": 2, "text": "gamma delta"}]
    )
    fp_state_build(base, state, num_buckets=4)

    delta = ray.data.from_items(
        [
            {"doc_id": 11, "text": "alpha beta"},  # already ingested -> drop
            {"doc_id": 12, "text": "epsilon zeta"},  # fresh -> keep
            {"doc_id": 13, "text": "epsilon zeta"},  # in-delta repeat -> drop
            {"doc_id": 14, "text": "eta theta"},  # fresh -> keep
        ]
    ).repartition(3)
    kept = fp_dedup_delta(delta, state, num_buckets=4).materialize()
    got = sorted((r["doc_id"], r["text"]) for r in kept.take_all())
    assert got == [(12, "epsilon zeta"), (14, "eta theta")]

    fp_state_append(kept, state, num_buckets=4)
    files1 = sorted(glob.glob(f"{state}/bucket=*/fps-*.parquet"))
    # the same delta now fully deduplicates...
    again = fp_dedup_delta(delta, state, num_buckets=4).materialize()
    assert again.count() == 0
    # ...and re-appending the (empty) survivors or re-appending the original
    # kept set leaves the state byte-identical (content-tagged convergence)
    fp_state_append(kept, state, num_buckets=4)
    files2 = sorted(glob.glob(f"{state}/bucket=*/fps-*.parquet"))
    assert files1 == files2


def test_lsh_incremental_neardup_cycle(ray_session, tmp_path):
    """Incremental MinHash-LSH state: pairs(delta) == one-shot pairs touching
    the delta; build(A)+append(B) leaves byte-identical files to build(A∪B);
    re-appending the same delta is a no-op."""
    import glob
    import os

    import pyarrow as pa
    import ray.data

    from r2s2_ray.functions.dedup import minhash_lsh_pairs
    from r2s2_ray.stages.incremental import (
        lsh_pairs_delta,
        lsh_state_append,
        lsh_state_build,
    )

    docs = ray.data.read_parquet(
        f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"]
    )

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 1), parity))

        return docs.map_batches(f, batch_format="pyarrow")

    state = str(tmp_path / "lsh_state")
    lsh_state_build(half(0), state, num_buckets=8)
    got = {
        (r["a"], r["b"])
        for r in lsh_pairs_delta(half(1), state, num_buckets=8).take_all()
    }
    want = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text").take_all()
        if r["a"] % 2 == 1 or r["b"] % 2 == 1
    }
    assert got == want and got

    def files(d):
        return {
            f: os.path.getsize(f) for f in sorted(glob.glob(f"{d}/bucket=*/bands-*.parquet"))
        }

    lsh_state_append(half(1), state, num_buckets=8)
    after_append = files(state)
    # convergence: appending the same delta again is a byte-identical no-op
    stats2 = lsh_state_append(half(1), state, num_buckets=8)
    assert files(state) == after_append
    assert all(r["n_new"] == 0 for r in stats2)
    # equivalence: the incremental state == a from-scratch build of the union
    state2 = str(tmp_path / "lsh_state_oneshot")
    lsh_state_build(docs, state2, num_buckets=8)
    a, b = files(state), files(state2)
    assert [os.path.relpath(f, state) for f in a] == [
        os.path.relpath(f, state2) for f in b
    ]
    assert list(a.values()) == list(b.values())
    # pairs against the APPENDED state still dedup to the same touching set
    got2 = {
        (r["a"], r["b"])
        for r in lsh_pairs_delta(half(1), state, num_buckets=8).take_all()
    }
    assert got2 == want
