"""Replicated-volume timings for the graph/dedup additions — the measured
backing BASELINE.md's scale claims reference for kg_scc / kg_sssp /
dd_setsim_prefix (the KG headline already has its own ×128 scaling
campaign).

Builds a ×R corpus under /tmp once: R disjoint doc_id replicas of
$GRAFT_SF_DIR's documents table, with every TOKEN suffixed by the replica
number. Suffixing every token (rather than appending one salt token) keeps
each replica's token-frequency distribution identical to the ×1 corpus —
an appended low-frequency salt would become every document's rarest token
and hence its entire PPJoin prefix, collapsing candidate generation into
R pathological 5000-doc groups, which measures the fixture, not the
operator. With per-token suffixes the vocabularies are replica-disjoint,
so the similarity workload is exactly R independent copies of the ×1
workload — volume scales linearly without changing shape. Times the SAME
constructions the sweep uses and prints ONE JSON line. Raw JSONs for the
record live in bench_runs/r5_volume/.

Usage: python scripts/bench_volume.py   (env: GRAFT_SF_DIR,
RAY_GRAFT_CPUS, GRAFT_VOLUME_REPLICATE default 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    rep = int(os.environ.get("GRAFT_VOLUME_REPLICATE", "64"))
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    vol_dir = f"/tmp/r2s2_vol_x{rep}"
    marker = f"{vol_dir}/.built"
    if not os.path.exists(marker):
        shutil.rmtree(vol_dir, ignore_errors=True)
        os.makedirs(vol_dir)
        src = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        import polars as pl

        parts = []
        base = pl.from_arrow(src)
        for r in range(rep):
            parts.append(
                base.select(
                    (pl.col("doc_id") + 10_000_000 * r).alias("doc_id"),
                    # suffix EVERY token with the replica id (see module
                    # docstring): " " -> "r<r> " plus a trailing suffix
                    (
                        pl.col("text").str.replace_all(" ", f"r{r} ", literal=True)
                        + f"r{r}"
                    ).alias("text"),
                )
            )
        pq.write_table(
            pl.concat(parts).to_arrow(), f"{vol_dir}/documents.parquet"
        )
        open(marker, "w").write("ok")

    import __ray_entry__ as entry
    from r2s2_ray.functions.dedup import setsim_prefix_pairs

    out: dict = {
        "metric": "volume_ops",
        "unit": "sec",
        "replicate": rep,
        "num_cpus": num_cpus,
        "sf": sf_dir,
        "queries": {},
        "rows": {},
        "loadavg": {},
    }

    def timed(name: str, fn) -> None:
        print(f"[bench_volume] start {name}", file=sys.stderr, flush=True)
        pre = load1()
        t0 = time.perf_counter()
        n = fn()
        sec = round(time.perf_counter() - t0, 3)
        out["queries"][name] = sec
        out["rows"][name] = int(n)
        out["loadavg"][name] = [pre, load1()]
        print(f"[bench_volume] {name} {sec}s rows={n}", file=sys.stderr, flush=True)

    timed("kg_scc", lambda: entry._kg_scc(vol_dir).count())
    timed("kg_sssp", lambda: entry._kg_sssp(vol_dir).count())
    timed(
        "dd_setsim_prefix",
        lambda: setsim_prefix_pairs(
            ray.data.read_parquet(
                f"{vol_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            "doc_id",
            "text",
            threshold=(99, 100),
        ).count(),
    )
    out["value"] = round(sum(out["queries"].values()), 3)
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
