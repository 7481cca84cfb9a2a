"""Routing + RDF set-semantics dedup + per-graph list folding — the engine's main
all-to-all exchange.

Parity targets:
* Statement router / TargetKey  — LoadIntoTable.java:242-281 (vectorized here: the
  whole batch gets a ``table_key`` column; routing becomes a partitioned write, no
  locks — SURVEY.md §2.2 M3).
* Class cracking                — RdfTypeSplitting.java:36-154: rdf:type triples are
  routed STRAIGHT to their per-class table (``type_<class>``) instead of a post-hoc
  split; the class census (A2) runs first.
* Set-semantics dedup + fold    — ReintroduceRdfSetSemantics.java:25-149 (D1/A6/A7):
  duplicates collapse, graphs fold into a sorted distinct list per triple.

Shuffle design (north rule: "partitioning / shuffle / skew handled explicitly"):
dedup keys are full triple contents, so key cardinality ~= row cardinality and a naive
``groupby(key).map_groups`` would invoke Python once per distinct TRIPLE. Instead rows
are hash-bucketed (``bucket = hash(triple) % B``) and ``groupby("bucket")`` calls one
vectorized polars ``group_by`` per bucket. Content hashing distributes hot predicates
uniformly — a predicate with 10^9 identical-shaped rows still spreads over all B
buckets, which is the skew story the reference lacked (its per-predicate writer lock,
LoadIntoTable.java:60). B scales with cluster size; each bucket must fit one worker's
heap.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..naming import iri_to_sql_name_part
from ..terms import RDF_TYPE, TableKey

_SEP = "\x1f"

#: full logical identity of a triple row (what DISTINCT ranges over)
DEDUP_KEY = ["table_key", "subj", "s_kind", "pred", "obj", "o_kind", "o_lang", "o_dt"]
#: minimal grouping key — ``combo`` functionally determines table_key, s_kind,
#: pred, o_kind, o_lang and o_dt, so grouping by 3 columns instead of 8 gives the
#: identical partition at a fraction of the hash/compare cost (the remaining
#: columns ride along as first())
GROUP_KEY = ["combo", "subj", "obj"]


def combo_string(t: pa.Table) -> pa.Array:
    """Row-wise routing-combo string: (pred, s_kind, o_kind, lang, dt, class-obj).

    The class-obj component is only set for rdf:type rows (class cracking key)."""
    is_type = pc.equal(t["pred"], RDF_TYPE)
    cls = pc.if_else(is_type, t["obj"], pa.scalar("", pa.string()))
    return pc.binary_join_element_wise(
        t["pred"].combine_chunks() if isinstance(t["pred"], pa.ChunkedArray) else t["pred"],
        pc.cast(t["s_kind"], pa.string()),
        pc.cast(t["o_kind"], pa.string()),
        pc.coalesce(t["o_lang"], ""),
        pc.coalesce(t["o_dt"], ""),
        cls,
        _SEP,
    )


def combo_to_table_key(combo: str, namespaces=None) -> tuple[str, TableKey, str | None]:
    """Driver-side: combo string -> (table name/key, TableKey, class_iri)."""
    parts = combo.split(_SEP)
    if len(parts) != 6:
        # IRIs/lang tags cannot legally contain U+001F; a malformed term would
        # otherwise mis-split here — fail with the cause, not an unpack error
        raise ValueError(
            f"malformed RDF term: control character U+001F inside a "
            f"predicate/datatype/class component (combo={combo!r})"
        )
    pred, s_kind, o_kind, lang, dt, cls = parts
    tk = TableKey(
        predicate=pred,
        subj_kind=int(s_kind),
        obj_kind=int(o_kind),
        lang=lang or None,
        datatype=dt or None,
    )
    if cls:
        # rdf:type + class -> its own table, named for the class
        # (RdfTypeSplitting.java:96-120 naming via the class IRI)
        name = "type_" + iri_to_sql_name_part(cls, namespaces)
        return name, tk, cls
    return tk.key_string(namespaces), tk, None


class RouteEncoder:
    """Adds ``table_key`` + ``combo`` columns; ``graph`` stays a string column
    (content-ordered ids are assigned at materialize time from the graph
    dictionary). No global census is needed before routing: the per-batch
    unique-combo set is bounded by predicates x kinds x langs x datatypes, so the
    table-key mapping is computed on the fly and memoized per task/actor — the
    whole pipeline makes ONE pass over the input."""

    def __init__(self, namespaces=None):
        self.namespaces = namespaces
        self._memo: dict[str, str] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        combo = combo_string(t)
        combo = combo.combine_chunks() if isinstance(combo, pa.ChunkedArray) else combo
        uniq = pc.unique(combo).to_pylist()
        for c in uniq:
            if c not in self._memo:
                self._memo[c] = combo_to_table_key(c, self.namespaces)[0]
        uniq_arr = pa.array(uniq, pa.string())
        key_arr = pa.array([self._memo[c] for c in uniq], pa.string())
        kidx = pc.index_in(combo, value_set=uniq_arr)
        t = t.append_column("table_key", pc.take(key_arr, kidx))
        return t.append_column("combo", combo)


def route(
    triples: ray.data.Dataset,
    namespaces=None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """Stateless tasks by default; the actor pool variant keeps the combo memo
    warm across batches when the combo domain is unusually large."""
    if not use_actors:
        return triples.map_batches(RouteEncoder(namespaces), batch_format="pyarrow")
    return triples.map_batches(
        RouteEncoder,
        fn_constructor_args=(namespaces,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


#: low-cardinality string columns dictionary-encoded for the shuffle. This cuts
#: the bytes flowing through the object store ~3x, which matters beyond network:
#: on a busy node the dominant cost of a shuffle is KERNEL time faulting shared
#: -memory pages (measured: 0.5s user vs 9s sys per reduce task before encoding,
#: 10x wall-time improvement after), and that cost is proportional to bytes.
_DICT_COLS = ("combo", "graph")


#: combo-major partition count for the fold bucket. Majors spread distinct
#: TABLES over the keyspace so sorted blocks are table-contiguous (compact
#: per-table direct writes); collisions merely co-locate two tables in a block.
_TABLE_MAJORS = 1024


def _add_bucket(num_buckets: int):
    """Pre-exchange combiner + payload minimization:

    * LOCAL quad dedup (combo, subj, obj, graph): repeats of a triple inside
      one extract block (the common case — re-mentions within a conversation)
      collapse BEFORE they ship;
    * only 5 columns cross the exchange — ``combo`` functionally determines
      table_key / pred / kinds / lang / dt, which ``_fold_bucket``
      reconstructs per unique combo after the shuffle (a per-block map over a
      tiny domain), saving four dict-encoded columns of payload;
    * combo + graph dictionary-encoded; bucket = int32 composite
      ``(hash(combo) % MAJORS) * B + hash(subj) % B``. Identical triples share
      combo AND subj, so dedup groups still co-locate; a hot PREDICATE still
      spreads over all B minor buckets via its subjects (the skew story the
      reference lacked); and two properties fall out of the composite that a
      pure content hash cannot give: (a) sorted blocks are TABLE-contiguous,
      so the fused reducer writes ~1 compact file per (block, table) instead
      of fragmenting every table across every block, and (b) all rows of a
      (table, subject) pair share a block, making the A5 subject-uniqueness
      census exact per block. The residual exposure — a single subject with
      millions of objects under ONE predicate concentrates in one block — is
      the same one the merge exchange's subject bucketing already carries.
    """

    def fn(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["combo", "subj", "obj", "graph"])).unique()
        b = (
            df.select(
                (
                    pl.col("combo").hash(seed=43).mod(_TABLE_MAJORS) * num_buckets
                    + pl.col("subj").hash(seed=42).mod(num_buckets)
                )
                .cast(pl.Int32)
                .alias("bucket")
            )
        )["bucket"]
        t = df.to_arrow().append_column("bucket", b.to_arrow())
        cols = {}
        for c in t.column_names:
            col = t[c]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if c in _DICT_COLS:
                col = pc.dictionary_encode(
                    pc.cast(col, pa.string()) if not pa.types.is_string(col.type) else col
                )
            elif c in ("subj", "obj"):
                col = pc.cast(col, pa.string()) if not pa.types.is_string(col.type) else col
            cols[c] = col
        return pa.table(cols)

    return fn


def _decode_dicts(t: pa.Table) -> pa.Table:
    cols = {}
    for c in t.column_names:
        a = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        if pa.types.is_dictionary(a.type):
            a = pc.cast(a, a.type.value_type)
        cols[c] = a
    return pa.table(cols)


def _fold_bucket(t: pa.Table, namespaces=None) -> pa.Table:
    """Vectorized per-bucket fold: exact dedup + sorted distinct graph list.

    (ReintroduceRdfSetSemantics.java:71-109 — DISTINCT + LIST(DISTINCT graph) with
    ORDER BY on the non-graph columns.) Graphs are kept as IRI strings here;
    lexicographic sort order == content-ordered graph-id order, so the list is
    already in enum order when materialize encodes it. The combo-derived
    columns (table_key, pred, kinds, lang, dt) were dropped for the exchange
    and are reconstructed here by a join against the block's tiny unique-combo
    set."""
    t = _decode_dicts(t)
    df = pl.from_arrow(t)
    # factorize graph IRIs to batch-local ints in LEXICOGRAPHIC order so the
    # per-group unique+sort aggregates ints (cheap) yet the reassembled string
    # lists come out in global content order; the graph domain is tiny
    gdom = df["graph"].unique().sort()
    df = df.with_columns(
        pl.col("graph")
        .replace_strict(old=gdom, new=pl.int_range(0, len(gdom), eager=True), return_dtype=pl.Int32)
        .alias("gid")
    )
    out = df.group_by(GROUP_KEY).agg(pl.col("gid").unique().sort().alias("gids"))
    combos = out["combo"].unique().to_list()
    parts = [c.split(_SEP) for c in combos]
    lookup = pl.DataFrame(
        {
            "combo": pl.Series(combos, dtype=pl.Utf8),
            "table_key": pl.Series(
                [combo_to_table_key(c, namespaces)[0] for c in combos], dtype=pl.Utf8
            ),
            "pred": pl.Series([p[0] for p in parts], dtype=pl.Utf8),
            "s_kind": pl.Series([int(p[1]) for p in parts], dtype=pl.Int8),
            "o_kind": pl.Series([int(p[2]) for p in parts], dtype=pl.Int8),
            "o_lang": pl.Series([p[3] or None for p in parts], dtype=pl.Utf8),
            "o_dt": pl.Series([p[4] or None for p in parts], dtype=pl.Utf8),
        }
    )
    out = (
        out.join(lookup, on="combo", how="left")
        .select(DEDUP_KEY + ["combo", "gids"])
        .sort(["subj", "obj"])
    )
    arrow = out.drop("gids").to_arrow()
    gids = out["gids"].to_arrow()
    gids = gids.combine_chunks() if isinstance(gids, pa.ChunkedArray) else gids
    gstr = pa.ListArray.from_arrays(
        gids.offsets, pc.take(gdom.to_arrow(), gids.values)
    )
    return arrow.append_column("graphs", gstr)


def fold(
    routed: ray.data.Dataset,
    num_buckets: int = 64,
    namespaces=None,
) -> ray.data.Dataset:
    """Dedup + graph-fold. Output columns: DEDUP_KEY + ``graphs`` (list<string>)
    + ``combo`` (constant per table partition; parquet dictionary-encodes it to
    ~nothing, and the manifest builder reads it back as the table identity).

    Implementation note: this is sort(bucket) + per-BLOCK map, not
    ``groupby(bucket).map_groups``. The range-partitioned sort already lands all
    rows of a bucket (hence of any dedup group) in one block, and
    ``_fold_bucket`` partitions by the full key itself — so per-group slicing
    adds nothing semantically, and map_groups' zero-copy group slices of large
    sorted blocks hit a pathological (~10x) slow path in the polars/arrow
    kernels. ``batch_size=None`` keeps batches == whole blocks (a group must
    never straddle a batch)."""
    # NO batch_size here: the combiner fuses with the read->extract chain, so a
    # row quota would count TRANSCRIPT rows (one transcript -> ~15 triples) and
    # bundle the whole corpus into a handful of serial tasks (measured: the
    # fold stage collapsed 9s -> 57s at 32 cpus under a 256k quota). Task
    # granularity belongs to upstream block sizing.
    # NOTE: table_key/pred/... are reconstructed POST-shuffle from combo, so
    # the same namespaces used at route() time must be passed here — the
    # route-computed table_key column is dropped by the exchange payload
    # minimization (_add_bucket ships 5 columns only)
    with_bucket = routed.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
    return with_bucket.sort("bucket").map_batches(
        lambda t: _fold_bucket(t, namespaces), batch_format="pyarrow", batch_size=None
    )


def block_tag(folded: pa.Table, cols: tuple[str, ...] = ("subj", "table_key")) -> str:
    """Deterministic content tag naming a reduce block's output files — the
    ONE shared implementation for every stage that direct-writes into a shared
    directory (fold reducers, merge split_write).

    tag = hash(row count, then each named column's raw Arrow buffers). For the
    fold stage subj alone is NOT unique across blocks: two single-table blocks
    of the same fold bucket (e.g. ex_role and ex_ts — every turn has exactly
    one of each) carry byte-identical subj columns, and their term-FRAGMENT
    files share one bucket=NN/ dir, so a subj-only tag silently overwrote one
    block's fragments (measured: J1 overlap undercounts on every ex_role
    pair). (combo, subj) does identify a fold block — the exchange bucket
    function is injective on it and blocks are bucket-complete; a retried task
    rebuilds the identical block and overwrites its own files (idempotency)."""
    import hashlib

    h = hashlib.blake2b(str(folded.num_rows).encode(), digest_size=8)
    for col in cols:
        a = folded[col]
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        if pa.types.is_dictionary(a.type):
            # .buffers() of a dictionary array exposes only the INDEX
            # buffers — one-table blocks would all hash [0,0,...]
            a = pc.cast(a, pa.string())
        for buf in a.buffers():
            if buf is not None:
                h.update(buf)
    return h.hexdigest()


def _write_census_fn(
    lean_dir: str,
    terms_frag_dir: str | None = None,
    num_term_buckets: int = 32,
    namespaces=None,
):
    """Final fold reducer body: fold the block, DIRECT-WRITE each table's slice
    to ``lean/table_key=<name>/`` (hive layout, same as a partitioned write),
    and return only the tiny census rows — the write and the step-1 census ride
    the fold exchange instead of costing a second full scan + Ray job each.

    When ``terms_frag_dir`` is given, the reducer ALSO spills its block's
    distinct terms as per-term-hash-bucket fragment files (subject terms tagged
    with their table_key so the J1 overlap probe rides along; tags dict-encode
    to ~nothing because fold blocks are table-contiguous). This is the map side
    of the term-dictionary exchange run as a side output of the fold shuffle:
    step 1 then only COMPACTS each bucket's fragments (dicts.
    compact_term_fragments) instead of re-reading the lean store's subj/obj
    columns and paying a second full sort job. A (term, table) pair lands in
    exactly one fold block (bucket = combo-major + subj-minor and table <->
    combo is 1:1), so fragments never double-count; the per-bucket compaction
    re-uniques regardless.

    Idempotency: the part tag hashes the block's full subj column + row count
    (zero-copy over the Arrow buffers), so a retried task overwrites its own
    files and distinct blocks cannot collide (same contract as
    merge.split_write). A crashed prior ATTEMPT is cleared by the caller
    (the step only re-enters when its manifest is absent)."""
    from .materialize import decompose_lean
    from .specs import spec_from_combo
    from .stats import census_block_rows
    from ..util import fs_makedirs, fs_write_table

    memo: dict = {}

    def fn(t: pa.Table) -> pa.Table:
        folded = _fold_bucket(t, namespaces)
        tag = block_tag(folded)
        keys = pc.unique(folded["table_key"]).to_pylist()
        for k in keys:
            sub = (
                folded.filter(pc.equal(folded["table_key"], k))
                if len(keys) > 1
                else folded
            )
            d = f"{lean_dir}/table_key={k}"
            fs_makedirs(d)
            # row count in the FILENAME (materialize bin-packs by rows — byte
            # sizes mislead by up to 6x under dictionary compression) and 128k
            # row groups so oversized slices stay splittable without a rewrite
            fs_write_table(
                sub.drop(["table_key"]),
                f"{d}/part-{tag}-r{sub.num_rows}.parquet",
                row_group_size=131072,
            )
        if terms_frag_dir is not None:
            df = pl.from_arrow(folded.select(["subj", "obj", "table_key"]))
            terms = pl.concat(
                [
                    df.select(
                        pl.col("subj").alias("term"), pl.col("table_key").alias("tbl")
                    ).unique(),
                    df.select(pl.col("obj").alias("term"))
                    .unique()
                    .with_columns(pl.lit(None, dtype=pl.Utf8).alias("tbl")),
                ]
            ).with_columns(
                # SAME bucket function as dicts.build_term_dictionary so both
                # paths produce byte-identical bucket-<b>.parquet dictionaries
                pl.col("term")
                .hash(seed=3)
                .mod(num_term_buckets)
                .cast(pl.Int32)
                .alias("bucket")
            )
            for key, g in terms.partition_by("bucket", as_dict=True).items():
                d = f"{terms_frag_dir}/bucket={int(key[0]):05d}"
                fs_makedirs(d)
                fs_write_table(g.drop("bucket").to_arrow(), f"{d}/part-{tag}.parquet")
        return census_block_rows(
            folded, lambda c: spec_from_combo(c, namespaces), decompose_lean, memo
        )

    return fn


def fold_write_census(
    routed: ray.data.Dataset,
    lean_dir: str,
    num_buckets: int = 64,
    terms_frag_dir: str | None = None,
    num_term_buckets: int = 32,
    namespaces=None,
) -> list[dict]:
    """ONE job = the fold exchange + the partitioned lean write + the full
    step-1 census (column stats, combos, row counts, graph domain, A5
    subject uniqueness). Returns the census rows (metadata-scale).

    This replaces write_parquet(partition_cols) + a separate census scan: the
    partitioned write fragmented every table across every reduce task (~700
    files at bench scale, re-read by every downstream job) and the census cost
    a second full pass + job launch. The composite bucket (see ``_add_bucket``)
    makes sorted blocks table-contiguous, so the direct write emits ~1 file per
    (block, table)."""
    from ..util import fs_rmtree

    fs_rmtree(lean_dir)
    if terms_frag_dir is not None:
        fs_rmtree(terms_frag_dir)
    with_bucket = routed.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
    return (
        with_bucket.sort("bucket")
        .map_batches(
            _write_census_fn(lean_dir, terms_frag_dir, num_term_buckets, namespaces),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
