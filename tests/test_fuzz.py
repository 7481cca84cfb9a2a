"""Property-based fuzz tests (hypothesis) — no Ray session needed.

Two families:
- the vectorized hash kernels vs their scalar reference implementations
  (the round-2 ADVICE bug — trailing-empty-string corruption in
  poly_hash_arr — is exactly the class example-based fixtures missed);
- the SPARQL BGP translator vs a naive multiset evaluator over random
  tiny stores and random pattern shapes (shared-variable join semantics,
  DISTINCT, constant restrictions, equality FILTERs).
"""

from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from r2s2_ray.functions.hashing import affine64, perm_constants, poly_hash_arr, poly_hash_one
from r2s2_ray.pipelines.sparql import parse_sparql, to_sql

# --------------------------------------------------------------------------
# hashing kernels
# --------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=12))
def test_poly_hash_arr_matches_scalar(strs):
    """Vectorized == scalar for arbitrary text, INCLUDING empty strings in
    every position and non-ASCII (utf-8 byte semantics)."""
    got = poly_hash_arr(pa.array(strs, pa.string()))
    want = np.array([poly_hash_one(s) for s in strs], dtype=np.uint64)
    assert np.array_equal(got, want), (strs, got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=20), min_size=1, max_size=8), st.integers(0, 5))
def test_poly_hash_arr_slice_offset(strs, k):
    """Arrow array SLICES (non-zero offset) hash identically to fresh arrays —
    the zero-copy buffer view must honor arr.offset."""
    arr = pa.array(strs + strs, pa.string()).slice(k, len(strs))
    keep = (strs + strs)[k : k + len(strs)]
    got = poly_hash_arr(arr)
    want = np.array([poly_hash_one(s) for s in keep], dtype=np.uint64)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, (1 << 64) - 1), max_size=10), st.integers(0, 7))
def test_affine64_matches_scalar(hs, i):
    a, b = perm_constants(i)
    h = np.array(hs, dtype=np.uint64)
    got = affine64(h, a, b)
    m = (1 << 64) - 1
    want = np.array([((a * x) + b) & m for x in hs], dtype=np.uint64)
    assert np.array_equal(got, want)


# --------------------------------------------------------------------------
# SPARQL BGP translator vs naive evaluator
# --------------------------------------------------------------------------

_ALPHABET = ["a", "b", "c"]
_VARS = ["x", "y", "z"]

_term = st.one_of(
    st.sampled_from([("var", v) for v in _VARS]),
    st.sampled_from([("iri", c) for c in _ALPHABET]),
)
_pattern = st.tuples(_term, _term, _term)
_patterns = st.lists(_pattern, min_size=1, max_size=3).filter(
    lambda ps: any(k == "var" for p in ps for k, _ in p)
)
_store = st.lists(
    st.tuples(st.sampled_from(_ALPHABET), st.sampled_from(_ALPHABET), st.sampled_from(_ALPHABET)),
    max_size=10,
)


def _naive_eval(store, patterns):
    """Multiset BGP evaluation: left-to-right pattern matching with binding
    extension (the SPARQL-algebra definition, independent of the SQL layout)."""
    sols = [dict()]
    for pat in patterns:
        new = []
        for b in sols:
            for row in store:
                b2 = dict(b)
                ok = True
                for (kind, val), cell in zip(pat, row):
                    if kind == "iri":
                        if cell != val:
                            ok = False
                            break
                    else:
                        if b2.get(val, cell) != cell:
                            ok = False
                            break
                        b2[val] = cell
                if ok:
                    new.append(b2)
        sols = new
    return sols


def _render(patterns, distinct, filt=None):
    body = " . ".join(
        " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in pat) for pat in patterns
    )
    if filt is not None:
        body += f' FILTER(?{filt[0]} = "{filt[1]}")'
    return f"SELECT {'DISTINCT ' if distinct else ''}* WHERE {{ {body} }}"


def _run_sql(store, q):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE all_triples (subj VARCHAR, pred VARCHAR, obj VARCHAR, "
        "o_lang VARCHAR, o_dt VARCHAR, graph VARCHAR)"
    )
    if store:
        con.executemany(
            "INSERT INTO all_triples VALUES (?, ?, ?, NULL, NULL, 'g')",
            [list(r) for r in store],
        )
    cur = con.execute(to_sql(parse_sparql(q)))
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), [tuple(r[i] for i in order) for r in rows]


@settings(max_examples=60, deadline=None)
@given(_store, _patterns, st.booleans())
def test_sparql_bgp_matches_naive(store, patterns, distinct):
    """Translator SQL over a random tiny store == the naive SPARQL-algebra
    evaluation: same variables, same solution multiset (set under DISTINCT)."""
    q = _render(patterns, distinct)
    cols, rows = _run_sql(store, q)
    sols = _naive_eval(store, patterns)
    used = sorted({v for p in patterns for k, v in p if k == "var"})
    assert cols == used
    want = [tuple(s[v] for v in used) for s in sols]
    if distinct:
        assert set(rows) == set(want)
    else:
        assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, st.sampled_from(_ALPHABET), st.data())
def test_sparql_filter_eq_matches_naive(store, patterns, const, data):
    """Equality FILTER == naive post-filter on the chosen binding."""
    used = sorted({v for p in patterns for k, v in p if k == "var"})
    var = data.draw(st.sampled_from(used))
    q = _render(patterns, False, filt=(var, const))
    cols, rows = _run_sql(store, q)
    sols = [s for s in _naive_eval(store, patterns) if s[var] == const]
    want = [tuple(s[v] for v in used) for s in sols]
    assert cols == used and Counter(rows) == Counter(want)


def test_zero_projection_raises():
    """An all-constant pattern set projects no variables — clear error, not
    invalid SQL (was: 'SELECT  FROM ...')."""
    import pytest

    with pytest.raises(ValueError, match="projects no variables"):
        to_sql(parse_sparql("SELECT * WHERE { <a> <b> <c> }"))


# --------------------------------------------------------------------------
# vectorized extractor vs the scalar oracle on adversarial transcript text
# --------------------------------------------------------------------------

import datetime as _dt

from r2s2_ray import vocab as _vocab
from r2s2_ray.extract.batch import TripleExtractor
from r2s2_ray.extract.oracle import extract_all
from r2s2_ray.transcripts import TRANSCRIPT_SCHEMA

_GAZ_WORDS = sorted(_vocab.GAZETTEER)[:5]

_fragment = st.one_of(
    st.text(max_size=12),
    st.sampled_from(_GAZ_WORDS + [w.upper() for w in _GAZ_WORDS[:2]]),
    st.sampled_from(
        [
            "[en] hello there",
            "[eng] not a lang tag",
            "[e] nope",
            "[en]missing space",
            "Tell me about document 42 from web.",
            "Tell me about document 42 from web",
            "tell me about document 42 from web.",
            "Document 7 is written in en and has 123 characters.",
            "Document 7 is written in EN and has 123 characters.",
            "see https://ex.org/a/b.,",
            "xhttps://glued.example/x",
            "https://",
            "https://.",
            "a.b,c.",
            "",
        ]
    ),
)
_text = st.lists(_fragment, max_size=4).map(" ".join)
_turn = st.fixed_dictionaries(
    {
        "conv_id": st.integers(0, 99).map(lambda n: f"conv-{n:08d}"),
        "turn_idx": st.integers(0, 7),
        "role": st.sampled_from(["user", "assistant", "tool"]),
        "text": _text,
        "tool": st.one_of(st.none(), st.sampled_from(["search", "calc"])),
        "ts": st.integers(0, 10**9).map(
            lambda s: _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=s)
        ),
    }
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_turn, min_size=1, max_size=6))
def test_extractor_matches_oracle_fuzz(turns):
    """The vectorized batch extractor must emit EXACTLY the scalar oracle's
    triple set on adversarial text: lang-tag look-alikes, pattern near-misses,
    glued/bare/trailing-punctuation URLs, cased gazetteer hits, empty text,
    random unicode — the fixture corpus never exercises these shapes."""
    tbl = pa.Table.from_pylist(turns, schema=TRANSCRIPT_SCHEMA)
    got = sorted(
        zip(
            *(
                TripleExtractor()(tbl)[c].to_pylist()
                for c in ["subj", "s_kind", "pred", "obj", "o_kind", "o_lang", "o_dt", "graph"]
            )
        )
    )
    want = sorted(tuple(t) for t in extract_all(turns))
    assert got == want


# --------------------------------------------------------------------------
# property-path translator vs naive path-algebra evaluator
# --------------------------------------------------------------------------

_step = st.tuples(
    st.booleans(),  # inverse
    st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=2, unique=True),
    st.sampled_from(["", "+", "*", "?"]),  # closure modifier
)
_path = st.lists(_step, min_size=1, max_size=3)
_node = st.one_of(st.just(("var", "x")), st.sampled_from([("iri", c) for c in _ALPHABET]))


def _step_rel(store, inv, preds, mod, extra_terms=()):
    """One path step -> Counter of (subj, obj) pairs. Plain steps are
    multisets (duplicate store rows multiply); closures (``+``/``*``/``?``)
    are DISTINCT pair sets (SPARQL arbitrary-length-path semantics), with
    ``*``/``?`` adding the zero-length identity over every graph term plus
    ``extra_terms`` (constant pattern endpoints — the spec's ZeroLengthPath
    yields a solution for a constant even when absent from the graph)."""
    base = Counter()
    for s, p, o in store:
        if p in preds:
            base[(o, s) if inv else (s, o)] += 1
    if not mod:
        return base
    ident = {(t, t) for s, _, o in store for t in (s, o)}
    ident |= {(t, t) for t in extra_terms}
    if mod == "?":
        return Counter(dict.fromkeys(set(base) | ident, 1))
    pairs = set(base)
    while True:
        nxt = pairs | {(a, d) for a, b in pairs for c, d in base if b == c}
        if nxt == pairs:
            break
        pairs = nxt
    if mod == "*":
        pairs |= ident
    return Counter(dict.fromkeys(pairs, 1))


def _compose(r1, r2):
    out = Counter()
    for (a, b), m in r1.items():
        for (c, d), n in r2.items():
            if b == c:
                out[(a, d)] += m * n
    return out


@settings(max_examples=50, deadline=None)
@given(_store, _path, _node, st.one_of(st.just(("var", "y")), st.sampled_from([("iri", c) for c in _ALPHABET])), st.booleans())
def test_sparql_property_path_matches_naive(store, path, subj, obj, distinct):
    """Random path expressions (sequence / inverse / alternation / closure)
    over random tiny stores: translator SQL == the path-algebra evaluation.
    Sequences are multisets over the desugared fresh intermediates; closures
    are distinct pair sets — exactly the engine's documented semantics."""
    if subj[0] != "var" and obj[0] != "var":
        obj = ("var", "y")
    rel = None
    for idx, (inv, preds, mod) in enumerate(path):
        extra = set()
        if idx == 0 and subj[0] == "iri":
            extra.add(subj[1])
        if idx == len(path) - 1 and obj[0] == "iri":
            extra.add(obj[1])
        r = _step_rel(store, inv, preds, mod, extra)
        rel = r if rel is None else _compose(rel, r)
    sols = Counter()
    for (a, b), m in rel.items():
        if subj[0] == "iri" and a != subj[1]:
            continue
        if obj[0] == "iri" and b != obj[1]:
            continue
        key = tuple(
            x for t, x in ((subj, a), (obj, b)) if t[0] == "var"
        )
        sols[key] += m

    def render_step(inv, preds, mod):
        atom = f"<{preds[0]}>" if len(preds) == 1 else "(" + "|".join(f"<{p}>" for p in preds) + ")"
        return ("^" if inv else "") + atom + mod

    pstr = "/".join(render_step(*s) for s in path)
    sterm = f"?{subj[1]}" if subj[0] == "var" else f"<{subj[1]}>"
    oterm = f"?{obj[1]}" if obj[0] == "var" else f"<{obj[1]}>"
    q = f"SELECT {'DISTINCT ' if distinct else ''}* WHERE {{ {sterm} {pstr} {oterm} }}"
    cols, rows = _run_sql(store, q)
    used = sorted({t[1] for t in (subj, obj) if t[0] == "var"})
    assert cols == used
    # project naive sols in column order (x before y by construction)
    if distinct:
        assert set(rows) == set(sols)
    else:
        assert Counter(rows) == sols


_members = st.lists(
    st.tuples(st.booleans(), st.sampled_from(_ALPHABET)),
    min_size=1,
    max_size=3,
    unique=True,
)


@settings(max_examples=60, deadline=None)
@given(_store, _members, st.booleans())
def test_sparql_property_set_inverse_members_matches_naive(store, members, negated):
    """(Negated) property sets with ^ members — ``(a|^b)`` / ``!(a|^b)`` /
    ``!^a`` — vs the spec translation alt(NPS(fwd), inv(NPS(bwd))): forward
    members match forward edges, inverse members match reversed edges, each
    branch only present when it has members; multiset union."""
    fwd = {p for inv, p in members if not inv}
    bwd = {p for inv, p in members if inv}
    want = Counter()
    for s, p, o in store:
        if negated:
            if fwd and p not in fwd:
                want[(s, o)] += 1
            if bwd and p not in bwd:
                want[(o, s)] += 1
        else:
            if p in fwd:
                want[(s, o)] += 1
            if p in bwd:
                want[(o, s)] += 1
    body = "|".join(("^" if inv else "") + f"<{p}>" for inv, p in members)
    pstr = ("!" if negated else "") + (f"({body})" if len(members) > 1 else body)
    if len(members) == 1 and not negated and not members[0][0]:
        pstr = f"<{members[0][1]}>"  # plain predicate — fine either way
    cols, rows = _run_sql(store, f"SELECT * WHERE {{ ?x {pstr} ?y }}")
    assert cols == ["x", "y"]
    assert Counter(rows) == want


# --------------------------------------------------------------------------
# expression FILTERs vs naive evaluation
# --------------------------------------------------------------------------

_EVALS = ["a", "ab", "3", "10", "x7", ""]
_estore = st.lists(st.sampled_from(_EVALS), min_size=0, max_size=8)
_efun = st.sampled_from(["plain", "strlen", "ucase", "lcase", "concat"])
_eop = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


def _apply_fun(fun, v):
    if fun == "strlen":
        return len(v)
    if fun == "ucase":
        return v.upper()
    if fun == "lcase":
        return v.lower()
    if fun == "concat":
        return v + "z"
    return v


def _render_efun(fun):
    if fun == "strlen":
        return "STRLEN(?y)"
    if fun == "ucase":
        return "UCASE(?y)"
    if fun == "lcase":
        return "LCASE(?y)"
    if fun == "concat":
        return 'CONCAT(?y, "z")'
    return "?y"


@settings(max_examples=60, deadline=None)
@given(_estore, _efun, _eop, st.one_of(st.sampled_from(_EVALS), st.integers(0, 12)))
def test_sparql_expression_filter_matches_naive(vals, fun, op, rhs):
    """FILTER(f(?y) <op> const) over random stores == the naive evaluation
    with the translator's coercion rule: numeric comparison when either side
    is numeric-valued (STRLEN or an int literal; TRY_CAST failures drop the
    row), lexical comparison otherwise. `plain ?y op const` intentionally
    takes the simple-form path — both paths are exercised."""
    import operator

    ops = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
           "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    store = [("s%d" % i, "p", v) for i, v in enumerate(vals)]
    numeric = fun == "strlen" or isinstance(rhs, int)
    rhs_str = str(rhs) if isinstance(rhs, int) else f'"{rhs}"'
    q = f"SELECT ?x ?y WHERE {{ ?x <p> ?y . FILTER({_render_efun(fun)} {op} {rhs_str}) }}"
    cols, rows = _run_sql(store, q)
    want = []
    for s, _, v in store:
        lhs = _apply_fun(fun, v)
        if numeric:
            try:
                l = float(lhs)
            except (TypeError, ValueError):
                continue  # TRY_CAST -> NULL -> fails the predicate
            try:
                r = float(rhs)
            except ValueError:
                continue
            keep = ops[op](l, r)
        else:
            keep = ops[op](str(lhs), str(rhs))
        if keep:
            want.append((s, v))
    assert cols == ["x", "y"]
    assert Counter(rows) == Counter(want)


_batom = st.tuples(
    st.sampled_from(["strlen_gt", "eq", "contains"]),
    st.one_of(st.sampled_from(_EVALS), st.integers(0, 6)),
)
_btree = st.recursive(
    _batom,
    lambda kids: st.one_of(
        st.tuples(st.just("not"), kids),
        st.tuples(st.sampled_from(["and", "or"]), kids, kids),
    ),
    max_leaves=4,
)


@settings(max_examples=60, deadline=None)
@given(_estore, _btree)
def test_sparql_boolean_filter_matches_naive(vals, tree):
    """FILTER bodies with &&/||/! connectives over comparison and CONTAINS
    atoms == the naive three-valued evaluation (an error — failed numeric
    cast — propagates through connectives like SQL NULL, and a non-TRUE
    filter eliminates the row: the SPARQL EBV error table)."""

    def render(t):
        if t[0] == "not":
            return f"!({render(t[1])})"
        if t[0] in ("and", "or"):
            op = "&&" if t[0] == "and" else "||"
            return f"({render(t[1])} {op} {render(t[2])})"
        kind, rhs = t
        r = str(rhs) if isinstance(rhs, int) else f'"{rhs}"'
        if kind == "strlen_gt":
            return f"STRLEN(?y) > {r}" if isinstance(rhs, int) else f'STRLEN(?y) > "{rhs}"'
        if kind == "contains":
            return f"CONTAINS(?y, {r})" if not isinstance(rhs, int) else f'CONTAINS(?y, "{rhs}")'
        return f"?y = {r}"

    def ev(t, v):
        """True / False / None (error) — SQL 3VL == SPARQL EBV errors."""
        if t[0] == "not":
            x = ev(t[1], v)
            return None if x is None else not x
        if t[0] in ("and", "or"):
            a, b = ev(t[1], v), ev(t[2], v)
            if t[0] == "and":
                if a is False or b is False:
                    return False
                if a is None or b is None:
                    return None
                return True
            if a is True or b is True:
                return True
            if a is None or b is None:
                return None
            return False
        kind, rhs = t
        if kind == "strlen_gt":
            if isinstance(rhs, int):
                return len(v) > rhs
            try:
                return float(len(v)) > float(rhs)
            except ValueError:
                return None
        if kind == "contains":
            return str(rhs) in v
        if isinstance(rhs, int):
            try:
                return float(v) == float(rhs)
            except ValueError:
                return None
        return v == rhs

    store = [("s%d" % i, "p", v) for i, v in enumerate(vals)]
    q = f"SELECT ?x ?y WHERE {{ ?x <p> ?y . FILTER({render(tree)}) }}"
    cols, rows = _run_sql(store, q)
    want = [(s, v) for s, _, v in store if ev(tree, v) is True]
    assert cols == ["x", "y"]
    assert Counter(rows) == Counter(want)


# --------------------------------------------------------------------------
# OPTIONAL (LeftJoin) vs naive evaluation, incl. group-local filters
# --------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(_store, _patterns, _patterns, st.one_of(st.none(), st.sampled_from(_ALPHABET)))
def test_sparql_optional_matches_naive(store, req, opt, filt_const):
    """{ REQ . OPTIONAL { OPT [FILTER(?v = c)] } } == the SPARQL LeftJoin:
    each required solution extends with every compatible optional solution
    that passes the group filter, or survives unextended (NULLs) when none
    does. The filter may unmatch the group but never eliminates the outer
    row."""
    req_vars = sorted({v for p in req for k, v in p if k == "var"})
    opt_vars = sorted({v for p in opt for k, v in p if k == "var"})
    # the translator rejects filters over variables the group never binds —
    # pick the filter var from the group's own variables
    if filt_const is not None and not opt_vars:
        filt_const = None
    fvar = opt_vars[0] if filt_const is not None else None

    body = " . ".join(
        " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in req
    )
    obody = " . ".join(
        " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in opt
    )
    if fvar is not None:
        obody += f' . FILTER(?{fvar} = "{filt_const}")'
    q = f"SELECT * WHERE {{ {body} . OPTIONAL {{ {obody} }} }}"
    cols, rows = _run_sql(store, q)

    opt_sols_all = _naive_eval(store, opt)
    if fvar is not None:
        opt_sols_all = [s for s in opt_sols_all if s[fvar] == filt_const]
    used = sorted(set(req_vars) | set(opt_vars))
    want = []
    for r in _naive_eval(store, req):
        matches = [
            o
            for o in opt_sols_all
            if all(o[v] == r[v] for v in o if v in r)
        ]
        if matches:
            for o in matches:
                merged = {**r, **o}
                want.append(tuple(merged.get(v) for v in used))
        else:
            want.append(tuple(r.get(v) for v in used))
    assert cols == used
    assert Counter(rows) == Counter(want)


def _naive_leftjoin(left, right):
    """SPARQL LeftJoin over solution-dict lists (a variable is bound iff the
    key is present): every left solution extends with each compatible right
    solution, or survives unextended when none is compatible."""
    out = []
    for l in left:
        ms = [r for r in right if all(r[v] == l[v] for v in r if v in l)]
        if ms:
            out.extend({**l, **r} for r in ms)
        else:
            out.append(l)
    return out


@settings(max_examples=50, deadline=None)
@given(_store, _patterns, _patterns, _patterns)
def test_sparql_nested_optional_matches_naive(store, req, a, b):
    """{ REQ . OPTIONAL { A . OPTIONAL { B } } } == LeftJoin(REQ,
    LeftJoin(A, B)) — the inner group can extend or stay unbound
    independently per outer row, and an inner-only variable shared with REQ
    joins NULL-compatibly (unbound is compatible with anything)."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"OPTIONAL {{ {render(a)} . OPTIONAL {{ {render(b)} }} }} }}"
    )
    cols, rows = _run_sql(store, q)
    inner = _naive_leftjoin(_naive_eval(store, a), _naive_eval(store, b))
    want_sols = _naive_leftjoin(_naive_eval(store, req), inner)
    used = sorted({v for ps in (req, a, b) for p in ps for k, v in p if k == "var"})
    assert cols == used
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert Counter(rows) == Counter(want)


# --------------------------------------------------------------------------
# UNION and aggregate projections vs naive evaluation
# --------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, st.booleans())
def test_sparql_union_matches_naive(store, br1, br2, distinct):
    """{ A } UNION { B } == the multiset concatenation of branch solutions,
    NULL for variables a branch leaves unbound."""
    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT {'DISTINCT ' if distinct else ''}* "
        f"WHERE {{ {{ {render(br1)} }} UNION {{ {render(br2)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    v1 = {v for p in br1 for k, v in p if k == "var"}
    v2 = {v for p in br2 for k, v in p if k == "var"}
    used = sorted(v1 | v2)
    want = []
    for branch, vs in ((br1, v1), (br2, v2)):
        for s in _naive_eval(store, branch):
            want.append(tuple(s.get(v) if v in vs else None for v in used))
    assert cols == used
    if distinct:
        assert set(rows) == set(want)
    else:
        assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, _patterns, st.sampled_from(_ALPHABET))
def test_sparql_union_rich_branches_matches_naive(store, br1, br2, opt, c):
    """Round-4 widening: UNION branches are full groups — a FILTER inside one
    branch scopes to that branch only, and an OPTIONAL inside the other
    left-joins inside that branch only."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    v1 = sorted({v for p in br1 for k, v in p if k == "var"})
    fvar = v1[0] if v1 else None
    b1 = render(br1) + (f' . FILTER(?{fvar} = "{c}")' if fvar else "")
    b2 = f"{render(br2)} . OPTIONAL {{ {render(opt)} }}"
    q = f"SELECT * WHERE {{ {{ {b1} }} UNION {{ {b2} }} }}"
    cols, rows = _run_sql(store, q)
    sols1 = [s for s in _naive_eval(store, br1) if fvar is None or s[fvar] == c]
    sols2 = _naive_leftjoin(_naive_eval(store, br2), _naive_eval(store, opt))
    used = sorted(
        {v for ps in (br1, br2, opt) for p in ps for k, v in p if k == "var"}
    )
    want = [tuple(s.get(v) for v in used) for s in sols1 + sols2]
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, _patterns)
def test_sparql_joined_union_matches_naive(store, req, br1, br2):
    """Round-4 widening: a UNION sequence joined with other patterns —
    Join(REQ, Union(A, B)) with SPARQL solution compatibility (a
    branch-unbound shared variable is compatible with anything; the merged
    binding is the bound one)."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"{{ {render(br1)} }} UNION {{ {render(br2)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    union_sols = list(_naive_eval(store, br1)) + list(_naive_eval(store, br2))
    want_sols = []
    for l in _naive_eval(store, req):
        for r in union_sols:
            if all(r[v] == l[v] for v in r if v in l):
                want_sols.append({**l, **r})
    used = sorted(
        {v for ps in (req, br1, br2) for p in ps for k, v in p if k == "var"}
    )
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, _patterns)
def test_sparql_union_inside_optional_matches_naive(store, req, br1, br2):
    """Round-4 widening: OPTIONAL { { A } UNION { B } } routes through the
    sub-Query fallback — LeftJoin(REQ, Union(A, B))."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"OPTIONAL {{ {{ {render(br1)} }} UNION {{ {render(br2)} }} }} }}"
    )
    cols, rows = _run_sql(store, q)
    union_sols = list(_naive_eval(store, br1)) + list(_naive_eval(store, br2))
    want_sols = _naive_leftjoin(_naive_eval(store, req), union_sols)
    used = sorted(
        {v for ps in (req, br1, br2) for p in ps for k, v in p if k == "var"}
    )
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, _patterns, _patterns)
def test_sparql_joined_union_then_optional_matches_naive(store, req, br1, br2, opt):
    """Review-fix pin: LeftJoin(Join(REQ, Union(A, B)), OPT) — a union
    branch may leave a shared variable unbound (NULL in the required part),
    and the OPTIONAL must treat that as compatible, adopting the group's
    binding in the merged solution."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"{{ {render(br1)} }} UNION {{ {render(br2)} }} "
        f"OPTIONAL {{ {render(opt)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    union_sols = list(_naive_eval(store, br1)) + list(_naive_eval(store, br2))
    joined = []
    for l in _naive_eval(store, req):
        for r in union_sols:
            if all(r[v] == l[v] for v in r if v in l):
                joined.append({**l, **r})
    want_sols = _naive_leftjoin(joined, _naive_eval(store, opt))
    used = sorted(
        {v for ps in (req, br1, br2, opt) for p in ps for k, v in p if k == "var"}
    )
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, _patterns)
def test_sparql_joined_union_then_minus_matches_naive(store, req, br1, br2):
    """Review-fix pin: Minus(Join(REQ, Union(A, B)), M) — a solution with a
    branch-unbound variable is removed only when a minus solution is
    compatible on the variables the solution ACTUALLY binds and the bound
    domains overlap (the SPARQL disjoint-domain rule)."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    minus = br2  # reuse a generated pattern as the MINUS group
    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"{{ {render(br1)} }} UNION {{ {render(br2)} }} "
        f"MINUS {{ {render(minus)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    union_sols = list(_naive_eval(store, br1)) + list(_naive_eval(store, br2))
    joined = []
    for l in _naive_eval(store, req):
        for r in union_sols:
            if all(r[v] == l[v] for v in r if v in l):
                joined.append({**l, **r})
    msols = list(_naive_eval(store, minus))
    want_sols = [
        l
        for l in joined
        if not any(
            set(l) & set(m) and all(m[v] == l[v] for v in m if v in l)
            for m in msols
        )
    ]
    used = sorted(
        {v for ps in (req, br1, br2) for p in ps for k, v in p if k == "var"}
    )
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, st.data())
def test_sparql_agg_over_union_matches_naive(store, br1, br2, data):
    """Round-4 widening: aggregates + GROUP BY over a whole-body UNION run on
    the union's solution multiset — COUNT(?v) counts the solutions where ?v
    is bound, and an unbound grouping variable groups as one NULL key."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    used = sorted(
        {v for ps in (br1, br2) for p in ps for k, v in p if k == "var"}
    )
    gvar = data.draw(st.sampled_from(used))
    cvar = data.draw(st.sampled_from(used))
    q = (
        f"SELECT ?{gvar} (COUNT(?{cvar}) AS ?n) WHERE "
        f"{{ {{ {render(br1)} }} UNION {{ {render(br2)} }} }} GROUP BY ?{gvar}"
    )
    cols, rows = _run_sql(store, q)
    sols = list(_naive_eval(store, br1)) + list(_naive_eval(store, br2))
    want: dict[str | None, int] = {}
    for s in sols:
        key = s.get(gvar)
        want[key] = want.get(key, 0) + (1 if s.get(cvar) is not None else 0)
    assert sorted(cols) == sorted([gvar, "n"])
    got = {r[cols.index(gvar)]: r[cols.index("n")] for r in rows}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, st.data())
def test_sparql_count_groupby_matches_naive(store, patterns, data):
    """(COUNT(?v) AS ?n) GROUP BY ?g == per-group solution counts of the
    naive evaluation (COUNT over a BGP-bound variable counts every row)."""
    used = sorted({v for p in patterns for k, v in p if k == "var"})
    gvar = data.draw(st.sampled_from(used))
    cvar = data.draw(st.sampled_from(used))
    body = " . ".join(
        " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in patterns
    )
    q = f"SELECT ?{gvar} (COUNT(?{cvar}) AS ?n) WHERE {{ {body} }} GROUP BY ?{gvar}"
    cols, rows = _run_sql(store, q)
    want = Counter(s[gvar] for s in _naive_eval(store, patterns))
    assert sorted(cols) == sorted([gvar, "n"])
    got = {r[cols.index(gvar)]: r[cols.index("n")] for r in rows}
    assert got == dict(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns, st.booleans())
def test_sparql_exists_matches_naive(store, req, sub, negated):
    """FILTER (NOT) EXISTS { BGP } == the correlated semi/anti-join: a
    required solution survives iff the subgroup has (no) solution compatible
    on the SHARED variables (group-local variables are scoped)."""
    shared = sorted(
        {v for p in req for k, v in p if k == "var"}
        & {v for p in sub for k, v in p if k == "var"}
    )

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"FILTER {'NOT ' if negated else ''}EXISTS {{ {render(sub)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    sub_sols = _naive_eval(store, sub)
    used = sorted({v for p in req for k, v in p if k == "var"})
    want = []
    for r in _naive_eval(store, req):
        hit = any(all(s[v] == r[v] for v in shared) for s in sub_sols)
        if hit != negated:
            want.append(tuple(r[v] for v in used))
    assert cols == used
    assert Counter(rows) == Counter(want)


@settings(max_examples=40, deadline=None)
@given(_store, _patterns, _patterns)
def test_sparql_minus_matches_naive(store, req, sub):
    """MINUS { BGP } == remove solutions with a compatible minus-side
    solution SHARING at least one variable; a disjoint group removes nothing
    (the MINUS / NOT-EXISTS divergence, property-based)."""
    shared = sorted(
        {v for p in req for k, v in p if k == "var"}
        & {v for p in sub for k, v in p if k == "var"}
    )

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = f"SELECT * WHERE {{ {render(req)} . MINUS {{ {render(sub)} }} }}"
    cols, rows = _run_sql(store, q)
    sub_sols = _naive_eval(store, sub)
    used = sorted({v for p in req for k, v in p if k == "var"})
    want = []
    for r in _naive_eval(store, req):
        if shared and any(all(s[v] == r[v] for v in shared) for s in sub_sols):
            continue  # removed
        want.append(tuple(r[v] for v in used))
    assert cols == used
    assert Counter(rows) == Counter(want)


_seqpreds = st.lists(st.sampled_from(_ALPHABET), min_size=2, max_size=3)


@settings(max_examples=50, deadline=None)
@given(
    _store,
    _seqpreds,
    st.sampled_from(["+", "*", "?"]),
    st.booleans(),
    _node,
    st.one_of(st.just(("var", "y")), st.sampled_from([("iri", c) for c in _ALPHABET])),
)
def test_sparql_sequence_closure_matches_naive(store, preds, mod, inv, subj, obj):
    """Sequence closures ``(p/q)+`` / ``*`` / ``?`` (and ``^``-inverted) vs
    naive evaluation: the closed-over edge relation is the COMPOSITION of the
    member predicates, the closure is a distinct pair set, ``*``/``?`` add
    the zero-length identity over graph terms plus constant endpoints, and
    ``^`` reverses the final pair set."""
    if subj[0] != "var" and obj[0] != "var":
        obj = ("var", "y")
    rel = None
    for p in preds:
        r = Counter()
        for s, pp, o in store:
            if pp == p:
                r[(s, o)] += 1
        rel = r if rel is None else _compose(rel, r)
    base = rel
    extra = {t[1] for t in (subj, obj) if t[0] == "iri"}
    ident = {(t, t) for s, _, o in store for t in (s, o)}
    ident |= {(t, t) for t in extra}
    if mod == "?":
        pairs = set(base) | ident
    else:
        pairs = set(base)
        while True:
            nxt = pairs | {(a, d) for a, b in pairs for c, d in base if b == c}
            if nxt == pairs:
                break
            pairs = nxt
        if mod == "*":
            pairs |= ident
    if inv:
        pairs = {(b, a) for a, b in pairs}
    sols = Counter()
    for a, b in pairs:
        if subj[0] == "iri" and a != subj[1]:
            continue
        if obj[0] == "iri" and b != obj[1]:
            continue
        sols[tuple(x for t, x in ((subj, a), (obj, b)) if t[0] == "var")] += 1
    pstr = ("^" if inv else "") + "(" + "/".join(f"<{p}>" for p in preds) + ")" + mod
    sterm = f"?{subj[1]}" if subj[0] == "var" else f"<{subj[1]}>"
    oterm = f"?{obj[1]}" if obj[0] == "var" else f"<{obj[1]}>"
    cols, rows = _run_sql(store, f"SELECT * WHERE {{ {sterm} {pstr} {oterm} }}")
    assert cols == sorted({t[1] for t in (subj, obj) if t[0] == "var"})
    assert Counter(rows) == sols


@settings(max_examples=60, deadline=None)
@given(
    _store,
    _members,
    st.sampled_from(["+", "*", "?"]),
    st.one_of(st.just(("var", "x")), st.sampled_from([("iri", c) for c in _ALPHABET])),
    st.one_of(st.just(("var", "y")), st.sampled_from([("iri", c) for c in _ALPHABET])),
)
def test_sparql_mixed_direction_closure_matches_naive(store, members, mod, subj, obj):
    """Closures over MIXED-direction alternations ``(a|^b)+`` / ``*`` / ``?``:
    the closed-over edge set is the union of forward edges for plain members
    and REVERSED edges for ^ members; the closure result is a DISTINCT pair
    set, with ``*``/``?`` adding the zero-length identity over every graph
    term plus constant pattern endpoints."""
    assume(len({inv for inv, _ in members}) == 2)  # genuinely mixed
    if subj[0] != "var" and obj[0] != "var":
        obj = ("var", "y")
    base = set()
    for s, p, o in store:
        for inv, m in members:
            if p == m:
                base.add((o, s) if inv else (s, o))
    extra = {t[1] for t in (subj, obj) if t[0] == "iri"}
    ident = {(t, t) for s, _, o in store for t in (s, o)} | {(t, t) for t in extra}
    if mod == "?":
        pairs = base | ident
    else:
        pairs = set(base)
        while True:
            nxt = pairs | {(a, d) for a, b in pairs for c, d in pairs if b == c}
            if nxt == pairs:
                break
            pairs = nxt
        if mod == "*":
            pairs |= ident
    sols = Counter()
    for a, b in pairs:
        if subj[0] == "iri" and a != subj[1]:
            continue
        if obj[0] == "iri" and b != obj[1]:
            continue
        sols[tuple(x for t, x in ((subj, a), (obj, b)) if t[0] == "var")] += 1
    pstr = (
        "("
        + "|".join(("^" if inv else "") + f"<{m}>" for inv, m in members)
        + ")"
        + mod
    )
    sterm = f"?{subj[1]}" if subj[0] == "var" else f"<{subj[1]}>"
    oterm = f"?{obj[1]}" if obj[0] == "var" else f"<{obj[1]}>"
    cols, rows = _run_sql(store, f"SELECT * WHERE {{ {sterm} {pstr} {oterm} }}")
    assert cols == sorted({t[1] for t in (subj, obj) if t[0] == "var"})
    assert Counter(rows) == sols


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=8).map(
            " ".join
        ),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([(1, 2), (3, 5), (9, 10)]),
)
def test_setsim_prefix_matches_bruteforce(texts, threshold):
    """The prefix+length filters of setsim_prefix_pairs must be LOSSLESS for
    any rational threshold: the distributed join equals brute-force token-set
    Jaccard over random tiny corpora (single-token docs, duplicate docs,
    shared-vocabulary near-misses)."""
    import ray.data

    from r2s2_ray.functions.dedup import setsim_prefix_pairs

    num, den = threshold
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    got = sorted(
        (r["a"], r["b"], r["inter"], r["uni"])
        for r in setsim_prefix_pairs(
            ray.data.from_arrow(t), "doc_id", "text", threshold=threshold
        ).take_all()
    )
    sets = [frozenset(x.split()) for x in texts]
    want = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if inter and den * inter >= num * uni:
                want.append((i, j, inter, uni))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=14,
        unique=True,
    ),
    st.integers(1, 3),
)
def test_pagerank_matches_python_reference(edge_ids, n_iters):
    """Integer PageRank on random tiny digraphs == a pure-Python rendering of
    the documented recurrence (floor divisions at exactly the two contract
    points, dangling mass dropped)."""
    import ray.data

    from r2s2_ray.functions.graph import pagerank

    edges = [(f"v{a}", f"v{b}") for a, b in edge_ids]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.large_string()),
                "dst": pa.array([b for _, b in edges], pa.large_string()),
            }
        )
    ).repartition(2)
    got = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(ds, n_iters=n_iters).take_all()
    )
    scale, d_num, d_den = 1_000_000, 85, 100
    base = (d_den - d_num) * scale // d_den
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = {v: scale for v in nodes}
    for _ in range(n_iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // out[a]
        r = {v: base + (d_num * s[v]) // d_den for v in nodes}
    assert got == sorted(r.items())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] < e[1]),
        min_size=1,
        max_size=16,
        unique=True,
    ),
    st.integers(1, 3),
)
def test_kcore_matches_python_reference(edge_ids, rounds):
    """Fixed-round 2-core peeling on random tiny graphs == a pure-Python
    peel (degrees over current edges, keep deg >= 2, restrict)."""
    import ray.data

    from r2s2_ray.functions.graph import kcore

    edges = [(f"v{a}", f"v{b}") for a, b in edge_ids]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.large_string()),
                "b": pa.array([b for _, b in edges], pa.large_string()),
            }
        )
    ).repartition(2)
    got = sorted(
        (r["node"], r["deg"]) for r in kcore(ds, k=2, rounds=rounds).take_all()
    )
    cur = list(edges)
    for _ in range(rounds):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 2}
        cur = [(a, b) for a, b in cur if a in keep and b in keep]
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert got == sorted(deg.items())


@settings(max_examples=40, deadline=None)
@given(
    _store,
    st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=2, unique=True),
    st.sampled_from(["+", "*", "?"]),
    st.one_of(st.just(("var", "x")), st.sampled_from([("iri", c) for c in _ALPHABET])),
    st.one_of(st.just(("var", "y")), st.sampled_from([("iri", c) for c in _ALPHABET])),
)
def test_sparql_negated_set_closure_matches_naive(store, members, mod, subj, obj):
    """Closures over negated property sets ``(!(a|b))+`` / ``!a*`` / ``!a?``:
    the closed-over edge set is every triple whose predicate is NOT a member;
    distinct pair semantics, zero-length identity for ``*``/``?``."""
    if subj[0] != "var" and obj[0] != "var":
        obj = ("var", "y")
    base = {(s, o) for s, p, o in store if p not in members}
    extra = {t[1] for t in (subj, obj) if t[0] == "iri"}
    ident = {(t, t) for s, _, o in store for t in (s, o)} | {(t, t) for t in extra}
    if mod == "?":
        pairs = base | ident
    else:
        pairs = set(base)
        while True:
            nxt = pairs | {(a, d) for a, b in pairs for c, d in pairs if b == c}
            if nxt == pairs:
                break
            pairs = nxt
        if mod == "*":
            pairs |= ident
    sols = Counter()
    for a, b in pairs:
        if subj[0] == "iri" and a != subj[1]:
            continue
        if obj[0] == "iri" and b != obj[1]:
            continue
        sols[tuple(x for t, x in ((subj, a), (obj, b)) if t[0] == "var")] += 1
    inner = "|".join(f"<{m}>" for m in members)
    pstr = (f"!({inner})" if len(members) > 1 else f"!<{members[0]}>") + mod
    sterm = f"?{subj[1]}" if subj[0] == "var" else f"<{subj[1]}>"
    oterm = f"?{obj[1]}" if obj[0] == "var" else f"<{obj[1]}>"
    cols, rows = _run_sql(store, f"SELECT * WHERE {{ {sterm} {pstr} {oterm} }}")
    assert cols == sorted({t[1] for t in (subj, obj) if t[0] == "var"})
    assert Counter(rows) == sols


@settings(max_examples=50, deadline=None)
@given(_store, _patterns, _patterns, _patterns)
def test_sparql_sibling_optionals_share_vars_matches_naive(store, req, a, b):
    """{ REQ . OPTIONAL { A } OPTIONAL { B } } == LeftJoin(LeftJoin(REQ, A), B)
    — the spec's sequential translation: the SECOND optional joins the RUNNING
    solution, so a variable bound by the first optional constrains (and is
    NULL-compatible with) the second; the merged binding is the bound side.
    The 3-var alphabet makes cross-optional shared variables frequent."""

    def render(ps):
        return " . ".join(
            " ".join(f"?{v}" if k == "var" else f"<{v}>" for k, v in p) for p in ps
        )

    q = (
        f"SELECT * WHERE {{ {render(req)} . "
        f"OPTIONAL {{ {render(a)} }} OPTIONAL {{ {render(b)} }} }}"
    )
    cols, rows = _run_sql(store, q)
    want_sols = _naive_leftjoin(
        _naive_leftjoin(_naive_eval(store, req), _naive_eval(store, a)),
        _naive_eval(store, b),
    )
    used = sorted({v for ps in (req, a, b) for p in ps for k, v in p if k == "var"})
    assert cols == used
    want = [tuple(s.get(v) for v in used) for s in want_sols]
    assert Counter(rows) == Counter(want)
