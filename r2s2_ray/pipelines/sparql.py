"""Minimal SPARQL serving over the materialized store — the last mile of the
reference's end state (SparqlOnLoadedTest.java:104-127 hands DuckDB + the R2RML
mapping to Ontop and runs SPARQL; here a small BGP-subset translator compiles
SPARQL directly against the ``all_triples`` reassembly view, so the store IS
queryable as SPARQL without a JVM).

Supported subset (documented, tested): PREFIX declarations, SELECT with
explicit variables or ``*``, ``FROM <graph>`` / ``FROM NAMED <graph>`` dataset clauses (FROM = the
default graph non-GRAPH patterns match; FROM NAMED = the named set GRAPH
patterns range over — empty named set means GRAPH matches nothing, the
SPARQL dataset semantics), basic graph patterns (joins via shared
variables; ``;`` predicate-object lists and ``,`` object lists),
``OPTIONAL { ... }`` groups INCLUDING nested OPTIONALs (compiled to LEFT
JOINs — nesting becomes LEFT JOINs inside the group subquery, the
LeftJoin(A, LeftJoin(B, C)) algebra; optional-only variables project as
NULL when unmatched — SPARQL unbound; comparison / string-function /
boolean-connective / expression FILTERs and BINDs INSIDE a group compile
into the LeftJoin condition / group scope — a failing filter or an
unmatched group yields NULL, never eliminates the outer row; a group
holding UNION/VALUES/GRAPH/MINUS/EXISTS/BOUND/subselect forms re-parses
WHOLE as a select-* sub-Query — group-scoped semantics for all of them —
and LEFT JOINs with NULL-compatible conditions on every shared variable),
non-nested ``GRAPH <g>/?g { ... }`` groups (a constant restricts its patterns
to that named graph; a variable binds the graph column and joins when shared),
anonymous blank nodes ``[]`` (each a fresh never-projected variable),
bracketed property lists ``[ p o ; q z ]`` (desugared to fresh variables +
patterns, nesting allowed) and labelled query bnodes
``_:x`` (scoped variables, standard SPARQL semantics),
property paths in the predicate position — sequences ``p1/p2/…`` (desugared
to chained patterns over fresh variables), inverse steps ``^p`` (swap
subject/object; ``^p+`` / ``^(a|b)+`` walk a closure backwards),
alternations ``p1|p2`` (compiled to ``pred IN``; ``^`` members allowed —
``(p|^q)`` unions reversed edges), negated property sets
``!p`` / ``!(p1|p2)`` (``pred NOT IN``) including ``^`` members
(``!(p|^q)`` / ``!^p`` — the spec's alt(NPS(fwd), inv(NPS(bwd)))
translation; NPS closures ``!(a|b)+`` / ``!p*`` / ``!p?`` close over the
complement edge set — only ``^`` members inside a CLOSED negated set are
rejected) and
closures ``p+``/``p*``/``p?`` incl. ``(a|b)+`` over alternation members
and MIXED-direction alternations ``(a|^b)+`` (the closed-over edge set is
the union of forward and reversed member edges)
and SEQUENCE closures ``(p/q)+``/``(p/q)*``/``(p/q)?`` (the closed-over
edge relation is the chain join of the members; ``^(p/q)+`` walks it
backwards; plain grouping parens ``(p/q)`` strip; member-level operators
inside a sequence closure and negated sequence closures are rejected
loudly)
(recursive-CTE transitive closures; ``*``/``?`` seed the zero-length pairs
over the store's terms plus constant endpoints; constant GRAPH/FROM
restrictions apply to every step; closures over negated sets or variable
predicates are rejected loudly),
IRI/prefixed-name/
literal constants (plain, ``@lang``, ``^^<datatype>``, bare numerics),
``FILTER(?v <op> term)`` for ``= != < <= > >=`` (numeric comparison when the
constant is numeric, lexical otherwise, column comparison when the right side
is another bound variable; FILTERs live in the required part),
``FILTER(?v (NOT) IN (t, ...))`` constant-list restrictions,
generalized expression FILTERs ``FILTER(expr <op> expr)`` with the BIND
expression grammar on either side (STRLEN/UCASE/CONCAT/arithmetic;
numeric coercion when either side is numeric-valued),
boolean connectives ``&&`` / ``||`` / ``!`` over comparison and
REGEX/STRSTARTS/STRENDS/CONTAINS atoms (SQL three-valued logic matches the SPARQL
EBV error table; ``BOUND(?v)`` is a first-class atom — a connective filter
holding one, or referencing OPTIONAL-only variables, defers to AFTER the
LEFT JOINs, the spec's Filter(LeftJoin(...)) placement),
string-function FILTERs ``REGEX(?v, "pat")`` / ``STRSTARTS(?v, "s")`` /
``STRENDS(?v, "s")`` / ``CONTAINS(?v, "s")`` (RE2 regex — DuckDB and SPARQL both; the optional
REGEX flags argument accepts ``i``/``s``/``m``/``x``),
whole-body ``{ group } UNION { group }`` (two or more branches, each a FULL
group — FILTER/BIND/OPTIONAL/VALUES/GRAPH/subselects and nested UNIONs all
legal inside a branch, compiled as self-contained sub-queries; multiset
semantics, branch-unbound variables project as NULL, all-constant branches
contribute bare match rows; aggregates + GROUP BY + HAVING on the outer
query run over the union's solution multiset, and DISTINCT / expression
ORDER BY / LIMIT / OFFSET apply to the union), and UNION sequences JOINED
with other top-level patterns (``?s a ?t . { A } UNION { B }`` — the union
compiles to a subquery joined on shared variables with SPARQL solution
compatibility: a branch-unbound shared variable is compatible with
anything and the merged binding is the bound one; like OPTIONAL, the union
join applies after the required part regardless of textual position),
aggregate projections ``(COUNT|SUM|MIN|MAX|AVG|SAMPLE(DISTINCT? ?v|*) AS
?alias)`` and ``GROUP_CONCAT(?v; SEPARATOR="..")`` (deterministic ascending
element order; SAMPLE = deterministic MIN) with ``GROUP BY`` and
``HAVING(?aggAlias <op> number)``, the direct aggregate form
``HAVING(COUNT(?v) > n)`` (COUNT/SUM/MIN/MAX/AVG, DISTINCT and ``*``
allowed, no alias or aggregate projection required — grouped keys alone
may be selected) and general HAVING expression comparisons over aggregate
calls and grouping keys (``HAVING(SUM(?x)/COUNT(?x) > 2)``, compiled as a
post-grouping filter wrapper; conjuncts ``&&``-join and all forms mix),
``GROUP BY (expr AS ?k)`` expression keys (desugared to pre-grouping
BINDs), ORDER BY
over whole-key aggregates — ``ORDER BY DESC(COUNT(?v))`` — with or
without a matching projected alias, nested ``{ SELECT ... }`` subqueries
(explicit projection required; joined to the outer pattern on shared
projected variables; legal INSIDE other groups too — OPTIONAL/UNION
branches/GRAPH/bare groups — via each group's sub-parse, and subqueries
inherit the outer dataset clause transitively), bare group-graph-patterns
``{ body }`` (SPARQL group join: desugared to a plain-SELECT subselect over
the group's visible variables — bag multiplicity kept, group-scoped
FILTERs stay inside; ``{ { SELECT … } }`` unwraps) (plain projected variables must be grouping keys; COUNT
works on lexical forms, the numeric aggregates cast to DOUBLE and skip
non-numeric forms — SPARQL error-skipping),
``VALUES ?v { ... }`` / ``VALUES (?a ?b) { (..) (..) }`` inline-data groups
inside the WHERE body AND as the trailing post-solution-modifier clause
(``… } ORDER BY ?x LIMIT 5 VALUES ?v { … }`` — spliced into the body, the
same join semantics; terms constrain/bind lexical forms; ``UNDEF`` cells
constrain nothing on their row and leave otherwise-unbound variables
unbound),
``FILTER (NOT) EXISTS { group }`` (correlated semi/anti-join; group-local
variables are scoped, shared variables correlate — standard SPARQL; a body
holding more than a plain BGP — FILTER/OPTIONAL/VALUES/GRAPH/UNION/BIND/
subselects/nested EXISTS — re-parses whole as a select-* sub-Query with
group-scoped semantics),
``MINUS { group }`` (anti-join with SPARQL compatibility on the shared
variables; a group sharing no variable removes nothing — the SPARQL
MINUS/NOT-EXISTS divergence; complex bodies re-parse as sub-Queries like
EXISTS, with the disjoint-domain rule on both sides' bound variables),
``FILTER(BOUND(?v))`` / ``FILTER(!BOUND(?v))`` (evaluated AFTER OPTIONAL
joins — the classic OPTIONAL+!BOUND anti-join idiom works),
``FILTER(LANG(?v) =/!= "en")`` (case-insensitive, ``""`` = untagged),
``FILTER(LANGMATCHES(LANG(?v), "range"))`` (RFC 4647 basic filtering —
``"en"`` matches ``en`` and ``en-US``, ``"*"`` any tagged literal) and
``FILTER(DATATYPE(?v) =/!= <dt>)`` (``xsd:string`` = plain untagged,
``rdf:langString`` = lang-tagged) over the stored ``o_lang``/``o_dt``
columns — an IRI/bnode binding behaves like a plain literal here
(combine with a kind filter for exact SPARQL error semantics),
``FILTER((!)isIRI/isURI/isBlank/isLiteral/isNumeric(?v))`` term-kind tests
over the serving views' constant ``s_kind``/``o_kind`` columns (exact —
the store's table split is by kind; isNumeric = literal with a numeric XSD
datatype, per spec untyped lexical numbers are not numeric; needs a direct
triple-pattern binding), ``FILTER((!)sameTerm(?a, ?b|term))`` (lexical-form
identity plus lang-tag/datatype identity when both sides are object
bindings),
``BIND(expr AS ?v)`` assignments (CONCAT/STR/UCASE/LCASE/STRLEN/SUBSTR/
REPLACE/STRBEFORE/STRAFTER/ABS/ROUND/CEIL/FLOOR/COALESCE/MD5/SHA256/
YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS over dateTime lexicals, IRI/URI
as the identity on the lexical form, the nondeterministic builtins
UUID/STRUUID/BNODE/RAND/NOW (serving-side only — no value oracle), and
STRLANG/STRDT as the lexical identity on their first argument (the
annotation is not carried into the value model),
``IF(cond, then, else)`` with an ``expr <op> expr`` condition, LANG/DATATYPE
as expressions over object bindings, and +,-,*,/ arithmetic with
TRY_CAST numeric coercion; later BINDs may reference earlier ones, BIND
targets work in FILTER/ORDER BY/SELECT, and a BIND referencing
OPTIONAL-only variables — ``COALESCE(?opt, "default")`` — defers to after
the LEFT JOINs), plain SELECT expressions ``SELECT ?s (expr AS ?v)``
(desugared to trailing BINDs; not combinable with aggregates or whole-body
UNION),
DISTINCT, ORDER BY (with ``ASC()``/``DESC()`` modifiers; variable keys
compare lexical forms, and expression keys — ``DESC(STRLEN(?v))``,
arithmetic, CONCAT — compile with the BIND grammar), LIMIT and OFFSET,
``ASK`` queries (same body grammar,
one boolean ``ask`` column; all-constant bodies are legal for ASK), and
``CONSTRUCT { template } WHERE { body }`` and the template-free
``CONSTRUCT WHERE { bgp }`` shorthand (per-solution template
instantiation, OPTIONAL-unbound variables skip their triple, DISTINCT
graph output as (subj, pred, obj)), and ``DESCRIBE <iri> ...``
(subject-rows concise-bounded-description core).
Terms bind to their lexical forms; IRIs and
blank-node labels as stored (bnodes are ``_:...``). The reference's own
round-trip query — ``SELECT DISTINCT ?type FROM <g> WHERE {[] a ?type}``
(SparqlOnLoadedTest.java:111-127) — runs verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class Term:
    kind: str  # "var" | "iri" | "lit" | "alt" | "plus" (path predicates)
    value: str
    lang: str | None = None
    datatype: str | None = None
    #: property-path alternation ``p1|p2|…``: the member IRIs (kind="alt")
    alts: list[str] | None = None


_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]+)>", re.I)
_SELECT_RE = re.compile(r"SELECT\s+(DISTINCT\s+)?(.*?)\s+WHERE", re.I | re.S)
_WHERE_RE = re.compile(r"WHERE\s*\{(.*)\}", re.I | re.S)
_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)", re.I)
_OFFSET_RE = re.compile(r"\bOFFSET\s+(\d+)", re.I)
_ORDER_RE = re.compile(r"ORDER\s+BY\s+(.+?)(?:\bLIMIT\b|\bOFFSET\b|$)", re.I | re.S)
_IN_RE = re.compile(
    r"FILTER\s*\(\s*\?(\w+)\s+(NOT\s+)?IN\s*\(([^()]*)\)\s*\)", re.I
)
_FILTER_RE = re.compile(r"FILTER\s*\(\s*(\?\w+)\s*(=|!=|<=|>=|<|>)\s*(.+?)\s*\)", re.I)
_FFUNC_RE = re.compile(
    r"FILTER\s*\(\s*(REGEX|STRSTARTS|STRENDS|CONTAINS)\s*\(\s*(\?\w+)\s*,\s*(\S+?)\s*"
    r"(?:,\s*(\S+?)\s*)?\)\s*\)",
    re.I,
)
_TERM_RE = re.compile(
    r"""\?(?P<var>\w+)
      | <(?P<iri>[^>]+)>
      | (?P<pn>\w*:\w[\w.-]*)
      | "(?P<lit>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z-]+)|\^\^<(?P<dt>[^>]+)>|\^\^(?P<dtpn>\w*:\w[\w.-]*))?
      | (?P<a>\ba\b)
      | (?P<num>[+-]?\d+(?:\.\d\d*)?)
    """,
    re.X,
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _parse_term(tok: str, prefixes: dict[str, str]) -> Term:
    m = _TERM_RE.fullmatch(tok.strip())
    if not m:
        raise ValueError(f"unsupported SPARQL term: {tok!r}")
    if m.group("var"):
        return Term("var", m.group("var"))
    if m.group("iri"):
        return Term("iri", m.group("iri"))
    if m.group("a"):
        return Term("iri", _RDF_TYPE)
    if m.group("pn"):
        pfx, local = m.group("pn").split(":", 1)
        local = local.rstrip(".")  # "ex:Turn." — trailing pattern dot glued on
        if pfx not in prefixes:
            raise ValueError(f"undeclared prefix: {pfx}")
        return Term("iri", prefixes[pfx] + local)
    if m.group("num") is not None:
        n = m.group("num")
        xsd = "http://www.w3.org/2001/XMLSchema#"
        return Term("lit", n, datatype=xsd + ("decimal" if "." in n else "integer"))
    lit = m.group("lit").replace('\\"', '"').replace("\\\\", "\\")
    dt = m.group("dt")
    if m.group("dtpn"):
        pfx, local = m.group("dtpn").split(":", 1)
        if pfx not in prefixes:
            raise ValueError(f"undeclared prefix: {pfx}")
        dt = prefixes[pfx] + local.rstrip(".")
    return Term("lit", lit, lang=m.group("lang"), datatype=dt)


@dataclass
class OptGroup:
    """One OPTIONAL group: its own BGP, group-local FILTERs/BINDs, and
    NESTED OPTIONAL children (compiled recursively as LEFT JOIN subqueries —
    the SPARQL LeftJoin(A, LeftJoin(B, C)) shape)."""

    quads: list[tuple[Term, Term, Term, Term | None]]
    #: group-local comparison / string-function FILTERs — part of the
    #: LeftJoin condition (can unmatch the group, never remove the outer row)
    filters: list[tuple[str, str, Term]]
    #: group-local BIND(expr AS ?v) assignments, textual order
    binds: list[tuple[object, str]]
    children: list["OptGroup"]
    #: group-local boolean / expression FILTERs (_parse_bool ASTs) — same
    #: LeftJoin-condition placement as ``filters``
    bools: list[object]
    #: when the group body holds forms the OptGroup shape can't carry
    #: (UNION/VALUES/GRAPH/MINUS/EXISTS/subselects), the WHOLE group
    #: re-parses as a select-* sub-Query and LEFT JOINs with NULL-compatible
    #: conditions on every shared variable; the other fields are empty then
    subquery: "Query | None" = None


@dataclass
class Query:
    select: list[str]  # variable names, or [] for *
    distinct: bool
    patterns: list[tuple[Term, Term, Term, Term | None]]  # (s, p, o, graph)
    filters: list[tuple[str, str, Term]]  # (var, op, constant)
    order_by: list[tuple[str, bool]]  # (var, descending)
    limit: int | None
    from_graphs: list[str] | None = None  # FROM <g> dataset restriction
    #: FROM NAMED <g> dataset clauses: the named-graph set GRAPH patterns
    #: range over (constant GRAPH IRIs outside the set match nothing)
    from_named: list[str] | None = None
    offset: int | None = None
    #: OPTIONAL groups (possibly nested): each compiles to a LEFT JOIN of a
    #: per-group subquery onto the required part; a group's own children
    #: compile to LEFT JOINs INSIDE its subquery (LeftJoin nesting). FILTERs
    #: and BINDs inside a group live in its subquery — the SPARQL LeftJoin
    #: condition semantics (a failing filter unmatches the group, it does
    #: not eliminate the outer row)
    optionals: list[OptGroup] | None = None
    #: aggregate projections: (func, distinct, var-or-None-for-*, alias)
    aggs: list[tuple[str, bool, str | None, str]] | None = None
    group_by: list[str] | None = None
    #: whole-body UNION: each branch is a full sub-Query (SELECT * over the
    #: branch's group — FILTER/BIND/OPTIONAL/VALUES/subselects all legal
    #: inside). Multiset union; a variable unbound in a branch projects as
    #: NULL — SPARQL unbound. Aggregates/GROUP BY/HAVING on the outer query
    #: apply over the union's solution multiset.
    union_branches: list["Query"] | None = None
    #: UNION sequences JOINED with the rest of the body (``?s a ?t .
    #: { A } UNION { B }``): each is a select-* Query carrying only
    #: union_branches, compiled to a subquery and joined on shared variables
    #: with SPARQL compatibility (an unbound/NULL union-side value is
    #: compatible with anything; the merged binding is the bound one). Like
    #: OPTIONAL, these apply after the required part regardless of textual
    #: position.
    union_joins: list["Query"] | None = None
    #: VALUES inline data: (ordered vars, rows of constant Terms)
    values_groups: list[tuple[list[str], list[list[Term]]]] | None = None
    #: FILTER (NOT) EXISTS { BGP }: (negated, quads)
    exists_filters: list[tuple[bool, list[tuple[Term, Term, Term, Term | None]]]] | None = None
    #: MINUS { BGP } groups (anti-join on shared vars; no-op when disjoint)
    minus_groups: list[list[tuple[Term, Term, Term, Term | None]]] | None = None
    #: FILTER (NOT) EXISTS { complex body }: (negated, select-* sub-Query) —
    #: bodies holding more than a plain BGP (FILTER/OPTIONAL/VALUES/GRAPH/
    #: UNION/BIND/subselects/nested groups) re-parse whole and compile as a
    #: correlated semi/anti-join on the shared visible variables
    exists_subqueries: list[tuple[bool, "Query"]] | None = None
    #: MINUS { complex body }: select-* sub-Queries, SPARQL MINUS
    #: compatibility semantics on the shared visible variables
    minus_subqueries: list["Query"] | None = None
    #: FILTER(LANG/DATATYPE(?v) =/!= const): (func, var, op, constant)
    langdt_filters: list[tuple[str, str, str, Term]] | None = None
    #: FILTER(BOUND(?v)) / FILTER(!BOUND(?v)): (var, positive) — applied
    #: AFTER OPTIONAL left joins (the anti-join idiom)
    bound_filters: list[tuple[str, bool]] | None = None
    #: FILTER((!)isIRI/isBlank/isLiteral/isNumeric(?v)): (func, var,
    #: positive) — compiled onto the serving views' constant s_kind/o_kind
    #: columns (exact, the table split is by kind)
    kind_filters: list[tuple[str, str, bool]] | None = None
    #: FILTER((!)sameTerm(?a, ?b|term)): (var, var-or-constant-Term,
    #: positive) — lexical-form identity plus, when both sides are object
    #: bindings, lang-tag and datatype identity
    sameterm_filters: list[tuple[str, object, bool]] | None = None
    #: BIND(expr AS ?v) assignments in textual order (later ones may
    #: reference earlier ones): (expression AST, target variable)
    bind_exprs: list[tuple[object, str]] | None = None
    #: SELECT expressions in an AGGREGATE query (``(SUM(?x)/COUNT(?x) AS
    #: ?avg)``): inline aggregates were extracted into ``aggs`` under
    #: internal ``__agg<n>`` aliases at parse time, so each expression AST
    #: references only grouping keys and aggregate aliases; compiled as an
    #: outer SELECT wrapped around the grouped subquery
    agg_binds: list[tuple[object, str]] | None = None
    #: CONSTRUCT template triples (var/iri/lit terms only); the result is the
    #: DISTINCT instantiated (subj, pred, obj) set — an RDF graph
    construct: list[tuple[Term, Term, Term]] | None = None
    #: nested { SELECT ... } subqueries (one level): each joins the outer
    #: pattern on its shared projected variables
    subselects: list["Query"] | None = None
    #: HAVING conjuncts (``&&``-joined), each ("alias", aggAlias, op, number)
    #: for the projected-alias form or ("agg", func, distinct,
    #: var-or-None-for-*, op, number) for the direct aggregate form — the
    #: latter compiles the aggregate expression straight into the HAVING
    #: clause, no alias/projection required
    having: list[tuple] | None = None
    #: generalized expression FILTERs: (lhs AST, op, rhs AST) compiled with
    #: the BIND expression compiler (numeric coercion when either side is
    #: numeric-valued)
    expr_filters: list[tuple[object, str, object]] | None = None
    #: boolean FILTERs with connectives: _parse_bool ASTs ("or"/"and"/"not"
    #: over comparison and string-function atoms), compiled by _bool_sql
    bool_filters: list[object] | None = None
    #: DESCRIBE <iri> ...: emit every stored quad whose SUBJECT is one of the
    #: listed IRIs (the concise-bounded-description core, one hop, no bnode
    #: closure — the store's bnode ids are stable content hashes, so the
    #: caller can follow them with further DESCRIBEs)
    describe: list[str] | None = None
    #: DESCRIBE ?v [...] WHERE { body }: the body compiled as a DISTINCT
    #: SELECT over the described variables; the outer query emits every quad
    #: whose subject appears in any of those projected columns
    describe_body: "Query | None" = None
    #: ASK query: compile the same body, return one boolean column ``ask``
    ask: bool = False


_AGG_RE = re.compile(
    r"\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE)\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)\s+AS\s+\?(\w+)\s*\)",
    re.I,
)
_GCONCAT_RE = re.compile(
    r"\(\s*GROUP_CONCAT\s*\(\s*(DISTINCT\s+)?(\?\w+)\s*"
    r'(?:;\s*SEPARATOR\s*=\s*"((?:[^"\\]|\\.)*)"\s*)?\)\s+AS\s+\?(\w+)\s*\)',
    re.I,
)
#: aggregate call INSIDE a SELECT expression (``(SUM(?x)/COUNT(?x) AS ?v)``)
#: — extracted into internal ``__agg<n>`` projections at parse time
_INLINE_AGG_RE = re.compile(
    r"\b(COUNT|SUM|MIN|MAX|AVG|SAMPLE)\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)", re.I
)
_GROUPBY_RE = re.compile(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", re.I)
_HAVING_ALIAS_RE = re.compile(r"\?(\w+)\s*(=|!=|<=|>=|<|>)\s*(\d+(?:\.\d+)?)")
#: the direct aggregate form ``COUNT(?v) > 2`` — no alias needed
_HAVING_AGG_RE = re.compile(
    r"(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)\s*"
    r"(=|!=|<=|>=|<|>)\s*(\d+(?:\.\d+)?)",
    re.I,
)
_FROM_RE = re.compile(r"\bFROM\s+(NAMED\s+)?(<([^>]+)>|\w*:\w[\w.-]*)", re.I)


def _parse_having(tail: str, aggs, group_by) -> list[tuple] | None:
    """Parse the HAVING clause from the query tail into a conjunct list.
    Each ``&&``-joined conjunct is the alias form ``?aggAlias <op> number``,
    the direct aggregate form ``COUNT(DISTINCT? ?v|*) <op> number``, or a
    general EXPRESSION comparison over aggregate calls and grouping keys
    (``SUM(?x)/COUNT(?x) > 2``) — aggregate calls inside the expression
    become internal ``__hvagg<n>`` projections (appended to ``aggs``, the
    same desugar SELECT expressions use) and the conjunct compiles as a
    post-grouping filter wrapper. HAVING bodies carry only numbers/strings
    through the BIND grammar, so balanced-paren extraction needs no literal
    masking."""
    m = re.search(r"\bHAVING\s*\(", tail, re.I)
    if m is None:
        if re.search(r"\bHAVING\b", tail, re.I):
            raise ValueError("HAVING needs a parenthesized condition")
        return None
    depth, j = 1, m.end()
    while j < len(tail) and depth:
        if tail[j] == "(":
            depth += 1
        elif tail[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ValueError("unbalanced parentheses in HAVING")
    conds: list[tuple] = []
    hv_n = [0]

    def _inline_hv(txt: str) -> str:
        def rep(am: re.Match) -> str:
            func = am.group(1).upper()
            if am.group(3) == "*" and func != "COUNT":
                raise ValueError(f"{func}(*) is not valid SPARQL")
            hv_n[0] += 1
            alias = f"__hvagg{hv_n[0]}"
            v = None if am.group(3) == "*" else am.group(3)[1:]
            aggs.append((func, bool(am.group(2)), v, alias))
            return f" ?{alias} "

        return _INLINE_AGG_RE.sub(rep, txt)

    for part in _split_top(tail[m.end() : j - 1], "&&"):
        part = part.strip()
        hv = _HAVING_ALIAS_RE.fullmatch(part)
        if hv:
            if not aggs:
                raise ValueError("HAVING without an aggregate projection")
            if hv.group(1) not in {a for _, _, _, a in aggs}:
                raise ValueError(
                    f"HAVING references unknown aggregate alias ?{hv.group(1)}"
                )
            conds.append(("alias", hv.group(1), hv.group(2), hv.group(3)))
            continue
        ha = _HAVING_AGG_RE.fullmatch(part)
        if ha:
            func = ha.group(1).upper()
            varg = ha.group(3)
            var = None if varg == "*" else varg[1:]
            if var is None and func != "COUNT":
                raise ValueError(f"{func}(*) is not a valid aggregate")
            if not (aggs or group_by):
                raise ValueError(
                    "HAVING(AGG(...)) needs a GROUP BY or aggregate projection"
                )
            conds.append(
                ("agg", func, bool(ha.group(2)), var, ha.group(4), ha.group(5))
            )
            continue
        # general expression conjunct: desugar aggregate calls to internal
        # projections, split on the depth-0 comparison, parse both sides
        # with the BIND grammar — compiled by the post-grouping wrapper
        cut = _top_cmp(part)
        if cut is None:
            raise ValueError(
                "unsupported HAVING form (supported: ?aggAlias <op> number, "
                "AGG(?var) <op> number, and expression comparisons over "
                f"aggregates, &&-joined): {part!r}"
            )
        pos, opc = cut
        if not (aggs or group_by):
            raise ValueError(
                "HAVING(expression) needs a GROUP BY or aggregate projection"
            )
        conds.append(
            (
                "exprcmp",
                _parse_expr(_inline_hv(part[:pos])),
                opc,
                _parse_expr(_inline_hv(part[pos + len(opc) :])),
            )
        )
    return conds
_ANON_RE = re.compile(r"\[\s*\]")
_BNODE_RE = re.compile(r"_:(\w+)")
_VALUES_RE = re.compile(r"VALUES\s+(\?\w+|\(\s*(?:\?\w+\s*)+\))\s*\{([^{}]*)\}", re.I)
_EXISTS_RE = re.compile(r"FILTER\s+(NOT\s+)?EXISTS\s*\{([^{}]*)\}", re.I)
_MINUS_RE = re.compile(r"MINUS\s*\{([^{}]*)\}", re.I)
_BOUND_RE = re.compile(r"FILTER\s*\(\s*(!)?\s*BOUND\s*\(\s*\?(\w+)\s*\)\s*\)", re.I)
_SAMETERM_RE = re.compile(
    r"FILTER\s*\(\s*(!)?\s*sameTerm\s*\(\s*\?(\w+)\s*,\s*(\?\w+|\S+?)\s*\)\s*\)",
    re.I,
)
_KINDF_RE = re.compile(
    r"FILTER\s*\(\s*(!)?\s*(isIRI|isURI|isBlank|isLiteral|isNumeric)\s*"
    r"\(\s*\?(\w+)\s*\)\s*\)",
    re.I,
)
_LANGMATCHES_RE = re.compile(
    r"FILTER\s*\(\s*LANGMATCHES\s*\(\s*LANG\s*\(\s*\?(\w+)\s*\)\s*,\s*(\S+?)\s*\)\s*\)",
    re.I,
)
_LANGDT_RE = re.compile(
    r"FILTER\s*\(\s*(LANG|DATATYPE)\s*\(\s*\?(\w+)\s*\)\s*(=|!=)\s*(\S+?)\s*\)", re.I
)
_QUOTED_RE = re.compile(r'"(?:[^"\\]|\\.)*"')


def _mask_literals(text: str):
    """Swap every quoted literal for an inert placeholder so the structural
    rewrites (anonymous-bnode/[]/_:label substitution, OPTIONAL/FILTER group
    regexes) can never match INSIDE literal constants — a literal "_:b1" or
    "[]" or "}" is data, not syntax. Returns (masked, restore) where restore
    puts the original literals back into any substring of the masked text."""
    stash: list[str] = []

    def grab(m: re.Match) -> str:
        stash.append(m.group(0))
        return f"\x00{len(stash) - 1}\x00"

    masked = _QUOTED_RE.sub(grab, text)

    def restore(s: str) -> str:
        return re.sub(r"\x00(\d+)\x00", lambda m: stash[int(m.group(1))], s)

    return masked, restore


def _path_atom(tok: str, prefixes: dict[str, str]) -> str:
    """One atom inside a path operator expression — must be an IRI."""
    t = _parse_term(tok, prefixes)
    if t.kind != "iri":
        raise ValueError(f"property-path atoms must be IRIs, got: {tok!r}")
    return t.value


#: gap between an object and the next subject: whitespace / "." separators
_SEP_GAP = re.compile(r"[\s.]*")
#: gap between a subject (or "/") and the first atom of a step: may open an
#: alternation paren and carry the step's inverse marker; a second ``^``
#: AFTER the ``!`` / paren marks the FIRST MEMBER inverse (``!^p``, ``(^a|b)``)
_PRE_GAP = re.compile(r"\s*(\^)?\s*(!)?\s*(\()?\s*(\^)?\s*")
#: gap after a step's last atom: optional close-paren, optional closure
#: modifier (``+`` one-or-more, ``*`` zero-or-more, ``?`` zero-or-one), then
#: either end-of-path (object follows) or "/" + the next step's prefix
_POST_GAP = re.compile(
    r"\s*(\))?\s*([+*?])?\s*(?:(/)\s*(\^)?\s*(!)?\s*(\()?\s*(\^)?\s*)?"
)
#: gap between two atoms of one alternation: "|" + optional member inverse
_ALT_GAP = re.compile(r"\s*\|\s*(\^)?\s*")
#: gap after an object continuing the same subject+predicate: "," object list
_COMMA_GAP = re.compile(r"\s*,\s*")
#: gap after an object continuing the same subject: ";" + next step's prefix
_SEMI_GAP = re.compile(r"\s*;\s*(\^)?\s*(!)?\s*(\()?\s*(\^)?\s*")
#: innermost non-empty bracketed property list ``[ p o ; ... ]``
_PROPLIST_RE = re.compile(r"\[([^\[\]]+)\]")

_PATH_KIND = {"+": "plus", "*": "star", "?": "qmark"}


def _expand_proplists(inner: str, fresh) -> str:
    """Desugar bracketed property lists: every ``[ p o ; q z ]`` becomes a
    fresh never-projected variable in place, with ``?fresh p o ; q z`` appended
    to the group body as ordinary patterns (innermost-first, so nesting
    resolves naturally). Literals are masked during the scan — a "[" inside a
    quoted constant is data. A property list as a FULL statement (``[ p o ] .``
    with no outer triple) leaves a dangling token and fails tokenization
    loudly rather than silently dropping its patterns."""
    if "[" not in inner:
        return inner
    masked, restore = _mask_literals(inner)
    extra: list[str] = []

    def repl(m: re.Match) -> str:
        v = fresh()
        extra.append(f"?{v.value} {m.group(1)}")
        return f" ?{v.value} "

    while _PROPLIST_RE.search(masked):
        masked = _PROPLIST_RE.sub(repl, masked)
    if re.search(r"[\[\]]", masked):
        raise ValueError(f"unbalanced brackets in group body: {restore(masked)!r}")
    # "." separators tolerate repetition (_SEP_GAP is [\s.]*) — join blindly
    return restore(" . ".join([masked] + extra))


#: parenthesized SEQUENCE closure ``(p/q)+`` (optionally ``^``-inverted);
#: the inner part must hold at least one ``/`` and no alternation members
#: the closure ``?`` must not swallow a following VARIABLE's question mark:
#: ``(p/q)? ?x`` has a qmark closure, ``(p/q) ?x`` does not
_SEQCLO_RE = re.compile(r"(\^?)\s*\(\s*([^()|]*?/[^()|]*?)\s*\)\s*([+*]|\?(?!\w))")
#: plain parenthesized sequence ``(p/q)`` with NO closure — the parens are
#: redundant grouping, stripped in place
_SEQPLAIN_RE = re.compile(
    r"\(\s*([^()|]*?/[^()|]*?)\s*\)(?!\s*([+*]|\?(?!\w)))"
)

_SEQ_MARK = "urn:x-seqpath:"


def _expand_seq_closures(inner: str) -> tuple[str, dict[str, tuple[str, list[str]]]]:
    """Desugar parenthesized sequence paths. ``(p/q)+`` / ``(p/q)*`` /
    ``(p/q)?`` become marker IRI atoms ``<urn:x-seqpath:K>`` (a leading ``^``
    stays on the marker — the closure walked backwards), with the returned
    dict mapping marker value -> ("plus"|"star"|"qmark", raw member tokens);
    :func:`_triples` rewrites the marker predicates into kind="seq*" Terms.
    Redundant grouping parens ``(p/q)`` with no closure are stripped. Member
    tokens may not carry their own operators (``(p+/q)*``, ``(^p/q)+``) and a
    sequence closure cannot be negated — each rejects loudly."""
    if "/" not in inner or "(" not in inner:
        return inner, {}
    masked, restore = _mask_literals(inner)
    seqs: dict[str, tuple[str, list[str]]] = {}

    def repl(m: re.Match) -> str:
        before = masked[: m.start()].rstrip()
        if before.endswith("!"):
            raise ValueError(
                "negated sequence closures (!(p/q)+) are not supported"
            )
        body = restore(m.group(2))
        if re.search(r"[+*?^!\[\]]", body):
            raise ValueError(
                f"unsupported path form inside sequence closure: ({body})"
            )
        members = [t.strip() for t in body.split("/")]
        if any(not t for t in members):
            raise ValueError(f"empty step in sequence closure: ({body})")
        key = f"{_SEQ_MARK}{len(seqs)}"
        seqs[key] = (_PATH_KIND[m.group(3)], members)
        return f" {m.group(1)}<{key}> "

    # match-by-match so the "negated?" look-behind sees the current text
    while True:
        m = _SEQCLO_RE.search(masked)
        if not m:
            break
        masked = masked[: m.start()] + repl(m) + masked[m.end() :]
    def strip_plain(m: re.Match) -> str:
        if masked[: m.start()].rstrip().endswith(("^", "!")):
            # ^(p/q) would need member-wise reversal, !(p/q) is not SPARQL —
            # neither is plain grouping, so refuse rather than mis-strip
            raise ValueError(
                f"unsupported operator on a plain sequence group: {m.group(0)!r}"
            )
        return f" {m.group(1)} "

    masked = _SEQPLAIN_RE.sub(strip_plain, masked)
    return restore(masked), seqs


def _triples(
    inner: str, prefixes: dict[str, str], fresh
) -> list[tuple[Term, Term, Term]]:
    """Tokenize a (brace-free) group body into (s, p, o) triples. Patterns
    cannot be split on "." (IRIs and prefixed names contain dots): tokenize
    the whole body in order and inspect the NON-TERM text between consecutive
    tokens — "." separates patterns, ";" continues the subject with a new
    predicate-object list, "," continues the subject+path with another
    object, and the property-path operators ``/`` (sequence), ``|``
    (alternation), ``^`` (inverse) and the postfix closures ``+``/``*``/``?``
    live in those gaps too. Bracketed property lists ``[ p o ]`` desugar to
    fresh variables first (:func:`_expand_proplists`). Sequences desugar to
    chained patterns over fresh ``?__path{n}`` variables (``fresh``), inverse
    steps swap subject/object (including over closures: ``^p+`` is the
    closure walked backwards), alternations become a kind="alt" predicate
    Term (compiled to ``pred IN``) and closure modifiers become
    kind="plus"/"star"/"qmark" Terms (compiled to recursive-CTE closures;
    ``(a|b)+`` closes over the member set). Operators around variable
    predicates are rejected loudly."""
    inner = _expand_proplists(inner, fresh)
    inner, seqs = _expand_seq_closures(inner)
    toks = list(_TERM_RE.finditer(inner))
    if not toks:
        raise ValueError(f"unsupported WHERE body (need s p o triples): {inner!r}")
    if not _SEP_GAP.fullmatch(inner[: toks[0].start()]):
        raise ValueError(f"unsupported syntax before first term: {inner!r}")

    n = len(toks)

    def gap(j: int) -> str:
        a = toks[j].end()
        b = toks[j + 1].start() if j + 1 < n else len(inner)
        return inner[a:b]

    def parse_steps(j: int, inv: bool, neg: bool, opened: bool, m_inv: bool):
        """Parse one path (toks[j] = first atom). Returns (steps, last_idx)
        where steps = [(inverse, negated, [(member_inverse, atom token)],
        modifier)] — member inverse marks ``^`` INSIDE an alternation or
        negated set (``(a|^b)``, ``!^p``), step inverse the ``^`` outside."""
        steps: list[tuple[bool, bool, list[tuple[bool, str]], str]] = []
        while True:
            if j >= n:
                raise ValueError("dangling pattern (need s p o triples)")
            atoms = [(m_inv, toks[j].group(0))]
            while j + 1 < n:
                am = _ALT_GAP.fullmatch(gap(j))
                if not am:
                    break
                j += 1
                atoms.append((bool(am.group(1)), toks[j].group(0)))
            post = _POST_GAP.fullmatch(gap(j))
            if not post:
                raise ValueError(f"unsupported path syntax: {gap(j)!r}")
            # parentheses must pair WITHIN one step — a stray open or close
            # is a typo'd alternation, not something to silently accept
            if opened != bool(post.group(1)):
                raise ValueError(
                    f"unbalanced parentheses in property path near: {gap(j)!r}"
                )
            steps.append((inv, neg, atoms, post.group(2) or ""))
            if not post.group(3):  # no "/": path ends, object follows
                return steps, j
            inv, neg = bool(post.group(4)), bool(post.group(5))
            opened, m_inv = bool(post.group(6)), bool(post.group(7))
            j += 1

    out: list[tuple[Term, Term, Term]] = []

    def emit(subj: Term, steps, obj: Term) -> None:
        """Desugar one (subject, path steps, object) chain into patterns —
        re-invoked per object of a "," list, so each object gets its own
        fresh intermediates (the SPARQL objectList semantics)."""
        cur = subj
        for k, (s_inv, s_neg, atoms, s_mod) in enumerate(steps):
            tgt = obj if k == len(steps) - 1 else fresh()
            # fold the step-level ^ into each member (inv distributes over
            # alternation and over negated sets: ^!(a) == !(^a))
            membs = [(mi != s_inv, tok) for mi, tok in atoms]
            any_inv = any(mi for mi, _ in membs)
            swap = False  # emit reversed instead of via member flags
            if s_neg:
                # negated property set !p / !(p|^q): members split by
                # direction into a two-branch CTE (the spec's
                # alt(NPS(fwd), inv(NPS(bwd))) translation)
                if s_mod:
                    # closure over a negated set, (!(a|b))+ / !p* / !p? — the
                    # closed-over edge set is pred NOT IN (members); inverse
                    # members inside a CLOSED negated set stay rejected
                    if any_inv:
                        raise ValueError(
                            "closures over negated sets with ^ members "
                            "((!(a|^b))+) are not supported"
                        )
                    p = Term(
                        "n" + _PATH_KIND[s_mod],
                        "",
                        alts=[_path_atom(t, prefixes) for _, t in membs],
                    )
                else:
                    p = Term(
                        "nalt",
                        "",
                        alts=[
                            ("^" if mi else "") + _path_atom(t, prefixes)
                            for mi, t in membs
                        ],
                    )
            elif s_mod:
                # closure: single member rides .value, alternation rides .alts
                kind = _PATH_KIND[s_mod]
                if len(membs) > 1:
                    if any_inv and not all(mi for mi, _ in membs):
                        # MIXED-direction alternation closure (a|^b)+ —
                        # members keep their ^ markers; the compiler closes
                        # over the two-branch (fwd ∪ reversed) edge union
                        p = Term(
                            kind,
                            "",
                            alts=[
                                ("^" if mi else "") + _path_atom(t, prefixes)
                                for mi, t in membs
                            ],
                        )
                    else:
                        # uniformly inverse members hoist: ^(a|b)+ == the
                        # (a|b)+ closure walked backwards
                        p = Term(
                            kind, "", alts=[_path_atom(t, prefixes) for _, t in membs]
                        )
                        swap = any_inv
                else:
                    # ^p+ == the closure walked backwards: emit reversed
                    p = Term(kind, _path_atom(membs[0][1], prefixes))
                    swap = membs[0][0]
            elif len(membs) > 1:
                p = Term(
                    "alt",
                    "",
                    alts=[
                        ("^" if mi else "") + _path_atom(t, prefixes)
                        for mi, t in membs
                    ],
                )
            elif membs[0][0] or len(steps) > 1:
                p = Term("iri", _path_atom(membs[0][1], prefixes))
                swap = membs[0][0]
            else:
                # plain single-step predicate: any term kind (var joins)
                p = _parse_term(membs[0][1], prefixes)
            out.append((tgt, p, cur) if swap else (cur, p, tgt))
            cur = tgt

    i = 0
    while i < n:
        subj = _parse_term(toks[i].group(0), prefixes)
        pre = _PRE_GAP.fullmatch(gap(i))
        if not pre:
            raise ValueError(f"unsupported syntax after subject: {gap(i)!r}")
        inv, neg = bool(pre.group(1)), bool(pre.group(2))
        opened, m_inv = bool(pre.group(3)), bool(pre.group(4))
        j = i + 1
        while True:  # predicate-object lists for this subject (";")
            steps, j = parse_steps(j, inv, neg, opened, m_inv)
            while True:  # object list for this path (",")
                if j + 1 >= n:
                    raise ValueError("dangling pattern (need s p o triples)")
                j += 1
                obj = _parse_term(toks[j].group(0), prefixes)
                emit(subj, steps, obj)
                if j + 1 < n and _COMMA_GAP.fullmatch(gap(j)):
                    continue
                break
            sm = _SEMI_GAP.fullmatch(gap(j)) if j + 1 < n else None
            if sm:
                inv, neg = bool(sm.group(1)), bool(sm.group(2))
                opened, m_inv = bool(sm.group(3)), bool(sm.group(4))
                j += 1
                continue
            break
        if not _SEP_GAP.fullmatch(gap(j)):
            raise ValueError(f"unsupported syntax after object: {gap(j)!r}")
        i = j + 1
    if seqs:
        # marker predicates placed by _expand_seq_closures -> seq-closure
        # Terms (member atoms resolve against the prologue's prefixes here)
        def unmark(t3):
            s, p, o = t3
            if p.kind == "iri" and p.value in seqs:
                kind, members = seqs[p.value]
                p = Term(
                    "seq" + kind,
                    "",
                    alts=[_path_atom(t, prefixes) for t in members],
                )
            return (s, p, o)

        out = [unmark(t3) for t3 in out]
    return out


def _quads(
    inner: str, prefixes: dict[str, str], g: Term | None, fresh
) -> list[tuple[Term, Term, Term, Term | None]]:
    """Group body -> (s, p, o, graph-term) quads. g=None means the pattern
    ranges over the whole store (the serving views union all graphs)."""
    return [(s, p, o, g) for s, p, o in _triples(inner, prefixes, fresh)]


#: expression tokens for BIND(expr AS ?v)
_ETOK_RE = re.compile(
    r"""\s*(?: (?P<var>\?\w+)
             | (?P<str>"(?:[^"\\]|\\.)*")
             | (?P<num>\d+(?:\.\d+)?)
             | (?P<iri><[^<>\s]*>)
             | (?P<name>[A-Za-z_]\w*)
             | (?P<op><=|>=|!=|[-+*/(),=<>])
         )""",
    re.X,
)

#: BIND functions -> (SQL function, numeric result). STR is the identity over
#: lexical forms (the store binds lexical forms already), cast for safety.
_BIND_FUNCS = {
    "CONCAT": ("concat", False),
    "STR": ("CAST({} AS VARCHAR)", False),
    "UCASE": ("upper", False),
    "LCASE": ("lower", False),
    "STRLEN": ("length", True),
    "SUBSTR": ("substr", False),
    # REPLACE / STRBEFORE / STRAFTER are special-cased in _expr_sql: SPARQL
    # REPLACE is regex-based and replaces ALL occurrences (DuckDB needs the
    # 'g' flag); STRBEFORE/STRAFTER return "" when the needle is absent
    "REPLACE": ("", False),
    "STRBEFORE": ("", False),
    "STRAFTER": ("", False),
    "ABS": ("abs(TRY_CAST({} AS DOUBLE))", True),
    "ROUND": ("round(TRY_CAST({} AS DOUBLE))", True),
    "CEIL": ("ceil(TRY_CAST({} AS DOUBLE))", True),
    "FLOOR": ("floor(TRY_CAST({} AS DOUBLE))", True),
    # COALESCE = first non-error (here: non-NULL) argument; IF / LANG /
    # DATATYPE are special-cased in _expr_sql (IF compiles to CASE WHEN and
    # accepts an ``expr <op> expr`` comparison as its condition; LANG and
    # DATATYPE read the stored o_lang / o_dt columns of an object binding,
    # same caveats as the FILTER forms)
    "COALESCE": ("coalesce", False),
    "IF": ("", False),
    "LANG": ("", False),
    "DATATYPE": ("", False),
    "MD5": ("md5", False),
    "SHA256": ("sha256", False),
    # SHA1/384/512 have no native DuckDB kernel — they compile to the
    # hashlib-backed scalar UDFs that register_udfs() installs on the
    # serving connection (lowercase hex, matching md5/sha256)
    "SHA1": ("sparql_sha1", False),
    "SHA384": ("sparql_sha384", False),
    "SHA512": ("sparql_sha512", False),
    # ENCODE_FOR_URI / TZ are special-cased in _expr_sql: percent-encoding
    # expands to a pure-SQL byte-list fold (oracle-expressible, no UDF);
    # TZ extracts the timezone suffix of the stored dateTime lexical form
    # ("" when absent — the SPARQL simple-literal result)
    "ENCODE_FOR_URI": ("", False),
    "TZ": ("", False),
    # the serving model stores IRIs by their lexical form, so constructing
    # an IRI from a string is the identity on that form (no re-validation)
    "IRI": ("({})", False),
    "URI": ("({})", False),
    # nondeterministic builtins (special-cased in _expr_sql; no oracle by
    # value — serving-side only): UUID/STRUUID mint fresh ids per row, RAND
    # is uniform [0,1), NOW is the query-time dateTime lexical
    "UUID": ("", False),
    "STRUUID": ("", False),
    "RAND": ("", True),
    "NOW": ("", False),
    # BNODE() mints a fresh label per row; BNODE(str) derives a stable label
    # from the string (same arg -> same label). STRLANG/STRDT return the
    # plain lexical form of their first argument — the store binds lexical
    # forms, so the tag/datatype annotation is not carried into the value
    # (LANG()/DATATYPE() over a STRLANG/STRDT result will NOT see it)
    "BNODE": ("", False),
    "STRLANG": ("", False),
    "STRDT": ("", False),
    # xsd:dateTime / xsd:date component accessors — operate on the lexical
    # form (a non-castable lexical yields NULL, the SPARQL error)
    "YEAR": ("year(TRY_CAST({} AS TIMESTAMP))", True),
    "MONTH": ("month(TRY_CAST({} AS TIMESTAMP))", True),
    "DAY": ("day(TRY_CAST({} AS TIMESTAMP))", True),
    "HOURS": ("hour(TRY_CAST({} AS TIMESTAMP))", True),
    "MINUTES": ("minute(TRY_CAST({} AS TIMESTAMP))", True),
    "SECONDS": ("second(TRY_CAST({} AS TIMESTAMP))", True),
}


def _parse_expr(src: str):
    """BIND expression -> AST tuples. Grammar: additive over multiplicative
    over primaries; primaries are variables, string literals, numbers,
    function calls (CONCAT/STR/UCASE/LCASE/STRLEN/SUBSTR/REPLACE) and parenthesized
    subexpressions. Returns nodes ("var", name) | ("str", text) |
    ("num", text) | ("bin", op, l, r) | ("func", NAME, [args])."""
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        if src[pos:].strip() == "":
            break
        m = _ETOK_RE.match(src, pos)
        if not m:
            raise ValueError(f"unsupported BIND expression syntax at: {src[pos:]!r}")
        pos = m.end()
        for k in ("var", "str", "num", "iri", "name", "op"):
            if m.group(k) is not None:
                toks.append((k, m.group(k)))
                break
    i = [0]

    def peek():
        return toks[i[0]] if i[0] < len(toks) else (None, None)

    def eat(kind=None, val=None):
        k, v = peek()
        if k is None or (kind and k != kind) or (val and v != val):
            raise ValueError(f"malformed BIND expression: {src!r}")
        i[0] += 1
        return v

    def prim():
        k, v = peek()
        if k == "var":
            eat()
            return ("var", v[1:])
        if k == "str":
            eat()
            return ("str", v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "num":
            eat()
            return ("num", v)
        if k == "iri":
            # an IRI term in expression position (STRDT datatype, IRI
            # comparison) evaluates to its lexical form — the store's
            # representation of IRIs
            eat()
            return ("str", v[1:-1])
        if k == "name":
            name = eat().upper()
            if name not in _BIND_FUNCS:
                raise ValueError(f"unsupported BIND function: {name}")
            eat("op", "(")
            args = []
            if peek() != ("op", ")"):  # zero-arg builtins: UUID()/NOW()/...
                args.append(cmpexpr())
                while peek() == ("op", ","):
                    eat()
                    args.append(cmpexpr())
            eat("op", ")")
            return ("func", name, args)
        if k == "op" and v == "(":
            eat()
            node = add()
            eat("op", ")")
            return node
        raise ValueError(f"malformed BIND expression: {src!r}")

    def mul():
        node = prim()
        while peek()[0] == "op" and peek()[1] in "*/":
            op = eat()
            node = ("bin", op, node, prim())
        return node

    def add():
        node = mul()
        while peek()[0] == "op" and peek()[1] in "+-":
            op = eat()
            node = ("bin", op, node, mul())
        return node

    def cmpexpr():
        # a function ARGUMENT may be a comparison (IF's condition); the
        # top-level expression stays additive — FILTER splits its own
        # comparison before reaching this parser
        node = add()
        if peek()[0] == "op" and peek()[1] in ("=", "!=", "<", "<=", ">", ">="):
            op = eat()
            node = ("cmpe", node, op, add())
        return node

    node = add()
    if i[0] != len(toks):
        raise ValueError(f"trailing tokens in BIND expression: {src!r}")
    return node


def _expr_sql(node, binds: dict[str, str]) -> str:
    """BIND AST -> SQL over the bound columns. Arithmetic coerces variable /
    string operands with TRY_CAST(.. AS DOUBLE) (non-numeric lexical forms
    become NULL — the SPARQL type-error-skipping behavior)."""
    kind = node[0]
    if kind == "var":
        if node[1] not in binds:
            raise ValueError(f"BIND over unbound variable ?{node[1]}")
        return binds[node[1]]
    if kind == "str":
        return _q(node[1])
    if kind == "num":
        return node[1]
    if kind == "bin":
        _, op, l, r = node

        def num(n):
            s = _expr_sql(n, binds)
            if n[0] == "num" or (n[0] in ("bin", "func") and _expr_numeric(n)):
                return s
            return f"TRY_CAST({s} AS DOUBLE)"

        return f"({num(l)} {op} {num(r)})"
    if kind == "cmpe":
        _, l, op, r = node
        return f"({_cmp_sql(l, op, r, binds)})"
    _, name, args = node
    if name == "IF":
        if len(args) != 3:
            raise ValueError("IF takes exactly three arguments")
        c, t, e = (_expr_sql(a, binds) for a in args)
        # an ERROR (NULL) condition must propagate as error (stay NULL),
        # not silently pick the else branch — hence the explicit NOT arm
        return f"(CASE WHEN {c} THEN {t} WHEN NOT ({c}) THEN {e} END)"
    if name in ("LANG", "DATATYPE"):
        # read the stored o_lang / o_dt columns of the variable's binding
        # pattern — same mechanics and caveats as the FILTER forms (an
        # IRI/bnode binding behaves like a plain literal here)
        if len(args) != 1 or args[0][0] != "var":
            raise ValueError(f"{name} takes exactly one variable argument")
        col = binds.get(args[0][1])
        if col is None:
            raise ValueError(f"{name} on unbound variable ?{args[0][1]}")
        if not col.endswith(".obj"):
            raise ValueError(f"{name}(?{args[0][1]}) needs an object binding")
        a = col[: -len(".obj")]
        if name == "LANG":
            return f"coalesce({a}.o_lang, '')"
        xsd_string = "http://www.w3.org/2001/XMLSchema#string"
        rdf_langstring = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
        return (
            f"coalesce({a}.o_dt, CASE WHEN {a}.o_lang IS NOT NULL "
            f"THEN {_q(rdf_langstring)} ELSE {_q(xsd_string)} END)"
        )
    sql_args = [_expr_sql(a, binds) for a in args]
    if name in ("UUID", "STRUUID", "RAND", "NOW"):
        if sql_args:
            raise ValueError(f"{name} takes no arguments")
        return {
            "UUID": "('urn:uuid:' || CAST(uuid() AS VARCHAR))",
            "STRUUID": "CAST(uuid() AS VARCHAR)",
            "RAND": "random()",
            "NOW": "strftime(CAST(now() AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S')",
        }[name]
    if name == "BNODE":
        if len(sql_args) > 1:
            raise ValueError("BNODE takes zero or one argument")
        if not sql_args:
            return "('_:' || CAST(uuid() AS VARCHAR))"
        return f"('_:b' || md5({sql_args[0]}))"
    if name in ("STRLANG", "STRDT"):
        if len(sql_args) != 2:
            raise ValueError(f"{name} takes exactly two arguments")
        return f"({sql_args[0]})"
    if name == "ENCODE_FOR_URI":
        if len(sql_args) != 1:
            raise ValueError("ENCODE_FOR_URI takes exactly one argument")
        # RFC 3986: unreserved chars [A-Za-z0-9-._~] pass through, every
        # other UTF-8 BYTE percent-encodes (non-ASCII is multi-byte, so the
        # byte-level walk is exactly the spec's behavior). The byte list
        # comes from the uppercase hex of the utf-8 encoding — pure SQL, so
        # the expression works on ANY DuckDB connection (oracles included).
        hx = f"hex(encode({sql_args[0]}))"
        byte = (
            f"strpos('123456789ABCDEF', substr({hx}, 2*i + 1, 1)) * 16 "
            f"+ strpos('123456789ABCDEF', substr({hx}, 2*i + 2, 1))"
        )
        enc = (
            "CASE WHEN (b BETWEEN 48 AND 57) OR (b BETWEEN 65 AND 90) "
            "OR (b BETWEEN 97 AND 122) OR b IN (45, 46, 95, 126) "
            "THEN chr(CAST(b AS INTEGER)) "
            "ELSE '%' || substr('0123456789ABCDEF', b // 16 + 1, 1) "
            "|| substr('0123456789ABCDEF', b % 16 + 1, 1) END"
        )
        return (
            f"coalesce(list_aggregate(list_transform("
            f"list_transform(range(0, length({hx}) // 2), i -> {byte}), "
            f"b -> {enc}), 'string_agg', ''), '')"
        )
    if name == "TZ":
        if len(sql_args) != 1:
            raise ValueError("TZ takes exactly one argument")
        return (
            f"coalesce(regexp_extract({sql_args[0]}, "
            f"'(Z|[+-][0-9][0-9]:[0-9][0-9])$', 1), '')"
        )
    if name == "REPLACE":
        if len(sql_args) != 3:
            raise ValueError("REPLACE takes exactly three arguments")
        return f"regexp_replace({sql_args[0]}, {sql_args[1]}, {sql_args[2]}, 'g')"
    if name in ("STRBEFORE", "STRAFTER"):
        if len(sql_args) != 2:
            raise ValueError(f"{name} takes exactly two arguments")
        s_, t_ = sql_args
        pos = f"position({t_} IN {s_})"
        if name == "STRBEFORE":
            return f"(CASE WHEN {pos} > 0 THEN substr({s_}, 1, {pos} - 1) ELSE '' END)"
        return (
            f"(CASE WHEN {pos} > 0 "
            f"THEN substr({s_}, {pos} + length({t_})) ELSE '' END)"
        )
    fn, _ = _BIND_FUNCS[name]
    if "{}" in fn:
        if len(sql_args) != 1:
            raise ValueError(f"{name} takes exactly one argument")
        return fn.format(sql_args[0])
    return f"{fn}({', '.join(sql_args)})"


def _expr_vars(node) -> set[str]:
    """Variable names an expression AST references."""
    k = node[0]
    if k == "var":
        return {node[1]}
    if k == "bin":
        return _expr_vars(node[2]) | _expr_vars(node[3])
    if k == "cmpe":
        return _expr_vars(node[1]) | _expr_vars(node[3])
    if k == "func":
        out: set[str] = set()
        for a in node[2]:
            out |= _expr_vars(a)
        return out
    return set()


def _expr_numeric(node) -> bool:
    if node[0] == "num" or node[0] == "bin":
        return True
    if node[0] == "func":
        return _BIND_FUNCS[node[1]][1]
    return False


def _split_top(src: str, op: str) -> list[str]:
    """Split ``src`` on depth-0 occurrences of the two-char operator ``op``
    (``&&`` / ``||``) — parenthesized subexpressions are opaque."""
    parts, depth, start = [], 0, 0
    i = 0
    while i < len(src):
        ch = src[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and src[i : i + 2] == op:
            parts.append(src[start:i])
            i += 2
            start = i
            continue
        i += 1
    parts.append(src[start:])
    return parts


def _top_cmp(src: str) -> tuple[int, str] | None:
    """Find the depth-0 comparison operator in a (masked) FILTER body.
    Returns (position, operator) or None."""
    d = 0
    for pos, ch in enumerate(src):
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
        elif d == 0 and ch in "<>=!":
            two = src[pos : pos + 2]
            opc = two if two in ("<=", ">=", "!=") else ch
            if opc in ("<", ">", "=", "<=", ">=", "!="):
                return pos, opc
    return None


#: boolean-atom string functions inside FILTER connectives
_SFUNC_ATOM_RE = re.compile(
    r"(REGEX|STRSTARTS|STRENDS|CONTAINS)\s*\(\s*\?(\w+)\s*,\s*(\S+?)\s*(?:,\s*(\S+?)\s*)?\)",
    re.I,
)


def _parse_bool(src: str, restore, prefixes: dict[str, str]):
    """A (masked) FILTER body with boolean connectives -> bool AST:
    ("or"|"and", [nodes]) | ("not", node) | ("sfunc", var, func, Term) |
    ("bound", var) | ("cmp", lhs AST, op, rhs AST). SQL three-valued logic
    mirrors the SPARQL error semantics here (error||true = true,
    error&&false = false, and a non-true filter eliminates the row). A
    filter containing a BOUND atom (or referencing OPTIONAL-only variables)
    is deferred to the post-LEFT-JOIN namespace at the compile site."""
    parts = _split_top(src, "||")
    if len(parts) > 1:
        return ("or", [_parse_bool(p, restore, prefixes) for p in parts])
    parts = _split_top(src, "&&")
    if len(parts) > 1:
        return ("and", [_parse_bool(p, restore, prefixes) for p in parts])
    s = src.strip()
    if s.startswith("!") and not s[1:].lstrip().startswith("="):
        return ("not", _parse_bool(s[1:], restore, prefixes))
    if s.startswith("("):
        depth, j = 1, 1
        while j < len(s) and depth:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        if depth == 0 and j == len(s):
            # parens spanning the WHOLE atom: a boolean group — recurse.
            # (A bare parenthesized arithmetic expression is not a valid
            # boolean atom anyway; the recursion's raise names it.)
            return _parse_bool(s[1:-1], restore, prefixes)
    m = _SFUNC_ATOM_RE.fullmatch(s)
    if m:
        var, func, arg = _parse_sfunc_parts(
            m.group(1), m.group(2), m.group(3), m.group(4), restore, prefixes
        )
        return ("sfunc", var, func, arg)
    mb = re.fullmatch(r"BOUND\s*\(\s*\?(\w+)\s*\)", s, re.I)
    if mb:
        # BOUND as a boolean atom: compiles to IS NOT NULL; a filter holding
        # one is DEFERRED to after the OPTIONAL left joins (where the tested
        # column is genuinely nullable) by the main compile site
        return ("bound", mb.group(1))
    split = _top_cmp(s)
    if split is None:
        raise ValueError(
            "unsupported FILTER form (supported: comparison ops, &&/||/! "
            "connectives, IN, REGEX/STRSTARTS/STRENDS/CONTAINS, (NOT) EXISTS, "
            f"(!)BOUND, LANG/DATATYPE, expr <op> expr): {restore(s)!r}"
        )
    pos, opc = split
    return (
        "cmp",
        _parse_expr(restore(s[:pos])),
        opc,
        _parse_expr(restore(s[pos + len(opc) :])),
    )


_BIND_OPEN_RE = re.compile(r"\bBIND\s*\(", re.I)
_BIND_AS_RE = re.compile(r"\sAS\s+\?(\w+)\s*$", re.I)


def _extract_binds(inner: str, restore) -> tuple[str, list[tuple[object, str]]]:
    """Pull every top-level ``BIND(expr AS ?v)`` out of the masked body via
    balanced-paren scanning (the expression itself contains parens, so a
    regex can't bound it). Returns (body without BINDs, [(AST, var)]) in
    textual order — later BINDs may reference earlier ones."""
    out: list[tuple[object, str]] = []
    while True:
        m = _BIND_OPEN_RE.search(inner)
        if not m:
            return inner, out
        depth, j = 1, m.end()
        while j < len(inner) and depth:
            if inner[j] == "(":
                depth += 1
            elif inner[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parentheses in BIND")
        body = inner[m.end() : j - 1]
        am = _BIND_AS_RE.search(body)
        if not am:
            raise ValueError(f"BIND needs the form BIND(expr AS ?var): {restore(body)!r}")
        out.append((_parse_expr(restore(body[: am.start()])), am.group(1)))
        inner = inner[: m.start()] + " " + inner[j:]


#: VALUES data tokens: the term grammar plus the UNDEF keyword
_VALUES_TOK_RE = re.compile(r"\bUNDEF\b|" + _TERM_RE.pattern, re.X | re.I)


_OPT_OPEN_RE = re.compile(r"\bOPTIONAL\s*\{", re.I)


def _at_depth0(text: str, pos: int) -> bool:
    """True when ``pos`` sits at brace depth 0 of ``text`` — extraction
    passes must only lift TOP-LEVEL groups; a match inside another group's
    braces belongs to that group (lifting it would silently re-scope it)."""
    d = 0
    for ch in text[:pos]:
        if ch == "{":
            d += 1
        elif ch == "}":
            d -= 1
    return d == 0


def _take_depth0(inner: str, pattern: re.Pattern) -> tuple[str, list[re.Match]]:
    """All DEPTH-0 matches of ``pattern``, removed from ``inner`` (each
    replaced by a space). Deeper matches stay in place — their enclosing
    group's parser rejects them loudly instead of this pass silently
    lifting them out of scope."""
    matches: list[re.Match] = []
    parts: list[str] = []
    last = 0
    for m in pattern.finditer(inner):
        if not _at_depth0(inner, m.start()):
            continue
        matches.append(m)
        parts.append(inner[last : m.start()])
        parts.append(" ")
        last = m.end()
    parts.append(inner[last:])
    return "".join(parts), matches


def _extract_braced(inner: str, open_re: re.Pattern) -> tuple[str, list[str]]:
    """Pull every TOP-LEVEL ``<keyword> { ... }`` group out via balanced-brace
    scanning (group bodies may nest further braces; matches inside other
    groups' braces are left for those groups' parsers to reject). Returns
    (body without the groups, group bodies in textual order) — operate on
    MASKED text."""
    out: list[str] = []
    while True:
        m = None
        for cand in open_re.finditer(inner):
            if _at_depth0(inner, cand.start()):
                m = cand
                break
        if not m:
            return inner, out
        depth, j = 1, m.end()
        while j < len(inner) and depth:
            if inner[j] == "{":
                depth += 1
            elif inner[j] == "}":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced braces in group")
        out.append(inner[m.end() : j - 1])
        inner = inner[: m.start()] + " " + inner[j:]


#: group forms inside OPTIONAL that route the whole group through the
#: sub-Query fallback (the OptGroup shape carries only BGP+FILTER+BIND+
#: nested OPTIONALs)
_OPT_SUBQ_KW_RE = re.compile(
    r"\b(UNION|VALUES|GRAPH|MINUS|SERVICE|BOUND)\b"
    r"|\bFILTER\s+(NOT\s+)?EXISTS\b"
    r"|\{\s*SELECT\b",
    re.I,
)


def _parse_opt_group(
    body: str, restore, prefixes: dict[str, str], fresh, dataset_clause: str = ""
) -> OptGroup:
    """One (masked) OPTIONAL group body -> OptGroup, recursing into nested
    OPTIONALs first. Supported inside a group: triples (incl. paths and
    property lists), comparison / string-function FILTERs, BINDs, nested
    OPTIONALs. Other group forms (UNION/VALUES/GRAPH/MINUS/EXISTS/
    subselects) route the WHOLE group through a select-* sub-Query re-parse
    — one LEFT JOIN of a self-contained subquery, NULL-compatible on every
    shared variable (for a variable whose required-part binding is itself
    non-nullable, the compatibility join degrades to plain equality)."""
    if any(
        _at_depth0(body, m.start()) for m in _OPT_SUBQ_KW_RE.finditer(body)
    ):
        decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in prefixes.items())
        sub = parse_sparql(
            decls + "SELECT * " + dataset_clause + " WHERE {" + restore(body) + "}"
        )
        return OptGroup([], [], [], [], [], subquery=sub)
    body, child_srcs = _extract_braced(body, _OPT_OPEN_RE)
    children = [
        _parse_opt_group(c, restore, prefixes, fresh, dataset_clause)
        for c in child_srcs
    ]
    body, binds = _extract_binds(body, restore)
    filters: list[tuple[str, str, Term]] = [
        _parse_ffunc(fm, restore, prefixes) for fm in _FFUNC_RE.finditer(body)
    ]
    body = _FFUNC_RE.sub("", body)

    def _take_cmp(fm: re.Match) -> str:
        # a right side the TERM grammar cannot parse (a function call, a
        # connective tail) falls through to the boolean extractor below
        try:
            filters.append(
                (fm.group(1)[1:], fm.group(2), _parse_term(restore(fm.group(3)), prefixes))
            )
        except ValueError:
            return fm.group(0)
        return ""

    body = _FILTER_RE.sub(_take_cmp, body)
    # remaining FILTER(...) forms: the boolean / expression grammar
    # (&&/||/! connectives, expr <op> expr, string-function atoms) — same
    # LeftJoin-condition placement. BOUND/EXISTS/group forms raise inside
    # _parse_bool / the keyword check below.
    bools: list[object] = []
    _f_open = re.compile(r"\bFILTER\s*\(", re.I)
    while True:
        fm = _f_open.search(body)
        if not fm:
            break
        depth, j = 1, fm.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parentheses in FILTER inside OPTIONAL")
        fbody = body[fm.end() : j - 1]
        if re.search(r"\bBOUND\b", fbody, re.I):
            # depth-0 BOUND routes the whole group through the sub-Query
            # fallback before reaching here; this path only sees BOUND
            # buried inside bare nested brace groups
            raise ValueError(
                "BOUND here is mis-nested (a group-level BOUND FILTER "
                "compiles via the OPTIONAL sub-Query fallback)"
            )
        bools.append(_parse_bool(fbody, restore, prefixes))
        body = body[: fm.start()] + " " + body[j:]
    if re.search(r"\bFILTER\b", body, re.I):
        raise ValueError(
            "unsupported FILTER form inside OPTIONAL (supported there: "
            "comparison ops, &&/||/! connectives, REGEX/STRSTARTS/STRENDS/CONTAINS)"
        )
    if re.search(r"[{}]", body) or re.search(
        r"\b(GRAPH|VALUES|UNION|EXISTS|MINUS|SERVICE|SELECT)\b", body, re.I
    ):
        raise ValueError("unsupported group form nested inside OPTIONAL")
    if not body.strip():
        raise ValueError(
            "OPTIONAL group needs its own triple patterns (a bare nested "
            "OPTIONAL is not supported)"
        )
    return OptGroup(
        _quads(restore(body), prefixes, None, fresh), filters, binds, children, bools
    )


def _parse_values(
    head: str, data: str, prefixes: dict[str, str]
) -> tuple[list[str], list[list[Term | None]]]:
    """``VALUES`` head + data block -> (ordered vars, rows of constant Terms).
    Single-var form (``VALUES ?v { t ... }``: bare terms, one per row) and the
    row form (``VALUES (?a ?b) { (t t) ... }``). ``UNDEF`` cells parse to
    ``None`` — no constraint on that variable for that row (the solution keeps
    the variable unbound when nothing else binds it)."""

    def cell(tok: str) -> Term | None:
        if tok.strip().upper() == "UNDEF":
            return None
        return _parse_term(tok, prefixes)

    vars_ = re.findall(r"\?(\w+)", head)
    rows: list[list[Term | None]] = []
    if head.lstrip().startswith("("):
        for rm in re.finditer(r"\(([^()]*)\)", data):
            toks = [m.group(0) for m in _VALUES_TOK_RE.finditer(rm.group(1))]
            if len(toks) != len(vars_):
                raise ValueError(
                    f"VALUES row arity {len(toks)} != {len(vars_)} variables"
                )
            rows.append([cell(t) for t in toks])
    else:
        rows = [[cell(m.group(0))] for m in _VALUES_TOK_RE.finditer(data)]
    if not rows:
        raise ValueError("empty VALUES data block")
    for row in rows:
        for t in row:
            if t is not None and t.kind == "var":
                raise ValueError("VALUES data must be constant terms")
    return vars_, rows


def _parse_groupby(tail: str) -> tuple[list[str], list[tuple[object, str]]] | None:
    """GROUP BY clause -> (ordered key names, desugared BINDs). Plain ``?v``
    keys pass through; ``(expr AS ?k)`` keys parse the expression with the
    BIND grammar and desugar to a pre-grouping BIND on ``?k`` (the SPARQL
    GroupBy-with-expression algebra). Returns None when there is no GROUP BY.
    Balanced-paren scanning — expressions nest parens freely."""
    m = re.search(r"GROUP\s+BY\s+", tail, re.I)
    if not m:
        return None
    keys: list[str] = []
    binds: list[tuple[object, str]] = []
    i, n = m.end(), len(tail)
    stop = re.compile(r"(?:HAVING|ORDER|LIMIT|OFFSET|VALUES)\b", re.I)
    while i < n:
        if tail[i].isspace():
            i += 1
            continue
        if stop.match(tail, i):
            break
        if tail[i] == "?":
            vm = re.match(r"\?(\w+)", tail[i:])
            keys.append(vm.group(1))
            i += vm.end()
        elif tail[i] == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if tail[j] == "(":
                    depth += 1
                elif tail[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced parentheses in GROUP BY")
            chunk = tail[i + 1 : j - 1]
            k = chunk.upper().rfind(" AS ")
            if k < 0:
                raise ValueError("GROUP BY expression keys need (expr AS ?alias)")
            am = re.fullmatch(r"\s*\?(\w+)\s*", chunk[k + 4 :])
            if not am:
                raise ValueError("GROUP BY (expr AS ?alias): alias must be ?name")
            binds.append((_parse_expr(chunk[:k]), am.group(1)))
            keys.append(am.group(1))
            i = j
        else:
            raise ValueError(
                f"unsupported GROUP BY key at: {tail[i:i+30]!r} "
                "(supported: ?var and (expr AS ?alias))"
            )
    if not keys:
        raise ValueError("empty GROUP BY clause")
    return keys, binds


def _parse_order(text: str) -> list[tuple[object, bool]]:
    """ORDER BY condition text -> [(key, descending)] preserving key order.
    A key is a variable NAME (plain ``?v``, ``ASC(?v)``, ``DESC(?v)``) or a
    BIND-grammar expression AST (``DESC(STRLEN(?v))``, bare ``STRLEN(?v)``,
    arithmetic, CONCAT, ...) — expression keys compile with the BIND
    expression compiler in :func:`_order_limit`."""

    def key_of(src: str):
        src = src.strip()
        m = re.fullmatch(r"\?(\w+)", src)
        if m:
            return m.group(1)
        # a whole-key aggregate — ORDER BY DESC(COUNT(?v)) — becomes an
        # ("agg", ...) node compiled against the grouped input columns
        ma = re.fullmatch(
            r"(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)", src, re.I
        )
        if ma:
            func = ma.group(1).upper()
            varg = ma.group(3)
            var = None if varg == "*" else varg[1:]
            if var is None and func != "COUNT":
                raise ValueError(f"{func}(*) is not a valid aggregate")
            return ("agg", func, bool(ma.group(2)), var)
        return _parse_expr(src)

    keys: list[tuple[object, bool]] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        m = re.match(r"(ASC|DESC)\s*\(", text[i:], re.I)
        if m:
            desc = m.group(1).upper() == "DESC"
            depth, j = 1, i + m.end()
            while j < n and depth:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError(f"unbalanced parentheses in ORDER BY: {text!r}")
            keys.append((key_of(text[i + m.end() : j - 1]), desc))
            i = j
            continue
        # bare key: ?var or an expression — consume to the next top-level space
        depth, j = 0, i
        while j < n and (depth or not text[j].isspace()):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        keys.append((key_of(text[i:j]), False))
        i = j
    return keys


def _close_brace(src: str, i: int) -> int:
    """Index just past the brace matching the ``{`` at ``i`` (balanced scan)."""
    depth, j = 1, i + 1
    n = len(src)
    while j < n and depth:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
        j += 1
    if depth:
        raise ValueError("unbalanced braces in WHERE body")
    return j


def _close_paren(src: str, i: int) -> int:
    """Index just past the paren matching the ``(`` at ``i`` (balanced scan)."""
    depth, j = 1, i + 1
    n = len(src)
    while j < n and depth:
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ValueError("unbalanced parentheses in SELECT")
    return j


#: text that OWNS the braced group opening right after it — such a group is
#: that construct's body, never a union branch
_GROUP_OWNER_RE = re.compile(
    r"(?:OPTIONAL|MINUS|EXISTS|SERVICE|UNION)\s*$"
    r"|GRAPH\s+(?:\?\w+|<[^>]+>|\w*:\w[\w.-]*)\s*$"
    r"|VALUES\s+[^{}]*$",
    re.I,
)


def _extract_union_seqs(inner: str) -> tuple[str, list[str]]:
    """Pull every depth-0 ``{ A } UNION { B } [UNION { C }…]`` sequence that
    is JOINED with the rest of the body (the whole-body case was handled
    earlier). Returns the body with the sequences excised plus each
    sequence's source text. Groups owned by a keyword (OPTIONAL/GRAPH/…) and
    ``{ SELECT`` subselects are left in place."""
    seqs: list[str] = []
    while True:
        found = None
        i, depth = 0, 0
        n = len(inner)
        while i < n:
            c = inner[i]
            if c == "{":
                if (
                    depth == 0
                    and not _GROUP_OWNER_RE.search(inner[:i])
                    and not re.compile(r"\s*SELECT\b", re.I).match(inner, i + 1)
                ):
                    j = _close_brace(inner, i)
                    um = re.compile(r"\s*UNION\s*\{", re.I).match(inner, j)
                    if um:
                        while um:
                            j = _close_brace(inner, um.end() - 1)
                            um = re.compile(r"\s*UNION\s*\{", re.I).match(inner, j)
                        found = (i, j)
                        break
                    i = j
                    continue
                depth += 1
            elif c == "}":
                depth -= 1
            i += 1
        if not found:
            return inner, seqs
        s, e = found
        seqs.append(inner[s:e])
        inner = inner[:s] + " " + inner[e:]


def _query_tail(q: str) -> str:
    """Solution-modifier tail: the text after the LAST brace outside any
    quoted literal (a ``}`` inside an ORDER BY string constant is data)."""
    mq, mr = _mask_literals(q)
    return mr(mq[mq.rindex("}") + 1 :])


_GRAPH_OPEN_RE = re.compile(r"\bGRAPH\s+(\?\w+|<[^>]+>|\w*:\w[\w.-]*)\s*\{", re.I)

_NONBIND_OPEN_RE = re.compile(r"\b(?:MINUS|FILTER\s+(?:NOT\s+)?EXISTS)\s*\{", re.I)


def _scrub_nonbinding(body: str) -> str:
    """Remove the spans of a group body that mention variables WITHOUT
    binding them — MINUS { ... } and FILTER (NOT) EXISTS { ... } interiors
    (balanced braces) and FILTER( ... ) expressions (balanced parens) — so a
    variable scan over the remainder sees only binding positions."""
    while True:
        m = _NONBIND_OPEN_RE.search(body)
        if not m:
            break
        j = _close_brace(body, m.end() - 1)
        body = body[: m.start()] + " " + body[j:]
    f_open = re.compile(r"\bFILTER\s*\(", re.I)
    while True:
        m = f_open.search(body)
        if not m:
            break
        depth, j = 1, m.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        body = body[: m.start()] + " " + body[j:]
    return body


def _sub_proj_vars(sub: str) -> set[str]:
    """Projection variables of a subselect SOURCE (text between its braces,
    starting at SELECT): bare ``?v`` tokens in the SELECT clause plus the
    ``AS ?alias`` of each parenthesized expression (the expression's input
    variables are NOT projected — subselect scope hides them). ``SELECT *``
    projects the visible variables of its own WHERE group (recursion)."""
    hm = re.search(r"\bSELECT\s+(?:DISTINCT\s+|REDUCED\s+)?", sub, re.I)
    if not hm:
        raise ValueError("subselect without a SELECT clause")
    rest, out, i = sub[hm.end() :], set(), 0
    stop = re.compile(r"\b(?:FROM|WHERE)\b|\{", re.I)
    while i < len(rest):
        c = rest[i]
        if c == "(":
            depth, j = 1, i + 1
            while j < len(rest) and depth:
                if rest[j] == "(":
                    depth += 1
                elif rest[j] == ")":
                    depth -= 1
                j += 1
            am = re.search(r"\bAS\s+\?(\w+)\s*\)\s*$", rest[i:j], re.I)
            if am:
                out.add(am.group(1))
            i = j
        elif c == "?":
            vm = re.match(r"\?(\w+)", rest[i:])
            out.add(vm.group(1))
            i += vm.end()
        elif c == "*":
            wm = re.search(r"\{", rest)
            out |= set(_visible_vars(rest[wm.end() : _close_brace(rest, wm.start()) - 1]))
            break
        elif stop.match(rest, i):
            break
        else:
            i += 1
    return out


def _visible_vars(body: str) -> list[str]:
    """In-scope (joinable) variables of a group body over MASKED text:
    variables in binding positions, where a nested ``{ SELECT ... }``
    contributes ONLY its projection (subselect scope hides its interior) and
    MINUS / EXISTS / FILTER spans contribute nothing (via
    :func:`_scrub_nonbinding`)."""
    pat = re.compile(r"\{\s*SELECT\b", re.I)
    out: set[str] = set()
    while True:
        m = pat.search(body)
        if not m:
            break
        j = _close_brace(body, m.start())
        out |= _sub_proj_vars(body[m.start() + 1 : j - 1])
        body = body[: m.start()] + " " + body[j:]
    out |= set(re.findall(r"\?(\w+)", _scrub_nonbinding(body)))
    return sorted(out)


def _distribute_graph_var(gtok: str, body: str) -> str:
    """Distribute a variable-GRAPH group's braced children out of the group
    (spec-equivalent rewrites — the graph variable joins the pieces back):

    * ``GRAPH ?g { A OPTIONAL { B } }`` -> ``GRAPH ?g { A } OPTIONAL
      { GRAPH ?g { B } }`` — equivalent while A binds ?g (empty A raises);
    * ``GRAPH ?g { {X} UNION {Y} }`` -> ``{ GRAPH ?g {X} } UNION
      { GRAPH ?g {Y} }`` — each branch binds ?g itself;
    * ``VALUES`` blocks hoist verbatim (inline data is graph-independent).

    Any other braced form inside the group keeps the flat scan's loud
    reject downstream."""
    body, opt_srcs = _extract_braced(body, _OPT_OPEN_RE)
    hoisted = [f" OPTIONAL {{ GRAPH {gtok} {{ {c} }} }} " for c in opt_srcs]
    body, v_matches = _take_depth0(body, _VALUES_RE)
    hoisted += [" " + vm.group(0) + " " for vm in v_matches]
    needs_anchor = bool(opt_srcs) or bool(v_matches)
    whole = _split_union_branches(body)
    if whole is not None:
        hoisted.append(
            " UNION ".join(f"{{ GRAPH {gtok} {{ {b} }} }}" for b in whole)
        )
        body = ""
    else:
        body, useqs = _extract_union_seqs(body)
        for seq in useqs:
            branches = _split_union_branches(seq)
            if branches is None:
                raise ValueError("unsupported UNION form inside GRAPH group")
            hoisted.append(
                " UNION ".join(f"{{ GRAPH {gtok} {{ {b} }} }}" for b in branches)
            )
    if re.search(r"[{}]", body):
        # anything braced beyond OPTIONAL/UNION/VALUES (MINUS, EXISTS,
        # subselects, bare groups) — reject HERE, loudly: re-emitting it
        # under GRAPH ?var would re-enter the rewrite loop unchanged
        raise ValueError(
            "unsupported group form nested inside GRAPH ?var (supported "
            "there: OPTIONAL, UNION, VALUES)"
        )
    if body.strip():
        return f" GRAPH {gtok} {{ {body} }} " + " ".join(hoisted)
    if needs_anchor or not hoisted:
        raise ValueError(
            "GRAPH ?var over OPTIONAL/VALUES needs its own triple patterns "
            "in the group (something must bind the graph variable)"
        )
    return " ".join(hoisted)


def _rewrite_graph_groups(inner: str, prefixes: dict[str, str]) -> str:
    """Desugar depth-0 GRAPH groups whose body holds NESTED groups (braces)
    — forms the flat GRAPH scan later in the parse would reject:

    * constant graph: ``GRAPH <g> { body }`` -> the subselect ``{ SELECT *
      FROM <g> WHERE { body } }``. A subselect's FROM pins its default
      graph, which is exactly constant-GRAPH semantics, and the sub-parse
      handles every group form (OPTIONAL/UNION/VALUES/MINUS/EXISTS/nested
      subselects) through the one body grammar. (The outer query's own
      FROM NAMED list, when present, is not re-checked against <g> — same
      behavior as the flat constant-GRAPH scan.)
    * variable graph: OPTIONAL / UNION / VALUES distribute out of the
      group (see :func:`_distribute_graph_var`).

    Operates on the MASKED body (literal placeholders move untouched); runs
    before every other group extractor so the rewritten text flows through
    the normal paths. Brace-free GRAPH groups pass through unchanged."""
    out = inner
    while True:
        hit = None
        for cand in _GRAPH_OPEN_RE.finditer(out):
            if not _at_depth0(out, cand.start()):
                continue
            j = _close_brace(out, cand.end() - 1)
            body = out[cand.end() : j - 1]
            if re.search(r"[{}]", body):
                hit = (cand, j, body)
                break
        if hit is None:
            return out
        cand, j, body = hit
        gtok = cand.group(1)
        if gtok.startswith("?"):
            rep = _distribute_graph_var(gtok, body)
        else:
            g = _parse_term(gtok, prefixes)
            if g.kind == "lit":
                raise ValueError("GRAPH must name an IRI or variable")
            # subselects need an explicit projection: project every variable
            # the body BINDS (anon/path vars included — they are
            # query-unique, so exposing them joins nothing by accident).
            # MINUS / FILTER (NOT) EXISTS / FILTER(...) interiors do not
            # bind, and a nested subselect exposes only its projection —
            # _visible_vars handles both
            body_vars = _visible_vars(body)
            if not body_vars:
                raise ValueError("GRAPH group with nested groups binds no variables")
            proj = " ".join(f"?{v}" for v in body_vars)
            rep = f" {{ SELECT {proj} FROM <{g.value}> WHERE {{ {body} }} }} "
        out = out[: cand.start()] + rep + out[j:]


def _kw_at_depth0(inner: str, kw: str) -> bool:
    """True when the bare keyword occurs OUTSIDE every braced group (masked
    text — literals cannot false-positive)."""
    return any(
        _at_depth0(inner, m.start()) for m in re.finditer(rf"\b{kw}\b", inner, re.I)
    )


def _split_union_branches(inner: str) -> list[str] | None:
    """Whole-body UNION splitter: when the (masked) body is exactly two or
    more balanced braced groups joined by UNION — whitespace only around them
    — return the branch bodies, else None. Balanced scanning, so branches may
    hold nested groups (OPTIONAL, subselects, further UNIONs)."""
    srcs: list[str] = []
    pos = 0
    while True:
        m = re.compile(r"\s*\{").match(inner, pos)
        if not m:
            return None
        try:
            j = _close_brace(inner, m.end() - 1)
        except ValueError:
            return None
        srcs.append(inner[m.end() : j - 1])
        um = re.compile(r"\s*UNION\b", re.I).match(inner, j)
        if um:
            pos = um.end()
            continue
        if inner[j:].strip():
            return None
        return srcs if len(srcs) >= 2 else None


def parse_sparql(q: str) -> Query:
    # SERVICE (federated query, SPARQL 1.1 §Federation) is the one query
    # feature this engine deliberately does not implement — it requires
    # network calls to remote endpoints at evaluation time, outside the
    # batch store's scope. Reject it by NAME up front (outside literals)
    # rather than letting it surface as a generic group-structure error.
    mq0, _r0 = _mask_literals(q)
    if re.search(r"\bSERVICE\b", mq0, re.I):
        raise ValueError(
            "SERVICE (federated query) is not supported: this engine "
            "evaluates against the local materialized store only and makes "
            "no network calls; materialize the remote data as a table and "
            "join locally instead"
        )
    # DESCRIBE <iri> [...]: no WHERE grammar needed — resolve PREFIXes and
    # return the subject-rows query directly
    if re.match(r"\s*(PREFIX\s+\w*:\s*<[^>]+>\s*)*DESCRIBE\b", q, re.I) and not re.search(
        r"\b(SELECT|WHERE)\b", q, re.I
    ):
        prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(q)}
        body = re.split(r"\bDESCRIBE\b", q, maxsplit=1, flags=re.I)[1]
        terms = [_parse_term(m.group(0), prefixes) for m in _TERM_RE.finditer(body)]
        if not terms or any(t.kind != "iri" for t in terms):
            raise ValueError("DESCRIBE takes one or more constant IRIs")
        return Query([], False, [], [], [], None, describe=[t.value for t in terms])
    # DESCRIBE ?v [...] WHERE { body }: the body re-parses as a DISTINCT
    # SELECT over the described variables; the outer query describes every
    # subject those columns bind (the SPARQL DescribeQuery form with a
    # pattern — Ontop answers it; the flat form above only took constants)
    dm = re.match(
        r"\s*((?:PREFIX\s+\w*:\s*<[^>]+>\s*)*)DESCRIBE\s+((?:\?\w+\s+)*\?\w+)\s+(WHERE\b.*)$",
        q,
        re.I | re.S,
    )
    if dm and not re.search(r"\bSELECT\b", q, re.I):
        dvars = dm.group(2).split()
        sub = parse_sparql(
            dm.group(1) + "SELECT DISTINCT " + " ".join(dvars) + " " + dm.group(3)
        )
        if sub.ask or sub.construct or sub.describe:
            raise ValueError("malformed DESCRIBE WHERE body")
        return Query([], False, [], [], [], None, describe_body=sub)
    # CONSTRUCT { template } WHERE { body }: parse the body as SELECT *, keep
    # the template triples for instantiation in to_sql. Solution modifiers
    # (ORDER BY / LIMIT / OFFSET) apply to the solution sequence BEFORE
    # instantiation; the emitted graph is DISTINCT (set semantics).
    construct_src = None
    if not re.search(r"\bSELECT\b", q, re.I) and re.search(r"\bCONSTRUCT\b", q, re.I):
        mq, mrestore = _mask_literals(q)
        # the CONSTRUCT WHERE { bgp } shorthand: the template IS the body
        # (spec-restricted to a basic graph pattern — the template parser
        # rejects anything else loudly)
        cw = re.search(r"\bCONSTRUCT\s+WHERE\s*\{([^{}]*)\}", mq, re.I)
        if cw:
            construct_src = mrestore(cw.group(1))
            q = mrestore(
                mq[: cw.start()] + "SELECT * WHERE {" + cw.group(1) + "}" + mq[cw.end() :]
            )
        else:
            cm = re.search(r"\bCONSTRUCT\s*\{([^{}]*)\}", mq, re.I)
            if not cm:
                raise ValueError("CONSTRUCT needs a brace-delimited template")
            construct_src = mrestore(cm.group(1))
            q = mrestore(mq[: cm.start()] + "SELECT * " + mq[cm.end() :])
    # ASK: same body grammar as SELECT * — rewrite the head, compile the body
    # identically, and flag the query so to_sql wraps it in EXISTS
    ask = False
    if not re.search(r"\bSELECT\b", q, re.I) and re.search(r"\bASK\b", q, re.I):
        q = re.sub(r"\bASK\s*(?:WHERE\s*)?\{", "SELECT * WHERE {", q, count=1, flags=re.I)
        ask = True
    # trailing VALUES clause (the SPARQL grammar's post-solution-modifier
    # position: ``... } ORDER BY ... LIMIT ... VALUES ?x { ... }``): joins
    # the query solutions exactly like an in-body VALUES group — splice it
    # inside the WHERE body's closing brace (masked scan: a "VALUES" inside
    # a quoted literal is data)
    _mq, _mrestore = _mask_literals(q)
    _tv = re.search(
        r"(VALUES\s+(?:\?\w+|\(\s*(?:\?\w+\s*)+\))\s*\{[^{}]*\})\s*$", _mq, re.I
    )
    if _tv and "}" in _mq[: _tv.start()]:
        # all index math on the MASKED text: a "}" inside a quoted literal
        # (e.g. in an ORDER BY expression) must not become the splice point
        rest = _mq[: _tv.start()]
        k = rest.rindex("}")
        q = _mrestore(rest[:k] + " " + _tv.group(1) + " " + rest[k:])
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(q)}
    sel = _SELECT_RE.search(q)
    if not sel:
        raise ValueError("only SELECT and ASK queries are supported")
    distinct = bool(sel.group(1))
    # FROM dataset clauses live between the projection and WHERE; strip them
    # from the projection text so they don't read as variables
    sel_text = _FROM_RE.sub("", sel.group(2))
    # aggregate projections: (COUNT(?x) AS ?n) etc. — pulled out first so the
    # remaining ?vars are the plain (grouping) projection
    aggs: list[tuple[str, bool, str | None, str]] = []
    for m in _GCONCAT_RE.finditer(sel_text):
        # func tuple carries the separator in the slot the others leave None;
        # SPARQL's default separator is a single space. Output order is
        # DOCUMENTED as ascending lexical (SPARQL leaves it undefined; a
        # deterministic order is what makes the result oracle-comparable).
        sep = m.group(3) if m.group(3) is not None else " "
        sep = sep.replace('\\"', '"').replace("\\\\", "\\")
        aggs.append(("GROUP_CONCAT:" + sep, bool(m.group(1)), m.group(2)[1:], m.group(4)))
    sel_text = _GCONCAT_RE.sub(" ", sel_text)
    for m in _AGG_RE.finditer(sel_text):
        func = m.group(1).upper()
        v = None if m.group(3) == "*" else m.group(3)[1:]
        if v is None and func != "COUNT":
            raise ValueError(f"{func}(*) is not valid SPARQL")
        if v is None and m.group(2):
            raise ValueError(
                "COUNT(DISTINCT *) is not supported (distinct SOLUTIONS — "
                "name the variables instead)"
            )
        aggs.append((func, bool(m.group(2)), v, m.group(4)))
    sel_text = _AGG_RE.sub(" ", sel_text)
    # plain SELECT expressions ``(expr AS ?v)`` (the aggregates are already
    # removed): each desugars to a trailing BIND — same grammar, evaluated
    # after the body's own BINDs — with ?v taking the expression's place in
    # the projection
    sel_binds: list[tuple[object, str]] = []
    if "(" in sel_text:
        sel_masked, sel_restore = _mask_literals(sel_text)
        inline_n = [0]

        def _extract_inline(txt: str) -> str:
            """Aggregate calls inside a SELECT expression become internal
            ``__agg<n>`` projections; the expression references the alias."""

            def rep(m: re.Match) -> str:
                func = m.group(1).upper()
                if m.group(3) == "*" and func != "COUNT":
                    raise ValueError(f"{func}(*) is not valid SPARQL")
                if m.group(3) == "*" and m.group(2):
                    raise ValueError(
                        "COUNT(DISTINCT *) is not supported (distinct SOLUTIONS "
                        "— name the variables instead)"
                    )
                inline_n[0] += 1
                alias = f"__agg{inline_n[0]}"
                v = None if m.group(3) == "*" else m.group(3)[1:]
                aggs.append((func, bool(m.group(2)), v, alias))
                return f" ?{alias} "

            return _INLINE_AGG_RE.sub(rep, txt)

        out_parts: list[str] = []
        i = 0
        while i < len(sel_masked):
            if sel_masked[i] == "(":
                j = _close_paren(sel_masked, i)
                seg = sel_masked[i + 1 : j - 1]
                am = _BIND_AS_RE.search(seg)
                if not am:
                    raise ValueError(
                        f"unsupported SELECT expression (need (expr AS ?v)): "
                        f"{sel_restore(seg)!r}"
                    )
                sel_binds.append(
                    (
                        _parse_expr(sel_restore(_extract_inline(seg[: am.start()]))),
                        am.group(1),
                    )
                )
                out_parts.append(f" ?{am.group(1)} ")
                i = j
            else:
                out_parts.append(sel_masked[i])
                i += 1
        sel_text = sel_restore("".join(out_parts))
    agg_binds: list[tuple[object, str]] = []
    if sel_binds and aggs:
        # an aggregate query: SELECT expressions evaluate over the GROUPED
        # result (grouping keys + aggregate aliases), as an outer wrapper
        agg_binds, sel_binds = sel_binds, []
    from_graphs: list[str] = []
    from_named: list[str] = []
    for m in _FROM_RE.finditer(q[: q.find("{") if "{" in q else len(q)]):
        target = from_named if m.group(1) else from_graphs
        if m.group(3):
            target.append(m.group(3))
        else:
            t = _parse_term(m.group(2), prefixes)
            target.append(t.value)
    sel_vars = [] if sel_text.strip() == "*" else re.findall(r"\?(\w+)", sel_text)
    if agg_binds:
        # expression targets are computed by the outer wrapper, not grouped
        _ab = {v for _, v in agg_binds}
        sel_vars = [v for v in sel_vars if v not in _ab]
    # literals are masked during ALL structural rewrites below and restored
    # per-fragment right before term parsing: "_:b1" / "[]" / "FILTER(...)"
    # inside a quoted constant is data, not syntax. The WHERE body itself is
    # located on the MASKED text — _WHERE_RE is greedy to the last brace,
    # and a "}" inside a solution-modifier string literal must not extend it
    _mq2, restore = _mask_literals(q)
    body = _WHERE_RE.search(_mq2)
    if not body:
        raise ValueError("missing WHERE clause")
    inner = body.group(1)
    # fresh never-projected variables for property-path sequence desugaring —
    # query-global counter so ?__path1 in one group can never accidentally
    # join a ?__path1 in another
    _path_n = [0]

    def fresh() -> Term:
        _path_n[0] += 1
        return Term("var", f"__path{_path_n[0]}")

    # anonymous bnodes: each [] is a FRESH never-projected variable; labelled
    # query bnodes _:x are scoped variables (standard SPARQL semantics — a
    # bnode label in a query does NOT match the stored label, it joins)
    anon_n = 0

    def _fresh(_m) -> str:
        nonlocal anon_n
        anon_n += 1
        return f" ?__anon{anon_n} "

    inner = _ANON_RE.sub(_fresh, inner)
    inner = _BNODE_RE.sub(lambda m: f" ?__bn_{m.group(1)} ", inner)
    # GRAPH groups holding nested groups desugar FIRST (constant graph ->
    # FROM-pinned subselect; variable graph -> distributed OPTIONAL/UNION/
    # VALUES) so the rewritten text flows through the normal group paths
    inner = _rewrite_graph_groups(inner, prefixes)
    # whole-body UNION comes out FIRST (before subselect extraction — a
    # subselect inside a branch belongs to that branch's sub-parse): the body
    # is a sequence of balanced braced groups joined by UNION. Each branch
    # re-parses as a full ``SELECT *`` sub-Query with the outer prologue and
    # dataset clauses — FILTER/BIND/OPTIONAL/VALUES/GRAPH/subselects inside a
    # branch all go through the one body grammar. Branch bnode variables were
    # already rewritten above, and union branches never join each other, so
    # the per-branch re-parse cannot capture variables across branches.
    def _parse_branches(srcs: list[str]) -> list[Query]:
        decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in prefixes.items())
        # the dataset clause rides the synthesized TEXT (not a post-hoc
        # attribute) so it propagates into every nested structure the branch
        # re-parse builds — its own OPTIONAL sub-queries, unions, subselects
        ds = " ".join(
            [f"FROM <{g}>" for g in from_graphs]
            + [f"FROM NAMED <{g}>" for g in from_named]
        )
        out = []
        for src in srcs:
            body_src = restore(src)
            if re.match(r"\s*SELECT\b", body_src, re.I):
                # a branch that IS a subselect: re-brace it so the synthetic
                # WHERE body reads { SELECT ... } (subselect position), not
                # a bare SELECT the triple grammar would choke on
                body_src = "{ " + body_src + " }"
            bq = parse_sparql(decls + "SELECT * " + ds + " WHERE {" + body_src + "}")
            out.append(bq)
        return out

    branch_srcs = _split_union_branches(inner)
    if branch_srcs is not None:
        if sel_binds or agg_binds:
            raise ValueError(
                "SELECT expressions over a whole-body UNION are not supported"
            )
        union_branches = _parse_branches(branch_srcs)
        tail = _query_tail(q)
        lim = _LIMIT_RE.search(tail)
        off = _OFFSET_RE.search(tail)
        order = _ORDER_RE.search(tail)
        gb_parsed = _parse_groupby(tail)
        group_by, gb_binds = gb_parsed if gb_parsed else ([], [])
        if gb_binds:
            raise ValueError(
                "GROUP BY expressions over a whole-body UNION are not supported"
            )
        having = _parse_having(tail, aggs, group_by)
        if any(c[0] == "exprcmp" for c in having or []):
            # the union compile path returns before the post-grouping
            # wrapper — reject instead of silently dropping the condition
            raise ValueError(
                "HAVING expressions over a whole-body UNION are not supported"
            )
        order_by = _parse_order(order.group(1)) if order else []
        agg_order = any(isinstance(k, tuple) and k[0] == "agg" for k, _ in order_by)
        if group_by and not aggs and not having and not agg_order:
            raise ValueError("GROUP BY without an aggregate projection")
        if aggs or having or agg_order:
            keys = group_by or sel_vars
            stray = [v for v in sel_vars if v not in keys]
            if stray:
                raise ValueError(f"non-grouped variables in aggregate SELECT: {stray}")
            group_by = keys
        return Query(
            sel_vars,
            distinct,
            [],
            [],
            order_by,
            int(lim.group(1)) if lim else None,
            from_graphs=from_graphs or None,
            from_named=from_named or None,
            offset=int(off.group(1)) if off else None,
            union_branches=union_branches,
            aggs=aggs or None,
            group_by=group_by or None,
            having=having,
            construct=_parse_construct(construct_src, prefixes) if construct_src else None,
            ask=ask,
        )
    # UNION sequences joined with the rest of the body: each becomes a
    # select-* union sub-Query, joined to the required part on shared
    # variables (NULL-compatible — SPARQL solution compatibility)
    inner, _useq_srcs = _extract_union_seqs(inner)
    union_joins = [
        Query(
            [],
            False,
            [],
            [],
            [],
            None,
            from_graphs=from_graphs or None,
            from_named=from_named or None,
            union_branches=_parse_branches(_split_union_branches(src)),
        )
        for src in _useq_srcs
    ]
    if _kw_at_depth0(inner, "UNION"):
        raise ValueError(
            "unsupported UNION placement (supported: { group } UNION { group } "
            "as the whole body or joined with other top-level patterns)"
        )
    # bare groups `{ body }` (no owning keyword) desugar to subselects over
    # their visible variables — SPARQL group-join semantics — so the
    # subselect extractor below picks them up
    inner = _desugar_bare_groups(inner)
    # nested { SELECT ... } subqueries next: their bodies contain braces that
    # every later single-level group regex would trip over. Subqueries inherit
    # the outer dataset (SPARQL: FROM is top-level-only syntax), so the outer
    # clause is injected into any subselect that does not pin its own — this
    # is what scopes a GRAPH-desugared FROM-pinned subselect's nested
    # subselects to the same graph, transitively.
    _ds_clause = " ".join(
        [f"FROM <{g}>" for g in from_graphs]
        + [f"FROM NAMED <{g}>" for g in from_named]
    )
    inner, subselects = _extract_subselects(inner, restore, prefixes, _ds_clause)
    # complex-bodied FILTER (NOT) EXISTS / MINUS groups re-parse whole as
    # select-* sub-Queries; extracted BEFORE the OPTIONAL scan so an OPTIONAL
    # inside such a body stays group-scoped (plain-BGP bodies fall through to
    # the flat extractors below)
    inner, exists_subqueries, minus_subqueries = _extract_group_subqueries(
        inner, restore, prefixes, _ds_clause
    )
    # GRAPH groups come out first (non-nested, plain triples inside): each
    # group's patterns carry the graph term — a constant restricts to that
    # named graph, a variable binds the graph column (joins when shared).
    # Patterns OUTSIDE any GRAPH group range over the whole store (the views
    # union all graphs), restricted by FROM when given. Balanced scanning
    # (not the non-nested regex) so a GRAPH body holding a nested group is
    # rejected HERE — the nested group must not leak out of its GRAPH scope.
    graph_quads: list[tuple[Term, Term, Term, Term | None]] = []
    _graph_open = re.compile(r"GRAPH\s+(\?\w+|<[^>]+>|\w*:\w[\w.-]*)\s*\{", re.I)
    while True:
        m = None
        for cand in _graph_open.finditer(inner):
            if _at_depth0(inner, cand.start()):
                m = cand
                break
        if not m:
            break
        depth, j = 1, m.end()
        while j < len(inner) and depth:
            if inner[j] == "{":
                depth += 1
            elif inner[j] == "}":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced braces in GRAPH group")
        g_body = inner[m.end() : j - 1]
        if re.search(r"[{}]", g_body):
            raise ValueError("nested groups inside GRAPH are not supported")
        g = _parse_term(m.group(1), prefixes)
        if g.kind == "lit":
            raise ValueError("GRAPH must name an IRI or variable")
        graph_quads += _quads(restore(g_body), prefixes, g, fresh)
        inner = inner[: m.start()] + " " + inner[j:]
    # OPTIONAL groups next (nesting allowed — each nested OPTIONAL compiles
    # to a LEFT JOIN inside its parent's subquery). A FILTER inside a group
    # is part of the LeftJoin condition (it can unmatch the group, never
    # remove the outer row): the comparison and string-function forms compile
    # into the group's subquery; other FILTER forms there are rejected loudly
    inner, _opt_srcs = _extract_braced(inner, _OPT_OPEN_RE)
    optionals = [
        _parse_opt_group(src, restore, prefixes, fresh, _ds_clause)
        for src in _opt_srcs
    ]
    # VALUES inline-data groups and FILTER (NOT) EXISTS groups — extracted
    # AFTER the OPTIONAL scan on purpose: one of these nested inside an
    # OPTIONAL body leaves that OPTIONAL unmatched (nested braces) and the
    # leftover braces fail the final tokenization loudly, instead of the
    # group being silently lifted out of its OPTIONAL scope
    inner, _v_matches = _take_depth0(inner, _VALUES_RE)
    values_groups = [
        _parse_values(m.group(1), restore(m.group(2)), prefixes) for m in _v_matches
    ]
    inner, _e_matches = _take_depth0(inner, _EXISTS_RE)
    exists_filters = [
        (bool(m.group(1)), _quads(restore(m.group(2)), prefixes, None, fresh))
        for m in _e_matches
    ]
    inner, _m_matches = _take_depth0(inner, _MINUS_RE)
    minus_groups = [
        _quads(restore(m.group(1)), prefixes, None, fresh) for m in _m_matches
    ]
    # BIND(expr AS ?v): balanced-paren extraction (the expression nests
    # parens); ASTs compile against the bound columns in to_sql
    inner, bind_exprs = _extract_binds(inner, restore)
    # FILTER((!)BOUND(?v)): post-OPTIONAL null tests (the anti-join idiom)
    bound_filters = [(m.group(2), not m.group(1)) for m in _BOUND_RE.finditer(inner)]
    inner = _BOUND_RE.sub(" ", inner)
    # FILTER(LANG(?v) = "en") / FILTER(DATATYPE(?v) = xsd:int): compile onto
    # the stored o_lang / o_dt columns of the variable's binding pattern
    langdt_filters: list[tuple[str, str, str, Term]] = []
    for m in _LANGDT_RE.finditer(inner):
        langdt_filters.append(
            (m.group(1).lower(), m.group(2), m.group(3), _parse_term(restore(m.group(4)), prefixes))
        )
    inner = _LANGDT_RE.sub(" ", inner)
    # FILTER((!)sameTerm(?a, ?b)): term identity — lexical forms plus
    # lang/datatype when both sides are object bindings
    sameterm_filters: list[tuple[str, object, bool]] = []
    for m in _SAMETERM_RE.finditer(inner):
        rhs: object = (
            m.group(3)[1:]
            if m.group(3).startswith("?")
            else _parse_term(restore(m.group(3)), prefixes)
        )
        sameterm_filters.append((m.group(2), rhs, not m.group(1)))
    inner = _SAMETERM_RE.sub(" ", inner)
    # FILTER((!)isIRI/isBlank/isLiteral/isNumeric(?v)): term-kind tests over
    # the serving views' constant kind columns
    kind_filters = [
        (m.group(2).lower(), m.group(3), not m.group(1))
        for m in _KINDF_RE.finditer(inner)
    ]
    inner = _KINDF_RE.sub(" ", inner)
    # FILTER(LANGMATCHES(LANG(?v), "range")): basic language-range matching —
    # "*" matches any tagged literal, "en" matches "en" and "en-US"
    for m in _LANGMATCHES_RE.finditer(inner):
        rng = _parse_term(restore(m.group(2)), prefixes)
        if rng.kind != "lit":
            raise ValueError("LANGMATCHES takes a plain string language range")
        langdt_filters.append(("langmatches", m.group(1), "=", rng))
    inner = _LANGMATCHES_RE.sub(" ", inner)
    # string-function FILTERs first (their own regex would otherwise be
    # half-eaten by the comparison form): REGEX/STRSTARTS/STRENDS/CONTAINS(?v, "lit")
    filters = []
    # FILTER(?v (NOT) IN (t, t, ...)): constant list, compiled to SQL IN —
    # the set restriction rides the alts slot of a constant Term
    for m in _IN_RE.finditer(inner):
        items = [
            _parse_term(tm.group(0), prefixes)
            for tm in _TERM_RE.finditer(restore(m.group(3)))
        ]
        if not items:
            raise ValueError("empty IN list in FILTER")
        if any(t.kind == "var" for t in items):
            raise ValueError("FILTER IN lists must be constant terms")
        op = "not in" if m.group(2) else "in"
        filters.append((m.group(1), op, Term("alt", "", alts=[t.value for t in items])))
    inner = _IN_RE.sub("", inner)
    filters.extend(
        _parse_ffunc(m, restore, prefixes) for m in _FFUNC_RE.finditer(inner)
    )
    inner = _FFUNC_RE.sub("", inner)
    # simple comparisons FILTER(?v <op> term); a right side the TERM grammar
    # cannot parse (e.g. a function call) falls through to the generalized
    # expression extractor below instead of raising
    def _take_cmp(m: re.Match) -> str:
        try:
            filters.append(
                (m.group(1)[1:], m.group(2), _parse_term(restore(m.group(3)), prefixes))
            )
        except ValueError:
            return m.group(0)  # left in place for the expression extractor
        return ""

    inner = _FILTER_RE.sub(_take_cmp, inner)
    # generalized expression FILTERs: FILTER(boolexpr) with ``&&``/``||``/``!``
    # connectives over comparison / string-function atoms, the BIND expression
    # grammar on comparison sides (balanced-paren extraction; connectives and
    # the comparison operator are found at paren depth 0)
    expr_filters: list[tuple[object, str, object]] = []
    bool_filters: list[object] = []
    _F_OPEN = re.compile(r"\bFILTER\s*\(", re.I)
    while True:
        m = _F_OPEN.search(inner)
        if not m:
            break
        depth, j = 1, m.end()
        while j < len(inner) and depth:
            if inner[j] == "(":
                depth += 1
            elif inner[j] == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced parentheses in FILTER")
        node = _parse_bool(inner[m.end() : j - 1], restore, prefixes)
        if node[0] == "cmp":
            expr_filters.append((node[1], node[2], node[3]))
        else:
            bool_filters.append(node)
        inner = inner[: m.start()] + " " + inner[j:]
    if re.search(r"\bFILTER\b", inner, re.I):
        raise ValueError(
            "unsupported FILTER form (supported: comparison ops, IN, "
            "REGEX/STRSTARTS/STRENDS/CONTAINS, (NOT) EXISTS, (!)BOUND, "
            "LANG/DATATYPE, expr <op> expr)"
        )
    # leftover braces or group keywords = a group the extractions above did
    # not consume (e.g. EXISTS nested inside OPTIONAL). The triple tokenizer
    # skips non-term characters, so without this check mis-nested structure
    # would silently degrade into bogus required triples.
    if re.search(r"[{}]", inner):
        raise ValueError("unsupported nested group structure in WHERE body")
    kw = re.search(r"\b(OPTIONAL|GRAPH|VALUES|UNION|EXISTS|MINUS|BIND|SERVICE)\b", inner, re.I)
    if kw:
        raise ValueError(f"unsupported or mis-nested {kw.group(1).upper()} group")
    rest = restore(inner)
    # a residue of only whitespace / "." separators (all patterns lived in
    # extracted groups) is an empty required part, not a parse error
    patterns = (
        _quads(rest, prefixes, None, fresh)
        if not re.fullmatch(r"[\s.]*", rest)
        else []
    ) + graph_quads
    if not patterns and not values_groups and not subselects and not union_joins:
        raise ValueError("empty WHERE clause")
    if (exists_filters or exists_subqueries) and not patterns and not union_joins:
        raise ValueError("FILTER EXISTS needs a basic graph pattern to correlate with")
    tail = _query_tail(q)
    lim = _LIMIT_RE.search(tail)
    off = _OFFSET_RE.search(tail)
    order = _ORDER_RE.search(tail)
    order_by = _parse_order(order.group(1)) if order else []
    gb_parsed = _parse_groupby(tail)
    group_by, gb_binds = gb_parsed if gb_parsed else ([], [])
    # GROUP BY (expr AS ?k) desugars to a pre-grouping BIND — the key is
    # computed per solution, then grouped like a plain variable
    bind_exprs = bind_exprs + gb_binds
    having = _parse_having(tail, aggs, group_by)
    agg_order = any(isinstance(k, tuple) and k[0] == "agg" for k, _ in order_by)
    if group_by and not aggs and not having and not agg_order:
        raise ValueError("GROUP BY without an aggregate projection")
    if aggs or having or agg_order:
        # SPARQL: every plain projected variable must be a grouping key; an
        # aggregate query without GROUP BY groups the whole solution set
        keys = group_by or sel_vars
        stray = [v for v in sel_vars if v not in keys]
        if stray:
            raise ValueError(f"non-grouped variables in aggregate SELECT: {stray}")
        group_by = keys
        if agg_binds:
            allowed = set(group_by) | {a for _, _, _, a in aggs}
            for node, v in agg_binds:
                bad = sorted(_expr_vars(node) - allowed)
                if bad:
                    raise ValueError(
                        f"SELECT expression for ?{v} references non-grouped, "
                        f"non-aggregate variables: {bad}"
                    )
    return Query(
        sel_vars,
        distinct,
        patterns,
        filters,
        order_by,
        int(lim.group(1)) if lim else None,
        from_graphs=from_graphs or None,
        from_named=from_named or None,
        offset=int(off.group(1)) if off else None,
        optionals=optionals or None,
        aggs=aggs or None,
        group_by=group_by or None,
        values_groups=values_groups or None,
        exists_filters=exists_filters or None,
        minus_groups=minus_groups or None,
        exists_subqueries=exists_subqueries or None,
        minus_subqueries=minus_subqueries or None,
        langdt_filters=langdt_filters or None,
        bound_filters=bound_filters or None,
        kind_filters=kind_filters or None,
        sameterm_filters=sameterm_filters or None,
        bind_exprs=(bind_exprs + sel_binds) or None,
        agg_binds=agg_binds or None,
        construct=_parse_construct(construct_src, prefixes) if construct_src else None,
        expr_filters=expr_filters or None,
        bool_filters=bool_filters or None,
        subselects=subselects or None,
        union_joins=union_joins or None,
        having=having,
        ask=ask,
    )


#: text immediately before a depth-0 ``{`` that means some keyword OWNS the
#: group (it is not a bare group-graph-pattern)
_GROUP_OWNER_RE = re.compile(
    r"(?:\bOPTIONAL\s*|\bMINUS\s*|\bUNION\s*|\bEXISTS\s*|"
    r"\bGRAPH\s+(?:\?\w+|<[^>]+>|\w*:\w[\w.-]*)\s*|"
    r"\bVALUES\s+(?:\?\w+|\([^)]*\))\s*)$",
    re.I | re.S,
)


def _desugar_bare_groups(inner: str) -> str:
    """SPARQL group-graph-pattern join: a depth-0 bare braced group — one no
    OPTIONAL/GRAPH/MINUS/UNION/EXISTS/VALUES keyword owns — joins its siblings
    on its visible variables. A group whose whole content is one subselect
    unwraps in place (redundant braces); any other bare group becomes the
    subselect ``{ SELECT <visible vars> WHERE { body } }`` — plain SELECT, so
    bag multiplicity is preserved, and the projection is exactly the group's
    in-scope variables, which is group-join semantics. A group-scoped FILTER
    stays inside the subselect; one referencing a variable the group does not
    bind fails the sub-parse loudly (spec: out-of-scope -> unbound)."""
    pos = 0
    while True:
        m = re.compile(r"\{").search(inner, pos)
        if not m:
            return inner
        if not _at_depth0(inner, m.start()) or _GROUP_OWNER_RE.search(
            inner[: m.start()]
        ):
            pos = m.start() + 1
            continue
        j = _close_brace(inner, m.start())
        body = inner[m.start() + 1 : j - 1]
        if re.match(r"\s*SELECT\b", body, re.I):
            pos = j  # a subselect: _extract_subselects owns it
            continue
        bs = body.strip()
        if (
            bs.startswith("{")
            and re.match(r"\{\s*SELECT\b", bs, re.I)
            and _close_brace(bs, 0) == len(bs)
        ):
            rep = " " + bs + " "  # { { SELECT ... } } -> { SELECT ... }
        else:
            vv = _visible_vars(body)
            if not vv:
                raise ValueError("bare group binds no variables")
            rep = (
                " { SELECT "
                + " ".join(f"?{v}" for v in vv)
                + " WHERE { "
                + body
                + " } } "
            )
        inner = inner[: m.start()] + rep + inner[j:]
        pos = m.start() + 1  # rescan: the unwrap may expose another layer


#: body content beyond a plain BGP — routes an EXISTS/MINUS group through the
#: sub-Query re-parse instead of the flat quad compile
_CPLX_BODY_RE = re.compile(
    r"[{}]|\b(?:FILTER|OPTIONAL|VALUES|GRAPH|UNION|MINUS|BIND|SELECT)\b", re.I
)
_EXISTS_MINUS_OPEN_RE = re.compile(
    r"(?:FILTER\s+(NOT\s+)?EXISTS|\b(MINUS))\s*\{", re.I
)


def _extract_group_subqueries(
    inner: str, restore, prefixes: dict[str, str], dataset_clause: str
):
    """Depth-0 ``FILTER (NOT) EXISTS { body }`` / ``MINUS { body }`` whose
    body holds more than a plain BGP: re-parse the WHOLE body as a select-*
    sub-Query (group-scoped semantics for every form inside — FILTER/
    OPTIONAL/VALUES/GRAPH/UNION/BIND/subselects) for the correlated
    semi/anti-join compile in ``to_sql``. Plain-BGP bodies are left in place
    for the cheaper flat quad compile (and its property-path support).
    Runs BEFORE the OPTIONAL scan so an OPTIONAL inside an EXISTS body stays
    in the body; depth-0 only, so an EXISTS inside an OPTIONAL body still
    belongs to that OPTIONAL's sub-parse."""
    decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in prefixes.items())
    exq: list[tuple[bool, Query]] = []
    mnq: list[Query] = []
    pos = 0
    while True:
        m = None
        for cand in _EXISTS_MINUS_OPEN_RE.finditer(inner, pos):
            if _at_depth0(inner, cand.start()):
                m = cand
                break
        if not m:
            return inner, exq, mnq
        j = _close_brace(inner, m.end() - 1)
        body = inner[m.end() : j - 1]
        if not _CPLX_BODY_RE.search(body):
            pos = j  # plain BGP: the flat extractor owns it
            continue
        sq = parse_sparql(
            decls + "SELECT * " + dataset_clause + " WHERE {" + restore(body) + "}"
        )
        if m.group(2):
            mnq.append(sq)
        else:
            exq.append((bool(m.group(1)), sq))
        inner = inner[: m.start()] + " " + inner[j:]
        pos = m.start()


def _extract_subselects(
    inner: str, restore, prefixes: dict[str, str], dataset_clause: str = ""
):
    """Pull every depth-0 ``{ SELECT ... }`` group out of the masked body via
    balanced-brace scanning and recursively parse it; deeper-nested subselects
    are left for their enclosing group's parser. Outer PREFIX declarations are
    re-prepended and the outer dataset clause is injected (before the
    subselect's first depth-0 WHERE) when the subselect does not carry its own
    FROM — SPARQL subqueries inherit prologue and dataset."""
    decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in prefixes.items())
    out = []
    pat = re.compile(r"\{\s*SELECT\b", re.I)
    pos = 0
    while True:
        m = pat.search(inner, pos)
        if not m:
            return inner, out
        if not _at_depth0(inner, m.start()):
            # inside another group's braces: that group's own parser handles
            # it (OPTIONAL routes through the sub-Query fallback; groups with
            # no subselect path keep leftover braces that fail the final
            # tokenization loudly). Lifting it here would re-scope it.
            pos = m.end()
            continue
        depth, j = 1, m.start() + 1
        while j < len(inner) and depth:
            if inner[j] == "{":
                depth += 1
            elif inner[j] == "}":
                depth -= 1
            j += 1
        if depth:
            raise ValueError("unbalanced braces in subselect")
        sub_masked = inner[m.start() + 1 : j - 1]
        if dataset_clause and not re.search(r"\bFROM\b", sub_masked, re.I):
            # masked text: a literal containing "WHERE"/"FROM" cannot
            # false-positive; the first depth-0 WHERE is the subselect's own
            wm = next(
                w
                for w in re.finditer(r"\bWHERE\b", sub_masked, re.I)
                if _at_depth0(sub_masked, w.start())
            )
            sub_masked = (
                sub_masked[: wm.start()] + dataset_clause + " " + sub_masked[wm.start() :]
            )
        sub_src = restore(sub_masked)
        sq = parse_sparql(decls + sub_src)
        if sq.ask or sq.construct:
            raise ValueError("only SELECT subqueries are supported")
        if not sq.select and not sq.aggs:
            raise ValueError(
                "subselects need an explicit projection (SELECT * is ambiguous here)"
            )
        out.append(sq)
        inner = inner[: m.start()] + " " + inner[j:]


def _parse_construct(
    src: str, prefixes: dict[str, str]
) -> list[tuple[Term, Term, Term]]:
    """CONSTRUCT template block -> triples. Only plain var/IRI/literal terms:
    property paths and blank-node shorthand are template-nonsensical here and
    rejected loudly (a template bnode would need per-solution bnode minting,
    which the serving layer does not do)."""

    def no_paths() -> Term:
        raise ValueError("property paths are not allowed in CONSTRUCT templates")

    tmpl = _triples(src, prefixes, no_paths)
    for t in tmpl:
        for term in t:
            if term.kind not in ("var", "iri", "lit"):
                raise ValueError(
                    f"unsupported CONSTRUCT template term kind: {term.kind}"
                )
    return tmpl


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_XSD_NUMERIC = {
    "http://www.w3.org/2001/XMLSchema#" + t
    for t in ("integer", "decimal", "double", "float", "int", "long")
}


def _compile_bgp(
    patterns: list[tuple[Term, Term, Term, Term | None]],
    dataset: tuple[list[str] | None, list[str] | None],
    triples_view: str,
    alias_prefix: str,
) -> tuple[list[str], dict[str, str], list[str], list[str]]:
    """One basic graph pattern (quads: each with an optional graph term) ->
    (FROM aliases, var->column binds, WHERE conds, CTE definitions). Shared
    variables become join equalities; constants become per-alias predicates.
    Variables bind to lexical forms; a GRAPH variable binds the graph column.
    A kind="plus" path predicate aliases a recursive-CTE transitive closure
    instead of the triples view (the CTE carries the LAST edge's o_lang/o_dt
    so literal/LANG/DATATYPE conditions on the path object still compile);
    a kind="alt" predicate compiles to ``pred IN (...)``."""
    from_graphs, from_named = dataset
    has_dataset = from_graphs is not None or from_named is not None
    binds: dict[str, str] = {}  # var -> first bound column
    conds: list[str] = []
    aliases: list[str] = []
    ctes: list[str] = []
    for i, (s, p, o, g) in enumerate(patterns):
        a = f"{alias_prefix}{i}"
        if p.kind in (
            "plus",
            "star",
            "qmark",
            "seqplus",
            "seqstar",
            "seqqmark",
            "nplus",
            "nstar",
            "nqmark",
        ):
            if p.kind.startswith("seq"):
                base_kind = p.kind[3:]
            elif p.kind.startswith("n"):
                base_kind = p.kind[1:]
            else:
                base_kind = p.kind
            # closure paths: WITH RECURSIVE transitive closure of the
            # predicate (or alternation-member) edge set. UNION (distinct)
            # terminates on cycles. ``*`` and ``?`` seed with the zero-length
            # pairs — every term of the (restricted) store paired with itself
            # (the SPARQL ZeroLengthPath: annotations ride the object side, so
            # a literal endpoint keeps its lang/datatype exactly). A constant
            # GRAPH / FROM restriction applies to EVERY step; a GRAPH
            # variable is ill-defined over a multi-edge path — rejected.
            if g is not None and g.kind == "var":
                raise ValueError(
                    "GRAPH variables over closure path patterns are not supported"
                )
            gc = ""
            if g is not None:
                if has_dataset and (not from_named or g.value not in from_named):
                    gc = " AND FALSE"
                else:
                    gc = f" AND {{t}}.graph = {_q(g.value)}"
            elif has_dataset:
                if from_graphs:
                    gs = ", ".join(_q(g_) for g_ in from_graphs)
                    gc = f" AND {{t}}.graph IN ({gs})"
                else:
                    gc = " AND FALSE"
            edge_view, gc_chain = triples_view, gc
            if p.kind.startswith("seq"):
                # sequence closure (p/q)+: the closed-over edge relation is
                # the CHAIN JOIN of the member predicates, one hop per member
                pconds = ["{t}.pred = " + _q(v) for v in p.alts]
            elif p.kind.startswith("n"):
                # closure over a negated property set (!(a|b))+: the
                # closed-over edge set is every triple whose predicate is NOT
                # a member
                pconds = [
                    "{t}.pred NOT IN (" + ", ".join(_q(v) for v in p.alts) + ")"
                ]
            elif p.alts and any(m.startswith("^") for m in p.alts):
                # MIXED-direction alternation closure (a|^b)+: the closed-over
                # edge relation is the UNION ALL of forward edges and REVERSED
                # ^-member edges (a reversed "object" is a store subject,
                # never a literal, so its o_lang/o_dt are NULL). The GRAPH /
                # FROM restriction is baked into each branch, so the chain
                # walks the CTE with no further predicate/graph conditions.
                fwd = [m for m in p.alts if not m.startswith("^")]
                bwd = [m[1:] for m in p.alts if m.startswith("^")]
                branches = [
                    f"SELECT b.subj, b.obj, b.o_lang, b.o_dt "
                    f"FROM {triples_view} b "
                    f"WHERE b.pred IN ({', '.join(_q(v) for v in fwd)})"
                    + gc.format(t="b")
                ] if fwd else []
                if bwd:
                    branches.append(
                        f"SELECT b.obj, b.subj, CAST(NULL AS VARCHAR), "
                        f"CAST(NULL AS VARCHAR) FROM {triples_view} b "
                        f"WHERE b.pred IN ({', '.join(_q(v) for v in bwd)})"
                        + gc.format(t="b")
                    )
                edge_view = f"{a}_me"
                ctes.append(
                    f"{edge_view}(subj, obj, o_lang, o_dt) AS (SELECT * FROM ("
                    + " UNION ALL ".join(f"({b})" for b in branches)
                    + ") u)"
                )
                pconds, gc_chain = ["TRUE"], ""
            elif p.alts:
                pconds = ["{t}.pred IN (" + ", ".join(_q(v) for v in p.alts) + ")"]
            else:
                pconds = ["{t}.pred = " + _q(p.value)]

            def _chain(prefix: str, first_on: str | None = None) -> tuple[str, str]:
                """(FROM clause, WHERE conds) for one pass over the member
                chain; ``first_on`` joins hop 0 to a preceding relation."""
                frm = f"{edge_view} {prefix}0"
                if first_on:
                    frm += f" ON {prefix}0.subj = {first_on}"
                wh = [pconds[0].format(t=f"{prefix}0") + gc_chain.format(t=f"{prefix}0")]
                for ii in range(1, len(pconds)):
                    frm += (
                        f" JOIN {edge_view} {prefix}{ii} "
                        f"ON {prefix}{ii}.subj = {prefix}{ii - 1}.obj"
                    )
                    wh.append(
                        pconds[ii].format(t=f"{prefix}{ii}")
                        + gc_chain.format(t=f"{prefix}{ii}")
                    )
                return frm, " AND ".join(wh)

            last = f"b{len(pconds) - 1}"
            e_frm, e_wh = _chain("b")
            edges = (
                f"SELECT b0.subj, {last}.obj, {last}.o_lang, {last}.o_dt "
                f"FROM {e_frm} WHERE {e_wh}"
            )
            zero = (
                f"SELECT DISTINCT z.subj AS subj, z.subj AS obj, "
                f"CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_dt "
                f"FROM {triples_view} z WHERE TRUE{gc.format(t='z')} "
                f"UNION "
                f"SELECT DISTINCT z.obj, z.obj, z.o_lang, z.o_dt "
                f"FROM {triples_view} z WHERE TRUE{gc.format(t='z')}"
            )
            # SPARQL ZeroLengthPath over a CONSTANT endpoint yields a
            # solution even when the term is absent from the graph
            # (eval(ZeroLengthPath(term X, var v)) = {v -> X}) — seed the
            # pattern's own constant endpoints explicitly, annotations from
            # the pattern term so literal-object conditions still hold
            for _t in (s, o):
                if _t.kind != "var":
                    _lang = _q(_t.lang) if _t.lang is not None else "CAST(NULL AS VARCHAR)"
                    _dt = (
                        _q(_t.datatype)
                        if _t.datatype is not None
                        else "CAST(NULL AS VARCHAR)"
                    )
                    zero += (
                        f" UNION SELECT {_q(_t.value)}, {_q(_t.value)}, {_lang}, {_dt}"
                    )
            cte = f"{a}_tc"
            if base_kind == "qmark":
                # zero-or-one: no recursion — zero-length pairs ∪ single
                # edges. The UNION must live INSIDE a subquery: at the top
                # level of a WITH RECURSIVE member DuckDB splits it into
                # anchor/recursive halves and skips dedup across that split.
                ctes.append(
                    f"{cte}(subj, obj, o_lang, o_dt) AS "
                    f"(SELECT DISTINCT * FROM (({zero}) UNION ({edges})) u)"
                )
            else:
                anchor = f"SELECT * FROM ({zero}) z0" if base_kind == "star" else edges
                r_last = f"t{len(pconds) - 1}"
                r_frm, r_wh = _chain("t", first_on="c.obj")
                ctes.append(
                    f"{cte}(subj, obj, o_lang, o_dt) AS ("
                    f"{anchor} "
                    f"UNION "
                    f"SELECT c.subj, {r_last}.obj, {r_last}.o_lang, {r_last}.o_dt "
                    f"FROM {cte} c JOIN {r_frm} WHERE {r_wh})"
                )
            aliases.append(f"{cte} {a}")
        else:
            mixed = p.kind in ("alt", "nalt") and p.alts and any(
                m.startswith("^") for m in p.alts
            )
            if mixed:
                # (negated) property set with ^ members: the spec's
                # alt(NPS(fwd), inv(NPS(bwd))) / alt(fwd..., inv(bwd)...)
                # translation — a two-branch CTE (UNION ALL: multiset), the
                # inverse branch emits reversed edges. The graph column rides
                # along so GRAPH/FROM conditions below apply unchanged; the
                # reversed "object" is the store subject (never a literal),
                # so its o_lang/o_dt are NULL.
                fwd = [m for m in p.alts if not m.startswith("^")]
                bwd = [m[1:] for m in p.alts if m.startswith("^")]
                op = "IN" if p.kind == "alt" else "NOT IN"
                branches = []
                if fwd:
                    branches.append(
                        f"SELECT b.subj, b.obj, b.o_lang, b.o_dt, b.graph "
                        f"FROM {triples_view} b "
                        f"WHERE b.pred {op} ({', '.join(_q(v) for v in fwd)})"
                    )
                if bwd:
                    branches.append(
                        f"SELECT b.obj, b.subj, CAST(NULL AS VARCHAR), "
                        f"CAST(NULL AS VARCHAR), b.graph FROM {triples_view} b "
                        f"WHERE b.pred {op} ({', '.join(_q(v) for v in bwd)})"
                    )
                cte = f"{a}_ns"
                ctes.append(
                    f"{cte}(subj, obj, o_lang, o_dt, graph) AS (SELECT * FROM ("
                    + " UNION ALL ".join(f"({b})" for b in branches)
                    + ") u)"
                )
                aliases.append(f"{cte} {a}")
            else:
                aliases.append(f"{triples_view} {a}")
            if g is not None:
                # SPARQL dataset semantics: with any FROM/FROM NAMED clause
                # present, GRAPH patterns range over the FROM NAMED set only
                # (an empty named set makes them match nothing)
                if g.kind == "var":
                    # bind first (the variable stays in scope even when the
                    # named set is empty and no solution exists)
                    if g.value in binds:
                        conds.append(f"{a}.graph = {binds[g.value]}")
                    else:
                        binds[g.value] = f"{a}.graph"
                    if has_dataset and not from_named:
                        conds.append("FALSE")
                    elif has_dataset:
                        gs = ", ".join(_q(g_) for g_ in from_named)
                        conds.append(f"{a}.graph IN ({gs})")
                elif has_dataset and (not from_named or g.value not in from_named):
                    conds.append("FALSE")
                else:
                    conds.append(f"{a}.graph = {_q(g.value)}")
            elif has_dataset:
                # FROM <g>: non-GRAPH patterns match the default graph = the
                # FROM union; a dataset with only FROM NAMED has an EMPTY
                # default graph (SPARQL dataset semantics)
                if from_graphs:
                    gs = ", ".join(_q(g_) for g_ in from_graphs)
                    conds.append(f"{a}.graph IN ({gs})")
                else:
                    conds.append("FALSE")
            if mixed:
                pass  # the predicate restriction lives inside the CTE
            elif p.kind == "alt":
                conds.append(
                    f"{a}.pred IN ({', '.join(_q(v) for v in p.alts)})"
                )
            elif p.kind == "nalt":
                conds.append(
                    f"{a}.pred NOT IN ({', '.join(_q(v) for v in p.alts)})"
                )
            elif p.kind == "var":
                if p.value in binds:
                    conds.append(f"{a}.pred = {binds[p.value]}")
                else:
                    binds[p.value] = f"{a}.pred"
            else:
                conds.append(f"{a}.pred = {_q(p.value)}")
        if s.kind == "var":
            if s.value in binds:
                conds.append(f"{a}.subj = {binds[s.value]}")
            else:
                binds[s.value] = f"{a}.subj"
        else:
            conds.append(f"{a}.subj = {_q(s.value)}")
        if o.kind == "var":
            if o.value in binds:
                conds.append(f"{a}.obj = {binds[o.value]}")
            else:
                binds[o.value] = f"{a}.obj"
        else:
            conds.append(f"{a}.obj = {_q(o.value)}")
            if o.kind == "lit":
                if o.lang is not None:
                    conds.append(f"{a}.o_lang = {_q(o.lang)}")
                elif o.datatype is not None:
                    conds.append(f"{a}.o_dt = {_q(o.datatype)}")
    return aliases, binds, conds, ctes


def _agg_projection(
    query: Query, vmap: dict[str, str]
) -> tuple[str, str, list[str]]:
    """Aggregate SELECT -> (projection SQL, GROUP BY clause, ordered output
    column names). Grouping keys
    are the plain projected variables (or the explicit GROUP BY); COUNT works
    on lexical forms directly, SUM/AVG/MIN/MAX cast the lexical form to
    DOUBLE (numeric-literal aggregation; non-numeric forms become NULL and
    are ignored, the SPARQL error-skipping behavior)."""
    keys = query.group_by or []
    missing = [v for v in keys if v not in vmap]
    if missing:
        raise ValueError(f"GROUP BY variables never bound: {missing}")
    # only SELECTed grouping keys are projected: SPARQL allows grouping by a
    # variable without projecting it, and the result shape must honor SELECT
    names = [v for v in keys if v in query.select]
    parts = [f"{vmap[v]} AS {v}" for v in names]
    for func, distinct, var, alias in query.aggs or []:
        if var is not None and var not in vmap:
            raise ValueError(f"aggregate over unbound variable ?{var}")
        d = "DISTINCT " if distinct else ""
        if func == "COUNT":
            arg = "*" if var is None else f"{d}{vmap[var]}"
            parts.append(f"CAST(COUNT({arg}) AS BIGINT) AS {alias}")
        elif func == "SAMPLE":
            # SPARQL SAMPLE picks an arbitrary value; MIN makes it the
            # deterministic (and thus oracle-comparable) choice
            parts.append(f"MIN({vmap[var]}) AS {alias}")
        elif func.startswith("GROUP_CONCAT:"):
            sep = func[len("GROUP_CONCAT:"):]
            parts.append(
                f"string_agg({d}{vmap[var]}, {_q(sep)} ORDER BY {vmap[var]}) AS {alias}"
            )
        else:
            parts.append(f"{func}({d}TRY_CAST({vmap[var]} AS DOUBLE)) AS {alias}")
    group = " GROUP BY " + ", ".join(vmap[v] for v in keys) if keys else ""
    return ", ".join(parts), group, names + [a for _, _, _, a in query.aggs or []]


def _order_limit(
    query: Query, projected: set[str], cols: dict[str, str] | None = None
) -> str:
    """ORDER BY / LIMIT / OFFSET tail. Variable keys use the projected alias
    when available, else the bound column (invalid under DISTINCT or
    aggregation, where SQL only sees the projection — raise rather than emit
    broken SQL). Expression keys compile with the BIND expression compiler
    over the same name space."""
    sql = ""
    if query.order_by:
        under_proj_only = query.distinct or _is_agg_query(query)
        parts = []
        for v, desc in query.order_by:
            if isinstance(v, str):
                if v in projected:
                    expr = v
                elif cols and v in cols and not under_proj_only:
                    expr = cols[v]
                else:
                    raise ValueError(f"ORDER BY variable ?{v} is not projected")
            elif v[0] == "agg":
                # ORDER BY over an aggregate: reuse a matching projected
                # alias when one exists, else compile the aggregate over the
                # grouped input columns (valid SQL in a grouped query)
                _, func, distinct, var = v
                if not (query.aggs or query.group_by):
                    raise ValueError(
                        "ORDER BY aggregate needs GROUP BY or an aggregate projection"
                    )
                alias = next(
                    (
                        a
                        for f, d, vv, a in query.aggs or []
                        if f == func and d == distinct and vv == var
                    ),
                    None,
                )
                if alias is not None:
                    expr = alias
                else:
                    if var is not None and (not cols or var not in cols):
                        raise ValueError(
                            f"ORDER BY aggregate over unbound variable ?{var}"
                        )
                    d = "DISTINCT " if distinct else ""
                    if func == "COUNT":
                        expr = f"COUNT({'*' if var is None else d + cols[var]})"
                    else:
                        expr = f"{func}({d}TRY_CAST({cols[var]} AS DOUBLE))"
            else:
                mapping: dict[str, str] = (
                    dict(cols) if cols and not under_proj_only else {}
                )
                mapping.update({p: p for p in projected})
                expr = _expr_sql(v, mapping)
            parts.append(f"{expr} DESC" if desc else expr)
        sql += " ORDER BY " + ", ".join(parts)
    if query.limit is not None:
        sql += f" LIMIT {query.limit}"
    if query.offset is not None:
        sql += f" OFFSET {query.offset}"
    return sql


def _values_alias(k: int, vars_: list[str], rows: list[list[Term | None]]) -> str:
    """One VALUES group -> an inline-data FROM alias ``(VALUES ...) vK(a, b)``
    (terms constrain lexical forms, same comparison the BGP constants use;
    an UNDEF cell is a typed NULL — joined with NULL-compatibility)."""
    body = ", ".join(
        "("
        + ", ".join(
            "CAST(NULL AS VARCHAR)" if t is None else _q(t.value) for t in row
        )
        + ")"
        for row in rows
    )
    return f"(VALUES {body}) v{k}({', '.join(vars_)})"


def _parse_sfunc_parts(
    func_name: str, var: str, arg_tok: str, flags_tok: str | None, restore, prefixes
) -> tuple[str, str, Term]:
    """REGEX/STRSTARTS/STRENDS/CONTAINS parts -> (var, func, argument Term) with the
    shared validation (literal args; REGEX flags ride the lang slot)."""
    func = func_name.lower()
    arg = _parse_term(restore(arg_tok), prefixes)
    if arg.kind != "lit":
        raise ValueError(f"{func_name.upper()} needs a literal argument")
    if flags_tok is not None:
        if func != "regex":
            raise ValueError(f"{func_name.upper()} takes exactly two arguments")
        flags = _parse_term(restore(flags_tok), prefixes)
        if flags.kind != "lit" or not re.fullmatch(r"[ismx]*", flags.value):
            raise ValueError(f"unsupported REGEX flags: {flags.value!r}")
        arg = Term("lit", arg.value, lang=flags.value)
    return var, func, arg


def _parse_ffunc(m: re.Match, restore, prefixes: dict[str, str]) -> tuple[str, str, Term]:
    """One REGEX/STRSTARTS/STRENDS/CONTAINS FILTER match -> (var, func, argument Term)."""
    return _parse_sfunc_parts(
        m.group(1), m.group(2)[1:], m.group(3), m.group(4), restore, prefixes
    )


def _filter_cond(var: str, op: str, term: Term, binds: dict[str, str]) -> str:
    """One comparison / string-function FILTER -> SQL condition over the
    bound columns (shared by the required part and OPTIONAL group bodies)."""
    if var not in binds:
        raise ValueError(f"FILTER on unbound variable ?{var}")
    if op in ("regex", "strstarts", "strends", "contains"):
        fn = {
            "regex": "regexp_matches",
            "strstarts": "starts_with",
            "strends": "ends_with",
            "contains": "contains",
        }[op]
        if op == "regex" and term.lang:  # REGEX flags ride the lang slot
            return f"{fn}({binds[var]}, {_q(term.value)}, {_q(term.lang)})"
        return f"{fn}({binds[var]}, {_q(term.value)})"
    sql_op = "<>" if op == "!=" else op
    if term.kind == "var":
        if term.value not in binds:
            raise ValueError(f"FILTER on unbound variable ?{term.value}")
        return f"{binds[var]} {sql_op} {binds[term.value]}"
    if term.datatype in _XSD_NUMERIC:
        return f"TRY_CAST({binds[var]} AS DOUBLE) {sql_op} {float(term.value)}"
    return f"{binds[var]} {sql_op} {_q(term.value)}"


def _compile_opt_group(
    grp: OptGroup,
    dataset: tuple[list[str] | None, list[str] | None],
    triples_view: str,
    prefix: str,
    all_ctes: list[str],
    parent_vars: set[str],
) -> tuple[str, set[str], set[str]]:
    """One OPTIONAL group -> (subquery SQL projecting every exposed variable
    under its own name, exposed variable set, ALWAYS-BOUND variable subset).
    Nested children compile to LEFT JOINs inside this subquery — the SPARQL
    LeftJoin(A, LeftJoin(B, C)) nesting. A variable exposed by a child but
    not bound in this group's own BGP is NULLABLE here; joins onto it use
    NULL-compatibility (an unbound variable is compatible with anything)."""
    if grp.subquery is not None:
        # the sub-Query fallback (UNION/VALUES/GRAPH/... inside the group):
        # self-contained SQL, every exposed variable treated as nullable so
        # the caller's ON clause uses NULL-compatibility throughout
        sub_sql, sub_cols = _to_sql_cols(
            grp.subquery, triples_view, allow_empty_projection=True
        )
        return sub_sql, set(sub_cols), set()
    aliases, binds, conds, g_ctes = _compile_bgp(
        grp.quads, dataset, triples_view, f"{prefix}t"
    )
    all_ctes.extend(g_ctes)
    for node, bv in grp.binds:
        # group-local BIND: computed in the subquery projection — NULL
        # (unbound) for outer rows the group does not match
        if bv in binds or bv in parent_vars:
            raise ValueError(f"BIND target ?{bv} is already bound")
        binds[bv] = f"({_expr_sql(node, binds)})"
    for fvar, fop, fterm in grp.filters:
        # group-local LeftJoin condition: compiled into the subquery WHERE,
        # so a failing filter unmatches the group (NULL row) instead of
        # eliminating the outer solution
        conds.append(_filter_cond(fvar, fop, fterm, binds))
    for node in grp.bools:
        conds.append(_bool_sql(node, binds))
    required = set(binds)
    if not grp.children:
        proj = ", ".join(f"{c} AS {v}" for v, c in binds.items())
        sql = f"SELECT {proj} FROM {', '.join(aliases)}"
        if conds:
            sql += " WHERE " + " AND ".join(conds)
        return sql, set(binds), required
    req = f"SELECT {', '.join(f'{c} AS {v}' for v, c in binds.items())} FROM {', '.join(aliases)}"
    if conds:
        req += " WHERE " + " AND ".join(conds)
    outer: dict[str, str] = {v: f"r.{v}" for v in binds}
    from_child: set[str] = set()
    joins: list[str] = []
    for k, child in enumerate(grp.children):
        c_sql, c_exposed, c_required = _compile_opt_group(
            child, dataset, triples_view, f"{prefix}c{k}_", all_ctes,
            parent_vars | set(binds),
        )
        ga = f"{prefix}g{k}"
        on_parts: list[str] = []
        for v in sorted(c_exposed):
            if v in outer:
                # unbound (NULL) is compatible with anything — on the child
                # side when it may leave v unbound, and on the outer side
                # when an EARLIER sibling optional bound it (sequential
                # LeftJoin: the later group joins the running solution)
                alts = []
                if v not in c_required:
                    alts.append(f"{ga}.{v} IS NULL")
                if v in from_child:
                    alts.append(f"{outer[v]} IS NULL")
                eq = f"{ga}.{v} = {outer[v]}"
                on_parts.append("(" + " OR ".join([eq] + alts) + ")" if alts else eq)
        joins.append(f"LEFT JOIN ({c_sql}) {ga} ON {' AND '.join(on_parts) or 'TRUE'}")
        for v in c_exposed:
            if v not in outer:
                outer[v] = f"{ga}.{v}"
                from_child.add(v)
            elif v in from_child:
                # merged binding = the bound side (earlier sibling or this)
                outer[v] = f"COALESCE({outer[v]}, {ga}.{v})"
    proj = ", ".join(f"{c} AS {v}" for v, c in outer.items())
    return (
        f"SELECT {proj} FROM ({req}) r {' '.join(joins)}",
        set(outer),
        required,
    )


def _cmp_sql(lhs, opc: str, rhs, binds: dict[str, str]) -> str:
    """One ``expr <op> expr`` comparison -> SQL over the bound columns, with
    the numeric-coercion rule: numeric comparison when either side is
    numeric-valued (TRY_CAST failures become NULL — SPARQL error-skipping)."""
    numeric = (
        _expr_numeric(lhs) or _expr_numeric(rhs)
        or lhs[0] == "num" or rhs[0] == "num"
    )

    def side(n):
        s = _expr_sql(n, binds)
        if numeric and not (_expr_numeric(n) or n[0] == "num"):
            return f"TRY_CAST({s} AS DOUBLE)"
        return s

    sql_op = "<>" if opc == "!=" else opc
    return f"{side(lhs)} {sql_op} {side(rhs)}"


def _bool_sql(node, binds: dict[str, str]) -> str:
    """Boolean FILTER AST (:func:`_parse_bool`) -> SQL condition. SQL
    three-valued logic mirrors SPARQL's error semantics: an error (NULL)
    short-circuits through || / && exactly like the spec's EBV table, and a
    non-TRUE result eliminates the row. BOUND compiles to IS NOT NULL —
    correct only over the post-LEFT-JOIN namespace, which the deferral at
    the compile site guarantees whenever OPTIONALs exist."""
    tag = node[0]
    if tag == "or":
        return "(" + " OR ".join(_bool_sql(x, binds) for x in node[1]) + ")"
    if tag == "and":
        return "(" + " AND ".join(_bool_sql(x, binds) for x in node[1]) + ")"
    if tag == "not":
        return f"NOT ({_bool_sql(node[1], binds)})"
    if tag == "bound":
        v = node[1]
        if v not in binds:
            raise ValueError(f"BOUND on unbound variable ?{v}")
        return f"({binds[v]} IS NOT NULL)"
    if tag == "sfunc":
        _, var, func, arg = node
        return _filter_cond(var, func, arg, binds)
    _, lhs, opc, rhs = node
    return _cmp_sql(lhs, opc, rhs, binds)


def _bool_vars(node) -> set[str]:
    """Variables a boolean FILTER AST references (deferral decision)."""
    tag = node[0]
    if tag in ("or", "and"):
        out: set[str] = set()
        for x in node[1]:
            out |= _bool_vars(x)
        return out
    if tag == "not":
        return _bool_vars(node[1])
    if tag == "bound":
        return {node[1]}
    if tag == "sfunc":
        _, var, _func, arg = node
        vs = {var}
        if getattr(arg, "kind", None) == "var":
            vs.add(arg.value)
        return vs
    _, lhs, _opc, rhs = node
    return _expr_vars(lhs) | _expr_vars(rhs)


def _bool_has_bound(node) -> bool:
    tag = node[0]
    if tag in ("or", "and"):
        return any(_bool_has_bound(x) for x in node[1])
    if tag == "not":
        return _bool_has_bound(node[1])
    return tag == "bound"



def _is_agg_query(query: "Query") -> bool:
    """True when compilation must take the grouped path: an aggregate
    projection, a HAVING clause, or an ORDER BY aggregate key."""
    return bool(
        query.aggs
        or query.having
        or any(isinstance(k, tuple) and k[0] == "agg" for k, _ in query.order_by or [])
    )


def _having_sql(query: Query, vmap: dict[str, str]) -> str:
    if not query.having:
        return ""
    parts = []
    for cond in query.having:
        if cond[0] == "exprcmp":
            continue  # compiled by the post-grouping wrapper in _to_sql_cols
        if cond[0] == "alias":
            _, alias, op, val = cond
            parts.append(f"{alias} {'<>' if op == '!=' else op} {val}")
            continue
        # direct aggregate form: compile the aggregate over the bound
        # column — SQL HAVING may reference aggregates that are not projected
        _, func, distinct, var, op, val = cond
        if var is not None and var not in vmap:
            raise ValueError(f"HAVING aggregate over unbound variable ?{var}")
        d = "DISTINCT " if distinct else ""
        if func == "COUNT":
            expr = f"COUNT({'*' if var is None else d + vmap[var]})"
        else:
            expr = f"{func}({d}TRY_CAST({vmap[var]} AS DOUBLE))"
        parts.append(f"{expr} {'<>' if op == '!=' else op} {val}")
    return " HAVING " + " AND ".join(parts) if parts else ""


def to_sql(query: Query, triples_view: str = "all_triples") -> str:
    """BGP -> self-join SQL over the (subj, pred, obj, o_lang, o_dt, graph)
    triples view. OPTIONAL groups compile to LEFT JOINs of per-group
    subqueries onto the required part (optional-only variables are NULL —
    SPARQL unbound — when the group does not match). ``p+`` path patterns
    contribute recursive CTEs, hoisted to one outermost WITH RECURSIVE."""
    return _to_sql_cols(query, triples_view)[0]


def _to_sql_cols(
    query: Query,
    triples_view: str = "all_triples",
    allow_empty_projection: bool = False,
) -> tuple[str, list[str]]:
    """``to_sql`` plus the ordered output column names — the UNION compiler
    needs each branch's columns to build the NULL-padded positional union.
    ``allow_empty_projection``: an all-constant UNION branch is legal (it
    contributes its match rows, every union variable NULL) — compile it as
    ``SELECT 1 AS __m`` instead of raising."""
    if query.describe:
        lst = ", ".join(_q(v) for v in query.describe)
        return (
            f"SELECT DISTINCT subj, pred, obj, o_lang, o_dt, graph "
            f"FROM {triples_view} WHERE subj IN ({lst}) "
            f"ORDER BY subj, pred, obj, graph"
        ), ["subj", "pred", "obj", "o_lang", "o_dt", "graph"]
    if query.describe_body is not None:
        sub_sql, sub_cols = _to_sql_cols(query.describe_body, triples_view)
        conds = " OR ".join(
            f'subj IN (SELECT "{c}" FROM ({sub_sql}) WHERE "{c}" IS NOT NULL)'
            for c in sub_cols
        )
        return (
            f"SELECT DISTINCT subj, pred, obj, o_lang, o_dt, graph "
            f"FROM {triples_view} WHERE {conds} "
            f"ORDER BY subj, pred, obj, graph"
        ), ["subj", "pred", "obj", "o_lang", "o_dt", "graph"]
    if query.construct:
        from dataclasses import replace

        tmpl_vars: list[str] = []
        for t in query.construct:
            for term in t:
                if term.kind == "var" and term.value not in tmpl_vars:
                    tmpl_vars.append(term.value)
        body_q = replace(query, construct=None, select=tmpl_vars, distinct=False)
        body_sql = to_sql(body_q, triples_view)
        parts = []
        for s, p, o in query.construct:
            cols = []
            for term, name in ((s, "subj"), (p, "pred"), (o, "obj")):
                v = f"b.{term.value}" if term.kind == "var" else _q(term.value)
                cols.append(f"CAST({v} AS VARCHAR) AS {name}")
            parts.append(f"SELECT {', '.join(cols)} FROM __body b")
        # unbound template variables (OPTIONAL) generate no triple — the
        # NULL filter is the SPARQL "skip incomplete instantiation" rule
        return (
            f"WITH __body AS ({body_sql}) "
            f"SELECT DISTINCT subj, pred, obj FROM ({' UNION ALL '.join(parts)}) "
            f"WHERE subj IS NOT NULL AND pred IS NOT NULL AND obj IS NOT NULL"
        ), ["subj", "pred", "obj"]
    all_ctes: list[str] = []

    def _with(sql: str) -> str:
        if not all_ctes:
            return sql
        return "WITH RECURSIVE " + ", ".join(all_ctes) + " " + sql
    if query.union_branches:
        # multiset union of full sub-Queries (each branch carries its own
        # FILTERs/BINDs/OPTIONALs and compiles self-contained — its CTEs live
        # inside its own subquery). The union projection is the SELECT list
        # (or the union of branch variables), NULL where a branch leaves a
        # variable unbound; outer aggregates/GROUP BY run over the union.
        compiled = [
            _to_sql_cols(bq, triples_view, allow_empty_projection=True)
            for bq in query.union_branches
        ]
        all_vars: list[str] = []
        for _, b_cols in compiled:
            for v in b_cols:
                if v not in all_vars:
                    all_vars.append(v)
        if _is_agg_query(query):
            base_vars = sorted(all_vars)
        else:
            base_vars = query.select or sorted(all_vars)
            if not base_vars and not query.ask and not allow_empty_projection:
                raise ValueError("query projects no variables")
        never = [v for v in base_vars if all(v not in b for _, b in compiled)]
        if never:
            raise ValueError(f"SELECT variables never bound: {never}")
        parts = []
        for k, (b_sql, b_cols) in enumerate(compiled):
            proj = ", ".join(
                v if v in b_cols else f"NULL AS {v}" for v in base_vars
            ) or "1 AS __m"
            parts.append(f"SELECT {proj} FROM ({b_sql}) __b{k}")
        sql = " UNION ALL ".join(parts)
        if query.ask:
            return f"SELECT EXISTS (SELECT * FROM ({sql}) __a) AS ask", ["ask"]
        vmap = {v: v for v in base_vars}
        if _is_agg_query(query):
            proj, group, out_cols = _agg_projection(query, vmap)
            sql = f"SELECT {proj} FROM ({sql}) __u{group}{_having_sql(query, vmap)}"
            return sql + _order_limit(query, set(out_cols), vmap), out_cols
        if query.distinct:
            sql = f"SELECT DISTINCT * FROM ({sql})"
        elif query.order_by:
            # expression ORDER BY keys are illegal directly on a UNION ALL
            # set — wrap it in a plain select first
            sql = f"SELECT * FROM ({sql}) __q"
        return sql + _order_limit(query, set(base_vars), vmap), base_vars
    aliases, binds, conds, p_ctes = _compile_bgp(
        query.patterns, (query.from_graphs, query.from_named), triples_view, "t"
    )
    all_ctes.extend(p_ctes)
    #: required-part variables whose binding column may be NULL (SPARQL
    #: unbound): bound only via a union_join branch that can skip them, a
    #: VALUES UNDEF cell, or a subselect that can leave them unbound. Every
    #: later join (OPTIONAL/EXISTS/MINUS) must treat NULL here as
    #: compatible-with-anything, not as a failed equality.
    nullable: set[str] = set()
    for k, sq in enumerate(query.subselects or []):
        # a nested SELECT joins the outer pattern on its shared projected
        # variables (natural-join semantics); unshared projected variables
        # bind fresh. Its SQL (own WITH included) nests as a FROM subquery.
        sub_sql = to_sql(sq, triples_view)
        a = f"sq{k}"
        aliases.append(f"({sub_sql}) {a}")
        sub_vars = list(sq.select) + [
            al for _, _, _, al in (sq.aggs or []) if not al.startswith("__")
        ] + [al for _, al in (sq.agg_binds or [])]
        sub_nullable = bool(sq.optionals or sq.union_branches)
        for v in sub_vars:
            if v in binds:
                conds.append(f"{a}.{v} = {binds[v]}")
            else:
                binds[v] = f"{a}.{v}"
                if sub_nullable:
                    nullable.add(v)
    for k, uq in enumerate(query.union_joins or []):
        # a union sequence joined with the body: shared variables join with
        # SPARQL compatibility (an unbound/NULL side is compatible with
        # anything; the merged binding is the bound one — COALESCE keeps
        # later references correct even when both sides are nullable)
        u_sql, u_cols = _to_sql_cols(uq, triples_view, allow_empty_projection=True)
        a = f"uj{k}"
        aliases.append(f"({u_sql}) {a}")
        for v in u_cols:
            if v in binds:
                conds.append(
                    f"({a}.{v} IS NULL OR {binds[v]} IS NULL OR {a}.{v} = {binds[v]})"
                )
                binds[v] = f"COALESCE({binds[v]}, {a}.{v})"
            else:
                binds[v] = f"{a}.{v}"
                nullable.add(v)
    for k, (v_vars, v_rows) in enumerate(query.values_groups or []):
        # inline data joins the required part: an already-bound variable gets
        # an equality (restriction) — NULL-compatible, because an UNDEF cell
        # constrains nothing on that row — and an unbound one binds to the
        # data column (NULL = the solution keeps it unbound)
        aliases.append(_values_alias(k, v_vars, v_rows))
        for j, v in enumerate(v_vars):
            if v in binds:
                conds.append(f"(v{k}.{v} IS NULL OR v{k}.{v} = {binds[v]})")
            else:
                binds[v] = f"v{k}.{v}"
                if any(row[j] is None for row in v_rows):
                    nullable.add(v)
    deferred_binds: list[tuple[object, str]] = []
    for node, bv in query.bind_exprs or []:
        # assignment: computes over already-bound columns (and earlier BINDs);
        # rebinding an existing variable is a SPARQL syntax error. A bind
        # referencing OPTIONAL-only variables (COALESCE over an unmatched
        # group is the idiom) defers to after the LEFT JOINs, where those
        # variables exist as NULLable columns.
        if bv in binds:
            raise ValueError(f"BIND target ?{bv} is already bound")
        if query.optionals and not (_expr_vars(node) <= set(binds)):
            deferred_binds.append((node, bv))
            continue
        binds[bv] = f"({_expr_sql(node, binds)})"
    deferred_cmps: list[tuple[object, str, object]] = []
    for lhs, opc, rhs in query.expr_filters or []:
        # same Filter(LeftJoin(...)) deferral as bool filters/BINDs: an
        # expression filter referencing OPTIONAL-only variables (or deferred
        # BIND targets — COALESCE(?opt, d) is the idiom) evaluates after the
        # LEFT JOINs
        if query.optionals and not (
            (_expr_vars(lhs) | _expr_vars(rhs)) <= set(binds)
        ):
            deferred_cmps.append((lhs, opc, rhs))
            continue
        conds.append(_cmp_sql(lhs, opc, rhs, binds))
    deferred_bools: list[object] = []
    for node in query.bool_filters or []:
        # Filter(LeftJoin(...)) placement: a connective filter that tests
        # BOUND or references OPTIONAL-only variables evaluates AFTER the
        # left joins (same deferral rule as BINDs over OPTIONAL variables);
        # filters over required-only variables stay in the required WHERE —
        # equivalent, and they prune before the joins
        if query.optionals and (
            _bool_has_bound(node) or not (_bool_vars(node) <= set(binds))
        ):
            deferred_bools.append(node)
            continue
        conds.append(_bool_sql(node, binds))
    for k, (negated, e_quads) in enumerate(query.exists_filters or []):
        # correlated semi/anti-join: group-local variables are scoped to the
        # subquery; variables shared with the required part correlate on the
        # outer alias columns (standard SPARQL EXISTS semantics)
        e_aliases, e_binds, e_conds, e_ctes = _compile_bgp(
            e_quads, (query.from_graphs, query.from_named), triples_view, f"e{k}_"
        )
        all_ctes.extend(e_ctes)
        # a nullable outer binding (union_join / UNDEF) left NULL means the
        # variable is unbound in this solution — EXISTS substitutes nothing
        # for it, so the subquery variable stays free (no correlation)
        e_conds += [
            f"({binds[v]} IS NULL OR {e_binds[v]} = {binds[v]})"
            if v in nullable
            else f"{e_binds[v]} = {binds[v]}"
            for v in e_binds
            if v in binds
        ]
        sub = f"SELECT 1 FROM {', '.join(e_aliases)}"
        if e_conds:
            sub += " WHERE " + " AND ".join(e_conds)
        conds.append(f"{'NOT ' if negated else ''}EXISTS ({sub})")
    for k, m_quads in enumerate(query.minus_groups or []):
        # MINUS: remove solutions with a COMPATIBLE minus-side solution that
        # shares at least one variable. BGP variables are always bound, so
        # compatible = equal on every shared variable; a group sharing no
        # variable removes nothing (the SPARQL MINUS/NOT-EXISTS divergence)
        m_aliases, m_binds, m_conds, m_ctes = _compile_bgp(
            m_quads, (query.from_graphs, query.from_named), triples_view, f"m{k}_"
        )
        all_ctes.extend(m_ctes)
        shared = [v for v in m_binds if v in binds]
        if not shared:
            continue
        # compatibility: equal on every shared variable the outer solution
        # actually binds (NULL = unbound = compatible); the removal also
        # requires a non-empty domain overlap — at least one shared variable
        # bound on the outer side (the MINUS disjoint-domain rule)
        m_conds += [
            f"({binds[v]} IS NULL OR {m_binds[v]} = {binds[v]})"
            if v in nullable
            else f"{m_binds[v]} = {binds[v]}"
            for v in shared
        ]
        if all(v in nullable for v in shared):
            m_conds.append(
                "(" + " OR ".join(f"{binds[v]} IS NOT NULL" for v in shared) + ")"
            )
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM {', '.join(m_aliases)} WHERE "
            + " AND ".join(m_conds)
            + ")"
        )
    for k, (negated, sq) in enumerate(query.exists_subqueries or []):
        # complex-bodied EXISTS: the body's select-* sub-Query nests as a
        # correlated (NOT) EXISTS. Correlation on every shared visible
        # variable; a NULL on either side means that solution leaves the
        # variable unbound — EXISTS substitutes nothing for it, so the
        # equality is waived (substitution-style semantics, matching the
        # flat-BGP EXISTS path)
        sub_sql, sub_cols = _to_sql_cols(sq, triples_view, allow_empty_projection=True)
        a = f"exq{k}"
        corr = []
        for v in sub_cols:
            if v in binds:
                c = f"{a}.{v} IS NULL OR {a}.{v} = {binds[v]}"
                if v in nullable:
                    c = f"{binds[v]} IS NULL OR " + c
                corr.append(f"({c})")
        sub = f"SELECT 1 FROM ({sub_sql}) {a}"
        if corr:
            sub += " WHERE " + " AND ".join(corr)
        conds.append(f"{'NOT ' if negated else ''}EXISTS ({sub})")
    for k, sq in enumerate(query.minus_subqueries or []):
        # complex-bodied MINUS: remove solutions with a COMPATIBLE minus-side
        # solution sharing at least one BOUND variable (the SPARQL MINUS
        # disjoint-domain rule). Either side NULL = unbound = compatible;
        # the overlap clause requires some shared variable bound on BOTH.
        sub_sql, sub_cols = _to_sql_cols(sq, triples_view, allow_empty_projection=True)
        shared = [v for v in sub_cols if v in binds]
        if not shared:
            continue
        a = f"mnq{k}"
        m_conds = [
            f"({binds[v]} IS NULL OR {a}.{v} IS NULL OR {a}.{v} = {binds[v]})"
            for v in shared
        ]
        m_conds.append(
            "("
            + " OR ".join(
                f"({binds[v]} IS NOT NULL AND {a}.{v} IS NOT NULL)" for v in shared
            )
            + ")"
        )
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM ({sub_sql}) {a} WHERE "
            + " AND ".join(m_conds)
            + ")"
        )
    for func, var, op, term in query.langdt_filters or []:
        # LANG/DATATYPE compile onto the stored o_lang / o_dt columns of the
        # variable's binding pattern. Caveat (documented): an IRI/bnode
        # binding carries NULL o_lang/o_dt and behaves like a plain literal —
        # restrict the pattern to literal objects for exact SPARQL semantics.
        col = binds.get(var)
        if col is None:
            raise ValueError(f"{func.upper()} on unbound variable ?{var}")
        if not col.endswith(".obj"):
            raise ValueError(f"{func.upper()}(?{var}) needs an object binding")
        a = col[: -len(".obj")]
        if func == "langmatches":
            # basic language ranges: "*" = any tagged literal; "en" matches
            # "en" and "en-US" (case-insensitive, RFC 4647 basic filtering)
            rng = term.value.lower()
            if rng == "*":
                expr = f"{a}.o_lang IS NOT NULL"
            else:
                expr = (
                    f"(lower({a}.o_lang) = {_q(rng)} OR "
                    f"starts_with(lower({a}.o_lang), {_q(rng + '-')}))"
                )
        elif func == "lang":
            if term.kind != "lit":
                raise ValueError("LANG compares against a plain string literal")
            # lang tags match case-insensitively; "" = no language tag
            expr = f"lower(coalesce({a}.o_lang, '')) = {_q(term.value.lower())}"
        else:
            if term.kind != "iri":
                raise ValueError("DATATYPE compares against a datatype IRI")
            xsd_string = "http://www.w3.org/2001/XMLSchema#string"
            rdf_langstring = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
            if term.value == xsd_string:
                # RDF 1.1: a plain (untagged, untyped) literal IS xsd:string;
                # the store may also carry the explicit annotation
                expr = (
                    f"({a}.o_lang IS NULL AND "
                    f"coalesce({a}.o_dt, {_q(xsd_string)}) = {_q(xsd_string)})"
                )
            elif term.value == rdf_langstring:
                expr = f"{a}.o_lang IS NOT NULL"
            else:
                expr = f"coalesce({a}.o_dt, '') = {_q(term.value)}"
        conds.append(f"NOT ({expr})" if op == "!=" else expr)
    for v1, rhs, positive in query.sameterm_filters or []:
        c1 = binds.get(v1)
        if c1 is None:
            raise ValueError(f"sameTerm on unbound variable ?{v1}")
        if isinstance(rhs, str):
            c2 = binds.get(rhs)
            if c2 is None:
                raise ValueError(f"sameTerm on unbound variable ?{rhs}")
            parts = [f"{c1} = {c2}"]
            if c1.endswith(".obj") and c2.endswith(".obj"):
                a1, a2 = c1[: -len(".obj")], c2[: -len(".obj")]
                parts.append(
                    f"coalesce({a1}.o_lang, '') = coalesce({a2}.o_lang, '')"
                )
                parts.append(f"coalesce({a1}.o_dt, '') = coalesce({a2}.o_dt, '')")
            expr = "(" + " AND ".join(parts) + ")"
        else:
            # constant: lexical identity, plus lang-tag / datatype identity
            # when the binding is an object column and the constant is a
            # literal (a plain constant only matches plain/xsd:string —
            # "x" never sameTerm-matches "x"@en)
            parts = [f"{c1} = {_q(rhs.value)}"]
            if c1.endswith(".obj") and rhs.kind == "lit":
                a1 = c1[: -len(".obj")]
                parts.append(
                    f"lower(coalesce({a1}.o_lang, '')) = "
                    f"{_q((rhs.lang or '').lower())}"
                )
                if not rhs.lang:
                    xsd_string = "http://www.w3.org/2001/XMLSchema#string"
                    parts.append(
                        f"coalesce({a1}.o_dt, {_q(xsd_string)}) = "
                        f"{_q(rhs.datatype or xsd_string)}"
                    )
            expr = "(" + " AND ".join(parts) + ")"
        conds.append(expr if positive else f"NOT {expr}")
    for func, var, positive in query.kind_filters or []:
        # term-kind tests over the views' constant s_kind/o_kind columns
        # (KIND_BNODE=0, KIND_IRI=1, KIND_LITERAL=2). A predicate/graph
        # binding is an IRI by construction. isNumeric = literal with a
        # numeric XSD datatype (untyped lexical numbers are NOT isNumeric —
        # the spec's typed-literal rule).
        col = binds.get(var)
        if col is None:
            raise ValueError(f"{func} on unbound variable ?{var}")
        if col.endswith(".obj"):
            a = col[: -len(".obj")]
            kind_col = f"{a}.o_kind"
        elif col.endswith(".subj"):
            a = col[: -len(".subj")]
            kind_col = f"{a}.s_kind"
        elif col.endswith(".pred") or col.endswith(".graph"):
            kind_col = "1"  # always an IRI
        else:
            raise ValueError(
                f"{func}(?{var}) needs a direct triple-pattern binding"
            )
        if func == "isnumeric":
            if not col.endswith(".obj"):
                expr = "FALSE"
            else:
                numeric_dts = ", ".join(
                    _q(f"http://www.w3.org/2001/XMLSchema#{n}")
                    for n in (
                        "integer", "decimal", "float", "double", "int", "long",
                        "short", "byte", "nonNegativeInteger", "positiveInteger",
                        "nonPositiveInteger", "negativeInteger", "unsignedInt",
                        "unsignedLong", "unsignedShort", "unsignedByte",
                    )
                )
                expr = f"({kind_col} = 2 AND {a}.o_dt IN ({numeric_dts}))"
        else:
            want = {"isiri": 1, "isuri": 1, "isblank": 0, "isliteral": 2}[func]
            expr = f"{kind_col} = {want}"
        conds.append(expr if positive else f"NOT ({expr})")
    for var, op, term in query.filters:
        if op in ("in", "not in"):
            if var not in binds:
                raise ValueError(f"FILTER on unbound variable ?{var}")
            lst = ", ".join(_q(v) for v in term.alts)
            conds.append(f"{binds[var]} {op.upper()} ({lst})")
            continue
        conds.append(_filter_cond(var, op, term, binds))
    group = ""
    if not query.optionals:
        # without OPTIONAL every bound variable is non-null: BOUND tests are
        # constant, compiled as IS (NOT) NULL on the bound column for parity
        for v, positive in query.bound_filters or []:
            if v not in binds:
                raise ValueError(f"BOUND on unbound variable ?{v}")
            conds.append(f"{binds[v]} IS {'NOT NULL' if positive else 'NULL'}")
        if _is_agg_query(query):
            proj, group, out_cols = _agg_projection(query, binds)
            projected = {a for _, _, _, a in query.aggs or []} | set(query.select)
        else:
            out_vars = query.select or sorted(v for v in binds if not v.startswith("__"))
            if not out_vars and not query.ask and not allow_empty_projection:
                raise ValueError("query projects no variables")
            missing = [v for v in out_vars if v not in binds]
            if missing:
                raise ValueError(f"SELECT variables never bound: {missing}")
            proj = ", ".join(f"{binds[v]} AS {v}" for v in out_vars) or "1 AS __m"
            projected = set(out_vars)
            out_cols = out_vars
        colmap = binds
        sql = f"SELECT {'DISTINCT ' if query.distinct else ''}{proj} FROM {', '.join(aliases)}"
        if conds:
            sql += " WHERE " + " AND ".join(conds)
        sql += group + _having_sql(query, binds)
    else:
        # comma-join FROM and LEFT JOIN do not mix: wrap the required part in
        # a subquery projecting every bound variable, then LEFT JOIN one
        # subquery per OPTIONAL group on its shared variables (nested groups
        # compile to LEFT JOINs INSIDE the group subqueries)
        req = f"SELECT {', '.join(f'{c} AS {v}' for v, c in binds.items())} FROM {', '.join(aliases)}"
        if conds:
            req += " WHERE " + " AND ".join(conds)
        outer: dict[str, str] = {v: f"r.{v}" for v in binds}
        opt_bound: set[str] = set()
        joins: list[str] = []
        for k, opt_group in enumerate(query.optionals):
            g_sql, g_exposed, g_required = _compile_opt_group(
                opt_group,
                (query.from_graphs, query.from_named),
                triples_view,
                f"o{k}_",
                all_ctes,
                set(binds),
            )
            on_parts: list[str] = []
            for v in sorted(g_exposed):
                if v in outer:
                    # unbound (NULL) is compatible with anything — on the
                    # group side when the group may leave v unbound, AND on
                    # the outer side when the running binding is nullable
                    # (union_join / UNDEF / subselect, or bound by an
                    # EARLIER OPTIONAL — sequential LeftJoin semantics: the
                    # later group joins the running solution, not just the
                    # required part)
                    alts = []
                    if v not in g_required:
                        alts.append(f"g{k}.{v} IS NULL")
                    if v in nullable or v in opt_bound:
                        alts.append(f"{outer[v]} IS NULL")
                    eq = f"g{k}.{v} = {outer[v]}"
                    on_parts.append(
                        "(" + " OR ".join([eq] + alts) + ")" if alts else eq
                    )
            joins.append(
                f"LEFT JOIN ({g_sql}) g{k} ON {' AND '.join(on_parts) or 'TRUE'}"
            )
            for v in g_exposed:
                if v not in outer:
                    outer[v] = f"g{k}.{v}"
                    opt_bound.add(v)
                elif v in nullable or v in opt_bound:
                    # the merged solution takes the bound side: a row where
                    # the running solution left v unbound adopts the group's
                    # binding
                    outer[v] = f"COALESCE({outer[v]}, g{k}.{v})"
        # deferred BINDs (referencing OPTIONAL-only variables) compute over
        # the post-join namespace — an unmatched group's NULL flows into the
        # expression, which is what COALESCE is for
        for node, bv in deferred_binds:
            if bv in outer:
                raise ValueError(f"BIND target ?{bv} is already bound")
            outer[bv] = f"({_expr_sql(node, outer)})"
        # BOUND tests evaluate AFTER the left joins (a !BOUND over an
        # OPTIONAL-only variable is the standard anti-join idiom)
        outer_conds = []
        for v, positive in query.bound_filters or []:
            if v not in outer:
                raise ValueError(f"BOUND on unbound variable ?{v}")
            outer_conds.append(f"{outer[v]} IS {'NOT NULL' if positive else 'NULL'}")
        for node in deferred_bools:
            outer_conds.append(_bool_sql(node, outer))
        for lhs, opc, rhs in deferred_cmps:
            outer_conds.append(_cmp_sql(lhs, opc, rhs, outer))
        where = " WHERE " + " AND ".join(outer_conds) if outer_conds else ""
        if _is_agg_query(query):
            proj, group, out_cols = _agg_projection(query, outer)
            projected = {a for _, _, _, a in query.aggs or []} | set(query.select)
        else:
            out_vars = query.select or sorted(v for v in outer if not v.startswith("__"))
            if not out_vars and not query.ask and not allow_empty_projection:
                raise ValueError("query projects no variables")
            missing = [v for v in out_vars if v not in outer]
            if missing:
                raise ValueError(f"SELECT variables never bound: {missing}")
            proj = ", ".join(f"{outer[v]} AS {v}" for v in out_vars) or "1 AS __m"
            projected = set(out_vars)
            out_cols = out_vars
        colmap = outer
        sql = (
            f"SELECT {'DISTINCT ' if query.distinct else ''}{proj} "
            f"FROM ({req}) r {' '.join(joins)}{where}{group}{_having_sql(query, outer)}"
        )
    having_exprs = [c for c in (query.having or []) if c[0] == "exprcmp"]
    if query.agg_binds or having_exprs:
        # SELECT expressions over an aggregate query, and HAVING expression
        # conjuncts: evaluate in an OUTER select over the grouped subquery —
        # the namespace is the grouped output itself (grouping keys +
        # aggregate aliases, incl. the internal __agg<n>/__hvagg<n>
        # projections, which the wrapper then hides)
        ns = {c: c for c in out_cols}
        visible = [c for c in out_cols if not c.startswith("__")]
        hconds = [
            f"({_expr_sql(l, ns)}) {'<>' if op == '!=' else op} ({_expr_sql(r, ns)})"
            for _, l, op, r in having_exprs
        ]
        where = " WHERE " + " AND ".join(hconds) if hconds else ""
        exprs = [
            f"({_expr_sql(node, ns)}) AS {v}" for node, v in (query.agg_binds or [])
        ]
        sql = f"SELECT {', '.join(visible + exprs)} FROM ({sql}) __gx{where}"
        out_cols = visible + [v for _, v in (query.agg_binds or [])]
        projected = set(out_cols)
        colmap = {c: c for c in out_cols}
    if query.ask:
        return _with(f"SELECT EXISTS (SELECT * FROM ({sql}) __a) AS ask"), ["ask"]
    return _with(sql + _order_limit(query, projected, colmap)), out_cols


def register_udfs(con) -> None:
    """Install the serving-side scalar UDFs DuckDB lacks natively: SHA1 /
    SHA384 / SHA512 (hashlib-backed, lowercase hex like the native
    md5/sha256). Call once per connection; a second call is a no-op."""
    import hashlib

    def mk(algo):
        # a plain single-parameter closure: duckdb's create_function counts
        # default args as parameters, so a lambda with `_a=algo` won't bind
        def f(s: str) -> str:
            return algo(s.encode("utf-8")).hexdigest()

        return f

    for name, algo in (
        ("sparql_sha1", hashlib.sha1),
        ("sparql_sha384", hashlib.sha384),
        ("sparql_sha512", hashlib.sha512),
    ):
        try:
            con.create_function(name, mk(algo), ["VARCHAR"], "VARCHAR")
        except Exception:
            pass  # already registered on this connection


def run_sparql(out_dir: str, sparql: str):
    """Execute a SPARQL query against a materialized store: loads the serving
    views (views.sql) into DuckDB and runs the translated SQL. Returns a
    pyarrow Table of variable bindings (lexical forms)."""
    import os

    import duckdb

    from ..util import fs_read_text

    con = duckdb.connect()
    register_udfs(con)
    for stmt in fs_read_text(os.path.join(out_dir, "views.sql")).split(";\n"):
        if stmt.strip():
            con.execute(stmt)
    return con.execute(to_sql(parse_sparql(sparql))).arrow()


if __name__ == "__main__":  # pragma: no cover - thin CLI wrapper
    # python -m r2s2_ray.pipelines.sparql OUT_DIR 'SPARQL...'  -> CSV on stdout
    import sys

    if len(sys.argv) != 3:
        sys.exit("usage: python -m r2s2_ray.pipelines.sparql OUT_DIR 'SPARQL query'")
    import csv

    table = run_sparql(sys.argv[1], sys.argv[2])
    cols = table.column_names
    w = csv.writer(sys.stdout)
    w.writerow(cols)
    for row in zip(*[table[c].to_pylist() for c in cols]):
        w.writerow(["" if v is None else v for v in row])
