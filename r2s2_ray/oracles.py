"""DuckDB oracle-SQL builders mirroring the KG extraction spec (oracle.py R1-R11)
and derived pipeline stages — generated from :mod:`r2s2_ray.vocab` so the SQL and
the engine can never drift apart. Used by ``__ray_entry__.oracle_sql()``."""

from __future__ import annotations

from . import vocab
from .terms import RDF_TYPE, XSD_DATETIME, XSD_INTEGER, XSD_STRING
from .transcripts import TRANSCRIPTS_SQL


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_BASE = f"""
tx AS ({TRANSCRIPTS_SQL}),
base AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         'https://ex.org/conv/' || conv_id AS C,
         'https://ex.org/conv/' || conv_id || '/turn/' || turn_idx AS T,
         'https://graphs.example.org/g' || (CAST(substr(conv_id, 6) AS BIGINT) % {vocab.N_GRAPHS}) AS G
  FROM tx
)
"""


def _gaz_list() -> str:
    return ", ".join(_q(g) for g in vocab.GAZETTEER)


def _canon_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {_q(a)} THEN {_q(c)}" for a, c in sorted(vocab.ALIAS_TO_CANONICAL.items())
    )
    return f"CASE {col} {whens} ELSE {col} END"


def raw_triples_sql(linked: bool = False) -> str:
    """The full extraction as SQL: one SELECT per rule, UNION ALL — same multiset
    as the vectorized extractor. ``linked=True`` applies alias->canonical entity
    linking (the Canonicalizer stage)."""
    tok = _canon_case("tok") if linked else "tok"
    selects = [
        # R1 rdf:type Turn
        f"SELECT T AS subj, 1 AS s_kind, {_q(RDF_TYPE)} AS pred, {_q(vocab.C_TURN)} AS obj, 1 AS o_kind, CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_dt, G AS graph FROM base",
        # R2 hasTurn
        f"SELECT C, 1, {_q(vocab.P_HAS_TURN)}, T, 1, NULL, NULL, G FROM base",
        # R3 turnIndex
        f"SELECT T, 1, {_q(vocab.P_TURN_INDEX)}, CAST(turn_idx AS VARCHAR), 2, NULL, {_q(XSD_INTEGER)}, G FROM base",
        # R4 role
        f"SELECT T, 1, {_q(vocab.P_ROLE)}, role, 2, NULL, {_q(XSD_STRING)}, G FROM base",
        # R6 ts
        f"SELECT T, 1, {_q(vocab.P_TS)}, strftime(ts, '%Y-%m-%dT%H:%M:%S'), 2, NULL, {_q(XSD_DATETIME)}, G FROM base",
        # R5 text (lang-tagged when prefixed, else xsd:string)
        f"""SELECT T, 1, {_q(vocab.P_TEXT)},
               CASE WHEN regexp_matches(text, '^\\[[a-z]{{2}}\\] ') THEN substr(text, 6) ELSE text END,
               2,
               CASE WHEN regexp_matches(text, '^\\[[a-z]{{2}}\\] ') THEN substr(text, 2, 2) ELSE NULL END,
               CASE WHEN regexp_matches(text, '^\\[[a-z]{{2}}\\] ') THEN NULL ELSE {_q(XSD_STRING)} END,
               G FROM base""",
        # R7 tool turns
        f"SELECT T, 1, {_q(vocab.P_TOOL)}, tool, 2, NULL, {_q(XSD_STRING)}, G FROM base WHERE tool IS NOT NULL",
        f"SELECT T, 1, {_q(vocab.P_INVOCATION)}, '_:inv_' || conv_id || '_' || turn_idx, 0, NULL, NULL, G FROM base WHERE tool IS NOT NULL",
        f"SELECT '_:inv_' || conv_id || '_' || turn_idx, 0, {_q(vocab.P_TOOL_NAME)}, tool, 2, NULL, {_q(XSD_STRING)}, G FROM base WHERE tool IS NOT NULL",
        # R8 about-pattern
        f"""SELECT C, 1, {_q(RDF_TYPE)}, {_q(vocab.C_CONVERSATION)}, 1, NULL, NULL, G FROM base
            WHERE regexp_matches(text, '^Tell me about document [0-9]+ from [A-Za-z0-9]+\\.$')""",
        f"""SELECT C, 1, {_q(vocab.P_ABOUT)}, {_q(vocab.DOC)} || regexp_extract(text, 'document ([0-9]+)', 1), 1, NULL, NULL, G FROM base
            WHERE regexp_matches(text, '^Tell me about document [0-9]+ from [A-Za-z0-9]+\\.$')""",
        f"""SELECT {_q(vocab.DOC)} || regexp_extract(text, 'document ([0-9]+)', 1), 1, {_q(RDF_TYPE)}, {_q(vocab.C_DOCUMENT)}, 1, NULL, NULL, G FROM base
            WHERE regexp_matches(text, '^Tell me about document [0-9]+ from [A-Za-z0-9]+\\.$')""",
        f"""SELECT {_q(vocab.DOC)} || regexp_extract(text, 'document ([0-9]+)', 1), 1, {_q(vocab.P_SOURCE)}, {_q(vocab.SRC)} || regexp_extract(text, 'from ([A-Za-z0-9]+)\\.$', 1), 1, NULL, NULL, G FROM base
            WHERE regexp_matches(text, '^Tell me about document [0-9]+ from [A-Za-z0-9]+\\.$')""",
        # R9 written-pattern
        f"""SELECT {_q(vocab.DOC)} || regexp_extract(text, '^Document ([0-9]+)', 1), 1, {_q(vocab.P_LANGUAGE)}, regexp_extract(text, 'written in ([a-z]+)', 1), 2, NULL, {_q(XSD_STRING)}, G FROM base
            WHERE regexp_matches(text, '^Document [0-9]+ is written in [a-z]+ and has [0-9]+ characters\\.')""",
        f"""SELECT {_q(vocab.DOC)} || regexp_extract(text, '^Document ([0-9]+)', 1), 1, {_q(vocab.P_CHAR_COUNT)}, regexp_extract(text, 'has ([0-9]+) characters', 1), 2, NULL, {_q(XSD_INTEGER)}, G FROM base
            WHERE regexp_matches(text, '^Document [0-9]+ is written in [a-z]+ and has [0-9]+ characters\\.')""",
        # R10 URL references
        f"""SELECT T, 1, {_q(vocab.P_REFERENCES)}, rtrim(regexp_extract(tok, 'https://.*$'), '.,'), 1, NULL, NULL, G
            FROM (SELECT T, G, unnest(string_split_regex(text, '\\s+')) AS tok FROM base)
            WHERE contains(tok, 'https://')""",
        # R11 mentions + entity typing (distinct per turn)
        f"""SELECT T, 1, {_q(vocab.P_MENTIONS)}, {_q(vocab.ENT)} || {tok}, 1, NULL, NULL, G
            FROM (SELECT DISTINCT T, G, tok FROM
                  (SELECT T, G, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok FROM base)
                  WHERE tok IN ({_gaz_list()}))""",
        f"""SELECT {_q(vocab.ENT)} || {tok}, 1, {_q(RDF_TYPE)}, {_q(vocab.C_ENTITY)}, 1, NULL, NULL, G
            FROM (SELECT DISTINCT T, G, tok FROM
                  (SELECT T, G, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok FROM base)
                  WHERE tok IN ({_gaz_list()}))""",
    ]
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {_BASE} {body}"


def transcripts_oracle() -> str:
    return f"SELECT conv_id, turn_idx, role, text, tool, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_s FROM ({TRANSCRIPTS_SQL})"


def dedup_triples_oracle() -> str:
    """Set-semantics dedup + graph fold, graphs as a comma-joined sorted string."""
    return (
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM ({raw_triples_sql(linked=True)}) "
        f"GROUP BY subj, pred, obj, o_lang, o_dt"
    )


def pred_counts_oracle() -> str:
    return f"SELECT pred, CAST(count(*) AS BIGINT) AS n FROM ({raw_triples_sql(linked=True)}) GROUP BY pred"


def class_census_oracle() -> str:
    return (
        f"SELECT obj AS class_iri, CAST(count(*) AS BIGINT) AS n "
        f"FROM ({raw_triples_sql(linked=True)}) WHERE pred = {_q(RDF_TYPE)} GROUP BY obj"
    )


def mentions_oracle() -> str:
    return (
        f"SELECT DISTINCT subj AS turn, obj AS entity FROM ({raw_triples_sql(linked=True)}) "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}"
    )


def term_dict_oracle() -> str:
    return (
        f"SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS id FROM ("
        f"  SELECT DISTINCT subj AS term FROM ({raw_triples_sql(linked=True)})"
        f"  UNION SELECT DISTINCT obj FROM ({raw_triples_sql(linked=True)})"
        f") ORDER BY term"
    )


def subject_functional_oracle() -> str:
    return (
        f"SELECT pred, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects "
        f"FROM ({raw_triples_sql(linked=True)}) GROUP BY pred"
    )


def lcs_bounds_oracle() -> str:
    return (
        f"SELECT pred, min(subj) AS min_subj, max(subj) AS max_subj "
        f"FROM ({raw_triples_sql(linked=True)}) GROUP BY pred"
    )


def sparql_turns_oracle() -> str:
    """Relational rendering of the SPARQL BGP in ``__ray_entry__._kg_sparql``:
    { ?turn a ex:Turn . ?turn ex:role ?role . OPTIONAL { ?turn ex:mentions ?e }
      FILTER(?role != "assistant") } with DISTINCT projection — required
    patterns are inner joins on the shared subject, OPTIONAL is a LEFT JOIN
    (unmatched -> NULL = SPARQL unbound)."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT ty.subj AS turn, r.obj AS role, m.obj AS e "
        f"FROM (SELECT DISTINCT subj FROM t WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(vocab.C_TURN)}) ty "
        f"JOIN (SELECT DISTINCT subj, obj FROM t WHERE pred = {_q(vocab.P_ROLE)}) r ON r.subj = ty.subj "
        f"LEFT JOIN (SELECT DISTINCT subj, obj FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) m ON m.subj = ty.subj "
        f"WHERE r.obj != 'assistant'"
    )


def sparql_antijoin_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_antijoin``:
    { ?turn a ex:Turn . ?turn ex:role ?role . VALUES ?role {"user" "system"}
      FILTER NOT EXISTS { ?turn ex:mentions ?e } }
    DISTINCT, ORDER BY DESC(?turn) OFFSET 5 — VALUES = an IN restriction,
    NOT EXISTS = a correlated anti-join, OFFSET over the unique-turn order."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT ty.subj AS turn, r.obj AS role "
        f"FROM (SELECT DISTINCT subj FROM t WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(vocab.C_TURN)}) ty "
        f"JOIN (SELECT DISTINCT subj, obj FROM t WHERE pred = {_q(vocab.P_ROLE)}) r ON r.subj = ty.subj "
        f"WHERE r.obj IN ('user', 'system') "
        f"AND NOT EXISTS (SELECT 1 FROM t m WHERE m.pred = {_q(vocab.P_MENTIONS)} AND m.subj = ty.subj) "
        f"ORDER BY turn DESC OFFSET 5"
    )


def sparql_graph_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_graph``:
    { GRAPH ?g { [] a ?type } } = distinct (graph, class) pairs over every
    subject (anonymous bnode = unconstrained, never projected)."""
    return (
        f"SELECT DISTINCT graph AS g, obj AS type "
        f"FROM ({raw_triples_sql(linked=True)}) WHERE pred = {_q(RDF_TYPE)}"
    )


def sparql_agg_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_agg``: instance
    counts per class — COUNT(?s) GROUP BY ?type over the type triples."""
    return (
        f"SELECT type, CAST(count(*) AS BIGINT) AS n FROM ("
        f"  SELECT subj, obj AS type, graph FROM ({raw_triples_sql(linked=True)}) "
        f"  WHERE pred = {_q(RDF_TYPE)} GROUP BY subj, obj, graph"
        f") GROUP BY type"
    )


def sparql_path_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_path``:
    { ?conv ex:hasTurn/ex:mentions ?e . BIND(CONCAT("m:", ?e) AS ?tag) } —
    the sequence path is a join through the (never-projected) intermediate
    turn; BIND is a computed projection."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT h.subj AS conv, m.obj AS e, 'm:' || m.obj AS tag "
        f"FROM t h JOIN t m ON m.subj = h.obj "
        f"WHERE h.pred = {_q(vocab.P_HAS_TURN)} AND m.pred = {_q(vocab.P_MENTIONS)}"
    )


def sparql_construct_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_construct``:
    CONSTRUCT { ?conv ex:mentionsEntity ?e } over the same sequence path —
    a DISTINCT (subj, constant pred, obj) graph."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT h.subj AS subj, {_q(vocab.EX + 'mentionsEntity')} AS pred, "
        f"m.obj AS obj "
        f"FROM t h JOIN t m ON m.subj = h.obj "
        f"WHERE h.pred = {_q(vocab.P_HAS_TURN)} AND m.pred = {_q(vocab.P_MENTIONS)}"
    )


def sparql_subselect_oracle(min_n: int = 6) -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_subselect``: typed
    conversations joined to a nested aggregate over the hasTurn/mentions path
    (COUNT of path solution rows per conversation) with HAVING."""
    t = raw_triples_sql(linked=True)
    return (
        # the served store has RDF SET semantics — dedup before counting, or
        # raw-extraction multiset duplicates inflate the path solution count
        f"WITH t AS (SELECT DISTINCT subj, pred, obj, graph FROM ({t})), "
        f"agg AS (SELECT h.subj AS conv, CAST(count(*) AS BIGINT) AS n "
        f"FROM t h JOIN t m ON m.subj = h.obj "
        f"WHERE h.pred = {_q(vocab.P_HAS_TURN)} AND m.pred = {_q(vocab.P_MENTIONS)} "
        f"GROUP BY h.subj HAVING n >= {min_n}) "
        f"SELECT DISTINCT ty.subj AS conv, agg.n "
        f"FROM (SELECT subj FROM t WHERE pred = {_q(RDF_TYPE)} "
        f"AND obj = {_q(vocab.C_CONVERSATION)}) ty "
        f"JOIN agg ON agg.conv = ty.subj"
    )


def sparql_proplist_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_proplist``:
    { ?conv ex:hasTurn [ ex:role ?role ; ex:mentions ?e ] } — the bracketed
    property list desugars to a fresh turn variable carrying both
    predicate-object pairs (two joins through the same turn)."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT h.subj AS conv, r.obj AS role, m.obj AS e "
        f"FROM t h "
        f"JOIN t r ON r.subj = h.obj AND r.pred = {_q(vocab.P_ROLE)} "
        f"JOIN t m ON m.subj = h.obj AND m.pred = {_q(vocab.P_MENTIONS)} "
        f"WHERE h.pred = {_q(vocab.P_HAS_TURN)}"
    )


def sparql_optsubselect_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_optsubselect``:
    the bare ``{ ?turn ex:role ?r }`` group is just the role pairs (group
    join over the shared store), and ``OPTIONAL { { SELECT ?turn (COUNT(?e)
    AS ?n) ... GROUP BY ?turn } }`` is a LEFT JOIN against the per-turn
    mention counts over the deduplicated (set-semantics) triple store."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"agg AS (SELECT subj AS turn, CAST(count(*) AS BIGINT) AS n "
        f"FROM t WHERE pred = {_q(vocab.P_MENTIONS)} GROUP BY subj) "
        f"SELECT r.subj AS turn, r.obj AS r, agg.n "
        f"FROM (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_ROLE)}) r "
        f"LEFT JOIN agg ON agg.turn = r.subj"
    )


def sparql_optnested_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_optnested``:
    { ?conv a ex:Conversation . OPTIONAL { ?conv ex:hasTurn ?turn .
      OPTIONAL { ?turn ex:mentions ?e } } } — LeftJoin(conv, LeftJoin(turns,
    mentions)): chained LEFT JOINs, because the inner join variable (?turn)
    is bound in the outer group's required part."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT ty.subj AS conv, h.obj AS turn, m.obj AS e "
        f"FROM (SELECT subj FROM t WHERE pred = {_q(RDF_TYPE)} "
        f"AND obj = {_q(vocab.C_CONVERSATION)}) ty "
        f"LEFT JOIN (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_HAS_TURN)}) h "
        f"ON h.subj = ty.subj "
        f"LEFT JOIN (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) m "
        f"ON m.subj = h.obj"
    )


def sparql_star_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_star``:
    { ?conv ex:hasTurn/ex:mentions* ?e } — the zero-or-more closure pairs
    every turn with itself (zero-length) plus its mentioned entities
    (mentions edges never chain, so the closure is one step deep here;
    the engine still evaluates the general recursive closure)."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"h AS (SELECT subj AS conv, obj AS turn FROM t "
        f"WHERE pred = {_q(vocab.P_HAS_TURN)}) "
        f"SELECT DISTINCT conv, turn AS e FROM h "
        f"UNION "
        f"SELECT DISTINCT h.conv, m.obj AS e FROM h "
        f"JOIN t m ON m.subj = h.turn AND m.pred = {_q(vocab.P_MENTIONS)}"
    )


def sparql_seqpath_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_seqpath``:
    { ?conv (ex:hasTurn/ex:mentions)+ ?e } — the closed-over edge relation is
    the hasTurn JOIN mentions chain (conv -> entity); those composed edges
    cannot chain further on this graph (an entity is never a hasTurn
    subject), so the one-or-more closure equals the single chain join."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT h.subj AS conv, m.obj AS e "
        f"FROM (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_HAS_TURN)}) h "
        f"JOIN (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) m "
        f"ON m.subj = h.obj"
    )


def sparql_strfuncs_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_strfuncs``. The
    engine percent-encodes with a byte-level RFC 3986 fold; this oracle is
    INDEPENDENT of that expression: entity IRIs on this corpus are ASCII
    slugs whose only non-unreserved characters are ``:`` and ``/``, so a
    targeted replace chain is the exact same function on this data shape.
    SHA256 is DuckDB-native on both sides; the corpus timestamps carry no
    timezone suffix, so TZ is the constant simple literal ''."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT m.subj AS turn, "
        f"replace(replace(m.obj, ':', '%3A'), '/', '%2F') AS enc, "
        f"sha256(m.obj) AS h, '' AS z "
        f"FROM t m JOIN t ts ON ts.subj = m.subj "
        f"AND ts.pred = {_q(vocab.P_TS)} "
        f"WHERE m.pred = {_q(vocab.P_MENTIONS)}"
    )


def sparql_undef_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_undef``:
    { ?turn ex:role ?role . VALUES (?role ?prio) { ("user" "1")
      ("assistant" UNDEF) } } — the UNDEF cell constrains nothing and leaves
    ?prio unbound (NULL) on assistant rows."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT subj AS turn, obj AS role, "
        f"CASE WHEN obj = 'user' THEN '1' END AS prio "
        f"FROM t WHERE pred = {_q(vocab.P_ROLE)} AND obj IN ('user', 'assistant')"
    )


def sparql_bool_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_bool``:
    { ?turn ex:role ?role . ?turn ex:text ?text .
      FILTER((?role = "assistant" || ?role = "tool") && STRLEN(?text) > 80
             && !CONTAINS(?text, "vector")) } DISTINCT."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT DISTINCT r.subj AS turn, r.obj AS role, x.obj AS text "
        f"FROM t r JOIN t x ON x.subj = r.subj AND x.pred = {_q(vocab.P_TEXT)} "
        f"WHERE r.pred = {_q(vocab.P_ROLE)} "
        f"AND (r.obj = 'assistant' OR r.obj = 'tool') "
        f"AND length(x.obj) > 80 AND NOT contains(x.obj, 'vector')"
    )


def sparql_having_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_having``:
    { ?turn ex:mentions ?e } GROUP BY ?turn HAVING(COUNT(DISTINCT ?e) >= 3)
    — per-turn distinct-entity counts filtered in the HAVING clause."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT subj AS turn FROM t WHERE pred = {_q(vocab.P_MENTIONS)} "
        f"GROUP BY subj HAVING COUNT(DISTINCT obj) >= 3"
    )


def sparql_aggexpr_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_aggexpr``: per-role
    turn counts with a SELECT expression over inline aggregates
    (SUM(?i)/COUNT(?t) — the average turn index) and a string expression over
    the grouping key."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"r AS (SELECT subj, obj AS role FROM t WHERE pred = {_q(vocab.P_ROLE)}), "
        f"i AS (SELECT subj, obj AS idx FROM t WHERE pred = {_q(vocab.P_TURN_INDEX)}) "
        f"SELECT role, CAST(COUNT(*) AS BIGINT) AS n, "
        f"SUM(TRY_CAST(idx AS DOUBLE)) / COUNT(*) AS avgidx, "
        f"role || '!' AS tag "
        f"FROM r JOIN i USING (subj) GROUP BY role"
    )


def sparql_dates_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_dates``: per
    (day, hour) counts of turn timestamps — the dateTime component accessors
    over the stored lexical forms."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT CAST(day(CAST(obj AS TIMESTAMP)) AS BIGINT) AS d, "
        f"CAST(hour(CAST(obj AS TIMESTAMP)) AS BIGINT) AS h, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM t WHERE pred = {_q(vocab.P_TS)} GROUP BY d, h"
    )


def sparql_union_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_union``:
    { ?turn ex:mentions ?e . FILTER(CONTAINS(?e, "or")) } UNION
    { ?turn ex:role "assistant" . OPTIONAL { ?turn ex:mentions ?e } }
    with COUNT(?e) GROUP BY ?turn over the union multiset — branch 1 is the
    filtered mentions edges, branch 2 every assistant turn left-joined to its
    mentions (an unmatched OPTIONAL contributes an unbound ?e that COUNT
    skips)."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"u AS ("
        f"SELECT subj AS turn, obj AS e FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)} AND contains(obj, 'or') "
        f"UNION ALL "
        f"SELECT r.subj AS turn, m.obj AS e "
        f"FROM (SELECT subj FROM t WHERE pred = {_q(vocab.P_ROLE)} "
        f"AND obj = 'assistant') r "
        f"LEFT JOIN (SELECT subj, obj FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}) m ON m.subj = r.subj"
        f") "
        f"SELECT turn, CAST(COUNT(e) AS BIGINT) AS n FROM u GROUP BY turn"
    )


def sparql_expr_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_expr``:
    { ?turn ex:text ?text . OPTIONAL { ?turn ex:tool ?tool } } with
    COALESCE(?tool, "none") and IF(STRLEN(?text) > 120, ...) SELECT
    expressions — a LEFT JOIN to the tool edges plus scalar projections."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT x.subj AS turn, coalesce(tl.obj, 'none') AS tool_name, "
        f"CASE WHEN length(x.obj) > 120 THEN 'long' ELSE 'short' END AS sz "
        f"FROM (SELECT subj, obj FROM t WHERE pred = {_q(vocab.P_TEXT)}) x "
        f"LEFT JOIN (SELECT subj, obj FROM t "
        f"WHERE pred = {_q(vocab.P_TOOL)}) tl ON tl.subj = x.subj"
    )


def sparql_kinds_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_kinds``: the
    distinct (subj, pred, obj) statements with a literal object and a
    non-bnode subject — the raw store's kind columns make this a direct
    predicate."""
    return (
        f"SELECT DISTINCT subj AS s, pred AS p, obj AS o "
        f"FROM ({raw_triples_sql(linked=True)}) "
        f"WHERE s_kind != 0 AND o_kind = 2"
    )


def sparql_groupconcat_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_groupconcat``:
    per-turn sorted distinct mentioned entities as one comma-joined string
    (the translator documents ascending element order for GROUP_CONCAT)."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})) "
        f"SELECT subj AS turn, string_agg(obj, ',' ORDER BY obj) AS ents "
        f"FROM t WHERE pred = {_q(vocab.P_MENTIONS)} GROUP BY subj"
    )


def roundtrip_oracle() -> str:
    """Deduped linked triples, bnode-involving predicates excluded (bnode ids are
    content-hashed on the engine side; hashing is pytest-verified instead)."""
    return (
        f"SELECT subj, pred, obj, o_lang, o_dt, graph FROM ({raw_triples_sql(linked=True)}) "
        f"WHERE s_kind != 0 AND o_kind != 0 "
        f"GROUP BY subj, pred, obj, o_lang, o_dt, graph"
    )


def sparql_mixedpath_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_mixedpath``:
    { ?x (ex:hasTurn|^ex:hasTurn)+ ?y } GROUP BY ?x — the closed-over edge
    set is the union of forward hasTurn edges and their reverses, so each
    conv and its turns form one component and the closure is exactly
    component x component (self-pairs included via the two-step
    conv->turn->conv / turn->conv->turn walks); COUNT(?y) per ?x is the
    component size."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH RECURSIVE t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"h AS (SELECT subj AS a, obj AS b FROM t "
        f"WHERE pred = {_q(vocab.P_HAS_TURN)}), "
        f"e AS (SELECT a, b FROM h UNION SELECT b, a FROM h), "
        f"c(a, b) AS (SELECT a, b FROM e "
        f"UNION SELECT c.a, e.b FROM c JOIN e ON e.a = c.b) "
        f"SELECT a AS x, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY a"
    )


def pagerank_oracle(
    n_iters: int = 3,
    scale: int = 1_000_000,
    d_num: int = 85,
    d_den: int = 100,
    personalized: bool = False,
) -> str:
    """Relational rendering of ``__ray_entry__._kg_pagerank`` /
    ``_kg_ppr``: the integer PageRank recurrence unrolled as chained CTEs
    over the distinct hasTurn+mentions edge set — floor divisions at exactly
    the two points the Ray operator floors, so the comparison is bit-exact
    despite iteration. ``personalized=True`` restricts r0 and the restart
    term to the seed set (conversation nodes = distinct hasTurn subjects),
    mirroring pagerank(seeds=...)."""
    t = raw_triples_sql(linked=True)
    base = (d_den - d_num) * scale // d_den
    seed_flag = (
        "CASE WHEN v IN (SELECT v FROM seeds) THEN 1 ELSE 0 END"
        if personalized
        else "1"
    )
    seed_flag_n = (
        "CASE WHEN n.v IN (SELECT v FROM seeds) THEN 1 ELSE 0 END"
        if personalized
        else "1"
    )
    parts = [
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"e AS (SELECT DISTINCT subj AS s, obj AS d FROM t "
        f"WHERE pred IN ({_q(vocab.P_HAS_TURN)}, {_q(vocab.P_MENTIONS)})), "
        f"nodes AS (SELECT s AS v FROM e UNION SELECT d FROM e), "
        f"seeds AS (SELECT DISTINCT subj AS v FROM t "
        f"WHERE pred = {_q(vocab.P_HAS_TURN)}), "
        f"od AS (SELECT s, CAST(count(*) AS BIGINT) AS o FROM e GROUP BY s), "
        f"r0 AS (SELECT v, CAST({scale} * ({seed_flag}) AS BIGINT) AS r "
        f"FROM nodes)"
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f", c{i} AS (SELECT e.d AS v, SUM(r.r // od.o) AS c "
            f"FROM e JOIN r{i - 1} r ON r.v = e.s JOIN od ON od.s = e.s "
            f"GROUP BY e.d), "
            f"r{i} AS (SELECT n.v, "
            f"CAST({base} * ({seed_flag_n}) "
            f"+ ({d_num} * COALESCE(c.c, 0)) // {d_den} AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{i} c ON c.v = n.v)"
        )
    parts.append(f" SELECT v AS node, r AS rank_scaled FROM r{n_iters}")
    return "".join(parts)


def comention_pmi_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_copmi``: distinct
    (turn, entity) mention rows, pair counts via a turn-keyed self-join, and
    the whole-bit PMI contract ``(length(bin(n_ab * N)) - 1) -
    (length(bin(n_a * n_b)) - 1)``."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"m AS (SELECT DISTINCT subj AS turn, obj AS ent FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"ne AS (SELECT ent, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY ent), "
        f"tot AS (SELECT CAST(count(DISTINCT turn) AS BIGINT) AS n FROM m), "
        f"p AS (SELECT x.ent AS a, y.ent AS b, CAST(count(*) AS BIGINT) AS n_ab "
        f"FROM m x JOIN m y ON x.turn = y.turn AND x.ent < y.ent GROUP BY 1, 2) "
        f"SELECT p.a, p.b, p.n_ab, "
        f"CAST((length(bin(p.n_ab * tot.n)) - 1) "
        f"- (length(bin(na.c * nb.c)) - 1) AS BIGINT) AS pmi_bits "
        f"FROM p JOIN ne na ON na.ent = p.a JOIN ne nb ON nb.ent = p.b "
        f"CROSS JOIN tot"
    )


def rdfs_infer_oracle(
    domains: dict[str, str], ranges: dict[str, str], subclass_of: dict[str, str]
) -> str:
    """Relational rendering of ``__ray_entry__._kg_rdfs_infer``: candidate
    (node, class) rows from asserted types + domain/range rules, exploded
    through the subclass transitive closure (computed here in Python and
    embedded as VALUES — the ontology is schema-sized), DISTINCT out."""
    closure_pairs = []
    classes = (
        set(subclass_of) | set(subclass_of.values())
        | set(domains.values()) | set(ranges.values())
    )
    for c in sorted(classes):
        cur: str | None = c
        while cur is not None:
            closure_pairs.append((c, cur))
            cur = subclass_of.get(cur)
    t = raw_triples_sql(linked=True)
    dom = ", ".join(f"({_q(p)}, {_q(c)})" for p, c in sorted(domains.items()))
    rng = ", ".join(f"({_q(p)}, {_q(c)})" for p, c in sorted(ranges.items()))
    cl = ", ".join(f"({_q(a)}, {_q(b)})" for a, b in closure_pairs)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj, o_kind FROM ({t})), "
        f"dom(pred, cls) AS (VALUES {dom}), "
        f"rng(pred, cls) AS (VALUES {rng}), "
        f"cl(cls, anc) AS (VALUES {cl}), "
        f"cand AS ("
        f"  SELECT subj AS node, obj AS cls FROM t WHERE pred = {_q(RDF_TYPE)} "
        f"  UNION ALL SELECT t.subj, dom.cls FROM t JOIN dom ON dom.pred = t.pred "
        f"  UNION ALL SELECT t.obj, rng.cls FROM t JOIN rng ON rng.pred = t.pred "
        f"  AND t.o_kind != 2) "
        f"SELECT DISTINCT cand.node, COALESCE(cl.anc, cand.cls) AS cls "
        f"FROM cand LEFT JOIN cl ON cl.cls = cand.cls"
    )


def lpa_oracle(rounds: int = 2, min_count: int = 300) -> str:
    """Relational rendering of ``__ray_entry__._kg_lpa_communities``: the
    bounded-round deterministic LPA unrolled — per round, most-frequent
    neighbor label with ties to the smallest label."""
    t = raw_triples_sql(linked=True)
    out = [
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"m AS (SELECT DISTINCT subj AS turn, obj AS ent FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"e AS (SELECT x.ent AS a, y.ent AS b "
        f"FROM m x JOIN m y ON x.turn = y.turn AND x.ent < y.ent "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        f"s AS (SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e), "
        f"l0 AS (SELECT DISTINCT u AS node, u AS label FROM s)"
    ]
    for i in range(1, rounds + 1):
        out.append(
            f", n{i} AS (SELECT s.u, l.label, count(*) AS c "
            f"FROM s JOIN l{i - 1} l ON l.node = s.w GROUP BY s.u, l.label), "
            f"l{i} AS (SELECT u AS node, label FROM ("
            f"SELECT u, label, row_number() OVER (PARTITION BY u "
            f"ORDER BY c DESC, label) AS rn FROM n{i}) WHERE rn = 1)"
        )
    out.append(f" SELECT node, label FROM l{rounds}")
    return "".join(out)


def shacl_oracle(shapes: list[dict]) -> str:
    """Relational rendering of ``__ray_entry__._kg_shacl``: cardinality
    shapes as a VALUES table, per-(subject, pred) DISTINCT-triple counts,
    LEFT join so absence counts 0, both violation directions."""
    t = raw_triples_sql(linked=True)
    rows = ", ".join(
        f"({_q(s['cls'])}, {_q(s['pred'])}, {int(s.get('min', 0))}, "
        f"{-1 if s.get('max') is None else int(s['max'])})"
        for s in shapes
    )
    preds = ", ".join(_q(s["pred"]) for s in shapes)
    classes = ", ".join(_q(c) for c in sorted({s["cls"] for s in shapes}))
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"typ AS (SELECT DISTINCT subj, obj AS cls FROM t "
        f"WHERE pred = {_q(RDF_TYPE)} AND obj IN ({classes})), "
        f"sh(cls, pred, lo, hi) AS (VALUES {rows}), "
        f"cnt AS (SELECT subj, pred, CAST(count(*) AS BIGINT) AS n FROM t "
        f"WHERE pred IN ({preds}) GROUP BY subj, pred), "
        f"f AS (SELECT typ.subj, typ.cls, sh.pred, sh.lo, sh.hi, "
        f"COALESCE(cnt.n, 0) AS n FROM typ JOIN sh ON sh.cls = typ.cls "
        f"LEFT JOIN cnt ON cnt.subj = typ.subj AND cnt.pred = sh.pred) "
        f"SELECT subj, cls, pred, n, "
        f"CASE WHEN n < lo THEN 'min' ELSE 'max' END AS kind "
        f"FROM f WHERE n < lo OR (hi >= 0 AND n > hi)"
    )


def link_predict_oracle(scale_bits: int = 20, min_count: int = 300) -> str:
    """Relational rendering of ``__ray_entry__._kg_link_predict``: the
    Resource-Allocation index over the STRONG co-mention graph (pairs
    co-mentioned >= min_count times) — for every non-edge pair, sum over
    common neighbors of 2^scale_bits // deg(w) plus the common-neighbor
    count (all integer floor arithmetic, bit-exact)."""
    t = raw_triples_sql(linked=True)
    scale = 1 << scale_bits
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"m AS (SELECT DISTINCT subj AS turn, obj AS ent FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"e AS (SELECT x.ent AS a, y.ent AS b "
        f"FROM m x JOIN m y ON x.turn = y.turn AND x.ent < y.ent "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        f"s AS (SELECT a AS u, b AS w FROM e UNION ALL SELECT b, a FROM e), "
        f"deg AS (SELECT u AS w, CAST(count(*) AS BIGINT) AS d FROM s GROUP BY u), "
        f"wedge AS (SELECT s1.u AS a, s2.w AS b, s1.w AS c "
        f"FROM s s1 JOIN s s2 ON s1.w = s2.u AND s1.u < s2.w), "
        f"cand AS (SELECT w.a, w.b, deg.d FROM wedge w JOIN deg ON deg.w = w.c "
        f"WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.b)) "
        f"SELECT a, b, CAST(sum({scale} // d) AS BIGINT) AS ra_scaled, "
        f"CAST(count(*) AS BIGINT) AS n_common "
        f"FROM cand GROUP BY a, b"
    )


def triangles_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_triangles``: distinct
    ordered co-mention pairs, wedge join + closing-edge join — each triangle
    once as a < b < c."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"m AS (SELECT DISTINCT subj AS turn, obj AS ent FROM t "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"p AS (SELECT DISTINCT x.ent AS a, y.ent AS b "
        f"FROM m x JOIN m y ON x.turn = y.turn AND x.ent < y.ent) "
        f"SELECT e1.a, e1.b, e2.b AS c "
        f"FROM p e1 JOIN p e2 ON e2.a = e1.b "
        f"JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b"
    )


def clustering_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_clustering``: triangle
    corners unioned and counted per vertex, degree from the ordered pair
    ends, wedges = deg*(deg-1)/2 — all integers."""
    tri = triangles_oracle()
    return (
        f"WITH tr AS ({tri}), "
        f"corners AS (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr "
        f"UNION ALL SELECT c FROM tr), "
        f"tpn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM corners "
        f"GROUP BY node), "
        f"t2 AS (SELECT DISTINCT subj, pred, obj FROM ({raw_triples_sql(linked=True)})), "
        f"m2 AS (SELECT DISTINCT subj AS turn, obj AS ent FROM t2 "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"p2 AS (SELECT DISTINCT x.ent AS a, y.ent AS b "
        f"FROM m2 x JOIN m2 y ON x.turn = y.turn AND x.ent < y.ent), "
        f"ends AS (SELECT a AS node FROM p2 UNION ALL SELECT b FROM p2), "
        f"dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM ends GROUP BY node) "
        f"SELECT dg.node, COALESCE(tpn.tri, 0) AS tri, "
        f"CAST(dg.deg * (dg.deg - 1) // 2 AS BIGINT) AS wedges "
        f"FROM dg LEFT JOIN tpn USING (node)"
    )


def kcore_oracle(k: int = 2, rounds: int = 4) -> str:
    """Relational rendering of ``__ray_entry__._kg_kcore``: the fixed-round
    peeling unrolled — degrees over the current edge set, keep deg >= k,
    restrict edges — over the ordered turn-entity mention pairs."""
    t = raw_triples_sql(linked=True)
    # every CTE is MATERIALIZED: the peeling rounds reference their
    # predecessor three times each, and DuckDB's default inline expansion
    # would copy the base parquet scan 3^rounds times (fd exhaustion)
    parts = [
        f"WITH t AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"p0 AS MATERIALIZED (SELECT DISTINCT LEAST(subj, obj) AS a, "
        f"GREATEST(subj, obj) AS b "
        f"FROM t WHERE pred = {_q(vocab.P_MENTIONS)})"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
            f"(SELECT a AS node FROM p{r - 1} UNION ALL SELECT b FROM p{r - 1}) "
            f"GROUP BY node), "
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}), "
            f"p{r} AS MATERIALIZED (SELECT p.a, p.b FROM p{r - 1} p "
            f"JOIN k{r} x ON x.node = p.a JOIN k{r} y ON y.node = p.b)"
        )
    parts.append(
        f" SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
        f"(SELECT a AS node FROM p{rounds} UNION ALL SELECT b FROM p{rounds}) "
        f"GROUP BY node"
    )
    return "".join(parts)


def render_dialogs_oracle() -> str:
    """SQL mirror of ``training_data.render_dialogs``: turns joined in
    turn_idx order as ``role: text`` lines, one row per conversation."""
    return f"""
        WITH tx AS ({TRANSCRIPTS_SQL}),
             r AS (SELECT conv_id,
                          string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
                            AS rendered,
                          CAST(count(*) AS BIGINT) AS n_turns
                   FROM tx GROUP BY conv_id)
        SELECT conv_id, rendered, n_turns,
               CAST(length(rendered) AS BIGINT) AS n_chars
        FROM r"""


def sparql_graphgroups_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_graphgroups``:
    { GRAPH ?g { ?turn a ex:Turn . OPTIONAL { ?turn ex:mentions ?e } } } —
    per-graph LeftJoin: the mentions edge must live in the SAME graph as the
    type triple to extend the row."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj, graph FROM ({t})) "
        f"SELECT DISTINCT ty.graph AS g, ty.subj AS turn, m.obj AS e "
        f"FROM (SELECT subj, graph FROM t WHERE pred = {_q(RDF_TYPE)} "
        f"AND obj = {_q(vocab.C_TURN)}) ty "
        f"LEFT JOIN (SELECT subj, obj, graph FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) m "
        f"ON m.subj = ty.subj AND m.graph = ty.graph"
    )


def sparql_describe_where_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_describe_where``:
    every stored quad whose subject is mentioned by some turn (the DESCRIBE
    body's binding set), DISTINCT, in (subj, pred, obj, graph) order."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT subj, pred, obj, o_lang, o_dt, graph FROM t "
        f"WHERE subj IN (SELECT DISTINCT obj FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) "
        f"ORDER BY subj, pred, obj, graph"
    )


def loss_masks_oracle() -> str:
    """SQL mirror of ``training_data.loss_masks``: per-line whitespace token
    counts, running per-conversation offsets in turn order, assistant-only
    trainable flag."""
    return f"""
        WITH tx AS ({TRANSCRIPTS_SQL}),
             n AS (SELECT conv_id, turn_idx, role,
                          CAST(len(string_split(role || ': ' || text, ' ')) AS BIGINT)
                            AS n_tok
                   FROM tx),
             o AS (SELECT conv_id, turn_idx, role, n_tok,
                          CAST(coalesce(sum(n_tok) OVER (
                               PARTITION BY conv_id ORDER BY turn_idx
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                               AS BIGINT) AS start_tok
                   FROM n)
        SELECT conv_id, turn_idx, start_tok,
               start_tok + n_tok AS end_tok,
               CAST(role = 'assistant' AS BIGINT) AS trainable
        FROM o"""


def entity_cards_oracle() -> str:
    """SQL mirror of ``__ray_entry__._kg_entity_cards``: distinct mention /
    hasTurn edges, per-entity mention count, distinct-conversation count,
    and the (count DESC, entity ASC) top co-mentioned entity."""
    t = raw_triples_sql(linked=True)
    return f"""
        WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})),
             m AS (SELECT DISTINCT subj AS turn, obj AS entity FROM t
                   WHERE pred = {_q(vocab.P_MENTIONS)}),
             h AS (SELECT DISTINCT subj AS conv, obj AS turn FROM t
                   WHERE pred = {_q(vocab.P_HAS_TURN)}),
             nm AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_mentions
                    FROM m GROUP BY entity),
             nc AS (SELECT entity, CAST(count(DISTINCT conv) AS BIGINT) AS n_convs
                    FROM m JOIN h USING (turn) GROUP BY entity),
             co AS (SELECT a.entity AS e1, b.entity AS e2,
                           CAST(count(*) AS BIGINT) AS n
                    FROM m a JOIN m b ON a.turn = b.turn AND a.entity != b.entity
                    GROUP BY 1, 2),
             top AS (SELECT e1 AS entity, e2 AS top_co, n AS top_co_n FROM (
                       SELECT e1, e2, n, row_number() OVER (
                           PARTITION BY e1 ORDER BY n DESC, e2 ASC) AS rn
                       FROM co) WHERE rn = 1)
        SELECT nm.entity, nm.n_mentions,
               coalesce(nc.n_convs, 0) AS n_convs,
               top.top_co,
               coalesce(top.top_co_n, 0) AS top_co_n
        FROM nm LEFT JOIN nc USING (entity) LEFT JOIN top USING (entity)"""


def bfs_khop_oracle(max_depth: int = 3) -> str:
    """SQL mirror of ``__ray_entry__._kg_bfs_khop``: unrolled BFS layers
    r0..r_k over the symmetrized distinct hasTurn+mentions edges, seed = the
    lexicographically first conversation; dist = first layer containing the
    node."""
    t = raw_triples_sql(linked=True)
    layers = ["r0 AS (SELECT (SELECT min(subj) FROM t WHERE pred = "
              f"{_q(vocab.P_HAS_TURN)}) AS node)"]
    for d in range(1, max_depth + 1):
        layers.append(
            f"r{d} AS (SELECT node FROM r{d-1} "
            f"UNION SELECT e.dst AS node FROM e JOIN r{d-1} ON e.src = r{d-1}.node)"
        )
    case = " ".join(
        f"WHEN node IN (SELECT node FROM r{d}) THEN {d}" for d in range(max_depth + 1)
    )
    return f"""
        WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})),
             ed AS (SELECT DISTINCT subj AS src, obj AS dst FROM t
                    WHERE pred IN ({_q(vocab.P_HAS_TURN)}, {_q(vocab.P_MENTIONS)})),
             e AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
             {', '.join(layers)}
        SELECT node, CAST(CASE {case} END AS BIGINT) AS dist
        FROM r{max_depth}"""


def characteristic_sets_oracle() -> str:
    """Per-subject predicate-set census over the raw linked triple stream
    (pred-set dedup is inherent to the set semantics, so no DISTINCT on the
    stream itself — mirrors functions/graph.py:characteristic_sets)."""
    return (
        "SELECT cset, n_preds, CAST(count(*) AS BIGINT) AS n_subjects FROM ("
        "  SELECT subj, array_to_string(list_sort(list(DISTINCT pred)), ',') AS cset,"
        "         CAST(count(DISTINCT pred) AS BIGINT) AS n_preds"
        f"  FROM ({raw_triples_sql(linked=True)}) GROUP BY subj"
        ") GROUP BY cset, n_preds"
    )


def degree_histogram_oracle() -> str:
    return (
        "SELECT deg, CAST(count(*) AS BIGINT) AS n_subjects FROM ("
        f"SELECT subj, CAST(count(*) AS BIGINT) AS deg FROM ({raw_triples_sql(linked=True)}) GROUP BY subj"
        ") GROUP BY deg"
    )


def void_summary_oracle() -> str:
    """VoID summary over the set-semantics triple view (distinct
    (subj,pred,obj,o_lang,o_dt), the fold's dedup key)."""
    return (
        f"WITH t AS (SELECT DISTINCT subj, pred, obj, o_lang, o_dt "
        f"           FROM ({raw_triples_sql(linked=True)})) "
        f"SELECT CAST((SELECT count(*) FROM t) AS BIGINT) AS n_triples, "
        f"       CAST((SELECT count(DISTINCT subj) FROM t) AS BIGINT) AS n_subjects, "
        f"       CAST((SELECT count(DISTINCT pred) FROM t) AS BIGINT) AS n_properties, "
        f"       CAST((SELECT count(DISTINCT obj) FROM t) AS BIGINT) AS n_objects, "
        f"       CAST((SELECT count(DISTINCT obj) FROM t WHERE pred = {_q(RDF_TYPE)}) AS BIGINT) AS n_classes"
    )


def literal_stats_oracle() -> str:
    return (
        "SELECT coalesce(o_dt, '') AS dt, coalesce(o_lang, '') AS lang, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(length(obj)) AS BIGINT) AS min_len, "
        "CAST(max(length(obj)) AS BIGINT) AS max_len "
        f"FROM ({raw_triples_sql(linked=True)}) WHERE o_kind = 2 "
        "GROUP BY 1, 2"
    )


def sparql_boundexpr_oracle() -> str:
    """Relational rendering of ``__ray_entry__._kg_sparql_boundexpr``:
    { ?turn a ex:Turn . OPTIONAL { ?turn ex:mentions ?e }
      FILTER(!BOUND(?e) || CONTAINS(?e, "ray")) } — LEFT JOIN then the
    disjunction over the nullable column."""
    t = raw_triples_sql(linked=True)
    return (
        f"WITH t AS ({t}) "
        f"SELECT DISTINCT ty.subj AS turn, m.obj AS e "
        f"FROM (SELECT DISTINCT subj FROM t WHERE pred = {_q(RDF_TYPE)} AND obj = {_q(vocab.C_TURN)}) ty "
        f"LEFT JOIN (SELECT DISTINCT subj, obj FROM t WHERE pred = {_q(vocab.P_MENTIONS)}) m ON m.subj = ty.subj "
        f"WHERE (m.obj IS NULL OR contains(m.obj, 'ray'))"
    )


def retract_oracle(forget: list[str]) -> str:
    """Dedup/fold SQL over the triple stream EXCLUDING the forgotten named
    graphs — the ground truth for quad_state_retract (incremental.py):
    state_folded after retraction must hash-match a from-scratch load of the
    corpus minus those graphs."""
    lst = ", ".join(_q(g) for g in forget)
    return (
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM ({raw_triples_sql(linked=True)}) WHERE graph NOT IN ({lst}) "
        f"GROUP BY subj, pred, obj, o_lang, o_dt"
    )


def sparql_update_oracle() -> str:
    """Ground truth for the ``kg_sparql_update`` entry (__ray_entry__._KG_UPDATE_SRC):
    a from-scratch fold of the corpus with the two DELETE WHERE constraint sets
    filtered out and the three INSERT DATA quads unioned in — the hash match
    proves apply_update == rebuild-with-edits. Constants here mirror the entry's
    UPDATE script verbatim."""
    g2 = _q("https://graphs.example.org/g2")
    g0 = _q("https://graphs.example.org/g0")
    manual = _q("https://ex.org/conv/manual-0")
    kept = (
        f"SELECT * FROM ({raw_triples_sql(linked=True)}) "
        f"WHERE NOT (pred = {_q(vocab.P_TOOL)}) "
        f"AND NOT (pred = {_q(vocab.P_ROLE)} AND obj = 'tool' AND o_lang IS NULL "
        f"AND o_dt = {_q(XSD_STRING)} AND graph = {g2})"
    )
    ins = (
        f"SELECT {manual} AS subj, 1 AS s_kind, {_q(RDF_TYPE)} AS pred, "
        f"{_q(vocab.C_CONVERSATION)} AS obj, 1 AS o_kind, "
        f"CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_dt, {g0} AS graph "
        f"UNION ALL SELECT {manual}, 1, {_q(vocab.P_SOURCE)}, "
        f"{_q(vocab.SRC + 'manual')}, 1, NULL, NULL, {g0} "
        f"UNION ALL SELECT {manual}, 1, {_q(vocab.P_CHAR_COUNT)}, "
        f"'42', 2, NULL, {_q(XSD_INTEGER)}, {g0}"
    )
    return (
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM ({kept} UNION ALL {ins}) "
        f"GROUP BY subj, pred, obj, o_lang, o_dt"
    )


def sparql_manage_oracle() -> str:
    """Ground truth for ``kg_sparql_manage`` (__ray_entry__._KG_MANAGE_SRC +
    the LOAD step): rebuild-with-graph-edits — COPY g0 -> urn:work, ADD g1
    into urn:work, MOVE g2 -> urn:archive (g2 gone), CLEAR g3, plus the two
    constant LOADed quads in urn:loaded. The hash match proves the per-bucket
    exchange-free graph rewrites equal a from-scratch load of the re-graphed
    corpus. Constants mirror the entry's management script verbatim."""
    g0 = _q("https://graphs.example.org/g0")
    g1 = _q("https://graphs.example.org/g1")
    g2 = _q("https://graphs.example.org/g2")
    g3 = _q("https://graphs.example.org/g3")
    t = raw_triples_sql(linked=True)
    return (
        f"WITH raw AS ({t}), "
        f"kept AS (SELECT subj, pred, obj, o_lang, o_dt, graph FROM raw "
        f"WHERE graph NOT IN ({g2}, {g3})), "
        f"work AS (SELECT subj, pred, obj, o_lang, o_dt, 'urn:work' AS graph "
        f"FROM raw WHERE graph IN ({g0}, {g1})), "
        f"arch AS (SELECT subj, pred, obj, o_lang, o_dt, 'urn:archive' "
        f"FROM raw WHERE graph = {g2}), "
        f"loaded AS (SELECT 'https://ex.org/loaded/1' AS subj, "
        f"{_q(vocab.P_SOURCE)} AS pred, {_q(vocab.SRC + 'load')} AS obj, "
        f"CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_dt, "
        f"'urn:loaded' AS graph "
        f"UNION ALL SELECT 'https://ex.org/loaded/2', {_q(vocab.P_SOURCE)}, "
        f"{_q(vocab.SRC + 'load')}, NULL, NULL, 'urn:loaded'), "
        f"uni AS (SELECT * FROM kept UNION ALL SELECT * FROM work "
        f"UNION ALL SELECT * FROM arch UNION ALL SELECT * FROM loaded) "
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM uni GROUP BY subj, pred, obj, o_lang, o_dt"
    )


def sparql_modify_oracle() -> str:
    """Ground truth for ``kg_sparql_modify`` (__ray_entry__._KG_MODIFY_SRC):
    the WHERE { GRAPH ?g { ?t ex:role "user" } } matches are exactly the
    role='user' quads, so rebuild-with-edits = corpus with those quads
    dropped, the renamed quad re-inserted into the SAME graph each match came
    from, and one default-graph provenance triple per matched turn. The hash
    match proves quad_state_modify's pre-state-instantiated delete+insert
    equals a from-scratch load of the edited corpus."""
    dg = _q("https://graphs.example.org/default")
    role = _q(vocab.P_ROLE)
    rf = _q(vocab.EX + "renamedFrom")
    xs = _q(XSD_STRING)
    t = raw_triples_sql(linked=True)
    return (
        f"WITH raw AS ({t}), "
        f"m AS (SELECT DISTINCT subj AS t, graph AS g FROM raw "
        f"WHERE pred = {role} AND obj = 'user' AND o_lang IS NULL AND o_dt = {xs}), "
        f"kept AS (SELECT subj, pred, obj, o_lang, o_dt, graph FROM raw "
        f"WHERE NOT (pred = {role} AND obj = 'user' AND o_lang IS NULL AND o_dt = {xs})), "
        f"ins AS (SELECT DISTINCT t AS subj, {role} AS pred, 'human' AS obj, "
        f"CAST(NULL AS VARCHAR) AS o_lang, {xs} AS o_dt, g AS graph FROM m "
        f"UNION SELECT DISTINCT t, {rf}, 'user', NULL, {xs}, {dg} FROM m), "
        f"uni AS (SELECT * FROM kept UNION ALL SELECT * FROM ins) "
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM uni GROUP BY subj, pred, obj, o_lang, o_dt"
    )


def conv_stats_oracle() -> str:
    return (
        f"SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns, "
        f"CAST(count(DISTINCT role) AS BIGINT) AS n_roles, "
        f"CAST(sum(length(text)) AS BIGINT) AS n_chars, "
        f"CAST(count(tool) AS BIGINT) AS n_tool_calls, "
        f"CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS span_s "
        f"FROM ({TRANSCRIPTS_SQL}) GROUP BY conv_id"
    )


def role_transitions_oracle() -> str:
    return (
        f"WITH tx AS ({TRANSCRIPTS_SQL}), "
        f"nx AS (SELECT role, lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role FROM tx) "
        f"SELECT role, next_role, CAST(count(*) AS BIGINT) AS n "
        f"FROM nx WHERE next_role IS NOT NULL GROUP BY role, next_role"
    )


def turn_dedup_oracle() -> str:
    return (
        f"SELECT conv_id, turn_idx, n_dups FROM ("
        f"  SELECT conv_id, turn_idx, "
        f"         row_number() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) AS rn, "
        f"         CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS n_dups "
        f"  FROM ({TRANSCRIPTS_SQL})"
        f") WHERE rn = 1"
    )


def random_walks_oracle(n_steps: int = 4) -> str:
    """Relational rendering of ``__ray_entry__._kg_random_walks``: the
    deterministic hash-guided walk recurrence unrolled as chained CTEs over
    the symmetrized hasTurn+mentions edge set. Step choice =
    min over neighbors of ``(fp(seed)*K_A + t*K_B + fp(u)*P) mod 2^64``
    (ties: u ASC) — realized, exactly as the Ray side does, as the string
    min of ``printf('%08x%08x', h) || u``; fp is the polynomial byte hash
    shared with the dedup oracle family (constants imported, cannot drift)."""
    from .functions import hashing as H
    from .oracles_td import U64, _mulmod, _poly_hash, _unsigned

    ka, kb, pp = H.K_A, H.K_B, int(H.P)
    t = raw_triples_sql(linked=True)
    parts = [
        f"WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({t})), "
        f"e AS (SELECT DISTINCT subj AS s, obj AS d FROM t "
        f"WHERE pred IN ({_q(vocab.P_HAS_TURN)}, {_q(vocab.P_MENTIONS)})), "
        f"sym AS (SELECT s AS a, d AS b FROM e UNION SELECT d, s FROM e), "
        f"nodes AS (SELECT a AS v FROM sym UNION SELECT b FROM sym), "
        f"fp AS (SELECT v, {_poly_hash('hex(encode(v))')} AS f FROM nodes), "
        f"w0 AS (SELECT DISTINCT subj AS walk, subj AS node FROM t "
        f"WHERE pred = {_q(vocab.P_HAS_TURN)})"
    ]
    for i in range(1, n_steps + 1):
        tb = (i * kb) % (1 << 64)
        h = (
            f"(({_mulmod(_unsigned('fw.f'), str(ka), str(ka % 2**32))} "
            f"+ CAST('{tb}' AS HUGEINT) "
            f"+ {_mulmod(_unsigned('fd.f'), str(pp), str(pp % 2**32))}) "
            f"% CAST('{U64}' AS HUGEINT))"
        )
        hex16 = (
            f"printf('%08x%08x', CAST({h} // 4294967296 AS BIGINT), "
            f"CAST({h} % 4294967296 AS BIGINT))"
        )
        parts.append(
            f", c{i} AS (SELECT w.walk, sym.b AS dst FROM w{i - 1} w "
            f"JOIN sym ON sym.a = w.node), "
            f"h{i} AS (SELECT c.walk, {hex16} || c.dst AS k FROM c{i} c "
            f"JOIN fp fw ON fw.v = c.walk JOIN fp fd ON fd.v = c.dst), "
            f"w{i} AS (SELECT walk, substr(min(k), 17) AS node FROM h{i} "
            f"GROUP BY walk)"
        )
    sel = " UNION ALL ".join(
        f"SELECT walk, CAST({i} AS BIGINT) AS step, node FROM w{i}"
        for i in range(0, n_steps + 1)
    )
    parts.append(f" {sel}")
    return "".join(parts)


def sparql_insertwhere_oracle() -> str:
    """Ground truth for ``kg_sparql_insertwhere``
    (__ray_entry__._KG_INSERTWHERE_SRC): the WHERE BGP { ?c ex:hasTurn ?t .
    ?t ex:mentions ?e } rendered as a distinct join, the two template
    triples derived per solution into the default graph, unioned with the
    corpus and folded — the hash match proves the pattern-driven insert
    equals rebuild-with-derived-triples."""
    dg = _q("https://graphs.example.org/default")
    mi = _q(vocab.EX + "mentionedIn")
    ic = _q(vocab.EX + "inConversation")
    t = raw_triples_sql(linked=True)
    return (
        f"WITH raw AS ({t}), "
        f"h AS (SELECT DISTINCT subj AS c, obj AS tn FROM raw "
        f"WHERE pred = {_q(vocab.P_HAS_TURN)}), "
        f"m AS (SELECT DISTINCT subj AS tn, obj AS e FROM raw "
        f"WHERE pred = {_q(vocab.P_MENTIONS)}), "
        f"j AS (SELECT DISTINCT c, tn, e FROM h JOIN m USING (tn)), "
        f"ins AS (SELECT DISTINCT e AS subj, {mi} AS pred, c AS obj, "
        f"CAST(NULL AS VARCHAR) AS o_lang, CAST(NULL AS VARCHAR) AS o_dt, "
        f"{dg} AS graph FROM j "
        f"UNION SELECT DISTINCT tn, {ic}, c, NULL, NULL, {dg} FROM j), "
        f"uni AS (SELECT subj, pred, obj, o_lang, o_dt, graph FROM raw "
        f"UNION ALL SELECT * FROM ins) "
        f"SELECT subj, pred, obj, o_lang, o_dt, "
        f"array_to_string(list_sort(list(DISTINCT graph)), ',') AS graphs_s, "
        f"CAST(count(DISTINCT graph) AS BIGINT) AS n_graphs "
        f"FROM uni GROUP BY subj, pred, obj, o_lang, o_dt"
    )
