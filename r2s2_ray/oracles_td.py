"""DuckDB oracle-SQL builders for the training-data operator family.

Each builder mirrors, bit for bit, the corresponding Ray operator in
``functions/`` — possible because those operators use the SQL-expressible hash
family from :mod:`r2s2_ray.functions.hashing` (polynomial byte hash, affine
MinHash permutations, polynomial band combiner, Rademacher hyperplanes). The
constants are IMPORTED from that module so the two sides cannot drift.

All 64-bit modular arithmetic is done in HUGEINT with explicit ``% 2^64``;
values cross into the signed BIGINT world via the two's-complement CASE. DuckDB
``list_reduce`` coerces its accumulator to the list element type, so the Horner
fold keeps the accumulator signed-64 at every step.
"""

from __future__ import annotations

from .functions import hashing as H

U64 = "18446744073709551616"  # 2^64
I63 = "9223372036854775808"  # 2^63
P = int(H.P)
Q = int(H.Q)
K_A = H.K_A


def _signed(u: str) -> str:
    """HUGEINT in [0, 2^64) -> signed BIGINT (two's complement)."""
    return (
        f"CAST(CASE WHEN {u} >= CAST('{I63}' AS HUGEINT) "
        f"THEN {u} - CAST('{U64}' AS HUGEINT) ELSE {u} END AS BIGINT)"
    )


def _unsigned(s: str) -> str:
    """signed BIGINT -> HUGEINT in [0, 2^64)."""
    return (
        f"(CASE WHEN {s} < 0 THEN CAST({s} AS HUGEINT) + CAST('{U64}' AS HUGEINT) "
        f"ELSE CAST({s} AS HUGEINT) END)"
    )


def _mulmod(u: str, a: str, a_lo: str | None = None) -> str:
    """(u * a) mod 2^64 without overflowing HUGEINT: split u into 32-bit halves.
    ``a_lo`` is a mod 2^32 (precomputed for constant a, expression otherwise)."""
    if a_lo is None:
        a_lo = f"({a} % 4294967296)"
    lo = f"({u} % 4294967296)"
    hi = f"({u} // 4294967296)"
    return (
        f"((({lo} * {a}) + ((({hi} * {a_lo}) % 4294967296) * 4294967296)) "
        f"% CAST('{U64}' AS HUGEINT))"
    )


#: byte list of an UPPERCASE hex string hx ('0' maps via strpos miss -> 0)
def _bytes_of_hex(hx: str, alphabet: str = "123456789ABCDEF") -> str:
    return (
        f"list_transform(range(0, length({hx}) // 2), "
        f"i -> strpos('{alphabet}', substr({hx}, 2*i + 1, 1)) * 16 "
        f"   + strpos('{alphabet}', substr({hx}, 2*i + 2, 1)))"
    )


#: Horner fold step for the polynomial hash, accumulator kept signed-64
def _horner_lam() -> str:
    step = f"({_mulmod(_unsigned('acc'), str(P), str(P % 2**32))} + x) % CAST('{U64}' AS HUGEINT)"
    # poly base P < 2^41 so acc*P + x < 2^105: the mulmod split keeps it exact
    return f"(acc, x) -> {_signed(step)}"


def _poly_hash(hx: str) -> str:
    """Signed-BIGINT polynomial hash of the string whose UPPERCASE hex is hx."""
    return (
        f"CASE WHEN length({hx}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE list_reduce(list_reverse({_bytes_of_hex(hx)}), {_horner_lam()}) END"
    )


def fingerprint_oracle() -> str:
    return f"""
        WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents)
        SELECT doc_id, {_poly_hash('h')} AS fingerprint FROM hx"""


def sequence_pack_oracle(budget: int = 256) -> str:
    """DuckDB mirror of functions.textstats.sequence_pack: global running
    token count in doc_id order, pack = prefix // budget."""
    return f"""
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
             c AS (SELECT doc_id, n_tokens,
                          sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_tokens AS prefix
                   FROM t)
        SELECT doc_id, n_tokens,
               CAST(prefix // {budget} AS BIGINT) AS pack_id,
               CAST(prefix % {budget} AS BIGINT) AS pack_offset
        FROM c"""


def stratified_split_oracle(test_pct: int = 5, val_pct: int = 5) -> str:
    """DuckDB mirror of functions.textstats.stratified_split: unsigned
    fingerprint mod 100 -> bucket, CASE thresholds -> split label."""
    return f"""
        WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
             fp AS (SELECT doc_id, {_poly_hash('h')} AS f FROM hx)
        SELECT doc_id,
               CAST({_unsigned('f')} % 100 AS BIGINT) AS bucket,
               CASE WHEN {_unsigned('f')} % 100 < {test_pct} THEN 'test'
                    WHEN {_unsigned('f')} % 100 < {test_pct + val_pct} THEN 'val'
                    ELSE 'train' END AS split
        FROM fp"""


#: deterministic PII injection shared by __ray_entry__._txt_pii_scrub and the
#: oracle below: the synthetic corpus contains no digits/@, so meaningful
#: redaction needs planted PII, derived from doc_id on BOTH sides
PII_INJECT_SQL = (
    "text || ' contact doc' || doc_id || '@example.com from 10.' || (doc_id % 200)"
    " || '.0.' || (doc_id % 250) || ' tel +41' || (70000000 + doc_id)"
    " || CASE WHEN doc_id % 5 = 0 THEN ' cc admin@example.org' ELSE '' END"
)


def pii_scrub_oracle() -> str:
    """DuckDB mirror of functions.textstats.pii_scrub over the PII-injected
    corpus: counts on the original text, then ordered regexp_replace. Both
    engines run RE2, so the patterns behave identically."""
    from .functions.textstats import PII_PATTERNS

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = "t"
    for _, pat, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    return f"""
        WITH src AS (SELECT doc_id, {PII_INJECT_SQL} AS t FROM documents)
        SELECT doc_id, {counts}, {clean} AS clean_text FROM src"""


def token_chunks_oracle(chunk_size: int = 32) -> str:
    """DuckDB mirror of functions.textstats.token_chunks: per-document
    fixed-size token windows via per-row unnest(range(ceil(n/size))) +
    1-based-inclusive list_slice."""
    c = chunk_size
    return f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             e AS (SELECT doc_id, toks,
                          unnest(range((len(toks) + {c - 1}) // {c})) AS ci
                   FROM t)
        SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
               CAST(len(list_slice(toks, ci * {c} + 1, ci * {c} + {c})) AS BIGINT) AS n_tokens,
               array_to_string(list_slice(toks, ci * {c} + 1, ci * {c} + {c}), ' ') AS chunk_text
        FROM e"""


def langid_oracle() -> str:
    from .functions.textstats import LANG_PROFILES

    langs = [l for l in LANG_PROFILES if LANG_PROFILES[l]]  # en, de, fr, es
    counts = ", ".join(
        "count(*) FILTER (tok IN ({})) AS c_{}".format(
            ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[l])), l
        )
        for l in langs
    )
    order = langs + ["zh"]  # numpy argmax: first max wins, in column order
    whens = []
    for i, l in enumerate(order[:-1]):
        conds = " AND ".join(f"c_{l} >= c_{m}" for m in order[i + 1 :])
        whens.append(f"WHEN {conds} THEN '{l}'")
    case = (
        "CASE WHEN " + " AND ".join(f"c_{l} = 0" for l in order) + " THEN 'unknown' "
        + " ".join(whens)
        + f" ELSE '{order[-1]}' END"
    )
    coal = ", ".join(f"coalesce(s.c_{l}, 0) AS c_{l}" for l in langs)
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
          FROM documents),
        scores AS (SELECT doc_id, {counts} FROM toks GROUP BY doc_id),
        cjk AS (SELECT doc_id,
                       4 * len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS c_zh
                FROM documents),
        j AS (SELECT c.doc_id, {coal}, c.c_zh AS c_zh
              FROM cjk c LEFT JOIN scores s ON s.doc_id = c.doc_id)
        SELECT doc_id, {case} AS lang_pred FROM j"""


#: (k, 2^k as BIGINT) rows for simhash bit extraction / reassembly (k < 63)
def _pow2_values() -> str:
    rows = ", ".join(f"({k}, {1 << k})" for k in range(63))
    return f"(VALUES {rows}, (63, 0)) pw(k, p)"


def simhash_oracle() -> str:
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS tok
          FROM documents),
        hx AS (SELECT doc_id, hex(encode(tok)) AS h FROM toks),
        th AS (SELECT doc_id, {_poly_hash('h')} AS hs FROM hx),
        bits AS (
          SELECT doc_id, pw.k, pw.p,
                 sum(CASE WHEN ((hs >> pw.k) & 1) = 1 THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN {_pow2_values()}
          GROUP BY doc_id, pw.k, pw.p)
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN
                   CASE WHEN k = 63 THEN -{I63} ELSE p END ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM bits GROUP BY doc_id"""


def _shingles_cte(shingle_k: int = 3, source: str = "documents") -> str:
    """DISTINCT (doc_id, s) word-k-shingles — mirrors dedup._shingle_rows."""
    concat = " || ' ' || ".join(f"toks[i + {j}]" for j in range(shingle_k))
    return f"""
        d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
              FROM {source}),
        sh AS (SELECT DISTINCT doc_id, s FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(1, len(toks) - {shingle_k - 2}),
                               i -> {concat})) AS s
                 FROM d))"""


def _minhash_ctes(num_perm: int = 64, bands: int = 16, shingle_k: int = 3, source: str = "documents") -> str:
    """CTE chain ending in ``bandkeys(doc_id, band, bh)`` — composable into
    larger oracles (td_prepare)."""
    rows = num_perm // bands
    perm_rows = ", ".join(
        "({}, CAST('{}' AS HUGEINT), CAST('{}' AS HUGEINT), {})".format(
            i, H.perm_constants(i)[0], H.perm_constants(i)[1], H.perm_constants(i)[0] % 2**32
        )
        for i in range(num_perm)
    )
    q_rows = ", ".join(
        "({}, CAST('{}' AS HUGEINT), {})".format(
            r, pow(Q, r, 2**64), pow(Q, r, 2**64) % 2**32
        )
        for r in range(rows)
    )
    affine = f"({_mulmod(_unsigned('bh'), 'p.a', 'p.alo')} + p.b) % CAST('{U64}' AS HUGEINT)"
    combined = _mulmod("sig.h", "q.qr", "q.qlo")
    return f"""
        {_shingles_cte(shingle_k, source)},
        shx AS (SELECT doc_id, hex(encode(s)) AS h FROM sh),
        base AS (SELECT doc_id, {_poly_hash('h')} AS bh FROM shx),
        perms AS (SELECT * FROM (VALUES {perm_rows}) p(i, a, b, alo)),
        sig AS (SELECT base.doc_id, p.i, min({affine}) AS h
                FROM base CROSS JOIN perms p GROUP BY base.doc_id, p.i),
        qs AS (SELECT * FROM (VALUES {q_rows}) q(r, qr, qlo)),
        bandkeys AS (
          SELECT sig.doc_id, sig.i // {rows} AS band,
                 {_signed(f"(sum({combined}) % CAST('{U64}' AS HUGEINT))")} AS bh
          FROM sig JOIN qs q ON sig.i % {rows} = q.r
          GROUP BY sig.doc_id, sig.i // {rows})"""


def minhash_pairs_oracle(num_perm: int = 64, bands: int = 16, shingle_k: int = 3) -> str:
    return f"""
        WITH {_minhash_ctes(num_perm, bands, shingle_k)}
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bandkeys x JOIN bandkeys y
          ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id"""


def td_prepare_oracle(
    min_tokens: int = 5, max_chars: int = 20_000, num_perm: int = 64, bands: int = 16
) -> str:
    """Composite corpus-preparation oracle: quality gate -> exact dedup (keep
    min doc_id per text) -> MinHash-LSH near-dedup (drop the larger id of every
    candidate pair). Mirrors pipelines/training_data.prepare_corpus."""
    return f"""
        WITH qf AS (
          SELECT doc_id, text FROM documents
          WHERE len(regexp_extract_all(text, '[a-z0-9]+')) >= {min_tokens}
            AND length(text) <= {max_chars}
            AND len(regexp_extract_all(text, '[A-Za-z]')) >= 1),
        e AS (SELECT min(doc_id) AS doc_id, text FROM qf GROUP BY text),
        {_minhash_ctes(num_perm, bands, 3, "e")},
        pairs AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bandkeys x JOIN bandkeys y
            ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
        SELECT doc_id FROM e WHERE doc_id NOT IN (SELECT b FROM pairs)"""


def _planes_cte(num_tables: int, num_planes: int, dim: int) -> str:
    """Rademacher plane entries s(t, p, d) — mirrors hashing.plane_matrix."""
    ka_lo = K_A % 2**32
    x = "(t.t * 1000003 + p.p * 1009 + d.d + 1)"
    h = _mulmod(f"CAST({x} AS HUGEINT)", str(K_A), str(ka_lo))
    return f"""
        planes AS (
          SELECT t.t, p.p, d.d,
                 CASE WHEN {h} >= CAST('{I63}' AS HUGEINT) THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range({num_tables})) AS t) t
          CROSS JOIN (SELECT unnest(range({num_planes})) AS p) p
          CROSS JOIN (SELECT unnest(range({dim})) AS d) d)"""


def embedding_lsh_oracle(
    threshold: float = 0.4, num_planes: int = 4, num_tables: int = 8, dim: int = 64
) -> str:
    return f"""
        WITH {_planes_cte(num_tables, num_planes, dim)},
        dots AS (
          SELECT e.vec_id, pl.t, pl.p,
                 sum(CAST(e.embedding[pl.d + 1] AS DOUBLE) * pl.s) AS dot
          FROM embeddings e JOIN planes pl ON pl.d < len(e.embedding)
          GROUP BY e.vec_id, pl.t, pl.p),
        buckets AS (
          SELECT vec_id, t,
                 sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, t),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
        SELECT a, b,
               round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
        FROM cand JOIN embeddings ea ON ea.vec_id = a
                  JOIN embeddings eb ON eb.vec_id = b
        WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])) >= {threshold}"""


def ann_lsh_oracle(
    k: int = 5, num_planes: int = 8, hamming_probe: int = 1, n_queries: int = 8, dim: int = 64
) -> str:
    assert hamming_probe == 1
    return f"""
        WITH {_planes_cte(1, num_planes, dim)},
        dots AS (
          SELECT e.vec_id, pl.p,
                 sum(CAST(e.embedding[pl.d + 1] AS DOUBLE) * pl.s) AS dot
          FROM embeddings e JOIN planes pl ON pl.d < len(e.embedding)
          GROUP BY e.vec_id, pl.p),
        sigs AS (
          SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS sig
          FROM dots GROUP BY vec_id),
        allowed AS (
          SELECT DISTINCT sig AS bucket FROM sigs WHERE vec_id < {n_queries}
          UNION
          SELECT DISTINCT xor(sig, 1 << b.b) AS bucket
          FROM sigs CROSS JOIN (SELECT unnest(range({num_planes})) AS b) b
          WHERE vec_id < {n_queries}),
        cand AS (
          SELECT s.vec_id FROM sigs s JOIN allowed a ON s.sig = a.bucket),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id,
                 list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                        CAST(ec.embedding AS DOUBLE[])) AS cos
          FROM (SELECT vec_id FROM embeddings WHERE vec_id < {n_queries}) q
          JOIN embeddings eq ON eq.vec_id = q.vec_id
          CROSS JOIN cand c
          JOIN embeddings ec ON ec.vec_id = c.vec_id)
        SELECT qid, vec_id
        FROM (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
              FROM scored)
        WHERE rn <= {k}"""


def image_features_oracle(n_bytes: int = 64) -> str:
    """sha256-chain feature: d1 = sha256(text), d2 = sha256(d1-hex), bytes =
    unhex-concat truncated to n_bytes, each scaled by exact dyadic 1/256."""
    n_digests = -(-n_bytes // 32)
    chain = ["sha256(text)"]
    for _ in range(n_digests - 1):
        chain.append(f"sha256({chain[-1]})")
    hx = f"upper({' || '.join(chain)})"
    return f"""
        WITH hx AS (SELECT doc_id AS media_id, substr({hx}, 1, {2 * n_bytes}) AS h
                    FROM documents)
        SELECT media_id,
               list_transform({_bytes_of_hex('h')},
                              b -> CAST(b / 256.0 AS FLOAT)) AS feature
        FROM hx"""


def video_frames_oracle(stride: int = 10) -> str:
    """Strided frame sampling over the data-dependent frame count declared by
    ``__ray_entry__._mm_video_frames`` (n_frames = len(text) % 97 + 4): one
    (media_id, frame_idx) row per stride step below the count."""
    max_steps = -(-(96 + 4) // stride)  # frame counts are <= 100
    return f"""
        SELECT d.doc_id AS media_id, CAST(f.fi * {stride} AS INTEGER) AS frame_idx
        FROM documents d
        CROSS JOIN (SELECT unnest(range({max_steps})) AS fi) f
        WHERE f.fi * {stride} < length(d.text) % 97 + 4"""


def audio_frames_oracle(n_samples: int = 1600, win: int = 400, hop: int = 160) -> str:
    n_frames = len(range(0, max(1, n_samples - win + 1), hop))
    return f"""
        WITH hx AS (SELECT doc_id AS media_id, upper(sha256(text)) AS h FROM documents),
        bytes AS (
          SELECT media_id, j.j,
                 strpos('123456789ABCDEF', substr(h, 2*j.j + 1, 1)) * 16
               + strpos('123456789ABCDEF', substr(h, 2*j.j + 2, 1)) AS bv
          FROM hx CROSS JOIN (SELECT unnest(range(32)) AS j) j),
        pos AS (
          SELECT f.fi, f.fi * {hop} + w.w AS sample
          FROM (SELECT unnest(range({n_frames})) AS fi) f
          CROSS JOIN (SELECT unnest(range({win})) AS w) w
          WHERE f.fi * {hop} + w.w < {n_samples})
        SELECT b.media_id, CAST(p.fi AS INTEGER) AS frame_idx,
               CAST(sum(b.bv * b.bv) AS BIGINT) AS energy
        FROM bytes b JOIN pos p ON b.j = p.sample % 32
        GROUP BY b.media_id, p.fi"""


def connected_components_oracle(per_doc: int = 20, groups: int = 50) -> str:
    """Recursive-CTE min-label propagation over the same synthetic edge list as
    functions.graph.cc_demo_edges: per-document stars + modular group anchors.
    The ``label < dst`` prune is safe (the component minimum is < every other
    node) and keeps the fixpoint near-linear."""
    return f"""
        WITH RECURSIVE e0 AS (
          SELECT 'n' || lpad(CAST(doc_id * {per_doc} + j.j AS VARCHAR), 8, '0') AS src,
                 'n' || lpad(CAST(doc_id * {per_doc} AS VARCHAR), 8, '0') AS dst
          FROM documents CROSS JOIN (SELECT unnest(range(1, {per_doc})) AS j) j
          UNION ALL
          SELECT 'n' || lpad(CAST(doc_id * {per_doc} AS VARCHAR), 8, '0') AS src,
                 'g' || lpad(CAST(doc_id % {groups} AS VARCHAR), 8, '0') AS dst
          FROM documents),
        e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        cc AS (
          SELECT node, node AS label FROM nodes
          UNION
          SELECT e.dst AS node, cc.label
          FROM cc JOIN e ON cc.node = e.src
          WHERE cc.label < e.dst)
        SELECT node, min(label) AS label FROM cc GROUP BY node"""


def repetition_oracle() -> str:
    """Oracle for functions.textstats.repetition_signals: non-empty line
    counts and duplicate lines, lowercase space-split word counts and
    duplicates, and adjacent-word-bigram totals / top count per document."""
    return """
WITH d AS (SELECT doc_id, text FROM documents),
ln AS (SELECT doc_id, list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS lines FROM d),
w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks FROM d),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b FROM w),
bgc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS top_bigram_n
        FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b) GROUP BY doc_id)
SELECT d.doc_id,
  CAST(coalesce(len(ln.lines), 0) AS BIGINT) AS n_lines,
  CAST(coalesce(len(ln.lines) - len(list_distinct(ln.lines)), 0) AS BIGINT) AS n_dup_lines,
  CAST(coalesce(len(w.toks), 0) AS BIGINT) AS n_words,
  CAST(coalesce(len(w.toks) - len(list_distinct(w.toks)), 0) AS BIGINT) AS n_dup_words,
  coalesce(bgc.n_bigrams, 0) AS n_bigrams,
  coalesce(bgc.top_bigram_n, 0) AS top_bigram_n
FROM d JOIN ln USING(doc_id) JOIN w USING(doc_id) LEFT JOIN bgc USING(doc_id)
"""


def contamination_oracle(bench_mod: int = 97, shingle_k: int = 5) -> str:
    """Oracle for functions.dedup.contamination_flags: a document (outside the
    benchmark stand-in, doc_id % bench_mod == 0) is contaminated when it
    shares at least one word-k-shingle with any benchmark document;
    ``n_shared`` counts its distinct shared shingles."""
    return f"""
WITH {_shingles_cte(shingle_k)},
bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % {bench_mod} = 0),
hits AS (SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_shared
         FROM sh JOIN bsh USING (s) WHERE sh.doc_id % {bench_mod} != 0
         GROUP BY sh.doc_id)
SELECT d.doc_id,
  coalesce(h.n_shared, 0) AS n_shared,
  CAST(coalesce(h.n_shared, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {bench_mod} != 0
"""


def substring_pairs_oracle(min_len: int = 20) -> str:
    """Oracle for functions.dedup.substring_dup_pairs: unordered doc pairs
    sharing at least one character substring of length min_len (k-gram
    witness set, self-join on the substring)."""
    return f"""
WITH g AS (SELECT DISTINCT doc_id, sub FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(text) - {min_len} + 2),
                  i -> substr(text, i, {min_len}))) AS sub
    FROM documents))
SELECT x.doc_id AS a, y.doc_id AS b
FROM g x JOIN g y ON x.sub = y.sub AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
"""


def ann_ivf_oracle(
    k: int = 5, n_centroids: int = 16, nprobe: int = 2, n_queries: int = 8
) -> str:
    """Oracle for functions.similarity.ivf_topk: deterministic codebook =
    n_centroids smallest-vec_id embeddings; assignment / probing by cosine
    with ties to the lower centroid index; exact top-k inside the union of
    every query's probed lists."""
    cos = (
        "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    )
    return f"""
        WITH cent AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {n_centroids})),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     {cos.format(a='e.embedding', b='c.embedding')} DESC,
                     c.cid ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1),
        probe AS (
          SELECT cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     {cos.format(a='e.embedding', b='c.embedding')} DESC,
                     c.cid ASC) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < {n_queries}) e
            CROSS JOIN cent c)
          WHERE rn <= {nprobe}),
        allowed AS (SELECT DISTINCT cid FROM probe),
        cand AS (SELECT a.vec_id FROM assign a JOIN allowed USING (cid)),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id,
                 {cos.format(a='eq.embedding', b='ec.embedding')} AS cos
          FROM (SELECT vec_id FROM embeddings WHERE vec_id < {n_queries}) q
          JOIN embeddings eq ON eq.vec_id = q.vec_id
          CROSS JOIN cand c
          JOIN embeddings ec ON ec.vec_id = c.vec_id)
        SELECT qid, vec_id
        FROM (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
              FROM scored)
        WHERE rn <= {k}"""


def neardup_clusters_oracle(num_perm: int = 64, bands: int = 16, shingle_k: int = 3) -> str:
    """Oracle for functions.dedup.neardup_clusters: recursive-CTE min-label
    propagation over the MinHash-LSH candidate pairs; singletons keep their
    own id."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(num_perm, bands, shingle_k)},
        p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM bandkeys x JOIN bandkeys y
                ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
        e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b AS src, a AS dst FROM p),
        cc AS (
          SELECT node, node AS label FROM (SELECT DISTINCT src AS node FROM e)
          UNION
          SELECT e.dst AS node, cc.label
          FROM cc JOIN e ON cc.node = e.src
          WHERE cc.label < e.dst),
        lab AS (SELECT node, min(label) AS label FROM cc GROUP BY node)
        SELECT d.doc_id, CAST(coalesce(lab.label, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN lab ON lab.node = d.doc_id"""


def training_shuffle_oracle() -> str:
    """Oracle for functions.textstats.training_shuffle: dense rank under the
    (affine64(doc_id), doc_id) order — the same K_A/K_B constants, unsigned
    64-bit arithmetic via the HUGEINT helpers."""
    from .functions.hashing import K_A, K_B

    u = _unsigned("doc_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    return f"""
        WITH h AS (SELECT doc_id, {h} AS h FROM documents)
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS shuffle_rank
        FROM h"""


def hll_distinct_oracle(p_bits: int = 6) -> str:
    """Oracle for relational.q_hll_distinct: the identical HLL construction —
    affine64 hash, top-p register, rank from the next 40 bits (integer
    arithmetic + bin() bit length), alpha_64 raw estimate whose power-of-two
    sum is exactly representable in float64 on both sides."""
    from .functions.hashing import K_A, K_B

    import math

    m = 1 << p_bits
    u = _unsigned("user_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    payload = 2 ** (64 - p_bits)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    # linear-counting constants m*ln(m/z), embedded as exact repr()s so SQL
    # and engine share the identical doubles (no SQL-side ln())
    lc = " ".join(
        f"WHEN {z} THEN {m * math.log(m / z)!r}" for z in range(1, m + 1)
    )
    return f"""
        WITH hs AS (SELECT event_type, {h} AS h FROM events),
        r AS (SELECT event_type,
                     CAST(h // {payload} AS BIGINT) AS reg,
                     CAST((h % {payload}) // {2**18} AS BIGINT) AS w
              FROM hs),
        rk AS (SELECT event_type, reg,
                      max(CASE WHEN w > 0
                               THEN 41 - length(ltrim(bin(w), '0'))
                               ELSE 41 END) AS rank
               FROM r GROUP BY event_type, reg),
        grid AS (SELECT t.event_type, j.reg
                 FROM (SELECT DISTINCT event_type FROM events) t
                 CROSS JOIN (SELECT unnest(range({m})) AS reg) j),
        agg AS (
          SELECT g.event_type,
                 {alpha!r} * {m} * {m} / sum(power(2.0, -coalesce(rk.rank, 0))) AS raw,
                 CAST(sum(CASE WHEN coalesce(rk.rank, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zero_registers
          FROM grid g LEFT JOIN rk ON rk.event_type = g.event_type AND rk.reg = g.reg
          GROUP BY g.event_type)
        SELECT event_type,
               CASE WHEN zero_registers > 0 AND raw <= {2.5 * m}
                    THEN CASE zero_registers {lc} END
                    ELSE raw END AS hll_estimate,
               zero_registers
        FROM agg"""


def heavy_hitters_oracle(depth: int = 4, width: int = 256, k: int = 10) -> str:
    """Oracle for relational.q_heavy_hitters: identical CMS construction in
    SQL — per-(row, bucket) counts over the affine64 top byte, true top-k by
    (count DESC, id ASC), estimate = min over the key's depth counters."""
    from .functions.hashing import perm_constants

    consts = [perm_constants(3 + i) for i in range(depth)]
    assert width > 0 and width & (width - 1) == 0, "width must be a power of two"
    span = 2 ** (64 - (width - 1).bit_length())

    def bucket(d: int, col: str) -> str:
        a, c = consts[d]
        u = _unsigned(col)
        h = f"(({_mulmod(u, str(a), str(a % 2**32))} + {c}) % CAST('{U64}' AS HUGEINT))"
        return f"CAST({h} // {span} AS BIGINT)"

    hash_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {bucket(d, 'user_id')} AS bucket FROM events"
        for d in range(depth)
    )
    ests = ", ".join(
        f"(SELECT n FROM cms WHERE d = {d} AND bucket = {bucket(d, 't.user_id')})"
        for d in range(depth)
    )
    return f"""
        WITH cms AS (
          SELECT d, bucket, CAST(count(*) AS BIGINT) AS n
          FROM ({hash_rows}) GROUP BY d, bucket),
        top AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
          FROM events GROUP BY user_id
          ORDER BY true_n DESC, user_id ASC LIMIT {k})
        SELECT t.user_id, t.true_n, least({ests}) AS cms_n
        FROM top t"""


def bloom_semijoin_oracle(m_bits: int = 4096, k_hashes: int = 3) -> str:
    """Oracle for relational.q_bloom_semijoin: the identical bloom filter in
    SQL — positions = top log2(m) bits of the affine64 hashes over the
    BUILDING customer keys; an order passes when ALL k positions are set."""
    from .functions.hashing import perm_constants

    shift = 2 ** (64 - (m_bits - 1).bit_length())
    consts = [perm_constants(11 + i) for i in range(k_hashes)]

    def pos(d: int, col: str) -> str:
        a, c = consts[d]
        u = _unsigned(col)
        h = f"(({_mulmod(u, str(a), str(a % 2**32))} + {c}) % CAST('{U64}' AS HUGEINT))"
        return f"CAST({h} // {shift} AS BIGINT)"

    build_rows = " UNION ALL ".join(
        f"SELECT {pos(d, 'c_custkey')} AS p FROM bld" for d in range(k_hashes)
    )
    passes = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits WHERE p = {pos(d, 'o.o_custkey')})"
        for d in range(k_hashes)
    )
    return f"""
        WITH bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        bits AS (SELECT DISTINCT p FROM ({build_rows})),
        probe AS (
          SELECT o.o_orderpriority,
                 CASE WHEN {passes} THEN 1 ELSE 0 END AS pass_,
                 CASE WHEN EXISTS (SELECT 1 FROM bld WHERE c_custkey = o.o_custkey)
                      THEN 1 ELSE 0 END AS true_
          FROM orders o)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(pass_) AS BIGINT) AS n_bloom_pass,
               CAST(sum(true_) AS BIGINT) AS n_true_match
        FROM probe GROUP BY o_orderpriority"""


def budget_sample_oracle(budget: int = 10_000) -> str:
    """Oracle for functions.textstats.budget_sample: inclusive running token
    sum over the (affine64(doc_id), doc_id) shuffle order, kept while it
    fits the budget."""
    from .functions.hashing import K_A, K_B

    u = _unsigned("doc_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    return f"""
        WITH t AS (
          SELECT doc_id, {h} AS h,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                    ROWS UNBOUNDED PRECEDING) <= {budget} AS BIGINT) AS keep
        FROM t"""


def rare_terms_oracle(k: int = 3) -> str:
    """Oracle for functions.textstats.rare_terms: distinct (doc, token) rows,
    corpus document frequency, per-doc top-k by (df ASC, token ASC)."""
    return f"""
        WITH t AS (SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                 x -> len(x) > 0)) AS tok
            FROM documents)),
        f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY tok)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, df FROM (
          SELECT t.doc_id, t.tok, f.df,
                 row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) - 1 AS rank
          FROM t JOIN f USING (tok))
        WHERE rank < {k}"""


def lm_surprisal_oracle() -> str:
    """Exact SQL mirror of ``textstats.lm_surprisal``'s integer contract:
    per-document sum of whole-bit unigram surprisals, where
    ``floor(log2(x)) = length(bin(x)) - 1`` keeps both engines in integer
    arithmetic (the float ``xent_nats`` column is excluded from the driver
    entry and pinned by pytest instead)."""
    return """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents
        ), cnt AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok
        ), tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(length(bin(tot.n)) - length(bin(cnt.c))) AS BIGINT)
                 AS surprisal_bits
        FROM tok t
        JOIN cnt ON cnt.tok = t.tok
        CROSS JOIN tot
        GROUP BY t.doc_id"""


def kmeans_oracle(
    k: int = 8,
    n_iters: int = 3,
    scale_bits: int = 20,
    vec_expr: str = "embedding",
    final: str = "assign",
) -> str:
    """Exact SQL mirror of ``similarity.kmeans``: the iterations unroll into a
    CTE chain. Everything is integer arithmetic — quantize, squared distances,
    per-cluster sums, the round-half-up integer mean via the positive-mod
    floor-division identity — so the comparison is bit-exact despite the
    algorithm being iterative (the int/int division is exact: the corrected
    numerator is divisible and below 2**53)."""
    scale = float(1 << scale_bits)
    out = [
        f"""
        WITH q AS (
          SELECT vec_id, d - 1 AS dim,
                 CAST(floor(CAST(e AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS qx
          FROM (SELECT vec_id, unnest({vec_expr}) AS e,
                       generate_subscripts({vec_expr}, 1) AS d
                FROM embeddings)
        ), c0 AS (
          SELECT CAST(r - 1 AS BIGINT) AS cluster, dim, qx FROM (
            SELECT dim, qx, dense_rank() OVER (ORDER BY vec_id) AS r FROM q
          ) WHERE r <= {k}
        )"""
    ]
    for i in range(1, n_iters + 2):
        out.append(
            f"""
        , d{i} AS (
          SELECT q.vec_id, c.cluster,
                 SUM((q.qx - c.qx) * (q.qx - c.qx)) AS dist
          FROM q JOIN c{i - 1} c USING (dim) GROUP BY q.vec_id, c.cluster
        ), a{i} AS (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cluster) AS rn
            FROM d{i}) WHERE rn = 1
        )"""
        )
        if i <= n_iters:
            out.append(
                f"""
        , s{i} AS (
          SELECT a.cluster, q.dim, SUM(q.qx) AS s, COUNT(*) AS n
          FROM a{i} a JOIN q ON q.vec_id = a.vec_id GROUP BY a.cluster, q.dim
        ), c{i} AS (
          SELECT p.cluster, p.dim,
                 CAST(COALESCE(
                   ((2*s.s + s.n) - ((((2*s.s + s.n) % (2*s.n)) + (2*s.n)) % (2*s.n)))
                     / (2*s.n),
                   p.qx) AS BIGINT) AS qx
          FROM c{i - 1} p LEFT JOIN s{i} s USING (cluster, dim)
        )"""
            )
    if final == "recon":
        # per-vector RECONSTRUCTED components: the assigned final centroid's
        # quantized values, (vec_id, dim, qx) — the PQ/ADC building block
        out.append(
            f" SELECT a.vec_id, c.dim, c.qx "
            f"FROM a{n_iters + 1} a JOIN c{n_iters} c USING (cluster)"
        )
    else:
        out.append(f" SELECT vec_id, cluster FROM a{n_iters + 1}")
    return "".join(out)


def bigram_surprisal_oracle() -> str:
    """Exact SQL mirror of ``textstats.bigram_surprisal``: ordered token
    positions via generate_subscripts, adjacent-position self-join for the
    bigram rows, corpus unigram/bigram counts, and the whole-bit add-1
    contract ``(length(bin(c1 + V)) - 1) - (length(bin(c2 + 1)) - 1)``."""
    return """
        WITH t AS (
          SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents)
        ), bg AS (
          SELECT a.doc_id, a.tok AS prev, b.tok AS cur
          FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM t GROUP BY tok),
        bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
               FROM bg GROUP BY prev, cur),
        v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uc),
        sc AS (
          SELECT bg.doc_id,
                 (length(bin(uc.c1 + v.v)) - 1)
                 - (length(bin(bc.c2 + 1)) - 1) AS bits
          FROM bg JOIN bc ON bc.prev = bg.prev AND bc.cur = bg.cur
                  JOIN uc ON uc.tok = bg.prev
                  CROSS JOIN v
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(bits) AS BIGINT) AS surprisal_bits
        FROM sc GROUP BY doc_id"""


def cdc_chunks_oracle(k: int = 8, mask_bits: int = 6) -> str:
    """Exact SQL mirror of ``dedup.cdc_chunks``: positional k-gram poly
    hashes (substr + the hex-bytes Horner fold), boundary after char i+k-1
    when the low ``mask_bits`` bits are zero (two's-complement low bits of
    the signed hash == the unsigned mod), chunk rows via lead()."""
    m = 1 << mask_bits
    h = _poly_hash("hex(encode(sub))")
    return f"""
        WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
                   FROM documents),
        pos AS (SELECT doc_id, i, substr(text, CAST(i AS INT), {k}) AS sub
                FROM d, unnest(range(1, n - {k} + 2)) t(i)),
        hh AS (SELECT doc_id, i, {h} AS hv FROM pos),
        bnd AS (SELECT doc_id, CAST(i + {k} AS BIGINT) AS start
                FROM hh JOIN d USING (doc_id)
                WHERE ((hv % {m}) + {m}) % {m} = 0 AND i + {k} - 1 < d.n),
        starts AS (SELECT doc_id, CAST(1 AS BIGINT) AS start FROM d WHERE n > 0
                   UNION ALL SELECT doc_id, start FROM bnd),
        c AS (SELECT s.doc_id, s.start,
                     lead(s.start) OVER (PARTITION BY s.doc_id ORDER BY s.start)
                       AS nxt,
                     d.n,
                     row_number() OVER (PARTITION BY s.doc_id ORDER BY s.start)
                       - 1 AS chunk_idx
              FROM starts s JOIN d USING (doc_id))
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, start,
               CAST(COALESCE(nxt, n + 1) - start AS BIGINT) AS len
        FROM c"""


def bernoulli_sample_oracle(rate_num: int = 1, rate_den: int = 8) -> str:
    """Exact SQL mirror of ``textstats.bernoulli_sample``: the affine64 draw
    (HUGEINT helpers) below floor(num * 2^64 / den)."""
    from .functions.hashing import K_A, K_B

    u = _unsigned("doc_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    thr = (rate_num << 64) // rate_den
    return (
        f"SELECT doc_id, lang, n_chars FROM documents "
        f"WHERE {h} < CAST('{thr}' AS HUGEINT)"
    )


def rrf_oracle(
    queries: list[str], k: int = 10, rrf_k: int = 60, scale_bits: int = 20
) -> str:
    """Exact SQL mirror of ``retrieval.rrf_fuse``: the BM25 top-k oracle
    joined with the full-corpus quality row_number (classifier score DESC,
    doc_id ASC), fused with floor divisions only."""
    scale = 1 << scale_bits
    return f"""
        WITH bm AS ({bm25_oracle(queries, k)}),
        cls AS ({classifier_score_oracle()}),
        qr AS (SELECT doc_id,
                      row_number() OVER (ORDER BY score DESC, doc_id) AS r
               FROM cls),
        f AS (SELECT bm.query_id, bm.doc_id,
                     CAST({scale} // ({rrf_k} + bm.rank)
                          + {scale} // ({rrf_k} + qr.r) AS BIGINT) AS rrf_scaled
              FROM bm JOIN qr USING (doc_id))
        SELECT query_id, doc_id, rrf_scaled,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS fused_rank
        FROM f"""


def winnow_oracle(shingle_k: int = 3, window: int = 4) -> str:
    """Exact SQL mirror of ``textstats.winnow_fingerprints``: ordered word
    k-shingles with positions, the poly-hash family, a leading window MIN in
    the UNSIGNED uint64 domain (full windows only), DISTINCT (doc_id, fp)."""
    concat = " || ' ' || ".join(f"toks[i + {j}]" for j in range(shingle_k))
    return f"""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(lower(text), ' '),
                                      x -> len(x) > 0) AS toks
                   FROM documents),
        pos AS (SELECT doc_id, i, {concat} AS s
                FROM (SELECT doc_id, toks,
                             unnest(range(1, len(toks) - {shingle_k - 2})) AS i
                      FROM d)),
        base AS (SELECT doc_id, i,
                        {_unsigned(_poly_hash("hex(encode(s))"))} AS bh
                 FROM pos),
        wins AS (SELECT doc_id,
                        min(bh) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
                        count(*) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS c
                 FROM base)
        SELECT DISTINCT doc_id, {_signed('m')} AS fp FROM wins WHERE c = {window}"""


def semdedup_oracle(
    k: int = 8, n_iters: int = 2, threshold: float = 0.95, scale_bits: int = 20
) -> str:
    """Exact SQL mirror of ``dedup.semdedup_pairs``: the unrolled-CTE integer
    k-means (kmeans_oracle) gives the bit-exact final assignment; pairs are the
    within-cluster cosines >= threshold (filter on the unrounded value, report
    round-6 — the repo-wide float compare contract)."""
    cos = (
        "list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), "
        "CAST(eb.embedding AS DOUBLE[]))"
    )
    return f"""
        WITH asn AS ({kmeans_oracle(k, n_iters, scale_bits)})
        SELECT ea.vec_id AS a, eb.vec_id AS b, xa.cluster AS cluster,
               round({cos}, 6) AS cosine
        FROM asn xa JOIN asn xb
               ON xb.cluster = xa.cluster AND xa.vec_id < xb.vec_id
             JOIN embeddings ea ON ea.vec_id = xa.vec_id
             JOIN embeddings eb ON eb.vec_id = xb.vec_id
        WHERE {cos} >= {threshold}"""


def bm25_oracle(queries: list[str], k: int = 10, idf_scale_bits: int = 10) -> str:
    """Exact SQL mirror of ``retrieval.bm25_topk``'s integer contract: the
    scaled multiplicative idf ``(N << bits) // df`` and the rational BM25
    saturation (k1=6/5, b=3/4) multiplied through to one HUGEINT floor
    division per term — bit-exact vs the polars Int128 path. Ties at the k
    boundary break on ascending doc_id in both engines."""
    from .functions.retrieval import query_terms

    pairs = query_terms(queries)
    values = ", ".join(f"({qid}, '{tok}')" for qid, tok in pairs)
    scale = 1 << idf_scale_bits
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents
        ), tf AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, tok
        ), dl AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
        ), stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 GREATEST(1, CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT))
                   AS avgdl
          FROM dl
        ), q(query_id, tok) AS (VALUES {values}),
        df AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
          FROM tf WHERE tok IN (SELECT tok FROM q) GROUP BY tok
        ), sc AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(SUM(
                   ((CAST(stats.n AS HUGEINT) * {scale})
                      // CAST(df.df AS HUGEINT))
                     * 44 * stats.avgdl * tf.tf
                   // CAST(20 * stats.avgdl * tf.tf + 6 * stats.avgdl
                           + 18 * dl.dl AS HUGEINT)
                 ) AS BIGINT) AS score_q
          FROM q
          JOIN df ON df.tok = q.tok
          JOIN tf ON tf.tok = q.tok
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats
          GROUP BY q.query_id, tf.doc_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q,
               CAST(rank AS BIGINT) AS rank
        FROM (SELECT query_id, doc_id, score_q,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_q DESC, doc_id) AS rank
              FROM sc)
        WHERE rank <= {k}"""


def dsir_oracle(
    target_value: str = "en", num_buckets: int = 1024
) -> str:
    """Exact SQL mirror of ``textstats.dsir_weights``: hashed unigram+bigram
    features (the polynomial-hash bucket), +1-smoothed target/raw bucket
    counts, and the whole-bit log-likelihood-ratio fold — all integer, so the
    comparison is bit-exact. ``flog2`` differences appear as ``length(bin())``
    differences (the -1s cancel)."""
    bucket = f"CAST({_unsigned(_poly_hash('hex(encode(f))'))} % {num_buckets} AS BIGINT)"
    return f"""
        WITH tok AS (
          SELECT doc_id, t AS tok, CAST(i AS BIGINT) AS pos
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t,
                       generate_subscripts(
                         regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS i
                FROM documents)
        ), feat AS (
          SELECT doc_id, tok AS f FROM tok
          UNION ALL
          SELECT a.doc_id, a.tok || ' ' || b.tok AS f
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ), dcb AS (
          SELECT doc_id, {bucket} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
          FROM feat GROUP BY doc_id, 2
        ), tgt AS (
          SELECT doc_id FROM documents WHERE lang = '{target_value}'
        ), bc AS (
          SELECT bucket,
                 CAST(SUM(c) AS BIGINT) AS cr,
                 CAST(COALESCE(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM tgt)
                                        THEN c END), 0) AS BIGINT) AS ct
          FROM dcb GROUP BY bucket
        ), tots AS (
          SELECT CAST((SELECT COALESCE(SUM(cr), 0) FROM bc) + {num_buckets}
                      AS BIGINT) AS nr,
                 CAST((SELECT COALESCE(SUM(ct), 0) FROM bc) + {num_buckets}
                      AS BIGINT) AS nt
        ), lam AS (
          SELECT bucket,
                 CAST(length(bin(ct + 1)) - length(bin(tots.nt))
                      - length(bin(cr + 1)) + length(bin(tots.nr))
                      AS BIGINT) AS lam
          FROM bc CROSS JOIN tots
        )
        SELECT dcb.doc_id,
               CAST(SUM(dcb.c) AS BIGINT) AS n_features,
               CAST(SUM(dcb.c * lam.lam) AS BIGINT) AS weight_bits
        FROM dcb JOIN lam USING (bucket)
        GROUP BY dcb.doc_id"""


def top_ngrams_oracle(n: int = 2, k: int = 20) -> str:
    """Exact SQL mirror of ``textstats.top_ngrams``: within-document n-grams
    via an n-way positional self-join, count DESC / gram ASC ranking."""
    join = "tok a0"
    gram = "a0.tok"
    for j in range(1, n):
        join += (
            f" JOIN tok a{j} ON a{j}.doc_id = a0.doc_id"
            f" AND a{j}.pos = a0.pos + {j}"
        )
        gram += f" || ' ' || a{j}.tok"
    return f"""
        WITH tok AS (
          SELECT doc_id, t AS tok, CAST(i AS BIGINT) AS pos
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t,
                       generate_subscripts(
                         regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS i
                FROM documents)
        ), g AS (
          SELECT {gram} AS gram FROM {join}
        ), c AS (
          SELECT gram, CAST(COUNT(*) AS BIGINT) AS "count" FROM g GROUP BY gram
        )
        SELECT CAST(row_number() OVER (ORDER BY "count" DESC, gram) AS BIGINT)
                 AS rank,
               gram, "count"
        FROM c ORDER BY "count" DESC, gram LIMIT {k}"""


def temperature_sample_oracle(denom: int = 4) -> str:
    """Exact SQL mirror of ``textstats.temperature_sample``: integer-sqrt
    temperature weights (float sqrt corrected to true isqrt), floor-division
    quotas with largest-remainder leftover assignment, per-source
    (poly_hash, id) ranking."""
    isq = (
        "(f0 + CASE WHEN (f0 + 1) * (f0 + 1) <= toks THEN 1 ELSE 0 END"
        " - CASE WHEN f0 * f0 > toks THEN 1 ELSE 0 END)"
    )
    return f"""
        WITH st AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS toks
                    FROM documents GROUP BY source),
             tot AS (SELECT CAST(count(*) AS BIGINT) // {denom} AS b FROM documents),
             f0t AS (SELECT source, toks,
                            CAST(floor(sqrt(CAST(toks AS DOUBLE))) AS BIGINT) AS f0
                     FROM st),
             wi AS (SELECT source, {isq} AS w FROM f0t),
             ww AS (SELECT source, w, SUM(w) OVER () AS wsum FROM wi),
             q0 AS (SELECT source,
                           (SELECT b FROM tot) * w // wsum AS q,
                           (SELECT b FROM tot) * w % wsum AS rem
                    FROM ww),
             lo AS (SELECT (SELECT b FROM tot) - SUM(q) AS leftover FROM q0),
             quota AS (SELECT source,
                              q + CASE WHEN row_number()
                                         OVER (ORDER BY rem DESC, source)
                                       <= (SELECT leftover FROM lo)
                                  THEN 1 ELSE 0 END AS quota
                       FROM q0),
             hx AS (SELECT doc_id, source, hex(encode(text)) AS h FROM documents),
             fp AS (SELECT doc_id, source, {_poly_hash('h')} AS f FROM hx),
             rnk AS (SELECT doc_id, source,
                            CAST(row_number() OVER (PARTITION BY source
                                                    ORDER BY f, doc_id) AS BIGINT) AS rk
                     FROM fp)
        SELECT rnk.doc_id, rnk.source, rnk.rk
        FROM rnk JOIN quota USING (source)
        WHERE rnk.rk <= quota.quota"""


def quantize_embeddings_oracle(bits: int = 8) -> str:
    """Exact SQL mirror of ``similarity.quantize_embeddings``: per-dimension
    max-abs scale, floor((x * L) / s) in IEEE float64 (same operation order
    as the numpy side, hence bit-identical), q = 0 on zero-scale dims."""
    levels = (1 << (bits - 1)) - 1
    return f"""
        WITH e AS (SELECT vec_id,
                          unnest(embedding) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
             s AS (SELECT i, max(abs(CAST(x AS DOUBLE))) AS s FROM e GROUP BY i)
        SELECT e.vec_id,
               CAST(e.i AS BIGINT) AS i,
               CAST(CASE WHEN s.s = 0 THEN 0
                         ELSE FLOOR((CAST(e.x AS DOUBLE) * {levels}) / s.s)
                    END AS BIGINT) AS q
        FROM e JOIN s USING (i)"""


def setsim_prefix_oracle(num: int = 3, den: int = 5) -> str:
    """Exact all-pairs token-set Jaccard with the integer rational threshold —
    deliberately NO prefix/length filtering, so the losslessness of
    ``dedup.setsim_prefix_pairs``'s filters is what the comparison proves."""
    return f"""
        WITH tok AS (SELECT DISTINCT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                     FROM documents),
             sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
             i AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
                   FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id < y.doc_id
                   GROUP BY 1, 2)
        SELECT i.a, i.b, i.inter, sa.n + sb.n - i.inter AS uni
        FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
        WHERE {den} * i.inter >= {num} * (sa.n + sb.n - i.inter)"""


def pq_codes_oracle(
    m: int = 8, dim: int = 64, k: int = 8, n_iters: int = 2, scale_bits: int = 20
) -> str:
    """Exact SQL mirror of ``similarity.pq_codes``: one integer-exact kmeans
    oracle per subspace over ``list_slice(embedding, ...)``, UNION ALL'd with
    the subspace index."""
    w = dim // m
    subs = []
    for j in range(m):
        inner = kmeans_oracle(
            k,
            n_iters,
            scale_bits,
            vec_expr=f"list_slice(embedding, {j * w + 1}, {(j + 1) * w})",
        )
        subs.append(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS subspace, cluster AS code "
            f"FROM ({inner})"
        )
    return " UNION ALL ".join(subs)


def pq_adc_oracle(
    m: int = 8,
    dim: int = 64,
    k_codes: int = 8,
    n_iters: int = 2,
    scale_bits: int = 20,
    nq: int = 8,
    k: int = 5,
) -> str:
    """Exact SQL mirror of ``similarity.pq_adc_topk``: per-subspace kmeans
    reconstruction (assigned final centroid components), integer squared
    distance to the quantized first-``nq`` query vectors, top-k per query
    (dist ASC, vec_id ASC)."""
    scale = float(1 << scale_bits)
    w = dim // m
    rec = " UNION ALL ".join(
        f"SELECT vec_id, dim + {j * w} AS dim, qx FROM ("
        + kmeans_oracle(
            k_codes,
            n_iters,
            scale_bits,
            vec_expr=f"list_slice(embedding, {j * w + 1}, {(j + 1) * w})",
            final="recon",
        )
        + ")"
        for j in range(m)
    )
    return f"""
        WITH rec AS ({rec}),
        gq AS (
          SELECT vec_id, d - 1 AS dim,
                 CAST(floor(CAST(e AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS qx
          FROM (SELECT vec_id, unnest(embedding) AS e,
                       generate_subscripts(embedding, 1) AS d
                FROM embeddings)
        ),
        qv AS (
          SELECT CAST(r - 1 AS BIGINT) AS qid, dim, qx FROM (
            SELECT dim, qx, dense_rank() OVER (ORDER BY vec_id) AS r FROM gq
          ) WHERE r <= {nq}
        ),
        d AS (
          SELECT qv.qid, rec.vec_id,
                 CAST(SUM((qv.qx - rec.qx) * (qv.qx - rec.qx)) AS BIGINT) AS dist
          FROM rec JOIN qv USING (dim) GROUP BY qv.qid, rec.vec_id
        )
        SELECT qid, vec_id, dist FROM (
          SELECT qid, vec_id, dist,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY dist, vec_id) AS rn
          FROM d) WHERE rn <= {k}"""


def hashed_bow_oracle(dim_bits: int = 8) -> str:
    """Exact SQL mirror of ``textstats.hashed_bow``: per-token polynomial
    hash (the shared SQL-expressible family) masked to ``dim_bits`` bits,
    counts per (doc, bucket)."""
    d = (1 << dim_bits) - 1
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents
        ), hx AS (
          SELECT doc_id, hex(encode(tok)) AS h FROM tok
        ), hh AS (
          SELECT doc_id, {_poly_hash('h')} AS f FROM hx
        )
        SELECT doc_id,
               CAST({_unsigned('f')} % {d + 1} AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS "count"
        FROM hh GROUP BY doc_id, dim"""


def weighted_sample_oracle(k: int = 100) -> str:
    """Exact SQL mirror of ``textstats.weighted_sample``: the same affine64
    draw (HUGEINT helpers), halved then floor-divided by the weight, k
    smallest (key, id)."""
    from .functions.hashing import K_A, K_B

    u = _unsigned("doc_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    return f"""
        WITH h AS (SELECT doc_id, n_chars,
                          ({h} // CAST(2 AS HUGEINT)) // n_chars AS key
                   FROM documents)
        SELECT doc_id, n_chars, CAST(key AS BIGINT) AS key
        FROM h ORDER BY key, doc_id LIMIT {k}"""


def classifier_score_oracle(dim_bits: int = 8) -> str:
    """Exact SQL mirror of ``textstats.classifier_score``: per-token poly
    hash masked to ``dim_bits`` bits, bucket weight ``((affine64(b) >> 4) %
    17) - 8`` via the shared HUGEINT affine helpers, per-doc weight sum and
    the >= 0 keep flag."""
    from .functions.hashing import K_A, K_B

    d = 1 << dim_bits
    aff = (
        f"(({_mulmod('b', str(K_A), str(K_A % 2**32))} + {K_B}) "
        f"% CAST('{U64}' AS HUGEINT))"
    )
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents
        ), hx AS (
          SELECT doc_id, hex(encode(tok)) AS h FROM tok
        ), hh AS (
          SELECT doc_id, {_poly_hash('h')} AS f FROM hx
        ), dim AS (
          SELECT doc_id, {_unsigned('f')} % {d} AS b FROM hh
        ), w AS (
          SELECT doc_id,
                 CAST((({aff} // 16) % 17) AS BIGINT) - 8 AS wt
          FROM dim
        )
        SELECT doc_id,
               CAST(sum(wt) AS BIGINT) AS score,
               CAST(sum(wt) >= 0 AS BIGINT) AS keep
        FROM w GROUP BY doc_id"""


def chunk_dedup_oracle(chunk_size: int = 32, occ_base: int = 1 << 20) -> str:
    """DuckDB mirror of ``dedup.chunk_dedup``: fixed token windows, global
    keep-first per exact chunk text (min packed (doc_id, chunk_idx)
    occurrence), per-document reassembly in chunk order, empty-string rows
    for fully-deduplicated documents."""
    c = chunk_size
    return f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             e AS (SELECT doc_id, toks,
                          unnest(range((len(toks) + {c - 1}) // {c})) AS ci
                   FROM t),
             ch AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
                           array_to_string(list_slice(toks, ci * {c} + 1, ci * {c} + {c}), ' ')
                             AS chunk_text
                    FROM e),
             win AS (SELECT chunk_text,
                            min(doc_id * {occ_base} + chunk_idx) AS occ
                     FROM ch GROUP BY chunk_text),
             surv AS (SELECT occ // {occ_base} AS doc_id,
                             occ % {occ_base} AS chunk_idx, chunk_text
                      FROM win),
             agg AS (SELECT doc_id,
                            CAST(count(*) AS BIGINT) AS n_kept,
                            string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_dedup
                     FROM surv GROUP BY doc_id),
             tot AS (SELECT doc_id,
                            CAST((len(string_split(text, ' ')) + {c - 1}) // {c} AS BIGINT)
                              AS n_total
                     FROM documents)
        SELECT tot.doc_id,
               coalesce(agg.text_dedup, '') AS text_dedup,
               CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
               n_total
        FROM tot LEFT JOIN agg USING (doc_id)"""


def filter_chain_oracle(dim_bits: int = 8, min_tokens: int = 20) -> str:
    """SQL mirror of ``textstats.filter_chain``: the same five integer rules
    composed from the quality / repetition / classifier oracle fragments,
    reason bitmask + keep flag per document."""
    from .functions.hashing import K_A, K_B

    d = 1 << dim_bits
    aff = (
        f"(({_mulmod('b', str(K_A), str(K_A % 2**32))} + {K_B}) "
        f"% CAST('{U64}' AS HUGEINT))"
    )
    return f"""
WITH d AS (SELECT doc_id, text FROM documents),
base AS (SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha
         FROM d),
w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks FROM d),
wd AS (SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_dup_words
       FROM w),
bgr AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b FROM w),
bgc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS top_bigram_n
        FROM (SELECT doc_id, b, count(*) AS c FROM bgr GROUP BY doc_id, b) GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM d),
hx AS (SELECT doc_id, hex(encode(tok)) AS h FROM tok),
hh AS (SELECT doc_id, {_poly_hash('h')} AS f FROM hx),
dim AS (SELECT doc_id, {_unsigned('f')} % {d} AS b FROM hh),
wt AS (SELECT doc_id, CAST((({aff} // 16) % 17) AS BIGINT) - 8 AS wt FROM dim),
cls AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM wt GROUP BY doc_id),
j AS (SELECT base.doc_id,
        n_tokens, n_chars, n_alpha,
        coalesce(wd.n_words, 0) AS n_words,
        coalesce(wd.n_dup_words, 0) AS n_dup_words,
        coalesce(bgc.n_bigrams, 0) AS n_bigrams,
        coalesce(bgc.top_bigram_n, 0) AS top_bigram_n,
        coalesce(cls.score, 0) AS score
      FROM base LEFT JOIN wd USING (doc_id)
                LEFT JOIN bgc USING (doc_id)
                LEFT JOIN cls USING (doc_id))
SELECT doc_id,
  CAST(CASE WHEN n_tokens < {min_tokens} THEN 1 ELSE 0 END
     + CASE WHEN 2 * n_alpha < n_chars THEN 2 ELSE 0 END
     + CASE WHEN 5 * n_dup_words > n_words THEN 4 ELSE 0 END
     + CASE WHEN 10 * top_bigram_n > n_bigrams AND n_bigrams >= 10 THEN 8 ELSE 0 END
     + CASE WHEN score < 0 THEN 16 ELSE 0 END AS BIGINT) AS reasons,
  CAST(CASE WHEN n_tokens < {min_tokens} THEN 1 ELSE 0 END
     + CASE WHEN 2 * n_alpha < n_chars THEN 2 ELSE 0 END
     + CASE WHEN 5 * n_dup_words > n_words THEN 4 ELSE 0 END
     + CASE WHEN 10 * top_bigram_n > n_bigrams AND n_bigrams >= 10 THEN 8 ELSE 0 END
     + CASE WHEN score < 0 THEN 16 ELSE 0 END = 0 AS BIGINT) AS keep
FROM j"""


def interleave_plan_oracle(scale: int = 840) -> str:
    """SQL mirror of ``textstats.interleave_plan``: per-source doc-id-order
    rank, deterministic weight 1 + poly_hash(source) % 4 via the shared hash
    family, integer virtual time ((r+1)*scale) // weight."""
    return f"""
WITH r AS (SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                  AS BIGINT) AS r
           FROM documents),
hx AS (SELECT DISTINCT source, hex(encode(source)) AS h FROM documents),
fp AS (SELECT source, {_poly_hash('h')} AS f FROM hx),
wt AS (SELECT source, 1 + CAST({_unsigned('f')} % 4 AS BIGINT) AS wgt FROM fp)
SELECT r.doc_id, r.source, r.r,
       CAST(((r.r + 1) * {scale}) // wt.wgt AS BIGINT) AS vt
FROM r JOIN wt USING (source)"""


def phash_neardup_oracle(n_bytes: int = 64) -> str:
    """SQL mirror of ``multimodal.phash_neardup``: sha-chain byte stream,
    average-hash bits (byte > floor(mean)), bit i weighted 2^i (HUGEINT sum
    wrapped to signed int64), canonical id = min media_id per signature."""
    n_digests = -(-n_bytes // 32)
    chain = ["sha256(text)"]
    for _ in range(n_digests - 1):
        chain.append(f"sha256({chain[-1]})")
    hx = f"upper({' || '.join(chain)})"
    weights = ", ".join(f"CAST('{1 << (i % 64)}' AS HUGEINT)" for i in range(n_bytes))
    u = (
        "sum(CASE WHEN l[i + 1] > mean THEN w[i + 1] "
        "ELSE CAST(0 AS HUGEINT) END)"
    )
    return f"""
WITH hx AS (SELECT doc_id AS media_id, substr({hx}, 1, {2 * n_bytes}) AS h
            FROM documents),
b AS (SELECT media_id, {_bytes_of_hex('h')} AS l FROM hx),
m AS (SELECT media_id, l, list_aggregate(l, 'sum') // {n_bytes} AS mean,
             [{weights}] AS w
      FROM b),
bits AS (SELECT media_id, l, mean, w, unnest(range({n_bytes})) AS i FROM m),
hv AS (SELECT media_id, {u} % CAST('{U64}' AS HUGEINT) AS hu
       FROM bits GROUP BY media_id),
ph AS (SELECT media_id, {_signed('hu')} AS phash FROM hv)
SELECT media_id, phash,
       min(media_id) OVER (PARTITION BY phash) AS canon_id
FROM ph"""


def bpe_pairs_oracle(k: int = 50) -> str:
    """Exact SQL mirror of ``textstats.bpe_pair_counts``: within-word adjacent
    char pairs via a generate_series lateral, count DESC / pair ASC ranking."""
    return f"""
        WITH words AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
        ), pairs AS (
          SELECT substr(w, CAST(i AS INT), 2) AS pair
          FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
          WHERE length(w) >= 2
        ), g AS (
          SELECT pair, CAST(count(*) AS BIGINT) AS count FROM pairs GROUP BY pair
        )
        SELECT CAST(row_number() OVER (ORDER BY count DESC, pair) AS BIGINT) AS rank,
               pair, count
        FROM g ORDER BY count DESC, pair LIMIT {k}"""


def cluster_keep_best_oracle(num_perm: int = 64, bands: int = 16, shingle_k: int = 3) -> str:
    """Oracle for functions.dedup.cluster_keep_best: the neardup_clusters
    CTE chain (LSH pairs -> recursive min-label CC) extended with the
    keep-longest representative rule (n_chars DESC, doc_id ASC)."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(num_perm, bands, shingle_k)},
        p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM bandkeys x JOIN bandkeys y
                ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
        e AS (SELECT a AS src, b AS dst FROM p UNION SELECT b AS src, a AS dst FROM p),
        cc AS (
          SELECT node, node AS label FROM (SELECT DISTINCT src AS node FROM e)
          UNION
          SELECT e.dst AS node, cc.label
          FROM cc JOIN e ON cc.node = e.src
          WHERE cc.label < e.dst),
        lab AS (SELECT node, min(label) AS label FROM cc GROUP BY node),
        asg AS (SELECT d.doc_id, coalesce(lab.label, d.doc_id) AS cluster_id, d.n_chars
                FROM documents d LEFT JOIN lab ON lab.node = d.doc_id)
        SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(doc_id AS BIGINT) AS kept_id,
               n_docs
        FROM (SELECT cluster_id, doc_id,
                     row_number() OVER (PARTITION BY cluster_id
                                        ORDER BY n_chars DESC, doc_id) AS rn,
                     CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_docs
              FROM asg)
        WHERE rn = 1"""


def scc_oracle() -> str:
    """Oracle for functions.graph.scc_distributed over scc_demo_edges:
    SCC BY DEFINITION via a recursive transitive closure — scc(v) =
    greatest(v, max u with v->*u and u->*v) — independent of the engine's
    trim/color/backward decomposition. Closure size stays small because
    mutual reachability is cycle-local in the synthetic graph."""
    return """
        WITH RECURSIVE base AS (
          SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS d8,
                 3 + (doc_id % 5) AS k
          FROM documents),
        e0 AS (
          SELECT 'c' || d8 || 'x' || CAST(j.j AS VARCHAR) AS src,
                 'c' || d8 || 'x' || CAST((j.j + 1) % k AS VARCHAR) AS dst
          FROM base CROSS JOIN (SELECT unnest(range(0, 7)) AS j) j
          WHERE j.j < k
          UNION ALL
          SELECT 'c' || d8 || 'x0', 't' || d8 || 'x0' FROM base
          UNION ALL
          SELECT 't' || d8 || 'x0', 't' || d8 || 'x1' FROM base),
        nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
        reach AS (
          SELECT src, dst FROM e0
          UNION
          SELECT r.src, e.dst FROM reach r JOIN e0 e ON r.dst = e.src),
        mutual AS (
          SELECT a.src AS node, a.dst AS m
          FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src)
        SELECT n.node AS node,
               greatest(n.node, coalesce(max(m.m), n.node)) AS scc
        FROM nodes n LEFT JOIN mutual m ON m.node = n.node
        GROUP BY n.node"""


def cap_per_source_oracle(k: int = 5) -> str:
    """Oracle for functions.textstats.cap_per_source: per-source row_number
    under the identical (affine64(doc_id), doc_id) order — same K_A/K_B
    constants, unsigned 64-bit arithmetic via the HUGEINT helpers."""
    from .functions.hashing import K_A, K_B

    u = _unsigned("doc_id")
    h = f"(({_mulmod(u, str(K_A), str(K_A % 2**32))} + {K_B}) % CAST('{U64}' AS HUGEINT))"
    return f"""
        WITH h AS (SELECT doc_id, source, {h} AS h FROM documents)
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                    AS BIGINT) AS keep_rank
        FROM h
        QUALIFY keep_rank <= {k}"""


def sssp_oracle() -> str:
    """Oracle for functions.graph.sssp_distances over sssp_demo_edges: the
    same DAG built in SQL, then a recursive-CTE walk enumerating every
    root-to-node path cost (terminates: the graph is acyclic) folded with
    min() — shortest path by definition, independent of the engine's
    Bellman-Ford frontier scheme."""
    return """
        WITH RECURSIVE base AS (
          SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS d8,
                 doc_id AS d
          FROM documents),
        e AS (
          SELECT 'R' AS src, 'n' || d8 || 'x0' AS dst,
                 CAST(d % 13 + 1 AS BIGINT) AS w
          FROM base
          UNION ALL
          SELECT 'n' || d8 || 'x' || CAST(j.j AS VARCHAR),
                 'n' || d8 || 'x' || CAST(j.j + 1 AS VARCHAR),
                 CAST((d + j.j) % 5 + 2 AS BIGINT)
          FROM base CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
          UNION ALL
          SELECT 'n' || d8 || 'x0', 'n' || d8 || 'x2', CAST(7 AS BIGINT)
          FROM base),
        walk AS (
          SELECT 'R' AS node, CAST(0 AS BIGINT) AS dist
          UNION ALL
          SELECT e.dst, walk.dist + e.w FROM walk JOIN e ON e.src = walk.node)
        SELECT node, CAST(min(dist) AS BIGINT) AS dist
        FROM walk GROUP BY node"""


def jl_project_oracle(out_dims: int = 16, quant: int = 1_000_000, dim: int = 64) -> str:
    """Oracle for functions.similarity.jl_project: the identical Rademacher
    planes (table 0) against floor-quantized coordinates, summed as BIGINTs —
    order-independent, bit-exact."""
    return f"""
        WITH {_planes_cte(1, out_dims, dim)}
        SELECT e.vec_id, CAST(pl.p AS BIGINT) AS dim,
               CAST(sum(CAST(pl.s AS BIGINT)
                        * CAST(floor(CAST(e.embedding[pl.d + 1] AS DOUBLE)
                                     * {quant}) AS BIGINT)) AS BIGINT) AS proj
        FROM embeddings e JOIN planes pl ON pl.t = 0 AND pl.d < len(e.embedding)
        GROUP BY e.vec_id, pl.p"""


def edit_neardup_oracle(num_perm: int = 64, bands: int = 16, shingle_k: int = 3) -> str:
    """Oracle for functions.dedup.edit_neardup_pairs: the identical MinHash
    band keys (same CTEs as minhash_pairs_oracle) + DuckDB's character-level
    levenshtein() on the candidate pairs."""
    return f"""
        WITH {_minhash_ctes(num_perm, bands, shingle_k)},
        pairs AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bandkeys x JOIN bandkeys y
            ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
        SELECT p.a, p.b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        FROM pairs p
        JOIN documents da ON da.doc_id = p.a
        JOIN documents db ON db.doc_id = p.b"""


def topo_layers_oracle() -> str:
    """Oracle for functions.graph.topo_layers over sssp_demo_edges: the same
    DAG in SQL, roots = srcs EXCEPT dsts, recursive walk, layer = max path
    length — longest path by definition."""
    return """
        WITH RECURSIVE base AS (
          SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS d8,
                 doc_id AS d
          FROM documents),
        e AS (
          SELECT 'R' AS src, 'n' || d8 || 'x0' AS dst FROM base
          UNION ALL
          SELECT 'n' || d8 || 'x' || CAST(j.j AS VARCHAR),
                 'n' || d8 || 'x' || CAST(j.j + 1 AS VARCHAR)
          FROM base CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
          UNION ALL
          SELECT 'n' || d8 || 'x0', 'n' || d8 || 'x2' FROM base),
        roots AS (SELECT DISTINCT src AS node FROM e
                  WHERE src NOT IN (SELECT dst FROM e)),
        walk AS (
          SELECT node, CAST(0 AS BIGINT) AS layer FROM roots
          UNION ALL
          SELECT e.dst, walk.layer + 1 FROM walk JOIN e ON e.src = walk.node)
        SELECT node, CAST(max(layer) AS BIGINT) AS layer
        FROM walk GROUP BY node"""


def bucket_batches_oracle(band: int = 16, budget: int = 256) -> str:
    """Oracle for functions.textstats.bucket_batches: the same whitespace
    token count, length band, and per-band running prefix sum in id order —
    batch_id = exclusive prefix // budget."""
    return f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(n_tokens // {band} AS BIGINT) AS lband,
               CAST(coalesce(sum(n_tokens) OVER (
                      PARTITION BY n_tokens // {band} ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // {budget} AS BIGINT) AS batch_id
        FROM c"""


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    """Oracle for functions.dedup.simhash_pairs: ALL pairs within the
    Hamming ball by brute force over the identical signatures — proves the
    pigeonhole chunk filter lossless, not just the verifier."""
    return f"""
        WITH sigs AS ({simhash_oracle()})
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}"""


def label_centroids_oracle(quant: int = 1_000_000) -> str:
    """Oracle for functions.similarity.label_centroids: identical floor
    quantization, BIGINT sums per (label, dim)."""
    return f"""
        SELECT CAST(e.label AS BIGINT) AS label,
               CAST(d.d AS BIGINT) AS dim,
               CAST(sum(CAST(floor(CAST(e.embedding[d.d + 1] AS DOUBLE)
                                   * {quant}) AS BIGINT)) AS BIGINT) AS qsum,
               CAST(count(*) AS BIGINT) AS n
        FROM embeddings e
        JOIN (SELECT unnest(range(64)) AS d) d ON d.d < len(e.embedding)
        GROUP BY e.label, d.d"""


def dup_rate_oracle() -> str:
    """Per-source exact-duplicate report, grouped by the SAME 64-bit
    polynomial text fingerprint the Ray operator exchanges (collision
    behavior therefore identical on both sides)."""
    h = _poly_hash("hex(encode(text))")
    return f"""
        WITH d AS (SELECT source, {h} AS h FROM documents),
        c AS (SELECT h, count(*) AS n_total FROM d GROUP BY h)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_total > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
        FROM d JOIN c USING (h)
        GROUP BY source"""


def vocab_coverage_oracle(vocab_size: int = 16) -> str:
    """Exact SQL mirror of ``textstats.vocab_coverage``: top-V vocabulary by
    (count DESC, token ASC), per-doc OOV counts, ppm via integer floor
    division, empty documents kept at zero via the LEFT JOIN."""
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                x -> len(x) > 0)) AS tok
          FROM documents),
        cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
        vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT {vocab_size}),
        per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab)
                                THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
                FROM tok GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(per.n_tokens, 0) AS n_tokens,
               COALESCE(per.n_oov, 0) AS n_oov,
               CAST(CASE WHEN COALESCE(per.n_tokens, 0) = 0 THEN 0
                    ELSE per.n_oov * 1000000 // per.n_tokens END AS BIGINT)
                 AS oov_ppm
        FROM documents d LEFT JOIN per USING (doc_id)"""


def mmr_oracle(nq: int = 8, k: int = 5, pool: int = 32) -> str:
    """Exact SQL mirror of ``similarity.mmr_topk``: top-``pool`` candidates
    per query by (round(cos, 9) DESC, vec_id) — rel is rounded at
    computation, matching the Ray side, so pool membership is pinned — then
    the lambda=1/2 greedy unrolled as ``k``-1 chained CTEs — score =
    round(0.5*rel - 0.5*maxsim, 9), maxsim = max cosine against the selected
    set, ties by vec_id ASC. The round-to-9 contract is shared with the Ray
    side."""
    parts = [
        f"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE vec_id < {nq}),
        s AS (SELECT q.qid, v.vec_id, CAST(v.embedding AS DOUBLE[]) AS e,
                     round(list_cosine_similarity(
                         q.e, CAST(v.embedding AS DOUBLE[])), 9) AS rel
              FROM q CROSS JOIN embeddings v),
        pool AS (SELECT qid, vec_id, e, rel FROM (
              SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY rel DESC, vec_id) AS rn FROM s)
              WHERE rn <= {pool}),
        selall0 AS (SELECT qid, vec_id, 0 AS rank, e FROM (
              SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY round(0.5 * rel, 9) DESC, vec_id) AS rn
              FROM pool) WHERE rn = 1)"""
    ]
    for i in range(1, k):
        parts.append(
            f""",
        sc{i} AS (SELECT c.qid, c.vec_id, c.e,
                         round(0.5 * c.rel - 0.5 *
                               (SELECT max(list_cosine_similarity(c.e, x.e))
                                FROM selall{i - 1} x WHERE x.qid = c.qid), 9)
                           AS score
                  FROM pool c
                  WHERE NOT EXISTS (SELECT 1 FROM selall{i - 1} x
                                    WHERE x.qid = c.qid
                                      AND x.vec_id = c.vec_id)),
        selall{i} AS (SELECT * FROM selall{i - 1} UNION ALL
              SELECT qid, vec_id, {i} AS rank, e FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id) AS rn FROM sc{i})
              WHERE rn = 1)"""
        )
    parts.append(
        f" SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id FROM selall{k - 1}"
    )
    return "".join(parts)


def epoch_plan_oracle(n_epochs: int = 3) -> str:
    """Exact SQL mirror of ``textstats.epoch_plan``: per-epoch dense rank
    under (affine64(doc_id; a_e, b_e), doc_id) with the same perm_constants
    the Ray side imports — one UNION ALL branch per epoch."""
    from .functions.hashing import perm_constants

    qs = []
    for e in range(n_epochs):
        a, b = perm_constants(e)
        u = _unsigned("doc_id")
        h = (
            f"(({_mulmod(u, str(a), str(a % 2**32))} + CAST('{b}' AS HUGEINT))"
            f" % CAST('{U64}' AS HUGEINT))"
        )
        qs.append(
            f"SELECT doc_id, CAST({e} AS BIGINT) AS epoch, "
            f"CAST(row_number() OVER (ORDER BY {h}, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM documents"
        )
    return " UNION ALL ".join(qs)
