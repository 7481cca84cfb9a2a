"""Extraction correctness: (a) the transcript builder matches its DuckDB SQL mirror,
(b) the vectorized Ray extractor emits exactly the oracle extractor's triple set
(P/R harness, BASELINE.md: P/R >= 0.95; exact equality expected here)."""

import duckdb
import pyarrow as pa

from r2s2_ray.extract.batch import TripleExtractor, extract_triples
from r2s2_ray.extract.oracle import extract_all
from r2s2_ray.transcripts import TRANSCRIPTS_SQL, documents_to_transcripts, read_transcripts


def _transcripts_table(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    return documents_to_transcripts(docs)


def test_builder_matches_sql(sf_small):
    got = _transcripts_table(sf_small)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    want = con.execute(
        f"SELECT * FROM ({TRANSCRIPTS_SQL}) ORDER BY conv_id, turn_idx"
    ).arrow()
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.num_rows == want.num_rows
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert got[col].to_pylist() == want[col].to_pylist(), col
    assert [t.isoformat() for t in got["ts"].to_pylist()] == [
        t.isoformat() for t in want["ts"].to_pylist()
    ]


def _canon(triples):
    return sorted(tuple(t) for t in triples)


def test_batch_extractor_matches_oracle(sf_small):
    tx = _transcripts_table(sf_small)
    want = _canon(extract_all(tx.to_pylist()))
    got_tbl = TripleExtractor()(tx)
    got = _canon(
        zip(
            got_tbl["subj"].to_pylist(),
            got_tbl["s_kind"].to_pylist(),
            got_tbl["pred"].to_pylist(),
            got_tbl["obj"].to_pylist(),
            got_tbl["o_kind"].to_pylist(),
            got_tbl["o_lang"].to_pylist(),
            got_tbl["o_dt"].to_pylist(),
            got_tbl["graph"].to_pylist(),
        )
    )
    assert len(got) == len(want)
    assert got == want


def test_batch_extractor_batch_invariance(sf_small):
    """Splitting the input into small batches must not change the triple set."""
    tx = _transcripts_table(sf_small).slice(0, 40)
    ex = TripleExtractor()
    whole = _canon(ex(tx).to_pylist())
    parts = []
    for off in range(0, tx.num_rows, 7):
        parts.extend(ex(tx.slice(off, 7)).to_pylist())
    assert _canon(parts) == whole


def test_ray_extract_pipeline(sf_small):
    ds = extract_triples(read_transcripts(sf_small))
    n = ds.count()
    tx = _transcripts_table(sf_small)
    assert n == len(extract_all(tx.to_pylist()))


def test_file_list_source_graph_defaulting(sf_small, tmp_path):
    """S1 + M1 parity: the work-list source attaches each file's graph IRI; a
    file listed without a graph falls back to the engine-derived graph."""
    import pytest

    from r2s2_ray.sources.filelist import (
        MalformedFileListError,
        parse_file_list,
        read_transcript_files,
    )

    tx = _transcripts_table(sf_small)
    import pyarrow.parquet as pq

    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    half = tx.num_rows // 2
    pq.write_table(tx.slice(0, half), a)
    pq.write_table(tx.slice(half), b)
    tsv = tmp_path / "toload.tsv"
    tsv.write_text(f"{a}\thttps://ex.org/graphs/fileA\n{b}\n")

    assert parse_file_list(str(tsv)) == [(a, "https://ex.org/graphs/fileA"), (b, None)]
    out = extract_triples(read_transcript_files(str(tsv))).to_pandas()

    convs_a = set(tx.slice(0, half)["conv_id"].to_pylist())
    from r2s2_ray import vocab

    subj_conv = out["subj"].str.extract(r"conv-(\d{8})", expand=False)
    in_a = subj_conv.notna() & subj_conv.apply(lambda d: d is not None and f"conv-{d}" in convs_a)
    # every triple whose subject belongs to file A carries file A's graph
    assert (out.loc[in_a, "graph"] == "https://ex.org/graphs/fileA").all()
    # file B rows keep the derived graph (M1 default)
    assert out.loc[~in_a, "graph"].str.startswith(vocab.GRAPHS).any()
    # triple set ignoring graphs matches the default single-file pipeline
    base = extract_triples(read_transcripts(sf_small)).to_pandas()
    cols = ["subj", "pred", "obj", "o_lang", "o_dt"]
    key = lambda df: set(map(tuple, df[cols].fillna("").values.tolist()))
    assert key(out) == key(base)

    bad = tmp_path / "bad.tsv"
    bad.write_text("a.parquet\tg\textra\n")
    with pytest.raises(MalformedFileListError):
        parse_file_list(str(bad))
