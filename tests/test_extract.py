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
