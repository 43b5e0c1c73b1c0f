"""The committed fixture parquet (read by the DuckDB oracles at a fixed
path) must stay value-identical to what the generator derives from the
reference .bin files."""

import pyarrow.parquet as pq

from tests.conftest import FIXTURE_PARQUET
from tools import fixture_gen


def test_committed_fixture_matches_reference():
    committed = pq.read_table(FIXTURE_PARQUET).to_pylist()
    fresh = fixture_gen.rows_to_table(
        fixture_gen.load_fixture_events()).to_pylist()
    assert len(committed) == len(fresh) == 166
    for a, b in zip(committed, fresh):
        assert a == b, a["doc_id"]


def test_synth_is_deterministic(tmp_path):
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    fixture_gen.write_synth_parquet(a, 3)
    fixture_gen.write_synth_parquet(b, 3)
    assert pq.read_table(a).equals(pq.read_table(b))
    # different seed -> different headers, same payloads
    c = tmp_path / "c.parquet"
    fixture_gen.write_synth_parquet(c, 3, seed=7)
    ta, tc = pq.read_table(a), pq.read_table(c)
    assert not ta.equals(tc)
    assert ta.column("doc_id").equals(tc.column("doc_id"))
