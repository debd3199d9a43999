"""Round-11 regression pins for the ADVICE/VERDICT r10 items.

The r10 driver stamp flagged ``audio_embeddings`` hash-RED while the
local gate was green: DuckDB's ``round()`` preserves the sign of zero
(12 tiny negative zero-crossing margins rounded to ``-0.0`` at 6dp)
where Spark's ``F.round`` goes through BigDecimal (no signed zero) and
emits ``+0.0`` — and the gate's ``round(v, 9)`` + ``==`` compare treats
``-0.0 == 0.0`` so the divergence was locally invisible. Pins here:

1. both ``_norm`` copies (tools/oracle_check.py, tests/oracle_util.py)
   now distinguish ``-0.0`` from ``0.0``;
2. the pre-fix audio SQL twin DOES emit ``-0.0`` on the smoke fixture
   (so these tests would have caught the r10 divergence) and the fixed
   twin emits none;
3. the image/video twins sharing the ``_unit_embedding`` tail emit no
   ``-0.0`` either;
4. the Spark/DuckDB audio pair bit-agrees on zero signs end to end.
"""

from __future__ import annotations

import importlib.util
import math

import pytest

from music_streaming_etl_glue_spark.operators import multimodal as M
from tests.conftest import REPO, SF_SMOKE
from tests.oracle_util import _norm as util_norm
from tests.oracle_util import duckdb_con


def _neg_zeros(values) -> int:
    return sum(
        1
        for v in values
        if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
    )


def _gate_norm():
    # load tools/oracle_check.py without importing __spark_entry__ (its
    # module-level import) into every pytest worker: exec only the _norm
    # definition source
    spec = importlib.util.spec_from_file_location(
        "oracle_check_under_test", str(REPO / "tools" / "oracle_check.py")
    )
    src = open(spec.origin).read()
    ns: dict = {"math": math}
    start = src.index("def _norm")
    end = src.index("def _rowset")
    exec(src[start:end], ns)
    return ns["_norm"]


def test_gate_norm_distinguishes_signed_zero():
    norm = _gate_norm()
    assert norm(-0.0) != norm(0.0)
    assert norm(0.0) == 0.0
    assert norm(1.5) == norm(1.5000000000001)  # 9dp rounding preserved
    # a value that merely ROUNDS to zero at 9dp keeps its sign token too
    assert norm(-1e-12) != norm(1e-12)


def test_util_norm_distinguishes_signed_zero():
    assert util_norm(-0.0) != util_norm(0.0)
    assert util_norm([0.0, -0.0]) != util_norm([0.0, 0.0])
    assert util_norm(float("nan")) == "nan"


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


def test_prefix_audio_twin_emitted_negative_zero(con):
    """The fixture still exercises the divergence class: with the
    ``+ 0.0`` guard stripped, DuckDB emits ``-0.0`` values (the exact
    r10 failure) — guarding against a fixture drift that would make the
    pins below vacuous."""
    sql = M.AUDIO_EMBEDDINGS_SQL.replace("+ 0.0 END", "END")
    assert sql != M.AUDIO_EMBEDDINGS_SQL  # the guard is present to strip
    vals = [r[2] for r in con.execute(sql).fetchall()]
    assert _neg_zeros(vals) > 0


def test_modality_twins_emit_no_negative_zero(con):
    for sql in (
        M.AUDIO_EMBEDDINGS_SQL,
        M.IMAGE_EMBEDDINGS_SQL,
        M.VIDEO_EMBEDDINGS_SQL,
    ):
        vals = [r[2] for r in con.execute(sql).fetchall()]
        assert _neg_zeros(vals) == 0


def test_audio_pair_bit_agrees_on_zero_signs(spark, con):
    """End-to-end: the Spark query and the DuckDB twin agree on every
    zero's sign bit (Spark's BigDecimal round can't emit -0.0; the twin
    must not either)."""
    sdf = M.audio_embeddings(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    s = {
        (r["doc_id"], r["dim"]): r["val"]
        for r in sdf.collect()
    }
    o = {
        (r[0], r[1]): r[2]
        for r in con.execute(M.AUDIO_EMBEDDINGS_SQL).fetchall()
    }
    assert set(s) == set(o)
    zero_keys = [k for k, v in o.items() if v == 0.0]
    assert len(zero_keys) > 100  # the class is populated on this fixture
    for k in zero_keys:
        assert math.copysign(1.0, s[k]) == math.copysign(1.0, o[k]), k
