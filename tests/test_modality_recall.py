"""Served-recall pins for the modality→ANN bridges (VERDICT r10 item
#5): each bridge's IVF-PQ funnel is audited against the exact kNN over
the same modality embeddings, and the measured recall@5 is pinned so
fixture or funnel drift surfaces as a test diff, not a silent serving
regression. The image/audio bridges serve at ``BRIDGE_IVF_NPROBE``
(their width/length IVF labels cluster the space weakly — recall@5 was
0.70/0.80 at the default nprobe=3); video's cells are tight and keeps
the default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from music_streaming_etl_glue_spark.operators import multimodal as M
from tests.conftest import SF_SMOKE

#: (entry fn, pinned mean recall@5 at the smoke fixture's 500 docs)
PINS = [
    ("image", entry._recall_image, 0.96),
    ("audio", entry._recall_audio, 0.98),
    ("video", entry._recall_video, 1.0),
]


@pytest.mark.parametrize("name,fn,pinned", PINS, ids=[p[0] for p in PINS])
def test_bridge_recall_pinned(spark, name, fn, pinned):
    audit = fn(spark, SF_SMOKE)
    mean = audit.agg(F.round(F.avg("recall_at_k"), 6)).head()[0]
    assert mean == pinned, f"{name} served recall@5 moved: {mean}"
    # the audit shape: one row per query, recall in [0, 1]
    assert audit.count() == 10
    bad = audit.filter(
        (F.col("recall_at_k") < 0) | (F.col("recall_at_k") > 1)
    ).count()
    assert bad == 0


def test_bridge_nprobe_is_the_audited_dial():
    """The serving constant exists and is wider than the default —
    the audit-tuned trade documented at its definition."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        IVF_NPROBE,
    )

    assert M.BRIDGE_IVF_NPROBE > IVF_NPROBE
