"""North-rule parity: Spark pipeline vs standalone pandas reference.

keep/drop F1 >= 0.99 (expected: exact) and per-turn scrubbed-text exact
equality under stable (conv_id, turn_idx, ts) ordering.
"""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.config import DEFAULT_CONFIG
from dataquality_box_spark.plans.pipeline import run_pipeline
from dataquality_box_spark.reference_impl import reference_labels


def _spark_result_pdf(spark, transcripts_df) -> pd.DataFrame:
    result = run_pipeline(transcripts_df, DEFAULT_CONFIG)
    pdf = result.select(
        "conv_id", "turn_idx", "ts", "lang", "ppl", "drop_reasons", "keep", "scrubbed_text"
    ).toPandas()
    return pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort").reset_index(
        drop=True
    )


def test_keep_drop_f1_and_scrub_equality(spark, transcripts_df, transcripts_pdf):
    got = _spark_result_pdf(spark, transcripts_df)
    exp = reference_labels(transcripts_pdf, DEFAULT_CONFIG)
    assert len(got) == len(exp)

    # keys align after the stable sort
    assert (got["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()

    g = got["keep"].to_numpy()
    e = exp["keep"].to_numpy()
    tp = (g & e).sum()
    fp = (g & ~e).sum()
    fn = (~g & e).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1}"
    assert (g == e).all(), "expected exact keep/drop agreement"

    # drop reasons agree exactly (taxonomy-ordered lists)
    assert [list(x) for x in got["drop_reasons"]] == [list(x) for x in exp["drop_reasons"]]

    # exact scrubbed-text equality (null for dropped turns in both)
    gs = got["scrubbed_text"].where(got["keep"], None)
    es = exp["scrubbed_text"].where(exp["keep"], None)
    mism = (gs.fillna("\0") != es.fillna("\0")).to_numpy()
    assert not mism.any(), f"{mism.sum()} scrub mismatches, first: " + str(
        list(zip(gs[mism].head(3), es[mism].head(3)))
    )

    # lang + ppl agree (same scorer via different execution paths)
    assert (got["lang"].to_numpy() == exp["lang"].to_numpy()).all()
    assert (abs(got["ppl"].to_numpy() - exp["ppl"].to_numpy()) < 1e-9).all()


def test_every_reason_fires(transcripts_pdf):
    exp = reference_labels(transcripts_pdf, DEFAULT_CONFIG)
    fired = set()
    for reasons in exp["drop_reasons"]:
        fired.update(reasons)
    from dataquality_box_spark.schema import DROP_REASONS

    missing = set(DROP_REASONS) - fired
    assert not missing, f"synth never triggers: {missing}"


def test_pii_actually_scrubbed(transcripts_pdf):
    exp = reference_labels(transcripts_pdf, DEFAULT_CONFIG)
    kept = exp[exp["keep"]]["scrubbed_text"].dropna()
    joined = "\n".join(kept)
    assert "@example.com" not in joined
    assert "123-45-" not in joined
    assert "(555) 123-" not in joined
    assert "<EMAIL>" in joined and "<SSN>" in joined and "<PHONE>" in joined
