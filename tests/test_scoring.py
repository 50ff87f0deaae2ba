"""Unit tests for the model scorers and the scrub regexes (no Spark)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from dataquality_box_spark.config import EMAIL_RE, PHONE_RE, SCRUB_STEPS, SSN_RE
from dataquality_box_spark.functions.scoring import (
    detect_lang_batch,
    perplexity_batch,
    score_batch,
)
from dataquality_box_spark.reference_impl import scrub_series


def test_langid_detects_each_language():
    s = pd.Series(
        {
            "en": "the data and the model have results that they will check",
            "fr": "nous avons une question pour vous mais pas les autres",
            "es": "los datos para una tabla pero muy grandes ahora",
            "de": "die daten und das modell sind nicht mit der tabelle",
            "zh": "数据 模型 查询 表格 答案 问题 系统",
            "und": "zz qq xx vv kk jj ww pp mm nn",
            "und2": "short",
        }
    )
    got = detect_lang_batch(s)
    assert got["en"] == "en" and got["fr"] == "fr"
    assert got["es"] == "es" and got["de"] == "de"
    assert got["zh"] == "zh"
    assert got["und"] == "und" and got["und2"] == "und"


def test_langid_handles_nulls_and_empty():
    s = pd.Series([None, "", "   ", "the and with that this have from"])
    got = detect_lang_batch(s)
    assert list(got[:3]) == ["und", "und", "und"]
    assert got[3] == "en"


def test_perplexity_ordering_and_determinism():
    s = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog",
            "xq zv jk qz wx vq zx jq kz xv qj zk vx qw",
            "@@ ## $$ %% ^^ && ** (( ))",
        ]
    )
    p1 = perplexity_batch(s)
    p2 = perplexity_batch(s)
    assert (p1 == p2).all()  # bit-exact across calls
    assert p1[0] < p1[1] < p1[2]  # english < gibberish < symbols


def test_perplexity_batch_boundary_independence():
    # scoring a row alone == scoring it inside a batch (no cross-row state)
    rows = ["hello there", "xq zv jk", "", "the data and the model"]
    whole = perplexity_batch(pd.Series(rows)).to_numpy()
    solo = np.array([perplexity_batch(pd.Series([r])).iloc[0] for r in rows])
    assert np.array_equal(whole, solo)


def test_score_batch_struct():
    out = score_batch(pd.Series(["the data and the model have results here"]))
    assert list(out.columns) == ["lang", "ppl"]
    assert out.iloc[0]["lang"] == "en" and out.iloc[0]["ppl"] > 0


def test_scrub_patterns_precise():
    cases = {
        "mail me at john.doe+x@sub.example.co.uk now": "mail me at <EMAIL> now",
        "ssn 123-45-6789 end": "ssn <SSN> end",
        "call (555) 123-4567 or 555-123-4567": "call <PHONE> or <PHONE>",
        "+1 555 123 4567 works": "<PHONE> works",
        # non-PII that must NOT be scrubbed
        "version 1.2-34-5678 is not an ssn": "version 1.2-34-5678 is not an ssn",
        "range 100-20 stays": "range 100-20 stays",
    }
    got = scrub_series(pd.Series(list(cases.keys())))
    for (src, want), g in zip(cases.items(), got):
        assert g == want, f"{src!r} -> {g!r} != {want!r}"


def test_scrub_patterns_java_compatible():
    # the same patterns must compile under Java-regex-safe constructs:
    # no lookbehind, no possessive quantifiers, no named groups
    for pat, _tok in SCRUB_STEPS:
        assert "(?<" not in pat and "*+" not in pat and "?P<" not in pat
        re.compile(pat)  # python side compiles
    for pat in (EMAIL_RE, SSN_RE, PHONE_RE):
        re.compile(pat)
