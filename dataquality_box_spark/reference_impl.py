"""Standalone pandas/NumPy reference implementation of the quality rules.

This is the "reference labels" oracle of the north rule: an independent,
non-Spark implementation of exactly the same keep/drop + scrub semantics
(SURVEY.md §5 point 3). The Spark pipeline must reproduce its keep/drop
decisions (F1 ≥ 0.99 — in practice exactly) and its scrubbed text
byte-for-byte under stable (conv_id, turn_idx, ts) ordering.

It shares ONLY the config constants and the two model-scoring batch
functions with the Spark pipeline; every rule/window/scrub computation
here is written directly against pandas.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .config import (
    BOILERPLATE_PREFIXES,
    DEFAULT_CONFIG,
    SCRUB_STEPS,
    TOXICITY_WORDS,
    QualityConfig,
)
from .functions.scoring import detect_lang_batch, perplexity_batch
from .schema import DROP_REASONS

_TOKEN_RE = re.compile(r"[^ \t\n\r]+")
_SYMBOL_RE = re.compile(r"[^A-Za-z0-9 \t\n\r]")
_BOIL_RE = re.compile("^(?:" + "|".join(re.escape(p) for p in BOILERPLATE_PREFIXES) + ")")
_TOX_RE = re.compile(
    r"(?i)\b(?:" + "|".join(re.escape(w) for w in TOXICITY_WORDS) + r")\b"
)
_SCRUB_RES = [(re.compile(p), tok) for p, tok in SCRUB_STEPS]


def scrub_series(texts: pd.Series) -> pd.Series:
    out = texts.fillna("")
    for cre, tok in _SCRUB_RES:
        out = out.str.replace(cre, tok, regex=True)
    return out


def reference_labels(pdf: pd.DataFrame, cfg: QualityConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Compute lang/ppl/flags/drop_reasons/keep/scrubbed_text in pandas."""
    df = pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort").reset_index(
        drop=True
    )
    text = df["text"].fillna("")

    toks = text.map(lambda t: _TOKEN_RE.findall(t))
    n_tokens = toks.map(len).to_numpy()
    n_chars = text.str.len().to_numpy()
    distinct_ratio = np.array(
        [len(set(t)) / len(t) if t else 1.0 for t in toks], dtype=np.float64
    )
    sym_ratio = np.where(
        n_chars > 0, text.str.count(_SYMBOL_RE).to_numpy() / np.maximum(n_chars, 1), 0.0
    )

    flags: dict[str, np.ndarray] = {
        "too_short": n_tokens < cfg.min_tokens,
        "too_long": n_chars > cfg.max_chars,
        "high_repetition": (n_tokens >= cfg.repetition_min_tokens)
        & (distinct_ratio < cfg.repetition_distinct_ratio),
        "high_symbol_ratio": (n_chars >= cfg.symbol_min_chars)
        & (sym_ratio > cfg.max_symbol_ratio),
        "boilerplate": text.str.match(_BOIL_RE).to_numpy(),
        "toxicity": text.str.contains(_TOX_RE, regex=True).to_numpy(),
    }

    lang = detect_lang_batch(text)
    ppl = perplexity_batch(text)
    if cfg.target_langs:
        flags["wrong_language"] = (~lang.isin(cfg.target_langs) & (lang != "und")).to_numpy()
    else:
        flags["wrong_language"] = np.zeros(len(df), dtype=bool)
    if cfg.max_ppl > 0:
        flags["high_perplexity"] = (ppl > cfg.max_ppl).to_numpy()
    else:
        flags["high_perplexity"] = np.zeros(len(df), dtype=bool)

    # conversation-window flags (grouped shift over the stable ordering)
    g = df.groupby("conv_id", sort=False)
    prev_role = g["role"].shift(1)
    prev_ts = g["ts"].shift(1)
    if cfg.enforce_role_alternation:
        flags["bad_role_sequence"] = (
            df["role"].isin(["user", "assistant"]) & (prev_role == df["role"])
        ).to_numpy()
    if cfg.enforce_tool_chain:
        flags["broken_tool_chain"] = (
            (df["role"] == "tool") & ~prev_role.isin(["assistant", "tool"])
        ).to_numpy()
    if cfg.enforce_ts_order:
        flags["out_of_order_ts"] = (df["ts"] < prev_ts).to_numpy()

    reasons_present = [r for r in DROP_REASONS if r in flags]
    reason_mat = np.stack([flags[r] for r in reasons_present], axis=1)
    reason_names = np.array(reasons_present, dtype=object)
    drop_reasons = [list(reason_names[row]) for row in reason_mat]

    dropping = [i for i, r in enumerate(reasons_present) if r in set(cfg.dropping_reasons)]
    keep = ~reason_mat[:, dropping].any(axis=1) if dropping else np.ones(len(df), bool)

    scrubbed = scrub_series(text)
    out = df[["conv_id", "turn_idx", "ts"]].copy()
    out["lang"] = lang.to_numpy()
    out["ppl"] = ppl.to_numpy()
    out["drop_reasons"] = drop_reasons
    out["keep"] = keep
    out["scrubbed_text"] = np.where(keep, scrubbed.to_numpy(), None)
    return out
