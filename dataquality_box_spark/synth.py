"""Deterministic synthetic transcript generator (seeded, vectorized).

Produces the FIXTURES.md §1 ``transcripts`` table with violations of
every quality rule planted at fixed rates. Fully vectorized NumPy so the
bench-scale corpus (millions of turns) generates in seconds. All
randomness flows from one ``np.random.default_rng(seed)`` — same seed,
same bytes, every run, every machine.

The generator does NOT compute expected labels; the standalone pandas
reference implementation (``reference_impl.py``) derives them from the
generated frame, and the Spark pipeline must agree with it (north rule:
keep/drop F1 ≥ 0.99, exact scrubbed-text equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.langdata import FILLER, LANGS, MARKERS, ZH_WORDS

POOL_SIZE = 512

# planted violation rates (per turn unless noted)
RATES = {
    "whale_conv": 0.002,  # per conversation: 300-800 turns
    "system_first": 0.2,  # per conversation
    "non_en_conv": 0.10,  # per conversation: fr/es/de/zh
    "double_role": 0.03,
    "tool_after_assistant": 0.05,
    "tool_broken": 0.01,
    "out_of_order_ts": 0.02,
    "turn_idx_dup": 0.01,
    "turn_idx_gap": 0.01,
    "too_short": 0.02,
    "too_long": 0.004,
    "high_repetition": 0.02,
    "high_symbol": 0.015,
    "boilerplate": 0.01,
    "pii": 0.03,
    "toxicity": 0.01,
    "gibberish": 0.01,
}

_BOILERPLATE = (
    "As an AI language model I must note the data looks fine",
    "I'm sorry, but I cannot verify that record for you",
    "Lorem ipsum dolor sit amet consectetur adipiscing elit",
)
_TOX_TEMPLATES = (
    "well frak this broken pipeline again",
    "the gorram query timed out once more",
    "shazbot the table scan is slow today",
)


def _text_pools(rng: np.random.Generator) -> dict[str, np.ndarray]:
    pools: dict[str, np.ndarray] = {}
    for lang in LANGS:
        vocab = (
            list(ZH_WORDS) if lang == "zh" else list(MARKERS[lang]) + list(FILLER[lang])
        )
        vocab_arr = np.array(vocab, dtype=object)
        sents = []
        for _ in range(POOL_SIZE):
            n = int(rng.integers(8, 41))
            sents.append(" ".join(vocab_arr[rng.integers(0, len(vocab_arr), n)]))
        pools[lang] = np.array(sents, dtype=object)
    return pools


def _pii_pool(rng: np.random.Generator, n: int = 64) -> np.ndarray:
    out = []
    for k in range(n):
        kind = k % 3
        if kind == 0:
            out.append(f" contact me at user{k}@example.com please")
        elif kind == 1:
            out.append(f" call (555) 123-{4000 + k:04d} or 555-987-{1000 + k:04d} now")
        else:
            out.append(f" my ssn is 123-45-{6000 + k:04d} keep it safe")
    return np.array(out, dtype=object)


def gen_transcripts(n_conversations: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_conv = n_conversations

    # --- conversation shapes
    turns_per_conv = rng.integers(5, 51, n_conv)
    whales = rng.random(n_conv) < RATES["whale_conv"]
    turns_per_conv = np.where(whales, rng.integers(300, 801, n_conv), turns_per_conv)
    total = int(turns_per_conv.sum())
    conv_of = np.repeat(np.arange(n_conv), turns_per_conv)
    offsets = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    pos = np.arange(total) - np.repeat(offsets, turns_per_conv)  # 0-based position

    # --- roles: [system?] user assistant user assistant ...
    sys_first_conv = rng.random(n_conv) < RATES["system_first"]
    sys_first = np.repeat(sys_first_conv, turns_per_conv)
    posr = pos - sys_first.astype(np.int64)
    role = np.where(posr % 2 == 0, "user", "assistant").astype(object)
    role[(pos == 0) & sys_first] = "system"
    skeleton_prev = np.empty(total, dtype=object)
    skeleton_prev[1:] = role[:-1]
    skeleton_prev[pos == 0] = None

    # planted violations on the role sequence
    dbl = (rng.random(total) < RATES["double_role"]) & (pos > 0) & (
        (skeleton_prev == "user") | (skeleton_prev == "assistant")
    )
    role[dbl] = skeleton_prev[dbl]
    tool_ok = (rng.random(total) < RATES["tool_after_assistant"]) & (
        skeleton_prev == "assistant"
    )
    tool_broken = (rng.random(total) < RATES["tool_broken"]) & (skeleton_prev == "user")
    is_tool = tool_ok | tool_broken
    role[is_tool] = "tool"
    tool_col = np.full(total, None, dtype=object)
    tool_ids = rng.integers(0, 5, total)
    tool_col[is_tool] = [f"tool_{t}" for t in tool_ids[is_tool]]
    # assistant turns occasionally declare a tool call
    asst_call = (role == "assistant") & (rng.random(total) < 0.1)
    tool_col[asst_call] = [f"tool_{t}" for t in tool_ids[asst_call]]

    # --- turn_idx with planted gaps and duplicates
    delta = np.ones(total, dtype=np.int64)
    delta[(rng.random(total) < RATES["turn_idx_dup"]) & (pos > 0)] = 0
    delta[(rng.random(total) < RATES["turn_idx_gap"]) & (pos > 0)] = 2
    delta[pos == 0] = 0
    cs = np.cumsum(delta)
    turn_idx = (cs - np.repeat(cs[offsets], turns_per_conv)).astype(np.int32)

    # --- timestamps: per-conv monotone, then adjacent swaps for ooo
    gap_s = rng.integers(1, 121, total).astype(np.int64)
    gap_s[pos == 0] = 0
    gcs = np.cumsum(gap_s)
    within = gcs - np.repeat(gcs[offsets], turns_per_conv)
    conv_start = np.repeat(np.arange(n_conv, dtype=np.int64) * 7200, turns_per_conv)
    ts_s = np.int64(1704067200) + conv_start + within  # 2024-01-01 base
    swap = (rng.random(total) < RATES["out_of_order_ts"]) & (pos > 0)
    swap &= ~np.concatenate(([False], swap[:-1]))  # no overlapping swaps
    si = np.nonzero(swap)[0]
    ts_s[si - 1], ts_s[si] = ts_s[si].copy(), ts_s[si - 1].copy()

    # --- text
    pools = _text_pools(rng)
    conv_lang = np.full(n_conv, "en", dtype=object)
    non_en = rng.random(n_conv) < RATES["non_en_conv"]
    conv_lang[non_en] = rng.choice(np.array(LANGS[1:], dtype=object), int(non_en.sum()))
    lang_of = np.repeat(conv_lang, turns_per_conv)
    pool_idx = rng.integers(0, POOL_SIZE, total)
    text = np.empty(total, dtype=object)
    for lang in LANGS:
        m = lang_of == lang
        text[m] = pools[lang][pool_idx[m]]

    r = rng.random(total)
    short_m = r < RATES["too_short"]
    text[short_m] = "ok"
    long_m = (r >= 0.02) & (r < 0.02 + RATES["too_long"])
    text[long_m] = "the quick brown fox jumps over the lazy dog " * 200  # >8192 chars
    rep_m = (r >= 0.03) & (r < 0.03 + RATES["high_repetition"])
    text[rep_m] = "spam spam spam spam " * 10
    sym_m = (r >= 0.06) & (r < 0.06 + RATES["high_symbol"])
    text[sym_m] = "@@ ## $$ %% ^^ && ** (( )) == ++ [[ ]] {{ }} :: ;;"
    boil_m = (r >= 0.08) & (r < 0.08 + RATES["boilerplate"])
    text[boil_m] = np.array(_BOILERPLATE, dtype=object)[rng.integers(0, 3, int(boil_m.sum()))]
    tox_m = (r >= 0.10) & (r < 0.10 + RATES["toxicity"])
    text[tox_m] = np.array(_TOX_TEMPLATES, dtype=object)[rng.integers(0, 3, int(tox_m.sum()))]
    gib_m = (r >= 0.155) & (r < 0.155 + RATES["gibberish"])
    text[gib_m] = "xq zv jk qz wx vq zx jq kz xv qj zk vx qw zj kq xz vj qk zw"
    pii_m = (r >= 0.12) & (r < 0.12 + RATES["pii"])
    pii_pool = _pii_pool(rng)
    pii_pick = rng.integers(0, len(pii_pool), total)
    pii_idx = np.nonzero(pii_m)[0]
    for i in pii_idx:
        text[i] = text[i] + pii_pool[pii_pick[i]]

    conv_id = np.char.add("conv_", np.char.zfill(conv_of.astype("U8"), 8)).astype(object)
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": pd.array(role, dtype=object),
            "text": pd.array(text, dtype=object),
            "tool": pd.array(tool_col, dtype=object),
            # microsecond unit: parquet TIMESTAMP(MICROS), which Spark's
            # vectorized reader maps to TimestampType (nanos would fail)
            "ts": pd.to_datetime(ts_s, unit="s").astype("datetime64[us]"),
        }
    )


def write_transcripts_parquet(
    path: str, n_conversations: int, seed: int = 42, rows_per_file: int = 25_000
) -> int:
    """Generate and write as a parquet DIRECTORY of many part files.

    The pool-based text compresses ~20x, so a single file gives Spark only
    a handful of byte-based input splits regardless of core count (row
    groups don't help once the whole file is smaller than
    files.openCostInBytes). Many part files = many splits = full scan
    parallelism — the layout any real multi-TB ingest has anyway.
    """
    import os

    pdf = gen_transcripts(n_conversations, seed)
    os.makedirs(path, exist_ok=True)
    n = len(pdf)
    n_files = max(8, n // rows_per_file)
    bounds = [round(i * n / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
        chunk.to_parquet(os.path.join(path, f"part-{i:05d}.parquet"), index=False)
    return n
