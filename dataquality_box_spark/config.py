"""Pipeline configuration: thresholds, regexes, wordlists.

One shared source of truth for BOTH the Spark pipeline (column
expressions / pandas UDFs) and the standalone pandas reference
implementation used for parity testing — the analog of the reference's
env-overridable thresholds (reference: plugins/services/config.py:26
THRESHOLD_TIME_DIFF et al.).

All regex patterns are written in the common subset of Java regex
(Spark `regexp_replace`/`rlike`) and Python `re`: no lookbehind, no
possessive quantifiers, `\\b` word boundaries only around ASCII.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- PII scrub patterns (applied in this order; replacement tokens are
# deterministic so per-turn scrubbed-text equality is exact).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PHONE_RE = r"(\+?1[-. ])?(\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b"
SCRUB_STEPS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
)

# Toxicity wordlist (placeholder vocabulary — the engine mechanism, an
# alternation rlike over a compiled wordlist, is the deliverable; swap the
# list for a real lexicon in production).
TOXICITY_WORDS: tuple[str, ...] = ("frak", "gorram", "shazbot", "smeghead", "belgium")

# English function words for the C4-style stop-word density signal
# (Raffel et al. 2020 keep pages with >= threshold stop-word coverage;
# machine-generated keyword soup scores near zero). Single source of
# truth for both the Spark expression and the DuckDB oracle's IN list.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
    "is", "are", "was", "be", "it", "that", "this", "with", "for", "as",
    "by", "from", "not", "have", "has",
)

# Boilerplate prefixes (reference analog: enum/pattern predicates in
# plugins/configs/rules/p0_R10_at_status_enum.yaml).
BOILERPLATE_PREFIXES: tuple[str, ...] = (
    "As an AI language model",
    "I'm sorry, but I cannot",
    "Lorem ipsum dolor",
)


@dataclass(frozen=True)
class QualityConfig:
    """Thresholds for the heuristic quality rules (SURVEY.md §2.2 P6)."""

    min_tokens: int = 3  # too_short: fewer whitespace tokens than this
    max_chars: int = 8192  # too_long
    # high_repetition: distinct-token ratio below this, with enough tokens
    repetition_distinct_ratio: float = 0.3
    repetition_min_tokens: int = 10
    # high_symbol_ratio: non-alnum-non-space chars / chars above this
    max_symbol_ratio: float = 0.30
    symbol_min_chars: int = 20
    # language filter: langs considered acceptable; empty = accept all
    target_langs: tuple[str, ...] = ("en",)
    # perplexity filter (char-bigram scorer); <=0 disables.
    # Calibration on the frozen model: clean en ≈ 7-25, fr/es/de ≈ 20-30,
    # keyboard-mash gibberish ≈ 100, symbol runs ≈ 150.
    max_ppl: float = 80.0
    # conversation-window checks
    enforce_role_alternation: bool = True
    enforce_tool_chain: bool = True
    enforce_ts_order: bool = True
    # secondary bucketing for extremely long conversations (SURVEY hard
    # part #2): conversations are windowed within buckets of this many
    # turns, with a small tail-merge fixing bucket boundaries, so the
    # per-task ceiling is the bucket size instead of the longest
    # conversation. None = plain per-conversation window (the right
    # default while conversations are bounded).
    conversation_bucket_turns: int | None = None
    # which reasons actually drop a turn (others are recorded but kept) —
    # the analog of the reference's P0(alert)/P1(asset)/P2(record) severity
    # routing (reference: plugins/operators/aggregator.py:139-147).
    dropping_reasons: tuple[str, ...] = field(
        default=(
            "too_short",
            "too_long",
            "high_repetition",
            "high_symbol_ratio",
            "boilerplate",
            "bad_role_sequence",
            "broken_tool_chain",
            "out_of_order_ts",
            "wrong_language",
            "high_perplexity",
            "toxicity",
        )
    )


DEFAULT_CONFIG = QualityConfig()

# SQL-expressible subset: model-based scoring disabled entirely so an
# ANSI-SQL oracle can reproduce keep/drop + scrub exactly.
HEURISTIC_CONFIG = QualityConfig(
    target_langs=(),
    max_ppl=0.0,
    dropping_reasons=(
        "too_short",
        "too_long",
        "high_repetition",
        "high_symbol_ratio",
        "boilerplate",
        "bad_role_sequence",
        "broken_tool_chain",
        "out_of_order_ts",
        "toxicity",
    ),
)

# A permissive config for mixed-language corpora (flagship entry over the
# driver's multi-language documents table): language + ppl rules recorded
# but not dropping.
MIXED_LANG_CONFIG = QualityConfig(
    target_langs=(),
    max_ppl=0.0,
    dropping_reasons=(
        "too_short",
        "too_long",
        "high_repetition",
        "high_symbol_ratio",
        "boilerplate",
        "toxicity",
    ),
)
