"""Deterministic language model tables shared by the scorers and synth.

Marker-word sets per language (ASCII-only, pairwise disjoint) plus a CJK
codepoint heuristic for zh. These frozen tables replace an external
fastText model download (north rule: fastText-style langid inside pandas
UDFs) — the mechanism (hashed-feature scoring inside Arrow-batched UDFs)
is identical, the tables are self-contained.
"""

from __future__ import annotations

MARKERS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "with", "that", "this", "have", "from", "they",
        "will", "would", "there", "about", "which", "their", "when",
    ),
    "fr": (
        "les", "une", "pour", "dans", "avec", "pas", "vous", "nous",
        "mais", "sont", "cette", "tout", "bien", "fait", "aussi",
    ),
    "es": (
        "los", "una", "para", "con", "por", "como", "pero", "muy",
        "todo", "esta", "hace", "entre", "puede", "donde", "ahora",
    ),
    "de": (
        "der", "die", "das", "und", "ist", "ein", "eine", "nicht",
        "mit", "auf", "von", "sich", "auch", "wir", "werden",
    ),
}

# Lang-specific filler vocabulary (keeps synthetic text realistic-ish and
# gives the perplexity scorer distinguishable character statistics).
FILLER: dict[str, tuple[str, ...]] = {
    "en": (
        "data", "model", "query", "table", "answer", "question", "system",
        "result", "value", "number", "please", "thanks", "running", "check",
        "output", "error", "update", "record", "process", "report",
    ),
    "fr": (
        "bonjour", "merci", "question", "reponse", "valeur", "nombre",
        "tableau", "resultat", "systeme", "erreur", "mise", "jour",
        "processus", "rapport", "verifier", "demande",
    ),
    "es": (
        "hola", "gracias", "pregunta", "respuesta", "valor", "numero",
        "tabla", "resultado", "sistema", "error", "actualizar", "registro",
        "proceso", "informe", "verificar", "solicitud",
    ),
    "de": (
        "hallo", "danke", "frage", "antwort", "wert", "nummer", "tabelle",
        "ergebnis", "system", "fehler", "aktualisieren", "datensatz",
        "prozess", "bericht", "pruefen", "anfrage",
    ),
}

# Small zh vocabulary (CJK); synth joins these with spaces so tokenization
# behaves; langid detects zh by CJK codepoint ratio, not markers.
ZH_WORDS: tuple[str, ...] = (
    "数据", "模型", "查询", "表格", "答案", "问题", "系统", "结果",
    "数值", "请问", "谢谢", "运行", "检查", "输出", "错误", "更新",
    "记录", "处理", "报告", "你好",
)

CJK_RE = r"[一-鿿]"

LANGS: tuple[str, ...] = ("en", "fr", "es", "de", "zh")

# English seed corpus for the char-bigram perplexity model — built from the
# en vocabulary plus connective glue, frozen at import time.
_EN_SEED_WORDS = MARKERS["en"] + FILLER["en"]
PPL_SEED_CORPUS = " ".join(
    _EN_SEED_WORDS[i % len(_EN_SEED_WORDS)] for i in range(0, 400)
) + " the quick brown fox jumps over the lazy dog . numbers 0123456789 , and punctuation ! ? : ; ' ( ) "


def _check_disjoint() -> None:
    seen: dict[str, str] = {}
    for lang, words in MARKERS.items():
        for w in words:
            assert w not in seen, f"marker {w!r} in both {seen[w]} and {lang}"
            seen[w] = lang


_check_disjoint()
