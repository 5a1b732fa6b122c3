"""Post-hoc hallucination filter.

Behavioral port of the reference's phrase filter (capability, not code:
src-tauri/src/whisper.rs:199-260): transcripts that consist entirely of a
known YouTube-training-data hallucination phrase, or of punctuation/music
symbols only, are discarded. Applied per chunk after decoding, exactly as
the reference applies it after ``state.full``.
"""

from __future__ import annotations

import unicodedata

# Known hallucination phrases (EN/KO/JA/ZH + the bare "you"), matching the
# reference's table at src-tauri/src/whisper.rs:201-229.
HALLUCINATION_PHRASES = (
    "thank you for watching",
    "thanks for watching",
    "thank you for listening",
    "thanks for listening",
    "subscribe to my channel",
    "please subscribe",
    "like and subscribe",
    "see you in the next video",
    "see you next time",
    "please like and subscribe",
    "don't forget to subscribe",
    "hit the bell",
    "leave a comment",
    "check out my other videos",
    "thanks for tuning in",
    "시청해 주셔서 감사합니다",
    "구독과 좋아요",
    "구독 부탁드립니다",
    "ご視聴ありがとうございました",
    "感谢收看",
    "谢谢观看",
    "you",
    "MBC 뉴스 이덕영입니다",
)

_EXTRA_PUNCT = {"…", "♪", "♫", "♬"}


def _is_punctish(ch: str) -> bool:
    if ch in _EXTRA_PUNCT:
        return True
    return ch.isascii() and not ch.isalnum() and not ch.isspace() and \
        unicodedata.category(ch).startswith(("P", "S"))


def filter_hallucinations(text: str) -> str:
    """Return '' if the text is a known hallucination, else the trimmed text."""
    trimmed = text.strip()
    if not trimmed:
        return ""

    # punctuation/music-symbol-only output (e.g. "...", "♪")
    if all(_is_punctish(c) for c in trimmed):
        return ""

    lower = trimmed.lower()
    stripped = lower.rstrip("".join(_EXTRA_PUNCT) +
                            r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")
    for phrase in HALLUCINATION_PHRASES:
        if stripped == phrase.lower():
            return ""
    return trimmed
