"""Incremental token-stream -> normalized TTS sentences.

Capability analog of reference sentence_manager/ (~1300 LoC): a streaming LLM
emits text incrementally; this module buffers it, splits on sentence-final
punctuation (default 。/，-class splits, default_config.yaml:41-42), runs a
text-normalization pipeline (numbers, dates, currency, phone numbers,
punctuation mapping — text_norm/normalizer.py:71-148) and releases
ready-to-speak sentences with a minimum-length policy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional

# sentence-final + clause-final punctuation (CJK + ASCII)
SENT_SPLIT = "。！？!?；;\n"
CLAUSE_SPLIT = "，,、：:"

# punctuation normalization map (reference text_norm punctuation mapping)
PUNCT_MAP = {
    "…": "。",
    "——": "，",
    "－": "-",
    "“": "",
    "”": "",
    '"': "",
    "‘": "",
    "’": "",
    "'": "",
    "（": "，",
    "）": "，",
    "(": "，",
    ")": "，",
    "【": "",
    "】": "",
    "《": "",
    "》": "",
}

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]
_BIG_UNITS = ["", "万", "亿"]


def _int_to_zh(n: int) -> str:
    """Integer -> Chinese reading (TN utils equivalent, text_norm/utils)."""
    if n == 0:
        return _DIGITS[0]
    if n < 0:
        return "负" + _int_to_zh(-n)
    parts = []
    big_idx = 0
    while n > 0:
        seg = n % 10000
        n //= 10000
        if seg:
            seg_str = ""
            zero_pending = False
            for i, d in enumerate(f"{seg}"[::-1]):
                d = int(d)
                if d == 0:
                    zero_pending = seg_str != ""
                else:
                    seg_str = _DIGITS[d] + _UNITS[i] + ("零" if zero_pending else "") + seg_str
                    zero_pending = False
            # 一十X -> 十X
            if seg_str.startswith("一十"):
                seg_str = seg_str[1:]
            parts.append(seg_str + _BIG_UNITS[big_idx])
        elif parts and not parts[-1].startswith("零"):
            parts.append("零")
        big_idx += 1
    out = "".join(reversed(parts)).strip("零")
    out = re.sub("零+", "零", out)
    return out or _DIGITS[0]


def _number_to_zh(s: str) -> str:
    if "." in s:
        a, b = s.split(".", 1)
        return _int_to_zh(int(a)) + "点" + "".join(_DIGITS[int(d)] for d in b if d.isdigit())
    return _int_to_zh(int(s))


def _digits_to_zh(s: str) -> str:
    """Digit-by-digit reading (phone numbers, codes)."""
    return "".join(_DIGITS[int(d)] if d.isdigit() else d for d in s)


class TextNormalizer:
    """Chinese-oriented TN: currency, percent, dates, phone, plain numbers."""

    def __call__(self, text: str) -> str:
        for k, v in PUNCT_MAP.items():
            text = text.replace(k, v)
        text = re.sub(r"￥\s*(\d+(?:\.\d+)?)", lambda m: _number_to_zh(m.group(1)) + "元", text)
        text = re.sub(r"\$\s*(\d+(?:\.\d+)?)", lambda m: _number_to_zh(m.group(1)) + "美元", text)
        text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: "百分之" + _number_to_zh(m.group(1)), text)
        text = re.sub(
            r"(\d{4})年(\d{1,2})月(\d{1,2})[日号]",
            lambda m: _digits_to_zh(m.group(1)) + "年" + _number_to_zh(m.group(2)) + "月" + _number_to_zh(m.group(3)) + "日",
            text,
        )
        text = re.sub(r"1[3-9]\d{9}", lambda m: _digits_to_zh(m.group(0)), text)
        text = re.sub(r"\d+(?:\.\d+)?", lambda m: _number_to_zh(m.group(0)), text)
        return text


@dataclass
class SentenceManagerConfig:
    min_sentence_len: int = 6  # don't emit micro-fragments
    max_buffer_len: int = 120  # force a clause split past this
    normalize: bool = True


class SentenceManager:
    """`put()` streamed text pieces, `get()` normalized complete sentences.

    Mirrors the reference's SentenceManager.put/get surface
    (sentence_manager/sentence_manager.py:67-111).
    """

    def __init__(self, config: Optional[SentenceManagerConfig] = None):
        self.config = config or SentenceManagerConfig()
        self._buffer = ""
        self._ready: List[str] = []
        self._normalizer = TextNormalizer()
        self._finished = False

    def put(self, piece: str) -> None:
        if self._finished:
            raise RuntimeError("stream already finished")
        self._buffer += piece
        self._drain(force=False)

    def finish(self) -> None:
        self._finished = True
        self._drain(force=True)

    def _emit(self, sentence: str) -> None:
        sentence = sentence.strip()
        if not sentence:
            return
        if self.config.normalize:
            sentence = self._normalizer(sentence)
        if sentence:
            self._ready.append(sentence)

    def _drain(self, force: bool) -> None:
        while True:
            cut = -1
            for i, ch in enumerate(self._buffer):
                if ch in SENT_SPLIT and i + 1 >= self.config.min_sentence_len:
                    cut = i
                    break
                if len(self._buffer) > self.config.max_buffer_len and ch in CLAUSE_SPLIT:
                    cut = i
                    break
            if cut < 0:
                break
            self._emit(self._buffer[: cut + 1])
            self._buffer = self._buffer[cut + 1 :]
        if force and self._buffer:
            self._emit(self._buffer)
            self._buffer = ""

    def get(self) -> Optional[str]:
        if self._ready:
            return self._ready.pop(0)
        return None

    def get_all(self) -> List[str]:
        out, self._ready = self._ready, []
        return out

    @property
    def pending(self) -> str:
        return self._buffer
