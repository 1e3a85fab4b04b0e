"""Long-context utilities.

The reference handles long context purely through RoPE scaling options (SURVEY
§5); it also ships two vestigial helpers we reproduce: a passkey-retrieval
prompt generator (modeling_utils.py:345-374 analog) for evaluating effective
context length, and a sliding memory-cache policy (LongGLMMemCache analog) for
bounding KV growth.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp


def generate_passkey_prompt(passkey: str, context_tokens: int = 4000, seed: int = 0) -> Tuple[str, str]:
    """Build a needle-in-a-haystack prompt; returns (prompt, expected_answer)."""
    rng = random.Random(seed)
    filler = [
        "The grass is green. The sky is blue. The sun is yellow. Here we go. There and back again.",
        "A quick brown fox jumps over the lazy dog while the river runs to the sea.",
        "Mountains rise in the west and valleys stretch far to the east under the clouds.",
    ]
    needle = f"The pass key is {passkey}. Remember it. {passkey} is the pass key."
    # ~20 tokens per filler sentence
    n_sent = max(1, context_tokens // 20)
    pos = rng.randint(n_sent // 4, 3 * n_sent // 4)
    parts = [rng.choice(filler) for _ in range(n_sent)]
    parts.insert(pos, needle)
    prompt = (
        "There is important info hidden in a lot of irrelevant text. Find and memorize it.\n"
        + " ".join(parts)
        + "\nWhat is the pass key? The pass key is"
    )
    return prompt, passkey


@dataclass
class SlidingMemCache:
    """Keep-first + keep-last KV retention policy over a static cache
    (LongGLMMemCache-style): when `length` exceeds `budget`, positions outside
    the first `keep_first` and last `keep_last` are masked out (attention never
    sees them; storage is untouched — static shapes stay static)."""

    budget: int
    keep_first: int = 64

    def retention_mask(self, length, max_len: int):
        """-> bool (max_len,): which cache positions stay visible."""
        idx = jnp.arange(max_len)
        keep_last = self.budget - self.keep_first
        recent = idx >= (length - keep_last)
        head = idx < self.keep_first
        within = idx < length
        over_budget = length > self.budget
        keep = jnp.where(over_budget, head | recent, True)
        return keep & within
