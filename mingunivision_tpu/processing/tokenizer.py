"""Tokenizer loading + multimodal special tokens.

The reference's BailingTokenizer (tokenization_bailing.py:48-276) is a
PreTrainedTokenizerFast subclass whose behavior on the UniVision path reduces to:
fast tokenization + a battery of added special tokens (special_tokens_map.json).
HF `tokenizers` is a pure-Rust wheel (CPU-only) and is reused as-is (SURVEY §7
build step 6); this module wires the specials and offers a tiny byte-level test
tokenizer so the full pipeline runs checkpoint-free.
"""

from __future__ import annotations

MULTIMODAL_SPECIAL_TOKENS = [
    "<|endoftext|>",
    "[gMASK]",
    "sop",
    "eop",
    "<role>",
    "</role>",
    "<imagePatch>",
    "<image>",
    "</image>",
    "<video>",
    "</video>",
    "<framePatch>",
    "<audioPatch>",
    "<audio>",
    "</audio>",
    "<gen_imagePatch>",
    "<gen_image>",
    "</gen_image>",
    "<gen_audioPatch>",
    "<gen_audio>",
    "</gen_audio>",
    "<audioGenPatch>",
    "<end_of_audio>",
    "<end_of_chunk>",
    "<text>",
    "<asr>",
    "<tts>",
]


def load_tokenizer(path: str):
    """Load the checkpoint tokenizer (tokenizer.json / HF fast format)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, trust_remote_code=False, use_fast=True)


def build_test_tokenizer(vocab_size: int = 4096):
    """Small byte-level BPE-ish tokenizer with the multimodal specials, for
    checkpoint-free end-to-end tests."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    # byte-level alphabet as the base vocab
    from tokenizers import trainers

    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=[], initial_alphabet=pre_tokenizers.ByteLevel.alphabet()
    )
    tok.train_from_iterator(
        ["the quick brown fox describes an image of a cat on a table " * 4,
         "generate a picture please <role>HUMAN</role> hello"],
        trainer=trainer,
    )
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, clean_up_tokenization_spaces=False)
    fast.add_special_tokens({"additional_special_tokens": MULTIMODAL_SPECIAL_TOKENS})
    return fast
