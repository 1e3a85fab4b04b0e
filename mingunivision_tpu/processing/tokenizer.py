"""Tokenizer loading + multimodal special tokens.

The reference's BailingTokenizer (tokenization_bailing.py:48-276) is a
PreTrainedTokenizerFast subclass whose behavior on the UniVision path reduces to:
fast tokenization + a battery of added special tokens (special_tokens_map.json).
HF `tokenizers` is a pure-Rust wheel (CPU-only) and is reused as-is (SURVEY §7
build step 6); this module wires the specials and offers a tiny byte-level test
tokenizer so the full pipeline runs checkpoint-free.
"""

from __future__ import annotations

from typing import Optional

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


class BailingTokenizer:
    """Facade over an HF fast tokenizer with the reference BailingTokenizer's
    non-jinja surface (tokenization_bailing.py:48-276 + :279-741):

      - gmask/sop/eop special-token properties (:130-188)
      - `apply_chat_template` falling back to chat_format.Chat rendering with
        the antglm `<role>` symbol system (:208-276), optional tokenize
      - GLM-legacy `build_inputs_for_generation` / `build_inputs_for_train`
        (processing/glm_legacy.py, golden-tested against the reference)
    """

    def __init__(self, tokenizer, gmask_token="[gMASK]", sop_token="sop", eop_token="eop"):
        self.tokenizer = tokenizer
        self.gmask_token = gmask_token
        self.sop_token = sop_token
        self.eop_token = eop_token
        self.add_bos_token = False

    def __getattr__(self, name):
        return getattr(self.tokenizer, name)

    def __call__(self, *a, **k):
        return self.tokenizer(*a, **k)

    def __len__(self):
        return len(self.tokenizer)

    def _special_id(self, token):
        tid = self.tokenizer.convert_tokens_to_ids(token)
        return tid if tid is not None else self.tokenizer.unk_token_id

    @property
    def gmask_token_id(self):
        return self._special_id(self.gmask_token)

    @property
    def sop_token_id(self):
        return self._special_id(self.sop_token)

    @property
    def eop_token_id(self):
        return self._special_id(self.eop_token)

    # -- chat templating (reference :208-276) ----------------------------------

    def _chat_from_json(self, chat, chat_format="antglm_chat", system=None):
        from mingunivision_tpu.processing.chat_format import Chat

        msgs = chat if "messages" not in chat else chat["messages"]
        _msgs, sys_msg = [], None
        for msg in msgs:
            if msg["role"].lower() == "system":
                sys_msg = msg["content"]
            else:
                _msgs.append(msg)
        payload = {"messages": _msgs}
        system = system or sys_msg
        if system:
            payload["system_message"] = system
        return Chat.from_json(payload, name=chat_format)

    def apply_chat_template(
        self,
        conversation,
        add_generation_prompt: bool = False,
        system=None,
        tokenize: bool = False,
        chat_format: str = "antglm_chat",
        chat_template: Optional[str] = None,
        **kwargs,
    ):
        # JINJA-FIRST (reference tokenization_bailing.py:208-241): when the
        # checkpoint ships an HF jinja chat template (tokenizer.chat_template)
        # — or the caller passes one explicitly — render through transformers'
        # built-in apply_chat_template; the Chat-object rendering below is the
        # fallback for template-less tokenizers (e.g. the synthetic test one).
        shipped = chat_template or getattr(self.tokenizer, "chat_template", None)
        if shipped is not None:
            return self.tokenizer.apply_chat_template(
                conversation,
                chat_template=chat_template,
                add_generation_prompt=add_generation_prompt,
                tokenize=tokenize,
                **kwargs,
            )
        is_batched = isinstance(conversation, list) and bool(conversation) and (
            isinstance(conversation[0], (list, tuple)) or "messages" in conversation[0]
        )
        conversations = conversation if is_batched else [conversation]
        rendered = []
        for chat in conversations:
            c = self._chat_from_json(chat, chat_format=chat_format, system=system)
            text = c.prompt_str
            if add_generation_prompt and not text.endswith(c.role_template.format(c.role_assistant)):
                text += c.role_template.format(c.role_assistant)
            rendered.append(text)
        if not is_batched:
            rendered = rendered[0]
        if tokenize:
            return self.tokenizer(rendered, add_special_tokens=False)["input_ids"]
        return rendered

    # -- GLM-legacy builders ----------------------------------------------------

    def _ids(self):
        return dict(
            eos_token_id=self.tokenizer.eos_token_id or self._special_id("<|endoftext|>"),
            bos_token_id=self.tokenizer.bos_token_id or self.sop_token_id,
            cls_token_id=self.tokenizer.cls_token_id or self.gmask_token_id,
            gmask_token_id=self.gmask_token_id,
        )

    def build_inputs_for_generation(self, input_ids, **kwargs):
        from mingunivision_tpu.processing.glm_legacy import build_inputs_for_generation

        return build_inputs_for_generation(
            list(input_ids), add_bos_token=self.add_bos_token, **self._ids(), **kwargs
        )

    def build_inputs_for_train(self, inputs, outputs, **kwargs):
        from mingunivision_tpu.processing.glm_legacy import build_inputs_for_train

        ids = self._ids()
        ids.pop("bos_token_id")
        return build_inputs_for_train(
            lambda t: self.tokenizer(t, add_special_tokens=False)["input_ids"],
            inputs,
            outputs,
            pad_token_id=self.tokenizer.pad_token_id or ids["eos_token_id"],
            sop_token_id=self.sop_token_id,
            add_bos_token=self.add_bos_token,
            eos_token_id=ids["eos_token_id"],
            cls_token_id=ids["cls_token_id"],
            gmask_token_id=ids["gmask_token_id"],
            **kwargs,
        )
