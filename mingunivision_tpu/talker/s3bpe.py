"""S3-BPE speech-codec tokenizer: BPE ids <-> raw codec ids.

Capability analog of the reference S3BpeTokenizer (s3bpe_tokenizer.py, loaded
from `s3_bpe/tokenizer.json` + `char_mapping.txt`): audio-codec ids are mapped
to unicode chars, BPE-merged into the talker's 32768-entry audio vocab, and
decoded back after AR generation (modeling_bailing_talker.py:73-76, :525-527).

Checkpoint-free operation: without the mapping files an identity mapping over
`audio_vocab_size` ids is used (1 bpe id == 1 codec id).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


class S3BpeTokenizer:
    def __init__(self, bpe_model: Optional[str] = None, mapping_file: Optional[str] = None):
        self._tok = None
        self._char2codec = {}
        self._codec2char = {}
        if bpe_model and os.path.exists(bpe_model):
            from tokenizers import Tokenizer

            self._tok = Tokenizer.from_file(bpe_model)
        if mapping_file and os.path.exists(mapping_file):
            with open(mapping_file) as f:
                for line in f:
                    parts = line.rstrip("\n").split()
                    if len(parts) == 2:
                        ch, cid = parts[0], int(parts[1])
                        self._char2codec[ch] = cid
                        self._codec2char[cid] = ch

    @property
    def identity(self) -> bool:
        return self._tok is None

    def encode(self, codec_ids: Sequence[int]) -> Tuple[List[int], int]:
        """raw codec ids -> (bpe ids, length)."""
        if self.identity:
            ids = list(int(c) for c in codec_ids)
            return ids, len(ids)
        text = "".join(self._codec2char[int(c)] for c in codec_ids)
        enc = self._tok.encode(text)
        return enc.ids, len(enc.ids)

    def decode(self, bpe_ids: Sequence[int]) -> List[int]:
        """bpe ids -> raw codec ids."""
        if self.identity:
            return [int(b) for b in bpe_ids]
        text = self._tok.decode(list(int(b) for b in bpe_ids))
        return [self._char2codec[ch] for ch in text if ch in self._char2codec]
