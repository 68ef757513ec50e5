"""Byte-level tokenizer for the self-trained QA language model.

No downloads, no vocab files: token ids 0-255 are raw UTF-8 bytes,
followed by the special ids below.  Implements the small surface
:class:`gvl_tpu.agent.core.Qwen3ChatBackend` needs (``encode`` /
``decode(skip_special_tokens=)``), so a byte-trained
:class:`~gvl_tpu.models.qwen3.Qwen3Engine` drops into the agent stack
unchanged — the reference's equivalent surface is the downloaded HF
tokenizer (`/root/reference/src/agent_core/qwen_reasoning_core.py:
1803-1879`).

``VOCAB_SIZE`` is padded to 384 (3×128 lanes) so the embedding and
lm_head matmuls tile cleanly on the MXU.
"""

from __future__ import annotations

PAD_ID = 256
BOS_ID = 257
EOS_ID = 258
VOCAB_SIZE = 384  # 256 bytes + specials, padded to a lane multiple


class ByteTokenizer:
    """UTF-8 bytes ↔ ids; specials are never produced by ``encode``."""

    pad_token_id = PAD_ID
    bos_token_id = BOS_ID
    eos_token_id = EOS_ID
    vocab_size = VOCAB_SIZE

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        data = bytes(int(i) for i in ids if int(i) < 256)
        return data.decode("utf-8", errors="replace")

    def __call__(self, text: str) -> dict:
        return {"input_ids": self.encode(text)}
