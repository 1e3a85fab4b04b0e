"""Conversation container + prompt rendering (reference chat_format.py surface).

The reference ships a FastChat-style `Chat` object (chat_format.py:48-875) with
role templates `<role>HUMAN</role>` / `<role>ASSISTANT</role>` / `<role>SYSTEM</role>`
(:134-148), json/inout parsing (:184-531) and several render styles (:576-791).
We provide the used surface: structured message storage, json round-trip, and the
`prompt_str` render that the UniVision path consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional


class PromptStyle(Enum):
    BAILING = "bailing"  # <role>X</role> prefixes, <|endoftext|> terminator
    PLAIN = "plain"


ROLE_TEMPLATES = {
    "SYSTEM": "<role>SYSTEM</role>",
    "HUMAN": "<role>HUMAN</role>",
    "ASSISTANT": "<role>ASSISTANT</role>",
}
TURN_TERMINATOR = "<|endoftext|>"


@dataclass
class Chat:
    system: Optional[str] = None
    messages: List[Dict[str, str]] = field(default_factory=list)
    style: PromptStyle = PromptStyle.BAILING

    def append(self, role: str, content: str) -> "Chat":
        role = role.upper()
        if role not in ROLE_TEMPLATES:
            raise ValueError(f"unknown role {role}")
        self.messages.append({"role": role, "content": content})
        return self

    @classmethod
    def from_json(cls, items: List[Dict], system: Optional[str] = None) -> "Chat":
        chat = cls(system=system)
        for item in items:
            role = item.get("role", item.get("from", "HUMAN")).upper()
            if role in ("USER",):
                role = "HUMAN"
            if role in ("BOT", "GPT"):
                role = "ASSISTANT"
            content = item.get("content", item.get("value", ""))
            if role == "SYSTEM":
                chat.system = content
            else:
                chat.append(role, content)
        return chat

    def prompt_str(self, add_generation_prompt: bool = True) -> str:
        """Render to the Bailing prompt format (assistant turns terminated with
        <|endoftext|>, trailing ASSISTANT prefix for generation)."""
        parts = []
        if self.system:
            parts.append(ROLE_TEMPLATES["SYSTEM"] + self.system)
        for m in self.messages:
            if m["role"] == "HUMAN":
                parts.append(ROLE_TEMPLATES["HUMAN"] + m["content"])
            else:
                parts.append(ROLE_TEMPLATES["ASSISTANT"] + m["content"] + TURN_TERMINATOR)
        if add_generation_prompt:
            parts.append(ROLE_TEMPLATES["ASSISTANT"])
        return "".join(parts)

    def to_json(self) -> List[Dict[str, str]]:
        out = []
        if self.system:
            out.append({"role": "SYSTEM", "content": self.system})
        out.extend(dict(m) for m in self.messages)
        return out
