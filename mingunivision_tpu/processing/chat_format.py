"""Conversation container + prompt rendering (reference chat_format.py surface).

The reference ships a FastChat-style `Chat` object (chat_format.py:48-875):
role templates, json/turns/inout/pack parsing (:185-531) and per-style renders
`prompt_str` / `prompt_inout` / `prompt_pack` (:631-791). This implements the
styles the Bailing family actually serves:

  - "antglm_chat" (default): `<role>HUMAN</role>` / `<role>ASSISTANT</role>` /
    `<role>OBSERVATION</role>` tags, system via `<role>SYSTEM</role>{}` — the
    UniVision prompt format.
  - "qwen" (ChatML): `<|im_start|>role\n ... <|im_end|>\n` (:613-621).
  - "llama2": `[INST] ... [/INST]` with `<<SYS>>` block (:603-611).
  - "antglm_raw" / "chatglm1" / "chatglm2": numbered-round plain styles with
    `第{}轮` / `[Round {}]` headers (:576-593, :738-746).
  - "chatglm3": `<|system|>/<|user|>/<|assistant|>` blocks (:595-600).
  - "baichuan": `<token_id-195/196>` role markers (:623-626).

Golden-tested against the reference implementation (pure stdlib Python) in
tests/test_chat_format_golden.py: renders and pack/inout round-trips are
string-identical for these styles.
"""

from __future__ import annotations

import copy
import re
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional, Tuple


class PromptStyle(Enum):
    ANTGLM_CHAT = "antglm_chat"
    CHATML = "chatml"  # qwen
    LLAMA2 = "llama2"
    ANTGLM_RAW = "antglm_raw"
    CHATGLM = "chatglm"  # chatglm1/chatglm2
    CHATGLM3 = "chatglm3"
    BAICHUAN2 = "baichuan2"


_STYLE_DEFAULTS = {
    # name -> (style, overrides)
    "antglm_chat": (PromptStyle.ANTGLM_CHAT, {}),
    "qwen": (
        PromptStyle.CHATML,
        dict(
            role_template="{}",
            system_template="<|im_start|>system\n{}",
            default_system="You are a helpful assistant.",
            role_human="<|im_start|>user\n",
            role_assistant="<|im_start|>assistant\n",
            general_role_end="<|im_end|>\n",
        ),
    ),
    "llama2": (
        PromptStyle.LLAMA2,
        dict(
            role_template="{}",
            system_template="[INST] <<SYS>>\n{}\n<</SYS>>\n\n",
            role_human="[INST] ",
            role_assistant="[/INST] ",
            human_end=" ",
            assistant_end=" </s><s>",
        ),
    ),
    # remaining open-model styles (reference chat_format.py:576-626) — cosmetic
    # parity only; nothing in the UniVision path uses them
    "antglm_raw": (
        PromptStyle.ANTGLM_RAW,
        dict(
            role_template="{}",
            role_human="用户: ",
            role_assistant="机器人: ",
            turn_start="第{}轮\n",
            general_role_end="\n",
        ),
    ),
    "chatglm1": (
        PromptStyle.CHATGLM,
        dict(
            role_template="{}",
            role_human="问：",
            role_assistant="答：",
            turn_start="[Round {}]\n",
            general_role_end="\n",
        ),
    ),
    "chatglm2": (
        PromptStyle.CHATGLM,
        dict(
            role_template="{}",
            role_human="问：",
            role_assistant="答：",
            turn_start="[Round {}]\n",
            general_role_end="\n\n",
        ),
    ),
    "chatglm3": (
        PromptStyle.CHATGLM3,
        dict(
            role_template="{}",
            system_template="<|system|>\n {}",
            role_human="<|user|>\n ",
            role_assistant="<|assistant|>\n ",
        ),
    ),
    "baichuan": (
        PromptStyle.BAICHUAN2,
        dict(
            role_template="{}",
            system_template="{}",
            role_human="<token_id-195>",
            role_assistant="<token_id-196>",
        ),
    ),
}

# styles that prefix every human turn with a numbered round header; value =
# first round index (reference :738-746: antglm_raw/chatglm2 count from 1,
# chatglm1 from 0)
_ROUND_START = {"antglm_raw": 1, "chatglm2": 1, "chatglm1": 0}


@dataclass
class Chat:
    """Chat symbol system. Default symbols are the Bailing `<role>` format."""

    name: str = "antglm_chat"
    system_template: str = "<role>SYSTEM</role>{}"
    system_message: str = ""
    role_human: str = "HUMAN"
    role_assistant: str = "ASSISTANT"
    role_observation: str = "OBSERVATION"
    role_template: str = "<role>{}</role>"
    turn_start: str = ""
    human_end: str = ""
    assistant_start: str = ""
    assistant_end: str = ""
    general_role_end: str = ""
    messages: List[Tuple[str, str]] = field(default_factory=list)
    id: Optional[str] = None
    source: Optional[str] = None
    lang: Optional[str] = None
    topic: Optional[str] = None
    origin_json: Optional[dict] = None
    style: PromptStyle = PromptStyle.ANTGLM_CHAT

    def __post_init__(self):
        self.id = self.id or str(uuid.uuid4())
        if self.name not in _STYLE_DEFAULTS:
            raise ValueError(f"unsupported chat format name {self.name!r}; supported: {sorted(_STYLE_DEFAULTS)}")
        style, overrides = _STYLE_DEFAULTS[self.name]
        self.style = style
        overrides = dict(overrides)  # never mutate the shared defaults
        default_system = overrides.pop("default_system", None)
        for k, v in overrides.items():
            setattr(self, k, v)
        if default_system and not self.system_message:
            self.system_message = default_system

    # -- construction ----------------------------------------------------------

    def append_message(self, role: str, message: str) -> "Chat":
        self.messages.append((role, message))
        return self

    def set_system_message(self, system_message: str) -> "Chat":
        self.system_message = system_message
        return self

    @classmethod
    def from_json(cls, input: dict, name: str = "antglm_chat") -> "Chat":
        """Reference :185-288: accepts `messages` (role/content dicts) or
        `turns` ({HUMAN, OBSERVATION, ASSISTANT} dicts)."""
        kwargs = {}
        if "system_template" in input:
            kwargs["system_template"] = input["system_template"]
        if "system_message" in input:
            kwargs["system_message"] = input["system_message"]
        chat = cls(
            name=input.get("name") or name,
            source=input.get("source"),
            lang=input.get("lang"),
            topic=input.get("topic"),
            origin_json=copy.deepcopy(input),
            **kwargs,
        )
        if "messages" in input:
            for msg in input["messages"]:
                role = {"HUMAN": chat.role_human, "OBSERVATION": chat.role_observation, "ASSISTANT": chat.role_assistant}.get(msg["role"])
                if role is None:
                    raise ValueError(f"unsupported role in dataset: {msg['role']}")
                chat.append_message(role, msg["content"])
        elif "turns" in input:
            for turn in input["turns"]:
                for key, role in (("HUMAN", chat.role_human), ("OBSERVATION", chat.role_observation), ("ASSISTANT", chat.role_assistant)):
                    if key in turn:
                        chat.append_message(role, turn[key])
        return chat

    @classmethod
    def from_inout(cls, sample: Dict[str, str], name: str = "antglm_chat") -> "Chat":
        """Parse {"input", "output"} back into a Chat (reference :430-531).
        Covers the role-tag styles (antglm_chat); the trailing generation tag is
        dropped and a non-empty output becomes the final assistant message."""
        chat = cls(name=name)
        text = sample["input"]
        # deliberate fix over the reference: its lazy `(.*?)` with no end anchor
        # always captures '' (the system content is silently dropped on parse,
        # chat_format.py:452-466); anchoring to the next role tag round-trips it
        sys_pattern = re.compile(chat.system_template.format(r"(.*?)(?=<role>|\Z)"), re.DOTALL)
        m = sys_pattern.search(text)
        if m and m.group(0):
            chat.system_message = m.group(1)
            text = text[m.end():]

        tags = {
            chat.role_human: re.compile(re.escape(chat.role_template.format(chat.role_human).strip())),
            chat.role_observation: re.compile(re.escape(chat.role_template.format(chat.role_observation).strip())),
            chat.role_assistant: re.compile(re.escape(chat.role_template.format(chat.role_assistant).strip())),
        }
        events = []
        for role, pat in tags.items():
            for m in pat.finditer(text):
                events.append((m.start(), m.end(), role))
        events.sort()
        for i, (start, end, role) in enumerate(events):
            content = text[end : events[i + 1][0]] if i + 1 < len(events) else text[end:]
            content = content.strip()
            if content:
                chat.append_message(role, content)
        output = sample.get("output", "")
        if output:
            chat.append_message(chat.role_assistant, output.strip())
        return chat

    @classmethod
    def from_pack(cls, packs: Dict[str, List[str]], name: str = "antglm_chat") -> List["Chat"]:
        """Parse pack training data (lists of input/output strings) into Chat
        objects; a new system tag starts a new conversation (reference :289-386)."""
        packs = cls._format_packs(packs)
        chats: List[Chat] = []
        chat = cls(name=name)
        sys_pattern = re.compile(chat.system_template.format(r"(.*?)"), re.DOTALL)
        for inp, out in zip(packs["input"], packs["output"]):
            m = sys_pattern.search(inp)
            if m and m.group(0):
                if chat.messages:
                    chats.append(chat)
                    chat = cls(name=name)
                chat.system_message = m.group(1)
                inp = inp[m.end():]
            part = cls.from_inout({"input": inp, "output": out}, name=name)
            for role, msg in part.messages:
                chat.append_message(role, msg)
        if chat.messages:
            chats.append(chat)
        return chats

    # -- rendering --------------------------------------------------------------

    @staticmethod
    def _format_packs(packs: Dict[str, List[str]]) -> Dict[str, List[str]]:
        _packs = copy.deepcopy(packs)
        if len(_packs["input"]) - 1 == len(_packs["output"]):
            _packs["output"].append("")
        if len(_packs["input"]) != len(_packs["output"]):
            raise ValueError(
                f'input/output count mismatch: {len(packs["input"])} vs {len(packs["output"])}'
            )
        return _packs

    @property
    def prompt_pack(self) -> Dict[str, List[str]]:
        """Per-assistant-turn (input, output) pairs (reference :688-791)."""
        inputs: List[str] = []
        outputs: List[str] = []
        system_prompt = self.system_template.format(self.system_message) if self.system_message else ""
        ret = system_prompt + self.general_role_end if system_prompt else ""

        # raw single-turn short-circuit (reference :722-736): no role/turn
        # formatting at all for <= 2 messages
        if self.style == PromptStyle.ANTGLM_RAW and len(self.messages) <= 2:
            inp, output = "", ""
            for role, message in self.messages:
                if role == self.role_assistant:
                    output = message
                else:
                    inp = ret + message
            return {"input": [inp], "output": [output]}

        round_start = _ROUND_START.get(self.name)
        for i, (role, message) in enumerate(self.messages):
            if round_start is not None and i % 2 == 0:
                ret += self.turn_start.format(i // 2 + round_start)
            role_end = self.general_role_end
            if role == self.role_assistant and self.assistant_end:
                role_end = self.assistant_end
            elif self.human_end:
                role_end = self.human_end
            ret += self.role_template.format(role) + message + role_end

            if role == self.role_assistant:
                outputs.append(message + role_end if message else "")
                inputs[-1] += ret[: -len(message + role_end)]
            elif (
                role == self.role_observation
                and len(self.messages) > 1
                and self.messages[i - 1][0] != self.role_assistant
            ):
                # observation not preceded by assistant joins the previous input
                continue
            else:
                inputs.append(ret)
            ret = ""

            if i == len(self.messages) - 1 and role != self.role_assistant:
                inputs[-1] += self.role_template.format(self.role_assistant).strip()
        if self.style == PromptStyle.ANTGLM_RAW:
            inputs = [item.strip() for item in inputs]  # reference :785-786
        return {"input": inputs, "output": outputs}

    @property
    def prompt_inout(self) -> Dict[str, str]:
        """Single (input, output) render (reference :658-687)."""
        packs = self._format_packs(self.prompt_pack)
        if self.style == PromptStyle.ANTGLM_RAW:
            # reference compat (:670-672): re-space the stripped pack inputs
            packs["input"] = [f"{item} " for item in packs["input"]]
        prompt_input = "".join(f"{x}{y}" for x, y in zip(packs["input"][:-1], packs["output"][:-1]))
        prompt_input += packs["input"][-1]
        if self.style == PromptStyle.ANTGLM_RAW:
            prompt_input = prompt_input.strip()
        return {"input": prompt_input, "output": packs["output"][-1]}

    @property
    def prompt_str(self) -> str:
        """input + output concatenated (reference :636-639)."""
        io = self.prompt_inout
        return f"{io['input']}{io['output']}"

    # -- misc -------------------------------------------------------------------

    @property
    def turns_num(self) -> int:
        return sum(1 for role, _ in self.messages if role == self.role_human)

    def to_json(self) -> dict:
        out = {
            "id": self.id,
            "name": self.name,
            "system_message": self.system_message,
            "messages": [],
        }
        inverse = {self.role_human: "HUMAN", self.role_assistant: "ASSISTANT", self.role_observation: "OBSERVATION"}
        for role, msg in self.messages:
            out["messages"].append({"role": inverse.get(role, role), "content": msg})
        return out

    def to_openai_api_messages(self) -> List[dict]:
        """Reference quirk (chat_format.py:862-873): always emits the system
        entry (even empty) and alternates user/assistant by INDEX parity, not
        by the stored role."""
        out = [{"role": "system", "content": self.system_message}]
        for i, (_, msg) in enumerate(self.messages):
            out.append({"role": "user" if i % 2 == 0 else "assistant", "content": msg})
        return out

    def copy(self) -> "Chat":
        return copy.deepcopy(self)
