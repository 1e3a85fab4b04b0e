"""Golden parity: our Chat vs the reference chat_format.Chat (pure stdlib).

Covers the served styles: the default Bailing `<role>` format (ANTGLM_CHAT),
qwen/ChatML and llama2 renders; prompt_str / prompt_inout / prompt_pack string
identity plus inout/pack round-trips.
"""

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)


@pytest.fixture(scope="module")
def ref_mod():
    p = "/root/reference/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import chat_format as ref_chat_format

    return ref_chat_format


from mingunivision_tpu.processing.chat_format import Chat  # noqa: E402


CONVOS = {
    "single": {"messages": [{"role": "HUMAN", "content": "hello"}]},
    "multi": {
        "messages": [
            {"role": "HUMAN", "content": "tell me a joke"},
            {"role": "ASSISTANT", "content": "why did the gpu cross the road?"},
            {"role": "HUMAN", "content": "why?"},
        ]
    },
    "with_system": {
        "system_message": "you are a terse assistant",
        "messages": [
            {"role": "HUMAN", "content": "hi"},
            {"role": "ASSISTANT", "content": "hello"},
            {"role": "HUMAN", "content": "bye"},
        ],
    },
    "with_observation": {
        "messages": [
            {"role": "HUMAN", "content": "what's the weather"},
            {"role": "OBSERVATION", "content": '{"weather": "sunny"}'},
            {"role": "ASSISTANT", "content": "it is sunny"},
            {"role": "HUMAN", "content": "and tomorrow?"},
        ]
    },
    "complete": {
        "messages": [
            {"role": "HUMAN", "content": "2+2?"},
            {"role": "ASSISTANT", "content": "4"},
        ]
    },
}


def _ref_name(name):
    # reference uses prompt_style=ANTGLM_CHAT via name=None + prompt_style kw
    return name


class TestRenderParity:
    @pytest.mark.parametrize("key", sorted(CONVOS))
    @pytest.mark.parametrize(
        "style",
        ["antglm_chat", "qwen", "llama2", "antglm_raw", "chatglm1", "chatglm2", "chatglm3", "baichuan"],
    )
    def test_prompt_renders(self, ref_mod, key, style):
        convo = CONVOS[key]
        if style == "antglm_chat":
            ref = ref_mod.Chat.from_json(convo, prompt_style=ref_mod.PromptStyle.ANTGLM_CHAT)
        else:
            ref = ref_mod.Chat.from_json(convo, name=style)
        ours = Chat.from_json(convo, name=style)
        assert ours.prompt_pack == ref.prompt_pack, f"{style}/{key} pack"
        assert ours.prompt_inout == ref.prompt_inout, f"{style}/{key} inout"
        assert ours.prompt_str == ref.prompt_str, f"{style}/{key} str"

    def test_turns_input_format(self, ref_mod):
        convo = {"turns": [{"HUMAN": "hi", "ASSISTANT": "hello"}, {"HUMAN": "more"}]}
        ref = ref_mod.Chat.from_json(convo, prompt_style=ref_mod.PromptStyle.ANTGLM_CHAT)
        ours = Chat.from_json(convo)
        assert ours.prompt_str == ref.prompt_str

    def test_turns_num_and_openai(self, ref_mod):
        convo = CONVOS["with_observation"]
        ref = ref_mod.Chat.from_json(convo, prompt_style=ref_mod.PromptStyle.ANTGLM_CHAT)
        ours = Chat.from_json(convo)
        assert ours.turns_num == ref.turns_num
        assert ours.to_openai_api_messages() == ref.to_openai_api_messages()


class TestRoundTrips:
    def test_inout_roundtrip_default_style(self, ref_mod):
        convo = CONVOS["with_system"]
        ref = ref_mod.Chat.from_json(convo, prompt_style=ref_mod.PromptStyle.ANTGLM_CHAT)
        io = ref.prompt_inout
        ours = Chat.from_inout(io)
        assert ours.system_message == "you are a terse assistant"
        roles = [r for r, _ in ours.messages]
        assert roles == ["HUMAN", "ASSISTANT", "HUMAN"]
        assert ours.messages[0][1] == "hi" and ours.messages[1][1] == "hello"
        # re-render reproduces the reference input
        assert ours.prompt_inout["input"] == io["input"]

    def test_pack_roundtrip(self, ref_mod):
        convo = CONVOS["with_observation"]
        ref = ref_mod.Chat.from_json(convo, prompt_style=ref_mod.PromptStyle.ANTGLM_CHAT)
        packs = ref.prompt_pack
        chats = Chat.from_pack(packs)
        assert len(chats) == 1
        merged = chats[0]
        assert [r for r, _ in merged.messages][:3] == ["HUMAN", "OBSERVATION", "ASSISTANT"]
        assert merged.prompt_str == ref.prompt_str
