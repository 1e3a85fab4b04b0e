"""Speech stack tests: sentence manager / TN, talker LM decode, detokenizer,
streaming pipeline (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.talker.detokenizer import AudioDetokenizer, FlowConfig, HiFTConfig
from mingunivision_tpu.talker.model import BailingTalker, TalkerConfig
from mingunivision_tpu.talker.qwen2 import Qwen2Config
from mingunivision_tpu.talker.s3bpe import S3BpeTokenizer
from mingunivision_tpu.talker.sentence_manager import (
    SentenceManager,
    SentenceManagerConfig,
    TextNormalizer,
    _int_to_zh,
)
from mingunivision_tpu.talker.streaming import OmniAudioPipeline


class TestTextNorm:
    def test_int_to_zh(self):
        assert _int_to_zh(0) == "零"
        assert _int_to_zh(15) == "十五"
        assert _int_to_zh(105) == "一百零五"
        assert _int_to_zh(1234) == "一千二百三十四"
        assert _int_to_zh(10000) == "一万"

    def test_normalizer_patterns(self):
        tn = TextNormalizer()
        assert tn("价格是￥35") == "价格是三十五元"
        assert tn("增长了12%") == "增长了百分之十二"
        assert "幺" in tn("电话13812345678")  # phone numbers read 1 as 幺 (reference alt_one)
        assert tn("共3个") == "共三个"

    def test_punct_mapping(self):
        tn = TextNormalizer()
        assert tn("他说“你好”") == "他说你好"


class TestSentenceManager:
    def test_streaming_split(self):
        sm = SentenceManager(SentenceManagerConfig(min_sentence_len=2, normalize=False))
        sm.put("今天天气")
        assert sm.get() is None
        sm.put("很好。明天")
        assert sm.get() == "今天天气很好。"
        sm.finish()
        assert sm.get() == "明天"

    def test_min_length_policy(self):
        sm = SentenceManager(SentenceManagerConfig(min_sentence_len=6, normalize=False))
        sm.put("好。还要继续说下去。")
        out = sm.get_all()
        assert out == ["好。还要继续说下去。"]


def tiny_talker_cfg() -> TalkerConfig:
    return TalkerConfig(
        qwen2=Qwen2Config(
            vocab_size=128 + 64,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            intermediate_size=128,
        ),
        text_vocab_size=128,
        audio_vocab_size=64,
        qa_model_hidden_size=32,
        vp_feature_size=8,
        max_audio_tokens=12,
    )


@pytest.fixture(scope="module")
def tiny_talker():
    return BailingTalker.random_init(jax.random.PRNGKey(0), tiny_talker_cfg(), dtype=jnp.float32)


class TestTalkerLM:
    def test_generate_audio_tokens_in_codec_range(self, tiny_talker):
        cfg = tiny_talker.cfg
        ids = np.random.default_rng(0).integers(0, cfg.text_vocab_size, (1, 6))
        codec = tiny_talker.generate_audio_tokens(ids, max_len=64)
        assert len(codec) <= cfg.max_audio_tokens
        assert all(0 <= c < cfg.audio_vocab_size for c in codec)

    def test_thinker_and_vp_injection_changes_output(self, tiny_talker):
        cfg = tiny_talker.cfg
        ids = np.random.default_rng(1).integers(0, cfg.text_vocab_size, (1, 6))
        a = tiny_talker.generate_audio_tokens(ids, max_len=64)
        th = np.random.default_rng(2).standard_normal((1, 2, cfg.qa_model_hidden_size)).astype(np.float32)
        tiny_talker.key = jax.random.PRNGKey(0)
        b = tiny_talker.generate_audio_tokens(ids, thinker_hidden=th, thinker_insert_loc=1, max_len=64)
        assert a != b or len(a) != len(b)  # conditioning must matter


class TestS3Bpe:
    def test_identity_roundtrip(self):
        t = S3BpeTokenizer()
        ids = [5, 9, 1]
        enc, n = t.encode(ids)
        assert enc == ids and n == 3
        assert t.decode(enc) == ids


@pytest.fixture(scope="module")
def tiny_detok():
    return AudioDetokenizer.random_init(
        jax.random.PRNGKey(0),
        FlowConfig(codec_vocab=64, token_dim=32, mel_dim=16, channels=32, depth=2, num_ode_steps=2),
        HiFTConfig(mel_dim=16, base_channels=32, upsample_rates=(4, 4), upsample_kernels=(8, 8)),
    )


class TestDetokenizer:
    def test_token2wav_shapes_and_crossfade(self, tiny_detok):
        tokens = np.random.default_rng(0).integers(0, 64, (1, 10))
        wav1, state = tiny_detok.token2wav(tokens, jax.random.PRNGKey(1))
        assert wav1.dtype == np.float32 and wav1.ndim == 1 and len(wav1) > 0
        # mel frames = 10 tokens * 2, upsample 16x => 320 samples total
        wav2, state = tiny_detok.token2wav(tokens, jax.random.PRNGKey(2), state)
        tail = tiny_detok.flush(state)
        assert len(tail) > 0
        assert np.abs(np.concatenate([wav1, wav2, tail])).max() <= 1.0


class TestStreamingPipeline:
    def test_end_to_end_stream(self, tiny_talker, tiny_detok):
        cfg = tiny_talker.cfg

        def tokenize(s):
            return [hash(ch) % cfg.text_vocab_size for ch in s][:8] or [1]

        pipe = OmniAudioPipeline(
            tiny_talker,
            tiny_detok,
            tokenize,
            sm_config=SentenceManagerConfig(min_sentence_len=2, normalize=True),
        )
        chunks = list(pipe.stream(iter(["今天天气很好。", "再见。"])))
        assert chunks[-1].is_last
        speech = [c for c in chunks if not c.is_last]
        assert len(speech) == 2
        assert all(c.wav.dtype == np.float32 for c in speech)

    def test_threaded_stream_matches_sync_sentences(self, tiny_talker, tiny_detok):
        cfg = tiny_talker.cfg

        def tokenize(s):
            return [hash(ch) % cfg.text_vocab_size for ch in s][:8] or [1]

        pipe = OmniAudioPipeline(
            tiny_talker, tiny_detok, tokenize, sm_config=SentenceManagerConfig(min_sentence_len=2)
        )
        chunks = list(pipe.stream_threaded(iter(["你好。", "世界。"])))
        assert chunks[-1].is_last
        assert len([c for c in chunks if not c.is_last]) == 2


class TestTextNormalizerFamilies:
    """TN families per reference text_norm/utils (temperature, fraction, range,
    phone 幺-reading, room numbers, ordinals, scores, en-numbers)."""

    def setup_method(self):
        from mingunivision_tpu.talker.sentence_manager import TextNormalizer

        self.tn = TextNormalizer()

    def test_temperature(self):
        assert self.tn("今天-3°C。") == "今天零下三度。"
        assert self.tn("水温25摄氏度") == "水温二十五摄氏度"

    def test_fraction_and_percent(self):
        assert self.tn("占3/4的") == "占四分之三的"
        assert self.tn("涨了12.5%") == "涨了百分之十二点五"

    def test_time_and_score(self):
        assert self.tn("12:30开始") == "十二点半开始"
        assert self.tn("9:05出发") == "九点五分出发"
        assert self.tn("2比1获胜") == "二比一获胜"

    def test_range_and_currency_range(self):
        assert self.tn("需要5-8个") == "需要五到八个"
        out = self.tn("价格30元-50元")
        assert "至" in out and "三十元" in out

    def test_phone_alt_one_and_room(self):
        assert self.tn("电话13811111234") == "电话幺三八幺幺幺幺幺二三四"
        assert self.tn("在201室") == "在二零幺室"

    def test_ordinal_and_comma_numbers(self):
        assert self.tn("第3名") == "第三名"
        assert self.tn("共1,234人") == "共一千二百三十四人"

    def test_units_and_compare(self):
        assert self.tn("面积50㎡") == "面积五十平方米"
        assert self.tn(">5次") == "大于五次"
        assert self.tn("用量250ml") == "用量二百五十毫升"

    def test_english_numbers(self):
        assert self.tn("the 3rd time") == "the third time"
        assert self.tn("costs $25 total") == "costs twenty five dollars total"
        assert self.tn("has 42 items") == "has forty two items"

    def test_english_years_money_decimals(self):
        # tacotron-style year reading (reference en_num.py _expand_number)
        assert self.tn("born in 1999.") == "born in nineteen ninety nine."
        assert self.tn("since 2005 we") == "since two thousand five we"
        assert self.tn("around 1900 or") == "around nineteen hundred or"
        assert self.tn("in 1907 he") == "in nineteen oh seven he"
        # pounds + dollar cents (reference _expand_dollars/_pounds_re)
        assert self.tn("pay £2 now") == "pay two pounds now"
        out = self.tn("it cost $2.50 then")
        assert "two dollars" in out and "fifty cents" in out
        # decimal point reading
        assert self.tn("pi is 3.14 roughly") == "pi is three point one four roughly"

    def test_time_ranges_and_seconds(self):
        assert self.tn("8:00-9:30开会") == "八点零分到九点半开会"
        assert self.tn("用时1:02:03完赛") == "用时一点二分三秒完赛"

    def test_separator_dates_and_year_only(self):
        # chronology.py RE_DATE2 + RE_DATE year-only digit-wise reading
        assert self.tn("2023-05-11发布") == "二零二三年五月十一日发布"
        assert self.tn("2023/5/11见") == "二零二三年五月十一日见"
        assert self.tn("2021年成立") == "二零二一年成立"
        assert self.tn("2024年3月") == "二零二四年三月"

    def test_license_plate(self):
        # num.py RE_LICENSE_PLATE: digits 幺-wise, letters kept
        assert self.tn("京A12345被拍") == "京A幺二三四五被拍"
        assert self.tn("沪B88") == "沪B八八"

    def test_landline_and_400(self):
        # phonecode.py RE_TELEPHONE / RE_NATIONAL_UNIFORM_NUMBER
        assert self.tn("打010-12345678") == "打零幺零，幺二三四五六七八"
        assert self.tn("热线400-123-4567") == "热线四零零幺二三四五六七"

    def test_rmb_suffix_currency(self):
        # currency.py RE_CURRENCY_2
        assert self.tn("付100RMB了") == "付一百元了"

    def test_quantifier_two_and_plus(self):
        # num.py RE_POSITIVE_QUANTIFIERS: bare 2 -> 两, '+' -> 多
        assert self.tn("买2个") == "买两个"
        assert self.tn("22个人") == "二十二个人"
        assert self.tn("有100+件") == "有一百多件"
        assert self.tn("3余次") == "三余次"

    def test_default_num_digitwise(self):
        # num.py RE_DEFAULT_NUM: leftover >=3-digit strings read 幺-digit-wise
        assert self.tn("编号12305。") == "编号幺二三零五。"
        # decimals keep value reading
        assert self.tn("重3.1415") == "重三点一四一五"

    def test_fullwidth_to_halfwidth(self):
        # reference normalizer.preprocess F2H (string_operator.replace_F2H):
        # full-width alphanumerics/symbols fold to ASCII before the rules run
        from mingunivision_tpu.talker.sentence_manager import full_to_half

        assert full_to_half("ｈｅｌｌｏ　ＡＢＣ１２３") == "hello ABC123"
        assert full_to_half("５０％") == "50%"
        # CJK sentence punctuation is deliberately retained full-width
        assert full_to_half("好，走！") == "好，走！"
        # end-to-end: full-width digits flow through the number rules
        assert self.tn("涨了１２.５%") == "涨了百分之十二点五"
        assert self.tn("面积５０㎡") == "面积五十平方米"

    def test_traditional_to_simplified(self):
        from mingunivision_tpu.talker.sentence_manager import traditional_to_simplified

        # goldens on common-use characters
        assert traditional_to_simplified("學習機會") == "学习机会"
        assert traditional_to_simplified("請讀這條") == "请读这条"
        assert traditional_to_simplified("時間問題") == "时间问题"
        # unknown traditional characters pass through untouched
        assert traditional_to_simplified("纔") == "纔"
        # end-to-end: traditional text + numbers normalize together
        assert self.tn("電話13811111234") == "电话幺三八幺幺幺幺幺二三四"

    def test_interpret_as_explicit_modes(self):
        # caller-directed reading (reference normalizer.normalize_custom):
        # the SAME digit string reads differently under each tag
        nc = self.tn.normalize_custom
        assert nc("-3.5", interpret_as="cardinal") == "负三点五"
        assert nc("1,234", interpret_as="cardinal") == "一千二百三十四"
        assert nc("¥12.5", interpret_as="currency") == "十二点五元"
        assert nc("302", interpret_as="digits") == "三零二"
        assert nc("13912345678", interpret_as="telephone") == "幺三九幺二三四五六七八"
        # address: value reading for buildings, 幺-digit-wise for the room tail
        assert nc("5幢4单元201室", interpret_as="address") == "五幢四单元二零幺室"
        assert nc("2023-11-05", interpret_as="date") == "二零二三年十一月五日"
        assert nc("8:30", interpret_as="time") == "八点半"
        assert nc("a_1b-2", interpret_as="id") == "A 下划线幺 B 杠二"
        assert nc("5cm", interpret_as="measure") == "五厘米"
        assert nc("你好!", interpret_as="punctuation") == "你好叹号"
        with pytest.raises(ValueError):
            nc("x", interpret_as="nonsense")


@pytest.fixture(scope="module")
def tiny_exact_detok():
    """Exact-tier CosyVoice detokenizer (talker/token2wav.py) at toy widths."""
    from mingunivision_tpu.talker.flow import CFMDecoderConfig, FlowConfig as CVFlowConfig
    from mingunivision_tpu.talker.flow_encoder import UpsampleConformerConfig
    from mingunivision_tpu.talker.hift import HiFTGeneratorConfig
    from mingunivision_tpu.talker.token2wav import CosyVoiceDetokenizer

    flow_cfg = CVFlowConfig(
        vocab_size=64,
        input_size=16,
        output_size=8,
        spk_embed_dim=4,
        encoder=UpsampleConformerConfig(
            input_size=16, output_size=16, attention_heads=2, linear_units=24,
            num_blocks=1, num_up_blocks=1, pre_lookahead_len=3, up_stride=2,
            static_chunk_size=4,
        ),
        decoder=CFMDecoderConfig(
            in_channels=32, out_channels=8, channels=(16,), attention_head_dim=8,
            n_blocks=1, num_mid_blocks=1, num_heads=2, static_chunk_size=4,
        ),
        n_timesteps=2,
    )
    hift_cfg = HiFTGeneratorConfig(
        in_channels=8, base_channels=16, nb_harmonics=1,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(3, 3), source_resblock_dilation_sizes=((1,), (1,)),
        f0_cond_channels=8,
    )
    return CosyVoiceDetokenizer.random_init(
        jax.random.PRNGKey(0), flow_cfg, hift_cfg, mel_cache_len=2, token_hop_len=3,
        max_mel_frames=128,
    )


class TestExactTierPipeline:
    def test_end_to_end_stream_with_cosyvoice_detok(self, tiny_talker, tiny_exact_detok):
        """The checkpoint-exact detokenizer plugs into the same
        OmniAudioPipeline surface as the analog tier."""
        cfg = tiny_talker.cfg

        def tokenize(s):
            return [hash(ch) % cfg.text_vocab_size for ch in s][:8] or [1]

        pipe = OmniAudioPipeline(
            tiny_talker,
            tiny_exact_detok,
            tokenize,
            sm_config=SentenceManagerConfig(min_sentence_len=2, normalize=True),
        )
        chunks = list(pipe.stream(iter(["今天天气很好。", "再见。"])))
        assert chunks[-1].is_last
        speech = [c for c in chunks if not c.is_last]
        assert len(speech) == 2
        assert all(c.wav.dtype == np.float32 and c.wav.ndim == 1 for c in speech)
        total = np.concatenate([c.wav for c in chunks])
        assert np.isfinite(total).all()
