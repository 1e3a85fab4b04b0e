"""Ming SDK examples-as-tests (analog of reference ming_sdk/ming_test.py):
text QA, streaming, speech out, image gen via the SDK facade.

Usage: python examples/ming_sdk_demo.py [--ckpt DIR]   (tiny random model default)
"""

import argparse
import sys

sys.path.insert(0, ".")


def build_tiny_ming():
    import jax

    from examples.test_infer_unified import build_tiny_infer
    from mingunivision_tpu.sdk.ming import Ming
    from mingunivision_tpu.talker.detokenizer import AudioDetokenizer, FlowConfig, HiFTConfig
    from mingunivision_tpu.talker.model import BailingTalker, TalkerConfig
    from mingunivision_tpu.talker.qwen2 import Qwen2Config
    from mingunivision_tpu.talker.sentence_manager import SentenceManagerConfig
    from mingunivision_tpu.talker.streaming import OmniAudioPipeline

    infer = build_tiny_infer()
    tcfg = TalkerConfig(
        qwen2=Qwen2Config(vocab_size=192, hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2, head_dim=16, intermediate_size=128),
        text_vocab_size=128, audio_vocab_size=64, qa_model_hidden_size=32,
        vp_feature_size=8, max_audio_tokens=8,
    )
    talker = BailingTalker.random_init(jax.random.PRNGKey(0), tcfg, dtype=jax.numpy.float32)
    detok = AudioDetokenizer.random_init(
        jax.random.PRNGKey(1),
        FlowConfig(codec_vocab=64, token_dim=32, mel_dim=16, channels=32, depth=2, num_ode_steps=2),
        HiFTConfig(mel_dim=16, base_channels=32, upsample_rates=(4, 4), upsample_kernels=(8, 8)),
    )
    pipe = OmniAudioPipeline(talker, detok, lambda s: [hash(c) % 128 for c in s][:8] or [1],
                             sm_config=SentenceManagerConfig(min_sentence_len=2))
    return Ming(infer=infer, talker_pipeline=pipe)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()
    if args.ckpt:
        from mingunivision_tpu.sdk.ming import Ming

        ming = Ming(args.ckpt)
    else:
        ming = build_tiny_ming()

    out = ming.generate("what is a red panda?", output_type="text", max_new_tokens=16)
    print("[textQA]", out["text"][:100])

    print("[stream]", end=" ")
    for piece in ming.generate_stream("tell me a story", chunk_tokens=4, max_new_tokens=12):
        print(repr(piece[:24]), end=" ", flush=True)
    print()

    ming.infer.reset_inner_state()
    out = ming.generate("draw a cat", output_type="image", max_new_tokens=8)
    print("[imageGen] images:", len(out["images"]))

    if ming.talker_pipeline is not None:
        ming.infer.reset_inner_state()
        out = ming.generate("说点什么。", output_type="speech", max_new_tokens=8)
        wav = out.get("audio")
        print("[speech] samples:", 0 if wav is None else len(wav))

        from mingunivision_tpu.processing.media import save_wav

        wav2 = ming.tts("今天天气很好。")
        save_wav("/tmp/ming_tts_demo.wav", wav2)
        print("[tts] wrote /tmp/ming_tts_demo.wav,", len(wav2), "samples")
    print("sdk demo complete")


if __name__ == "__main__":
    main()
