"""Named HF adapter parity (eval/hf_adapters.py) on tiny local models.

Each test builds a tiny HF checkpoint offline, runs the adapter through
the public registry, and compares against a direct HF call made with the
REFERENCE's prompt shaping (`lmms_eval/models/llava_hf.py`,
`instructblip.py`, `qwen_vl.py`) — the adapters' whole job is that
shaping, so the golden pins it.
"""

import numpy as np
import pytest
import torch

from law_of_vision_representation_in_mllms_tpu.eval.api import Instance
from law_of_vision_representation_in_mllms_tpu.eval.models_registry import (
    build_lmm_by_name)


def _word_tokenizer(extra=()):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    words = ("<unk> <pad> </s> a chat between curious user and an "
             "artificial intelligence assistant the gives helpful detailed "
             "polite answers to questions what is this cat dog red blue "
             "USER ASSISTANT describe image of".split())
    vocab = {w: i for i, w in enumerate(dict.fromkeys(list(words)
                                                      + list(extra)))}
    t = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=t, unk_token="<unk>", pad_token="<pad>",
        eos_token="</s>",
        model_input_names=["input_ids", "attention_mask"])
    # added special token: survives pre-tokenization intact, so the
    # processor's '<image>'*N expansion tokenizes to N image ids
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    return tok


def _tiny_llava_hf(tmp_path):
    from transformers import (CLIPImageProcessor, CLIPVisionConfig,
                              LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration,
                              LlavaProcessor)
    tok = _word_tokenizer()
    image_token_id = tok.convert_tokens_to_ids("<image>")
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=28, patch_size=7)
    tc = LlamaConfig(hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=4,
                     vocab_size=len(tok) + len(tok.all_special_tokens))
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=image_token_id,
                      vision_feature_select_strategy="default",
                      vision_feature_layer=-2)
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval()
    proc = LlavaProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": 28}, crop_size={"height": 28,
                                                   "width": 28}),
        tokenizer=tok, patch_size=7, num_additional_image_tokens=1,
        vision_feature_select_strategy="default")
    d = tmp_path / "llava_hf_snap"
    model.save_pretrained(d)
    proc.save_pretrained(d)
    return str(d), model, proc


def _img():
    from PIL import Image
    return Image.new("RGB", (28, 28), (120, 40, 200))


def test_llava_hf_adapter_golden(tmp_path):
    snap, model, proc = _tiny_llava_hf(tmp_path)
    lmm = build_lmm_by_name("llava_hf", pretrained=snap)
    img = _img()
    ctx = "what is this"                       # no <image> tag on purpose
    got = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t", (ctx, {"max_new_tokens": 3}),
        [img])])[0]

    # reference shaping: prepend '<image>', vicuna template fallback
    from law_of_vision_representation_in_mllms_tpu.eval.hf_adapters import (
        VICUNA_SYSTEM)
    text = f"{VICUNA_SYSTEM} USER: <image>\n{ctx} ASSISTANT:"
    inputs = proc(text=text, images=img, return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(**inputs, do_sample=False, max_new_tokens=3)
    want = proc.batch_decode(ids[:, inputs["input_ids"].shape[1]:],
                             skip_special_tokens=True)[0].strip()
    assert got == want

    # loglikelihood: continuation slice under the same template
    score, greedy = lmm.loglikelihood([Instance(
        "loglikelihood", {}, 0, "t", (ctx, " a cat"), [img])])[0]
    assert np.isfinite(score) and isinstance(greedy, bool)
    prompt = f"{VICUNA_SYSTEM} USER: <image>\n{ctx} ASSISTANT:"
    joint = f"{prompt} a cat</s>"
    # llava_hf.py:205-207: BOTH encodings go through the processor so the
    # expanded image-token ids cancel out of the continuation slice
    ctx_len = proc(text=prompt, images=img,
                   return_tensors="pt")["input_ids"].shape[1]
    inputs = proc(text=joint, images=img, return_tensors="pt")
    k = inputs["input_ids"].shape[1] - ctx_len
    with torch.no_grad():
        logits = model(**inputs).logits
    lp = torch.log_softmax(logits[0, -k - 1:-1].float(), dim=-1)
    tgt = inputs["input_ids"][0, -k:]
    want_score = float(lp.gather(1, tgt[:, None]).sum())
    assert abs(score - want_score) < 1e-4


def test_instructblip_adapter_strips_image_tag(tmp_path):
    from transformers import (BertConfig, Blip2QFormerConfig,
                              BlipImageProcessor, InstructBlipConfig,
                              InstructBlipForConditionalGeneration,
                              InstructBlipProcessor, InstructBlipVisionConfig,
                              OPTConfig)
    tok = _word_tokenizer()
    qtok = _word_tokenizer()
    vc = InstructBlipVisionConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2,
                                  num_attention_heads=4, image_size=28,
                                  patch_size=7)
    qc = Blip2QFormerConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=1, num_attention_heads=4,
                            encoder_hidden_size=32, vocab_size=len(tok))
    lc = OPTConfig(hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                   num_attention_heads=4, vocab_size=len(tok),
                   word_embed_proj_dim=32)
    cfg = InstructBlipConfig(vision_config=vc.to_dict(),
                             qformer_config=qc.to_dict(),
                             text_config=lc.to_dict(), num_query_tokens=4,
                             image_token_index=tok.convert_tokens_to_ids(
                                 "<image>"))
    torch.manual_seed(1)
    model = InstructBlipForConditionalGeneration(cfg).eval()
    proc = InstructBlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 28,
                                                 "width": 28}),
        tokenizer=tok, qformer_tokenizer=qtok, num_query_tokens=4)
    d = tmp_path / "iblip_snap"
    model.save_pretrained(d)
    proc.save_pretrained(d)

    lmm = build_lmm_by_name("instructblip", pretrained=str(d))
    img = _img()
    got = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t",
        ("<image>\ndescribe the image", {"max_new_tokens": 3}),
        [img])])[0]

    inputs = proc(text="describe the image", images=img,
                  return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(**inputs, do_sample=False, max_new_tokens=3)
    want = proc.batch_decode(ids, skip_special_tokens=True)[0].strip()
    assert got == want


def test_qwen_vl_query_format_and_generate():
    """The from_list_format protocol without the 9B checkpoint: a fake
    tokenizer/model pair records what the adapter hands over."""
    from law_of_vision_representation_in_mllms_tpu.eval.hf_adapters import (
        QwenVLLMM)
    calls = {}

    class FakeTok:
        eod_id = 151643
        pad_token_id = None

        def from_list_format(self, entries):
            calls["entries"] = entries
            parts = []
            for e in entries:
                if "image" in e:
                    parts.append(f"<img>{e['image']}</img>")
                else:
                    parts.append(e["text"])
            return "".join(parts)

        def __call__(self, text, return_tensors=None):
            calls["query"] = text
            ids = [ord(c) % 50 for c in text][:16]
            if return_tensors == "pt":
                return {"input_ids": torch.tensor([ids]),
                        "attention_mask": torch.ones((1, len(ids)),
                                                     dtype=torch.long)}
            return {"input_ids": ids}

        def decode(self, ids, skip_special_tokens=True):
            calls["decoded"] = [int(i) for i in ids]
            return "a cat."

    class FakeModel:
        def generate(self, input_ids, attention_mask=None, **kw):
            calls["gen_kwargs"] = kw
            return torch.cat([input_ids, torch.tensor([[1, 2, 3]])], dim=1)

    lmm = QwenVLLMM(model=FakeModel(), tokenizer=FakeTok())
    out = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t",
        ("<image>\nwhat is this?", {"until": ["."],
                                    "max_new_tokens": 7}), [_img()])])
    assert out == ["a cat"]                      # stop-string truncation
    assert calls["entries"][0]["image"].endswith("v0.png")
    assert calls["entries"][-1]["text"] == "what is this?"
    assert calls["query"].startswith("<img>")
    # qwen_vl.py:260-280 parity: greedy at temperature 0, per-request
    # token cap, eod as eos AND pad fallback
    kw = calls["gen_kwargs"]
    assert kw["max_new_tokens"] == 7 and kw["do_sample"] is False
    assert kw["eos_token_id"] == 151643 and kw["pad_token_id"] == 151643
    assert calls["decoded"] == [1, 2, 3]         # continuation slice only


def _tiny_fuyu():
    from transformers import (FuyuConfig, FuyuForCausalLM,
                              FuyuImageProcessor, FuyuProcessor)
    # FuyuProcessor derives the image-placeholder/newline ids from
    # encode("|SPEAKER|")[1] (the middle piece after the Whitespace
    # pre-tokenizer splits the pipes), so SPEAKER/NEWLINE need real
    # vocab entries; <s>/|ENDOFTEXT|/<0x04> are looked up by name
    tok = _word_tokenizer(extra=("<s>", "|ENDOFTEXT|", "<0x04>",
                                 "SPEAKER", "NEWLINE", "|"))
    ip = FuyuImageProcessor(size={"height": 32, "width": 32},
                            patch_size={"height": 8, "width": 8})
    proc = FuyuProcessor(image_processor=ip, tokenizer=tok)
    cfg = FuyuConfig(hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     vocab_size=len(tok) + 8, patch_size=8,
                     image_token_id=proc.image_token_id)
    torch.manual_seed(0)
    return FuyuForCausalLM(cfg).eval(), proc


def test_fuyu_adapter_golden():
    model, proc = _tiny_fuyu()
    lmm = build_lmm_by_name("fuyu", model=model, processor=proc)
    img = _img()
    ctx = "describe this image"
    got = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t", (ctx, {"max_new_tokens": 4}),
        [img])])[0]

    # reference shaping (`fuyu.py:186`): raw context + trailing newline,
    # answer = everything past the prompt (the processor ends the prompt
    # with the beginning-of-answer token)
    inputs = proc(text=f"{ctx}\n", images=img, return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(**inputs, do_sample=False, max_new_tokens=4)
    want = proc.batch_decode(
        ids[:, inputs["input_ids"].shape[1]:],
        skip_special_tokens=True)[0].strip(" ").strip("\n").strip()
    assert got == want

    # loglikelihood: continuation-suffix logprob under f"{ctx}\n{cont}"
    score, greedy = lmm.loglikelihood([Instance(
        "loglikelihood", {}, 0, "t", (ctx, "a red cat"), [img])])[0]
    assert np.isfinite(score) and isinstance(greedy, bool)
    joint = proc(text=f"{ctx}\na red cat", images=img,
                 return_tensors="pt")
    k = joint["input_ids"].shape[1] - inputs["input_ids"].shape[1]
    assert k > 0
    with torch.no_grad():
        logits = model(**joint).logits
    lp = torch.log_softmax(logits[0, -k - 1:-1].float(), dim=-1)
    tgt = joint["input_ids"][0, -k:]
    assert abs(score - float(lp.gather(1, tgt[:, None]).sum())) < 1e-4


def _tiny_idefics2():
    from transformers import (Idefics2Config,
                              Idefics2ForConditionalGeneration,
                              Idefics2ImageProcessor, Idefics2Processor)
    tok = _word_tokenizer(extra=("<fake_token_around_image>",
                                 "<end_of_utterance>", "User:",
                                 "Assistant:"))
    tok.add_special_tokens({"additional_special_tokens": [
        "<fake_token_around_image>", "<end_of_utterance>"]})
    ip = Idefics2ImageProcessor(do_image_splitting=False,
                                size={"shortest_edge": 32,
                                      "longest_edge": 32})
    proc = Idefics2Processor(image_processor=ip, tokenizer=tok,
                             image_seq_len=4)
    cfg = Idefics2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        perceiver_config=dict(resampler_n_latents=4, resampler_depth=1,
                              resampler_n_heads=2, resampler_head_dim=8,
                              num_key_value_heads=1, hidden_size=32),
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4,
                         vocab_size=len(tok) + 8),
        image_token_id=tok.convert_tokens_to_ids("<image>"))
    torch.manual_seed(0)
    return Idefics2ForConditionalGeneration(cfg).eval(), proc


def test_idefics2_adapter_golden():
    model, proc = _tiny_idefics2()
    lmm = build_lmm_by_name("idefics2", model=model, processor=proc)
    img = _img()
    ctx = "what is this"

    # the tiny processor ships no chat template -> the adapter renders
    # the reference idefics2 form itself
    prompt = lmm.build_prompt(ctx, 1)
    assert prompt == f"User:<image>{ctx}<end_of_utterance>\nAssistant:"

    got = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t", (ctx, {"max_new_tokens": 3}),
        [img])])[0]
    inputs = proc(text=prompt, images=[img], return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(**inputs, do_sample=False, max_new_tokens=3)
    want = proc.batch_decode(ids[:, inputs["input_ids"].shape[1]:],
                             skip_special_tokens=True)[0].strip()
    assert got == want

    # idefics2.py:161-162: loglikelihood unimplemented in the reference
    with pytest.raises(NotImplementedError):
        lmm.loglikelihood([])


def test_named_adapters_registered():
    from law_of_vision_representation_in_mllms_tpu.eval import hf_adapters
    from law_of_vision_representation_in_mllms_tpu.eval.models_registry import (
        LMM_REGISTRY)
    assert LMM_REGISTRY["llava_hf"] is hf_adapters.LlavaHFLMM
    assert LMM_REGISTRY["instructblip"] is hf_adapters.InstructBlipLMM
    assert LMM_REGISTRY["qwen_vl"] is hf_adapters.QwenVLLMM
    assert LMM_REGISTRY["fuyu"] is hf_adapters.FuyuLMM
    assert LMM_REGISTRY["idefics2"] is hf_adapters.Idefics2LMM


def test_minicpm_v_protocol():
    from law_of_vision_representation_in_mllms_tpu.eval.hf_adapters import (
        MiniCPMVLMM)
    calls = {}

    class FakeModel:
        def chat(self, image=None, msgs=None, context=None, tokenizer=None,
                 sampling=None, temperature=None, max_new_tokens=None):
            calls.update(msgs=msgs, sampling=sampling, image=image,
                         max_new_tokens=max_new_tokens)
            return "a dog!", context, None

    lmm = MiniCPMVLMM(model=FakeModel(), tokenizer=object())
    out = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t",
        ("<image>\nwhat animal?", {"until": ["!"],
                                   "max_new_tokens": 7}), [_img()])])
    assert out == ["a dog"]
    assert calls["msgs"] == [{"role": "user", "content": "what animal?"}]
    assert calls["sampling"] is False and calls["max_new_tokens"] == 7
    assert calls["image"] is not None
    with pytest.raises(NotImplementedError):
        lmm.loglikelihood([])


def test_xcomposer2_protocol():
    from law_of_vision_representation_in_mllms_tpu.eval.hf_adapters import (
        XComposer2LMM)
    calls = {}

    class FakeModel:
        def chat(self, tok, query=None, image=None, do_sample=None,
                 max_new_tokens=None):
            calls.update(query=query, do_sample=do_sample)
            return "blue.", None

    lmm = XComposer2LMM(model=FakeModel(), tokenizer=object())
    out = lmm.generate_until([Instance(
        "generate_until", {}, 0, "t", ("what color?", {}), [_img()])])
    assert out == ["blue."]
    assert calls["query"].startswith("[UNUSED_TOKEN_146]user\nwhat color?")
    assert calls["query"].endswith("[UNUSED_TOKEN_146]assistant\n")
    assert calls["do_sample"] is False


def test_phi3v_format():
    """Prompt shaping without the remote-code checkpoint: the format
    method is the adapter's protocol surface."""
    from law_of_vision_representation_in_mllms_tpu.eval.hf_adapters import (
        Phi3VLMM)

    class FakeTok:
        def apply_chat_template(self, messages, tokenize=False,
                                add_generation_prompt=True):
            assert messages[0]["role"] == "user"
            return f"<|user|>{messages[0]['content']}<|assistant|>"

    lmm = Phi3VLMM.__new__(Phi3VLMM)

    class P:
        tokenizer = FakeTok()
    lmm.processor = P()
    assert lmm._format("<image>\nwhat?") == \
        "<|user|><|image_1|>\nwhat?<|assistant|>"
    assert lmm._format("no tag here") == \
        "<|user|><|image_1|>\nno tag here<|assistant|>"


def test_all_fork_adapters_registered():
    from law_of_vision_representation_in_mllms_tpu.eval import hf_adapters  # noqa: F401
    from law_of_vision_representation_in_mllms_tpu.eval.models_registry import (
        LMM_REGISTRY)
    # the fork's full local-adapter surface (`lmms_eval/models/`)
    for name in ("llava_hf", "instructblip", "qwen_vl", "fuyu",
                 "idefics2", "minicpm_v", "phi3v", "xcomposer2_4khd",
                 "gpt4v", "qwen-vl-api", "openai-api", "llava",
                 "hf-vision2seq"):
        assert name in LMM_REGISTRY, name
