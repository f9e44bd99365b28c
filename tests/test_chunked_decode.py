"""Chunked decode (models/decode.py) parity with the in-program scan.

The chunk-scan body is the same step as `generate_greedy`; these tests
pin exact token equality for chunk sizes that divide max_new_tokens
unevenly (padding tail), ragged (right-padded) batches, and early EOS
exit (the chunked path must still return eos-padded [B, max_new]).
"""

import jax.numpy as jnp
import numpy as np

from law_of_vision_representation_in_mllms_tpu.core.precision import (
    FP32_PRECISION)
from law_of_vision_representation_in_mllms_tpu.models import llava as M
from law_of_vision_representation_in_mllms_tpu.models.decode import (
    ChunkedGreedyDecoder)

from test_splice_llava import _tiny_batch, _tiny_llava


def _greedy(params, cfg, batch, max_new, eos_id):
    return np.asarray(M.generate_greedy(
        params, cfg, batch["input_ids"], batch["text_mask"],
        batch["pixel_values"], max_new_tokens=max_new, eos_id=eos_id,
        precision=FP32_PRECISION))


def test_chunked_matches_greedy():
    cfg, params = _tiny_llava(1)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(cfg, rng, b=2, l=6)
    max_new = 10
    want = _greedy(params, cfg, batch, max_new, eos_id=0)
    for chunk in (3, 4, 16):   # uneven tail / even / single oversized chunk
        dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                                   precision=FP32_PRECISION, chunk=chunk)
        got = dec.generate(batch["input_ids"], batch["text_mask"],
                           batch["pixel_values"], max_new_tokens=max_new)
        np.testing.assert_array_equal(got, want, err_msg=f"chunk={chunk}")


def test_chunked_ragged_batch():
    cfg, params = _tiny_llava(2)
    rng = np.random.RandomState(1)
    batch = _tiny_batch(cfg, rng, b=3, l=8)
    mask = np.asarray(batch["text_mask"]).copy()
    mask[1, 5:] = False            # row 1 is shorter (right padding)
    mask[2, 6:] = False
    batch["text_mask"] = jnp.asarray(mask)
    max_new = 8
    want = _greedy(params, cfg, batch, max_new, eos_id=0)
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                               precision=FP32_PRECISION, chunk=4)
    got = dec.generate(batch["input_ids"], batch["text_mask"],
                       batch["pixel_values"], max_new_tokens=max_new)
    np.testing.assert_array_equal(got, want)


def test_chunked_early_exit_pads_eos():
    """Force EOS to be the argmax everywhere (eos_id = whatever the model
    emits first) so the host loop exits after chunk 1 of many — the padded
    tail must equal the full-scan output (all eos)."""
    cfg, params = _tiny_llava(3)
    rng = np.random.RandomState(2)
    batch = _tiny_batch(cfg, rng, b=2, l=6)
    probe = _greedy(params, cfg, batch, 1, eos_id=0)
    eos_id = int(probe[0, 0])      # first emitted token becomes "eos"
    max_new = 12
    want = _greedy(params, cfg, batch, max_new, eos_id=eos_id)
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=eos_id,
                               precision=FP32_PRECISION, chunk=4)
    got = dec.generate(batch["input_ids"], batch["text_mask"],
                       batch["pixel_values"], max_new_tokens=max_new)
    np.testing.assert_array_equal(got, want)


def test_chunked_negotiated_layouts_match_greedy():
    """negotiate_layouts=True (the 7B OOM fix, models/layouts.py): AOT
    AUTO-layout chunk program + prefill pinned to the negotiated formats
    + one-time param relayout must be token-identical to the plain path,
    across chunk boundaries and a second call (params already relaid)."""
    cfg, params = _tiny_llava(4)
    rng = np.random.RandomState(5)
    batch = _tiny_batch(cfg, rng, b=2, l=6)
    max_new = 10
    want = _greedy(params, cfg, batch, max_new, eos_id=0)
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                               precision=FP32_PRECISION, chunk=4,
                               negotiate_layouts=True)
    got = dec.generate(batch["input_ids"], batch["text_mask"],
                       batch["pixel_values"], max_new_tokens=max_new)
    np.testing.assert_array_equal(got, want)
    assert dec._param_formats is not None and dec._relaid
    got2 = dec.generate(batch["input_ids"], batch["text_mask"],
                        batch["pixel_values"], max_new_tokens=max_new)
    np.testing.assert_array_equal(got2, want)


def test_chunked_program_reuse():
    """Same shapes -> no rebuild; the jitted fns are cached per decoder."""
    cfg, params = _tiny_llava(1)
    rng = np.random.RandomState(3)
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                               precision=FP32_PRECISION, chunk=4)
    b1 = _tiny_batch(cfg, rng, b=2, l=6)
    b2 = _tiny_batch(cfg, rng, b=2, l=6)
    g1 = dec.generate(b1["input_ids"], b1["text_mask"], b1["pixel_values"],
                      max_new_tokens=8)
    n_programs = len(dec._fns)
    g2 = dec.generate(b2["input_ids"], b2["text_mask"], b2["pixel_values"],
                      max_new_tokens=8)
    assert len(dec._fns) == n_programs == 1
    want1 = _greedy(params, cfg, b1, 8, eos_id=0)
    want2 = _greedy(params, cfg, b2, 8, eos_id=0)
    np.testing.assert_array_equal(g1, want1)
    np.testing.assert_array_equal(g2, want2)


def test_chunked_multitower_mixed_resolution():
    """Two MoF towers at DIFFERENT resolutions: the decoder must keep the
    per-tower pixel LIST intact (stacking into one array raises on
    inhomogeneous shapes — generate_greedy's contract is a list)."""
    import jax
    from law_of_vision_representation_in_mllms_tpu.models import llama as L
    from law_of_vision_representation_in_mllms_tpu.models.towers import (
        TowerEntry, TowerSpec)
    from law_of_vision_representation_in_mllms_tpu.models.vit import ViTConfig

    def vit(sz):
        return ViTConfig(image_size=sz, patch_size=7, hidden_size=16,
                         num_layers=2, num_heads=2, intermediate_size=32,
                         use_class_token=True, use_pre_layernorm=True,
                         patch_bias=False)

    entries = [TowerEntry(name=f"tiny{s}", kind="vit", vit_config=vit(s),
                          vit_family="clip", hidden_size=16,
                          num_patches=vit(s).num_patches)
               for s in (14, 28)]
    cfg = M.LlavaConfig(
        tower_spec=TowerSpec(entries=entries, join="mof"),
        decoder=L.tiny(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=64),
        projector_type="mlp2x_gelu")
    params = M.init_params(jax.random.PRNGKey(3), cfg, FP32_PRECISION)
    rng = np.random.RandomState(4)
    batch = _tiny_batch(cfg, rng, b=2, l=6)
    batch["pixel_values"] = [
        jnp.asarray(rng.randn(2, 14, 14, 3).astype(np.float32)),
        jnp.asarray(rng.randn(2, 28, 28, 3).astype(np.float32))]
    max_new = 6
    want = _greedy(params, cfg, batch, max_new, eos_id=0)
    dec = ChunkedGreedyDecoder(params, cfg, eos_id=0,
                               precision=FP32_PRECISION, chunk=4)
    got = dec.generate(batch["input_ids"], batch["text_mask"],
                       batch["pixel_values"], max_new_tokens=max_new)
    np.testing.assert_array_equal(got, want)
