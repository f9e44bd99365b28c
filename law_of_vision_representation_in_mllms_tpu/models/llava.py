"""LLaVA-1.5 model: tower(s) -> concat -> mm_projector -> splice -> LLaMA.

The TPU-native re-design of `llava/model/llava_arch.py` +
`llava/model/language_model/llava_llama.py`:

- `encode_images` — per-tower ViT forward (frozen; under stop_gradient) then
  channel concat and the shared projector (`llava_arch.py:260-286`).
- `loss_fn` — splice + decoder CE in a single jittable graph, static shapes
  throughout (the reference's `prepare_inputs_labels_for_multimodal` is a
  Python loop, `llava_arch.py:293-478`).
- `generate_greedy` — prefill + lax.scan decode with a KV cache
  (`llava_llama.py:105-143` pre-splices embeddings the same way).
- `dump_image_embeds` — the A-score embedding hook (post-projector, LLM
  space) as a first-class function instead of commented-out code
  (`llava_arch.py:475-476`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.precision import Precision, DEFAULT_PRECISION
from . import llama as L
from .projector import apply_projector, init_projector
from .splice import splice_plan, splice_embeds, IGNORE_INDEX
from .towers import TowerSpec, TowerEntry, parse_tower_spec
from .vit import ViTTower


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    tower_spec: TowerSpec
    decoder: L.LlamaConfig
    projector_type: str = "mlp2x_gelu"
    select_layer: int = -2
    select_feature: str = "patch"
    # per-tower-name FeaturizerConfig overrides (from loaded bundles);
    # consumed by tower_runtime.make_diffusion_apply
    featurizer_overrides: Optional[Dict[str, Any]] = None
    # Opt-in visual-token pruning (beyond-reference inference accelerator,
    # PruMerge/FastV-family): keep only the top-`visual_keep` image tokens,
    # scored by `prune_score` ("auto" = tower CLS attention when the lead
    # tower has a class token, else projected-token L2 norm). Static keep
    # count -> static shapes; visual_keep=None (default) is exact parity.
    visual_keep: Optional[int] = None
    prune_score: str = "auto"            # auto | saliency | norm
    # KV-cache quantization for generation ("int8" | None): int8 codes +
    # per-(slot, head) scales (ops/quant.quantize_kv) halve the decode
    # cache's resident bytes AND its per-step attention read — the term
    # the round-4 decode roofline flagged as the b8 bottleneck. With the
    # flash prefill (TPU default) prompt K/V are computed exactly and
    # only the CACHE is quantized; None = exact bf16 cache parity.
    kv_quant: Optional[str] = None

    @classmethod
    def build(cls, tower: str, decoder: Optional[L.LlamaConfig] = None,
              **kw) -> "LlavaConfig":
        return cls(tower_spec=parse_tower_spec(tower),
                   decoder=decoder or L.vicuna_7b(), **kw)

    @property
    def full_num_patches(self) -> int:
        """Image-token count after the projector, BEFORE any pruning.
        A perceiver projector resamples any patch grid to its 64 learned
        latents (`perceiver_helpers.py:76`); per-tower projectors under MoF
        contribute 64 each."""
        from .projector import parse_projector_type
        kind, _ = parse_projector_type(self.projector_type)
        if kind == "perceiver":
            from .perceiver import NUM_LATENTS
            if self.tower_spec.join == "mof":
                return NUM_LATENTS * len(self.tower_spec.entries)
            return NUM_LATENTS
        return self.tower_spec.num_patches

    @property
    def num_patches(self) -> int:
        """Image-token count the splice sees (post-pruning)."""
        n = self.full_num_patches
        if self.visual_keep is not None:
            return min(self.visual_keep, n)
        return n


def init_params(rng, cfg: LlavaConfig,
                precision: Precision = DEFAULT_PRECISION,
                init_towers: bool = True,
                init_decoder: bool = True) -> Dict[str, Any]:
    """Random-init params (tests / tiny models). Real checkpoints come from
    io.hf_port + io.checkpoint. `init_decoder=False` leaves the decoder
    subtree empty — at 7B the decoder is initialized in its own jit program
    (one giant program mixing Flax tower init with 13 GB of decoder
    sampling overloads the compile pipeline)."""
    k_tow, k_proj, k_dec = jax.random.split(rng, 3)
    towers = []
    if init_towers:
        for i, e in enumerate(cfg.tower_spec.entries):
            if e.kind == "vit":
                mod = ViTTower(e.vit_config, cfg.select_layer,
                               _select_feature(cfg, e), precision)
                px = jnp.zeros((1, e.vit_config.image_size,
                                e.vit_config.image_size, 3))
                towers.append(mod.init(jax.random.fold_in(k_tow, i),
                                       px)["params"])
            else:
                towers.append({})  # diffusion/feature towers ported later
    pdtype = precision.param_dtype
    if cfg.tower_spec.join == "mof":
        # per-tower projectors (`llava_arch.py:169-181`)
        proj = [init_projector(jax.random.fold_in(k_proj, i),
                               cfg.projector_type, e.hidden_size,
                               cfg.decoder.hidden_size, dtype=pdtype)
                for i, e in enumerate(cfg.tower_spec.entries)]
    else:
        proj = init_projector(k_proj, cfg.projector_type,
                              cfg.tower_spec.mm_hidden_size,
                              cfg.decoder.hidden_size, dtype=pdtype)
    # the decoder inits directly in the param dtype — at 7B, a transient
    # fp32 copy would double peak memory (27 GB) on a 16 GB chip
    dec = (L.init_params(k_dec, cfg.decoder, dtype=pdtype)
           if init_decoder else {})
    return {"towers": towers, "projector": proj, "decoder": dec}


def _select_feature(cfg: LlavaConfig, entry: TowerEntry) -> str:
    # SigLIP has no CLS token; the reference forces 'cls_patch'
    # (`siglip_encoder.py:15`) meaning "keep all tokens".
    if entry.vit_family == "siglip":
        return "cls_patch"
    return cfg.select_feature


def _vit_forward_with_saliency(tower_params, vcfg, select_layer: int,
                               precision: Precision, pixel_values):
    """One encoder pass returning (patch features, CLS-attention scores
    [B, P]) — the saliency comes from the last block actually run, via the
    sown q/k projections (O(S) memory; see facet.cls_attention_scores)."""
    from .facet import cls_scores_from_qk
    from .vit import ViTEncoder
    n = vcfg.resolve_layer(select_layer)
    enc = ViTEncoder(vcfg, precision)
    out, inter = enc.apply({"params": tower_params["encoder"]}, pixel_values,
                           num_blocks=n, sow_facets_layer=n - 1,
                           mutable=["intermediates"])
    blk = inter["intermediates"][f"block_{n - 1}"]
    sal = cls_scores_from_qk(blk["facet_q"][0], blk["facet_k"][0],
                             vcfg.head_dim)
    return out[:, 1:], sal


def prune_visual_tokens(tokens: jnp.ndarray, scores: jnp.ndarray,
                        keep: int) -> jnp.ndarray:
    """Keep the top-`keep` tokens by score, in their ORIGINAL order
    (positional structure matters to the decoder). Static shapes: top_k +
    sort + gather."""
    _, idx = lax.top_k(scores, keep)
    idx = jnp.sort(idx, axis=-1)
    return jnp.take_along_axis(tokens, idx[..., None], axis=1)


def encode_images(params, cfg: LlavaConfig, pixel_values: List[jnp.ndarray],
                  precision: Precision = DEFAULT_PRECISION,
                  diffusion_apply=None) -> jnp.ndarray:
    """pixel_values: one NHWC array per tower entry. Returns projected
    features [B, P, D_llm]. Towers are frozen (stop_gradient), matching
    `requires_grad_(False)` in every reference tower.

    With `cfg.visual_keep`, the projected tokens are pruned to the top-K by
    tower CLS attention (or token norm) — see LlavaConfig.visual_keep."""
    feats = []
    saliency = None
    want_saliency = (cfg.visual_keep is not None
                     and cfg.prune_score in ("auto", "saliency")
                     and cfg.tower_spec.join != "mof")
    for i, e in enumerate(cfg.tower_spec.entries):
        if e.kind == "vit":
            sel = _select_feature(cfg, e)
            if (want_saliency and saliency is None and sel == "patch"
                    and e.vit_config.use_class_token):
                f, saliency = _vit_forward_with_saliency(
                    params["towers"][i], e.vit_config, cfg.select_layer,
                    precision, pixel_values[i])
                saliency = lax.stop_gradient(saliency)
            else:
                mod = ViTTower(e.vit_config, cfg.select_layer, sel,
                               precision)
                f = mod.apply({"params": params["towers"][i]},
                              pixel_values[i])
        elif e.kind == "diffusion":
            if diffusion_apply is None:
                raise ValueError("diffusion tower requires diffusion_apply "
                                 "(models.featurizer)")
            f = diffusion_apply(params["towers"][i], e, pixel_values[i])
        elif e.kind == "feature":
            f = pixel_values[i]          # precomputed features pass through
        else:
            raise ValueError(e.kind)
        feats.append(lax.stop_gradient(f.astype(precision.compute_dtype)))
    if cfg.tower_spec.join == "mof":
        # MoF: per-tower projectors, tokens INTERLEAVED across towers —
        # the reference's documented MoF design (its live encode path is
        # commented out, `llava_arch.py:265-276`; the interleave follows
        # that commented implementation, stack + transpose + reshape).
        projected = [apply_projector(params["projector"][i], f, precision)
                     for i, f in enumerate(feats)]
        pmin = min(p.shape[1] for p in projected)
        stack = jnp.stack([p[:, :pmin] for p in projected], axis=1)
        b, n, t, d = stack.shape
        out = stack.transpose(0, 2, 1, 3).reshape(b, n * t, d)
        saliency = None                  # interleave breaks the alignment
    else:
        cat = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        out = apply_projector(params["projector"], cat, precision)
    keep = cfg.num_patches
    if cfg.visual_keep is not None and keep < out.shape[1]:
        usable = saliency is not None and saliency.shape[1] == out.shape[1]
        if cfg.prune_score == "saliency" and not usable:
            raise ValueError(
                "prune_score='saliency' needs a patch-selected class-token "
                "ViT tower whose patch count matches the projected tokens "
                "(no MoF interleave, no perceiver resampling)")
        scores = (saliency if usable
                  else jnp.linalg.norm(out.astype(jnp.float32), axis=-1))
        out = prune_visual_tokens(out, lax.stop_gradient(scores), keep)
    return out


def dump_image_embeds(params, cfg: LlavaConfig, pixel_values,
                      precision: Precision = DEFAULT_PRECISION,
                      diffusion_apply=None):
    """A-score hook: the post-projector per-image embeddings the reference
    dumps via `save_tensor_to_folder` (`llava_arch.py:229-248,475-476`)."""
    return encode_images(params, cfg, pixel_values, precision,
                         diffusion_apply)


def loss_fn(params, cfg: LlavaConfig, batch: Dict[str, jnp.ndarray],
            precision: Precision = DEFAULT_PRECISION,
            diffusion_apply=None, remat: bool = False,
            remat_policy=None,
            use_flash: bool = False, lora_scaling: float = 1.0,
            cp=None, pp=None):
    """Training loss.

    batch: input_ids [B,L] (with -200 image slots), labels [B,L],
    text_mask [B,L] bool, pixel_values: list of NHWC arrays per tower.
    If params contain a "lora" subtree (models/lora.py), the decoder runs
    with the rank-r adapters applied (the reference's peft-LoRA finetune,
    `train.py:945-985`). cp: optional ContextParallel — decoder attention
    runs sequence-parallel (ring) over cp.seq_axis. pp: optional
    PipelineParallel — the decoder trunk runs GPipe-scheduled over the
    mesh's stage axis (parallel/pipeline.py; exclusive with cp/LoRA).
    """
    if pp is not None and (cp is not None or "lora" in params):
        raise ValueError("pipeline parallelism composes with data/tensor "
                         "parallelism, not with cp or LoRA (v1)")
    plan = splice_plan(batch["input_ids"], batch["labels"],
                       batch["text_mask"], cfg.num_patches)
    img = encode_images(params, cfg, batch["pixel_values"], precision,
                        diffusion_apply)
    txt = L.embed_tokens(params["decoder"], batch["input_ids"], precision)
    embeds = splice_embeds(plan, txt, img)
    positions, attn_mask, labels = plan.positions, plan.attn_mask, plan.labels
    if cp is not None:
        # the spliced length (max_length + num_patches - 1) is arbitrary;
        # right-pad to a seq-axis multiple (padded keys masked out, padded
        # labels ignored) so the ring shards evenly
        pad = (-embeds.shape[1]) % cp.mesh.shape[cp.seq_axis]
        if pad:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
            positions = jnp.pad(positions, ((0, 0), (0, pad)))
            attn_mask = jnp.pad(attn_mask, ((0, 0), (0, pad)))
            labels = jnp.pad(labels, ((0, 0), (0, pad)),
                             constant_values=IGNORE_INDEX)
    if pp is not None:
        from ..parallel.pipeline import forward_pipelined
        h = forward_pipelined(params["decoder"], cfg.decoder, embeds,
                              positions, attn_mask=attn_mask, pp=pp,
                              precision=precision, use_flash=use_flash,
                              remat=remat)
    else:
        h, _ = L.forward(params["decoder"], cfg.decoder, embeds, positions,
                         attn_mask=attn_mask, precision=precision,
                         remat=remat, remat_policy=remat_policy,
                         use_flash=use_flash,
                         lora=params.get("lora"),
                         lora_scaling=lora_scaling, cp=cp)
    logits = L.logits_fn(params["decoder"], h, precision)
    return L.causal_lm_loss(logits, labels)


def generate_greedy(params, cfg: LlavaConfig, input_ids, text_mask,
                    pixel_values, *, max_new_tokens: int, eos_id: int,
                    precision: Precision = DEFAULT_PRECISION,
                    diffusion_apply=None, use_flash: Optional[bool] = None,
                    rng=None, temperature=0.0, top_p=1.0):
    """Greedy decode. Returns [B, max_new_tokens] token ids (eos-padded).

    With `rng` + `temperature > 0`, decodes by temperature/top-p
    sampling instead (`models/sampling.py`; the reference's
    `do_sample=temperature > 0` contract, `lmms_eval/models/llava.py:415-417`)
    — see `generate_sample` for the explicit entry point.
    """
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    # static python temperature 0 keeps the greedy program free of the
    # per-step vocab sort; a traced temperature compiles the sampling
    # path with its own argmax fallback inside (sampling.sample_token)
    sampling = rng is not None and not (
        isinstance(temperature, (int, float)) and temperature <= 0)
    if sampling:
        from .sampling import sample_token
        rng, first_key = jax.random.split(rng)

        def next_tok(logits, key):
            return sample_token(logits, key, temperature, top_p)
    else:
        first_key = None

        def next_tok(logits, key):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    b, l = input_ids.shape
    plan = splice_plan(input_ids, jnp.full_like(input_ids, IGNORE_INDEX),
                       text_mask, cfg.num_patches)
    img = encode_images(params, cfg, pixel_values, precision,
                        diffusion_apply)
    txt = L.embed_tokens(params["decoder"], input_ids, precision)
    embeds = splice_embeds(plan, txt, img)

    l_out = embeds.shape[1]
    t_max = l_out + max_new_tokens
    cache = L.init_cache(cfg.decoder, b, t_max,
                          precision.compute_dtype, quant=cfg.kv_quant)
    slot_valid = jnp.concatenate(
        [plan.attn_mask, jnp.zeros((b, max_new_tokens), bool)], axis=1)

    h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                         plan.positions, attn_mask=slot_valid, cache=cache,
                         cache_index=0, precision=precision,
                         use_flash=use_flash)
    # last VALID position's logits seed generation (right padding)
    n_valid = jnp.sum(plan.attn_mask, axis=1)                    # [B]
    last_idx = jnp.maximum(n_valid - 1, 0)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    logits = L.logits_fn(params["decoder"], h_last[:, None], precision)
    first_tok = next_tok(logits[:, -1], first_key)

    def step(carry, inputs):
        cache, tok, done, pos = carry
        t, key = inputs
        emb = L.embed_tokens(params["decoder"], tok[:, None], precision)
        # slots [l_out, l_out+t] hold generated tokens; mark them valid
        gen_slots = jnp.arange(max_new_tokens) <= t
        sv = jnp.concatenate(
            [plan.attn_mask, jnp.broadcast_to(gen_slots,
                                              (b, max_new_tokens))], axis=1)
        h, new_cache = L.forward(params["decoder"], cfg.decoder, emb,
                                 pos[:, None], attn_mask=sv, cache=cache,
                                 cache_index=l_out + t, precision=precision)
        logits = L.logits_fn(params["decoder"], h, precision)
        nxt = next_tok(logits[:, -1], key)
        done = done | (tok == eos_id)
        nxt = jnp.where(done, eos_id, nxt)
        return (new_cache, nxt, done, pos + 1), tok

    keys = (jax.random.split(rng, max_new_tokens) if sampling
            else jnp.zeros((max_new_tokens, 2), jnp.uint32))
    init = (cache, first_tok, jnp.zeros((b,), bool), n_valid)
    _, toks = lax.scan(step, init, (jnp.arange(max_new_tokens), keys))
    return jnp.transpose(toks)                                   # [B, T_new]


def generate_beam(params, cfg: LlavaConfig, input_ids, text_mask,
                  pixel_values, *, max_new_tokens: int, eos_id: int,
                  num_beams: int, length_penalty: float = 1.0,
                  precision: Precision = DEFAULT_PRECISION,
                  diffusion_apply=None, use_flash: Optional[bool] = None):
    """Beam-search decode (the reference adapter forwards `num_beams` to
    HF generate, `lmms_eval/models/llava.py:395-418`; default 1 across
    every paper task). Returns [B, max_new_tokens] token ids of each
    batch row's best beam (eos-padded).

    HF-parity semantics (transformers `GenerationMixin._beam_search`,
    the vectorized refactor): each step keeps the top 2k of the k*V
    continuations; candidates that hit a stopping criterion (EOS, or
    max length on the final step) and rank in the top k are merged into
    a fixed [B, k] finished-hypothesis pool by sequence score
    `sum_logprobs / gen_len**length_penalty` (gen_len counts the EOS),
    while the best k non-finished candidates continue decoding. The
    `early_stopping=False` heuristic gates pool additions exactly as
    HF's `_check_early_stop_heuristic` does (a latch per batch row once
    the pool is full and the best running raw score can no longer beat
    the worst pooled score at the current length). Token-for-token
    parity with `LlamaForCausalLM.generate(num_beams=k)` is golden-
    tested across length penalties in tests/test_beam.py.

    TPU-native design: all `num_beams` beams of all batch rows decode
    as one [B*k] batch through the same cached forward as greedy; beam
    reordering is a gather over the cache's batch axis INSIDE the scan
    (the HF `reorder_cache` equivalent), and the hypothesis pool is a
    static [B, k] top-k merge per step — HF's own refactor is already
    static-shape, so the port introduces no approximation."""
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    b, _ = input_ids.shape
    k = num_beams
    T = max_new_tokens
    pen = float(length_penalty)
    plan = splice_plan(input_ids, jnp.full_like(input_ids, IGNORE_INDEX),
                       text_mask, cfg.num_patches)
    img = encode_images(params, cfg, pixel_values, precision,
                        diffusion_apply)
    txt = L.embed_tokens(params["decoder"], input_ids, precision)
    embeds = splice_embeds(plan, txt, img)

    l_out = embeds.shape[1]
    t_max = l_out + T
    cache = L.init_cache(cfg.decoder, b, t_max,
                          precision.compute_dtype, quant=cfg.kv_quant)
    slot_valid = jnp.concatenate(
        [plan.attn_mask, jnp.zeros((b, T), bool)], axis=1)
    h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                         plan.positions, attn_mask=slot_valid, cache=cache,
                         cache_index=0, precision=precision,
                         use_flash=use_flash)
    n_valid = jnp.sum(plan.attn_mask, axis=1)                    # [B]
    last_idx = jnp.maximum(n_valid - 1, 0)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    logits = L.logits_fn(params["decoder"], h_last[:, None], precision)
    logprobs = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))

    vocab = logprobs.shape[-1]
    kk = 2 * k            # beams_to_keep = max(2, 1 + n_eos) * k, one EOS
    neg = jnp.float32(-1e9)
    top_mask = jnp.arange(kk) < k       # only top-k candidates may finish
    batch_base = jnp.arange(b)[:, None] * k                # [B, 1]

    def beam_update(lp_bkv, state, t):
        """One HF beam-search bookkeeping step at generated position t
        (0-based): top-2k continuation selection, running-beam refresh,
        finished-pool merge, early-stop-heuristic latch. Arithmetic
        (additive -1e9 masks, fp32 scores) mirrors HF's to keep even
        degenerate orderings identical."""
        run_scores, run_seqs, pool_seqs, pool_scores, pool_fin, unsat = \
            state
        acc = lp_bkv + run_scores[:, :, None]              # [B, k, V]
        topk_lp, flat = lax.top_k(acc.reshape(b, k * vocab), kk)
        parent = flat // vocab                             # [B, 2k]
        tok2k = (flat % vocab).astype(jnp.int32)
        cand_seqs = jnp.take_along_axis(run_seqs, parent[:, :, None],
                                        axis=1)            # [B, 2k, T]
        cand_seqs = cand_seqs.at[:, :, t].set(tok2k)
        # stopping criteria on each candidate: EOS, or max length hit
        hits = (tok2k == eos_id) | (t + 1 >= T)
        # best k non-finished candidates continue decoding
        run_lp = topk_lp + hits.astype(jnp.float32) * neg
        new_run_scores, idx = lax.top_k(run_lp, k)
        new_run_seqs = jnp.take_along_axis(cand_seqs, idx[:, :, None],
                                           axis=1)
        sel_parent = jnp.take_along_axis(parent, idx, axis=1)   # [B, k]
        sel_tok = jnp.take_along_axis(tok2k, idx, axis=1)
        # finished-pool merge (HF _update_finished_beams): normalized
        # score, only top-k candidates may finalize, additions blocked
        # once the early-stop heuristic latched
        gen_len = (t + 1).astype(jnp.float32)
        norm = topk_lp / (gen_len ** pen)
        did_fin = hits & top_mask[None, :]
        norm = norm + (~unsat).astype(jnp.float32) * neg   # [B,1] bcast
        norm = norm + (~did_fin).astype(jnp.float32) * neg
        merged_scores = jnp.concatenate([pool_scores, norm], axis=1)
        merged_seqs = jnp.concatenate([pool_seqs, cand_seqs], axis=1)
        merged_fin = jnp.concatenate([pool_fin, did_fin], axis=1)
        new_pool_scores, midx = lax.top_k(merged_scores, k)
        new_pool_seqs = jnp.take_along_axis(merged_seqs, midx[:, :, None],
                                            axis=1)
        new_pool_fin = jnp.take_along_axis(merged_fin, midx, axis=1)
        # HF _check_early_stop_heuristic, early_stopping=False: latch
        # once every pool slot is finished and the best running raw sum
        # normalized at the CURRENT length cannot beat the worst slot
        best_possible = new_run_scores[:, :1] / (gen_len ** pen)
        worst_fin = jnp.where(
            new_pool_fin, jnp.min(new_pool_scores, axis=1, keepdims=True),
            neg)
        new_unsat = unsat & jnp.any(best_possible > worst_fin, axis=-1,
                                    keepdims=True)
        new_state = (new_run_scores, new_run_seqs, new_pool_seqs,
                     new_pool_scores, new_pool_fin, new_unsat)
        return new_state, sel_parent, sel_tok

    # HF running-score init: beam 0 at 0, the rest at -1e9 so step 1's
    # top-2k effectively selects distinct first tokens of one beam
    run_scores = jnp.broadcast_to(
        jnp.where(jnp.arange(k) == 0, 0.0, -1e9).astype(jnp.float32),
        (b, k))
    state = (run_scores,
             jnp.full((b, k, T), eos_id, jnp.int32),       # running seqs
             jnp.full((b, k, T), eos_id, jnp.int32),       # pool seqs
             jnp.full((b, k), -1e9, jnp.float32),          # pool scores
             jnp.zeros((b, k), bool),                      # pool finished
             jnp.ones((b, 1), bool))                       # heur. unsat
    # step 1 from the prompt logits (all beams share the prompt)
    lp0 = jnp.broadcast_to(logprobs[:, None, :], (b, k, vocab))
    state, _parent0, tok0 = beam_update(lp0, state, jnp.int32(0))
    # beams share their batch row's prompt cache: expand B -> B*k (the
    # k copies are identical, so step 1 needs no parent reorder)
    cache = jax.tree.map(lambda x: jnp.repeat(x, k, axis=1), cache)
    prompt_mask_k = jnp.repeat(plan.attn_mask, k, axis=0)  # [B*k, l_out]
    pos0 = jnp.repeat(n_valid, k)                          # [B*k]

    def step(carry, t):
        # forwards the token selected at generated position t, then runs
        # the bookkeeping for position t+1
        cache, state, tok, pos = carry
        emb = L.embed_tokens(params["decoder"],
                             tok.reshape(b * k)[:, None], precision)
        gen_slots = jnp.arange(T) <= t
        sv = jnp.concatenate(
            [prompt_mask_k, jnp.broadcast_to(gen_slots, (b * k, T))],
            axis=1)
        h, cache = L.forward(params["decoder"], cfg.decoder, emb,
                             pos[:, None], attn_mask=sv, cache=cache,
                             cache_index=l_out + t, precision=precision)
        lp = jax.nn.log_softmax(
            L.logits_fn(params["decoder"], h, precision)[:, -1]
            .astype(jnp.float32)).reshape(b, k, vocab)
        state2, parent, tok2 = beam_update(lp, state, t + 1)
        # reorder the cache (incl. this step's KV rows) to follow the
        # surviving parents — HF reorder_cache
        gather_rows = (batch_base + parent).reshape(b * k)
        cache = jax.tree.map(lambda x: x[:, gather_rows], cache)
        return (cache, state2, tok2, pos + 1), None

    if T > 1:
        (cache, state, _tok, _pos), _ = lax.scan(
            step, (cache, state, tok0, pos0), jnp.arange(T - 1))
    # HF finalize: the pool is already sorted descending by score;
    # num_return_sequences=1 takes slot 0
    return state[2][:, 0]


def generate_sample(params, cfg: LlavaConfig, input_ids, text_mask,
                    pixel_values, *, max_new_tokens: int, eos_id: int,
                    rng, temperature: float = 1.0, top_p: float = 1.0,
                    precision: Precision = DEFAULT_PRECISION,
                    diffusion_apply=None, use_flash: Optional[bool] = None):
    """Temperature/top-p sampling decode — the reference's
    `generate(do_sample=True, temperature=..., top_p=...)` surface
    (`lmms_eval/models/llava.py:415-417`, `run_llava.py:81-83`).
    `temperature <= 0` degrades to greedy, matching the reference's
    `do_sample = temperature > 0` routing."""
    return generate_greedy(
        params, cfg, input_ids, text_mask, pixel_values,
        max_new_tokens=max_new_tokens, eos_id=eos_id, precision=precision,
        diffusion_apply=diffusion_apply, use_flash=use_flash, rng=rng,
        temperature=temperature, top_p=top_p)


def generate_speculative(params, cfg: LlavaConfig, input_ids, text_mask,
                         pixel_values, *, max_new_tokens: int, eos_id: int,
                         draft_len: int = 8,
                         precision: Precision = DEFAULT_PRECISION,
                         diffusion_apply=None,
                         use_flash: Optional[bool] = None):
    """Greedy-equivalent decode with prompt-lookup speculation
    (models/speculative.py rationale) on the FULL LLaVA path: matches
    `generate_greedy` by construction (bit-exact parity tested in fp32;
    see speculative.py's bf16 tie caveat), but each decode-side weight
    pass verifies up to draft_len+1 tokens. Handles right-padded ragged
    batches (positions are per-row; cache slots are uniform; acceptance
    is lockstep = min over rows, which only under-accepts). Returns
    ([B, max_new_tokens] tokens, verification-round count)."""
    from .speculative import bigram_draft, pad_after_eos

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    b, l = input_ids.shape
    g = draft_len
    plan = splice_plan(input_ids, jnp.full_like(input_ids, IGNORE_INDEX),
                       text_mask, cfg.num_patches)
    img = encode_images(params, cfg, pixel_values, precision,
                        diffusion_apply)
    txt = L.embed_tokens(params["decoder"], input_ids, precision)
    embeds = splice_embeds(plan, txt, img)

    l_out = embeds.shape[1]
    gen_cap = max_new_tokens + g + 1
    t_max = l_out + gen_cap
    cache = L.init_cache(cfg.decoder, b, t_max,
                          precision.compute_dtype, quant=cfg.kv_quant)
    h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                         plan.positions,
                         attn_mask=jnp.concatenate(
                             [plan.attn_mask,
                              jnp.zeros((b, gen_cap), bool)], axis=1),
                         cache=cache, cache_index=0, precision=precision,
                         use_flash=use_flash)
    n_valid = jnp.sum(plan.attn_mask, axis=1)
    last_idx = jnp.maximum(n_valid - 1, 0)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    first = jnp.argmax(L.logits_fn(params["decoder"], h_last[:, None],
                                   precision)[:, -1],
                       axis=-1).astype(jnp.int32)

    # token history for the bigram lookup: text prompt (the image
    # placeholder id never collides with generated tokens) + generated
    h_max = l + gen_cap
    hist = jnp.zeros((b, h_max), jnp.int32)
    hist = lax.dynamic_update_slice(hist, input_ids, (0, 0))
    hist = lax.dynamic_update_slice(hist, first[:, None], (0, l))

    def cond(carry):
        return carry[2] < max_new_tokens

    def body(carry):
        hist, cache, n_gen, rounds = carry
        # n_gen tokens are known; the latest one's KV is not yet cached
        cur = lax.dynamic_slice(hist, (0, l + n_gen - 1), (b, 1))
        draft = bigram_draft(hist, l + n_gen, g)
        inp = jnp.concatenate([cur, draft], axis=1)
        emb = L.embed_tokens(params["decoder"], inp, precision)
        pos = n_valid[:, None] + n_gen - 1 + jnp.arange(g + 1)[None]
        slot_ok = jnp.concatenate(
            [plan.attn_mask,
             jnp.broadcast_to(jnp.arange(gen_cap)[None] < n_gen + g,
                              (b, gen_cap))], axis=1)
        h, cache = L.forward(params["decoder"], cfg.decoder, emb, pos,
                             attn_mask=slot_ok, cache=cache,
                             cache_index=l_out + n_gen - 1,
                             precision=precision)
        y = jnp.argmax(L.logits_fn(params["decoder"], h, precision),
                       axis=-1).astype(jnp.int32)
        agree = jnp.cumprod((draft == y[:, :g]).astype(jnp.int32), axis=1)
        a = jnp.min(jnp.sum(agree, axis=1))
        a = jnp.clip(a, 0, max_new_tokens - n_gen - 1)
        hist = lax.dynamic_update_slice(hist, y, (0, l + n_gen))
        return hist, cache, n_gen + a + 1, rounds + 1

    hist, _, _, rounds = lax.while_loop(
        cond, body, (hist, cache, jnp.int32(1), jnp.int32(0)))

    out = lax.dynamic_slice(hist, (0, l), (b, max_new_tokens))
    return pad_after_eos(out, eos_id), rounds
